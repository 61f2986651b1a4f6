"""Cross-store retention: one right-to-be-forgotten operator over every
persisted index family.

A real 100 TB training-data pipeline holds one document in MANY derived
artifacts at once — MinHash signatures + LSH bands (and their sharded
serving exports), IVF-PQ / IVF-OPQ residual codes, flat PQ/OPQ codes,
the raw-vector ANN / IVF / QED partitioned stores (which hold the
document's embedding verbatim), lexical postings with corpus
statistics. A GDPR/right-to-be-forgotten request must remove the
document from ALL of them, and a crash halfway through the fan-out must
not leave some stores forgetting and others still serving the id (an
auditor reading the half-deleted state would call either answer wrong).

:func:`delete_docs_everywhere` makes the fan-out transactional by
reusing the shared two-phase swap core (``sources.tables``):

1. **Prepare** — every target store's filtered replacement is written
   to its sibling ``__retention_tmp``. No live store changes. The
   suffix is EXCLUSIVE to retention: the per-store lifecycle recovers
   (``recover_compact_swap`` / ``recover_ivfpq_swap`` /
   ``recover_postings_swap`` / ``recover_sigs_swap``) only ever touch
   their own ``__compact`` / ``__delete`` siblings, so a startup that
   interleaves per-store recovery with :func:`recover_retention` can
   never mistake a prepared retention copy for stale lifecycle debris
   and delete it out from under a committed manifest.
2. **Manifest** — one ``_retention_manifest.json`` records the full
   store list. Its existence is the commit point: before it exists the
   transaction rolls back, after it exists it rolls forward.
3. **Commit** — each prepared copy is swapped in through the shared
   rename protocol, then the manifest is removed.

A process death anywhere is healed by :func:`recover_retention` at
startup: with no manifest the transaction never committed and the live
stores were never touched — the function returns False WITHOUT touching
anything (prepared-but-uncommitted ``__retention`` tmps are inert
debris; the next retention prepare clears its own leftovers, and
:func:`vacuum_stores` sweeps them on demand); with a manifest it
completes every remaining swap (roll-forward — every tmp was verified
complete before the manifest was written) and then removes the
manifest. Re-running a delete converges.

Sketch stores (CMS/HLL) are the documented impossibility: a sketch is a
lossy fold, so it cannot unlearn one key — ``F.count_min_sketch``-style
cell sums and HLL register maxima keep the deleted doc's contribution
forever. Passing ``sketch_stores`` raises with the rebuild-only
remediation instead of silently "succeeding".

Reference parity: the reference engine has no deletion story at all
(its shards are immutable ``.npy`` files — ``app/src/index_builder.py``
rebuilds from scratch); this operator is part of the
beyond-the-reference pipeline surface, at the same crash-safety bar as
the per-store lifecycles.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import (
    CELL_STORE_KINDS,
    CODES_SWAP_MARKERS,
    FLAT_CODES_KINDS,
    POSTINGS_SWAP_MARKERS,
    RAW_VECTOR_KINDS,
    _commit_bands_swap,
    _commit_dir_swap,
    _prepare_bands_rewrite,
    _prepare_ivfpq_rewrite,
    _prepare_postings_rewrite,
    _prepare_sigs_delete,
    _prepare_table_rewrite,
    _recover_dir_swap,
    _swap_names,
    _sync_partitions,
    recover_compact_swap,
    recover_ivfpq_swap,
    recover_postings_swap,
    recover_sigs_swap,
)

MANIFEST_NAME = "_retention_manifest.json"

# The swap-window suffix retention owns EXCLUSIVELY. Per-store lifecycle
# recovers clear only their own __compact/__delete siblings, so a
# prepared retention copy survives any interleaving of startup recovery
# calls until recover_retention itself rolls the manifest forward.
RETENTION_SUFFIX = "__retention"

# vec_id-addressed partitioned stores the retention fan-out accepts:
# quantized codes (cell or flat) AND the raw-vector families (hyperplane
# ANN buckets, IVF cells, QED bins) — the raw stores hold the forgotten
# doc's embedding verbatim, so skipping them would leak the vector.
_ALL_VECTOR_KINDS = CELL_STORE_KINDS + FLAT_CODES_KINDS + RAW_VECTOR_KINDS

# every swap-window suffix any store family can leave siblings under
_ALL_SUFFIXES = ("__compact", "__delete", RETENTION_SUFFIX)


def _ids_df(spark: SparkSession, delete_ids, col: str) -> DataFrame:
    if isinstance(delete_ids, DataFrame):
        src = delete_ids
        first = src.columns[0]
        return F.broadcast(
            src.select(F.col(first).cast("bigint").alias(col)).distinct()
        )
    return F.broadcast(
        spark.createDataFrame(
            [(int(i),) for i in delete_ids], f"{col} bigint"
        ).distinct()
    )


def delete_docs_everywhere(
    spark: SparkSession,
    delete_ids,
    manifest_path: str,
    *,
    lsh: tuple[str, str] | None = None,
    lsh_sharded: list[tuple[str, str]] | tuple = (),
    vector_stores: list[str] | tuple[str, ...] = (),
    postings_stores: list[str] | tuple[str, ...] = (),
    content_hash_tables: list[str] | tuple[str, ...] = (),
    sketch_stores: list[str] | tuple[str, ...] = (),
    audit_log: str | None = None,
    clock=None,
) -> None:
    """Remove ``delete_ids`` from every given persisted artifact,
    all-or-nothing.

    ``delete_ids``: a Python list of ids or a one-column DataFrame. The
    SAME id space addresses a document everywhere it lives: ``doc_id``
    in the LSH index and postings stores, ``vec_id`` for the document's
    embedding in the vector stores (the fixtures and the serving tiers
    keep these aligned; pass separate calls if yours diverge).

    ``lsh``: ``(sigs_path, bands_table)`` — both halves of the LSH
    index. ``lsh_sharded``: ``(sigs_path, bands_table)`` pairs of the
    shard-partitioned serving exports (:func:`~.tables.write_bands_sharded`
    / :func:`~.tables.write_sigs_sharded`) — the shard layout is
    preserved, so replica exports keep pruning to their directories.
    ``vector_stores``: paths of ANY vec_id-addressed partitioned store —
    quantized (IVF-PQ / IVF-OPQ / flat PQ / OPQ codes) or raw-vector
    (hyperplane-bucketed ANN, IVF cell, QED bin stores); the kind is
    read from each store's own sidecar and the partition layout
    (cell / bucket / qed_bin / stream ingest_batch) is preserved.
    ``postings_stores``: lexical store paths (postings + doc-length +
    term-df sidecars all rewritten, so BM25 statistics reflect the
    post-delete corpus exactly). ``content_hash_tables``: bucketed
    exact-dedup history tables (:func:`~.tables.
    write_content_hashes_bucketed`) — a deleted doc's (doc_id,
    content_hash) row would otherwise keep flagging future re-ingests
    of its content as duplicates of a forgotten id. ``manifest_path``:
    a directory the transaction manifest lives under while the commit
    fan-out runs — run :func:`recover_retention` on it at startup.

    Stream-maintained (``ingest_batch``-partitioned) stores are fair
    targets: every prepare restates the epoch level and carries the
    absorbed-epoch watermark, so the maintenance loop resumes with its
    replay protection intact after the delete.

    ``sketch_stores``: always raises — see the module docstring. CMS and
    HLL cannot unlearn; rebuild them from the surviving corpus with
    their batch builders instead.

    ``audit_log``: optional path of an append-only JSON-lines audit
    trail. The manifest is REMOVED once the fan-out commits, so it
    cannot prove afterwards that a deletion happened; with
    ``audit_log`` set, one line — distinct-id count, the stores
    touched, requested/committed timestamps, and whether startup
    recovery finished the commit — is appended once every swap has
    committed, AT LEAST once per deletion (the audit spec rides
    INSIDE the manifest, so a crash-then-:func:`recover_retention`
    completion is audited too, marked ``"via": "recover"``; a death
    between the append and the manifest removal yields a benign
    duplicate rather than a lost proof). ``clock``: zero-arg callable
    returning the timestamp value to record (caller-owned — the
    engine takes no wall-clock dependency); timestamps are null
    without it.

    Scale shape: each store's rewrite is the SAME broadcast anti-join +
    layout-preserving rewrite its own ``delete_from_*`` runs (parquet
    is immutable, so a delete is O(store rewrite) per store — batch
    deletion requests into maintenance windows). The transaction adds
    no data movement, only the ordering guarantee: every rewrite is
    staged under its sibling ``__retention_tmp`` before any store swaps.
    """
    if sketch_stores:
        raise ValueError(
            "CMS/HLL sketch stores cannot unlearn a key (cell sums and "
            "register maxima keep every absorbed contribution): rebuild "
            f"{list(sketch_stores)} from the surviving corpus with "
            "cms_build / hll_registers instead of deleting from them"
        )
    manifest_file = os.path.join(manifest_path, MANIFEST_NAME)
    if os.path.exists(manifest_file):
        raise ValueError(
            f"a retention manifest already exists at {manifest_file}: an "
            "earlier delete died after its commit point — run "
            "recover_retention(spark, manifest_path) to roll it forward "
            "before issuing a new delete"
        )
    stores: list[dict] = []
    doc_ids = _ids_df(spark, delete_ids, "doc_id")
    vec_ids = _ids_df(spark, delete_ids, "vec_id")

    def _stage_lsh(sigs_path: str, bands_table: str) -> None:
        _prepare_bands_rewrite(
            spark,
            bands_table,
            lambda cur, _parts: cur.join(doc_ids, "doc_id", "left_anti"),
            suffix=RETENTION_SUFFIX,
        )
        stores.append(
            {"medium": "table", "name": bands_table, "suffix": RETENTION_SUFFIX}
        )
        _prepare_sigs_delete(spark, doc_ids, sigs_path, suffix=RETENTION_SUFFIX)
        stores.append(
            {"medium": "dir", "path": sigs_path, "suffix": RETENTION_SUFFIX,
             "markers": ["_SUCCESS"]}
        )

    # ---- phase 1: prepare every store's filtered replacement --------
    if lsh is not None:
        _stage_lsh(*lsh)
    for sigs_path, bands_table in lsh_sharded:
        _stage_lsh(sigs_path, bands_table)
    for path in vector_stores:
        # kind validation happens inside the prepare (it reads the
        # sidecar anyway and raises on anything outside the kinds set)
        _prepare_ivfpq_rewrite(
            spark,
            path,
            lambda cur, _parts: cur.join(vec_ids, "vec_id", "left_anti"),
            kinds=_ALL_VECTOR_KINDS,
            suffix=RETENTION_SUFFIX,
        )
        stores.append(
            {"medium": "dir", "path": path, "suffix": RETENTION_SUFFIX,
             "markers": list(CODES_SWAP_MARKERS)}
        )
    for table in content_hash_tables:
        _prepare_table_rewrite(
            spark,
            table,
            lambda cur, _parts: cur.join(doc_ids, "doc_id", "left_anti"),
            ("content_hash",),
            suffix=RETENTION_SUFFIX,
        )
        stores.append(
            {"medium": "table", "name": table, "suffix": RETENTION_SUFFIX}
        )
    for path in postings_stores:
        _prepare_postings_rewrite(
            spark,
            path,
            lambda posts, dls: (
                posts.join(doc_ids, "doc_id", "left_anti"),
                dls.join(doc_ids, "doc_id", "left_anti"),
            ),
            suffix=RETENTION_SUFFIX,
        )
        stores.append(
            {"medium": "dir", "path": path, "suffix": RETENTION_SUFFIX,
             "markers": list(POSTINGS_SWAP_MARKERS)}
        )

    # ---- phase 2: the commit point ----------------------------------
    manifest: dict = {"stores": stores}
    if audit_log is not None:
        manifest["audit"] = {
            "log": audit_log,
            "n_ids": doc_ids.count(),
            "requested_at": clock() if clock is not None else None,
        }
    os.makedirs(manifest_path, exist_ok=True)
    tmp_manifest = manifest_file + ".tmp"
    with open(tmp_manifest, "w") as fh:
        json.dump(manifest, fh)
        # fsync data BEFORE the rename and the directory AFTER it:
        # process death is covered by the rename alone, but POWER loss
        # can persist a rename whose data pages never hit disk (a
        # zero-length manifest on XFS/older ext4) or lose the rename
        # entirely — either would break the all-or-nothing promise.
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(tmp_manifest, manifest_file)  # atomic: manifest is all-or-nothing
    dir_fd = os.open(manifest_path, os.O_RDONLY)
    try:
        os.fsync(dir_fd)
    finally:
        os.close(dir_fd)

    # ---- phase 3: swap every prepared copy in ------------------------
    _commit_all(spark, stores)
    # audit BEFORE clearing the manifest: at-least-once. The reverse
    # order could lose the proof forever — a death between the remove
    # and the append leaves no manifest for recover_retention to
    # re-audit from. This way a death inside the window is healed by
    # recovery re-running the (idempotent) swaps and appending again
    # (via='recover'); every line records an already-applied deletion.
    _append_audit(manifest, via="delete", clock=clock)
    os.remove(manifest_file)


def _store_names(stores: list[dict]) -> list[str]:
    return [
        st["name"] if st.get("medium") == "table" else st.get("path", "?")
        for st in stores
    ]


def _append_audit(manifest: dict, via: str, clock=None) -> None:
    """Append the deletion's proof line to the manifest's audit log —
    AT LEAST once per completed fan-out (called after every swap
    committed, right before the manifest file is removed; the audit
    spec lives inside the manifest so the recover path can audit a
    crash-completed deletion too). A death between the append and the
    remove makes recovery append a second ``via='recover'`` line for
    the same deletion — duplicates are benign for proof, a LOST line
    is not, which is why the append comes first. Durable: flushed and
    fsync'd before returning, so the line survives the same power
    events the manifest protocol does."""
    audit = manifest.get("audit")
    if not isinstance(audit, dict) or not audit.get("log"):
        return
    line = {
        "n_ids": audit.get("n_ids"),
        "stores": _store_names(manifest.get("stores", [])),
        "requested_at": audit.get("requested_at"),
        "committed_at": clock() if clock is not None else None,
        "via": via,
    }
    log_dir = os.path.dirname(audit["log"])
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
    with open(audit["log"], "a") as fh:
        fh.write(json.dumps(line) + "\n")
        fh.flush()
        os.fsync(fh.fileno())


def _commit_all(spark: SparkSession, stores: list[dict]) -> None:
    """Swap each prepared store in, tolerating already-committed
    entries (roll-forward re-runs this after a mid-fan death). Because
    the ``__retention`` suffix is exclusive to this transaction, a
    missing tmp next to a healthy live store can only mean THIS
    transaction already swapped it — no lifecycle recover can have
    cleared a manifest-listed tmp — so skipping it is sound.

    Entries without a ``suffix`` key are manifests written BEFORE the
    retention-exclusive suffix existed: their table tmps live under
    the lifecycle's ``__compact`` names (dir entries always recorded
    their suffix explicitly), so that is the backward-compatible
    default — defaulting to ``__retention`` would make an upgraded
    binary silently skip every old table swap."""
    for st in stores:
        suffix = st.get("suffix", "__compact")
        if st["medium"] == "table":
            table = st["name"]
            tmp = f"{table}{suffix}_tmp"
            if spark.catalog.tableExists(tmp) and spark.catalog.tableExists(
                table
            ):
                _commit_bands_swap(spark, table, suffix=suffix)
            else:
                # death inside (or after) this store's swap window:
                # the shared recover completes it idempotently
                recover_compact_swap(spark, table, suffix=suffix)
        else:
            path = st["path"]
            tmp, _old = _swap_names(path, suffix)
            if os.path.exists(tmp) and os.path.exists(path):
                _commit_dir_swap(path, suffix=suffix)
            else:
                _recover_dir_swap(
                    path,
                    tuple(st["markers"]),
                    suffix=suffix,
                    label="retention target",
                )


def recover_retention(
    spark: SparkSession, manifest_path: str, clock=None
) -> bool:
    """Startup recovery for a process death anywhere inside
    :func:`delete_docs_everywhere`. No manifest → the transaction never
    reached its commit point: nothing to do and NOTHING is touched (the
    live stores were never modified; any prepared ``__retention`` tmps
    are inert debris the next retention prepare or
    :func:`vacuum_stores` clears). Manifest present → every prepared
    copy was complete when it was written, so roll the whole fan-out
    FORWARD: finish each remaining swap and drop the manifest. Safe to
    run in any order relative to the per-store lifecycle recovers —
    they cannot touch the ``__retention`` siblings this transaction
    owns. Returns True if a manifest was found and processed. A rolled-
    forward manifest carrying an audit spec gets its audit line
    appended (``"via": "recover"``) the moment the manifest clears —
    the deletion is provable even when a crash, not the caller,
    finished the commit; pass ``clock`` to timestamp it."""
    manifest_file = os.path.join(manifest_path, MANIFEST_NAME)
    if not os.path.exists(manifest_file):
        return False
    try:
        with open(manifest_file) as fh:
            data = json.load(fh)
        stores = data["stores"]
        if not isinstance(stores, list) or not all(
            isinstance(st, dict) for st in stores
        ):
            raise TypeError("manifest 'stores' is not a list of objects")
    except (ValueError, KeyError, TypeError):
        # torn commit point: the rename survived a power loss but the
        # data pages didn't (pre-fsync kernels / non-POSIX stores) —
        # a zero-length file, a truncated JSON prefix, or a husk that
        # parses as a scalar/list. The transaction never durably
        # committed — clear the husk and report not-found; re-issuing
        # the SAME delete converges (every per-store rewrite is
        # idempotent), which is the documented remediation after a
        # power event.
        os.remove(manifest_file)
        return False
    _commit_all(spark, stores)
    _append_audit(data, via="recover", clock=clock)  # before remove:
    # at-least-once, same law as delete_docs_everywhere's commit tail
    os.remove(manifest_file)
    return True


def recover_all(
    spark: SparkSession,
    manifest_paths: list[str] | tuple[str, ...] | str,
    *,
    lsh: tuple[str, str] | None = None,
    lsh_sharded: list[tuple[str, str]] | tuple = (),
    vector_stores: list[str] | tuple[str, ...] = (),
    postings_stores: list[str] | tuple[str, ...] = (),
    content_hash_tables: list[str] | tuple[str, ...] = (),
    vacuum: bool = False,
    clock=None,
) -> dict:
    """ONE ordered startup-recovery entrypoint: heal a node after any
    crash with a single call, given the same store-layout spec
    :func:`delete_docs_everywhere` takes (reference analog: the
    startup hook as the single recovery point,
    ``app/src/query_service.py:86-133`` — the reference re-reads its
    immutable shards at boot; here the artifacts are mutable, so boot
    must also complete whatever rewrite was in flight when the node
    died).

    Order matters and is fixed:

    1. :func:`recover_retention` on every manifest path — committed
       cross-store transactions roll FORWARD first, so a store that
       was mid-retention serves the post-delete corpus before anything
       else looks at it. (The ``__retention`` suffix is exclusive, so
       the per-store recovers below could not damage a pending
       transaction either way — the ordering buys promptness of the
       GDPR effect, not safety.)
    2. Every per-store lifecycle recover: bands table + signature dir
       for each LSH index (full and sharded), the layout-generic dir
       recover for every vec_id store family, the postings recover for
       every lexical store. Each is idempotent and heals only its own
       ``__compact`` / ``__delete`` windows.
    3. Optionally (``vacuum=True``) :func:`vacuum_stores` over the
       whole layout, with ``manifest_paths`` passed through — at this
       point every manifest has been rolled forward, so surviving
       ``__retention`` siblings are provably uncommitted debris and
       the sweep is safe by construction.

    ``clock`` is forwarded to :func:`recover_retention` so a rolled-
    forward deletion's audit line carries a completion timestamp.

    Idempotent on a healthy layout (all-False report, nothing
    touched). Returns a report dict:
    ``{"retention": {manifest_path: bool}, "stores": {name: bool},
    "vacuumed": [names]}`` — True where a recovery action happened.
    """
    if isinstance(manifest_paths, str):
        manifest_paths = (manifest_paths,)
    report: dict = {"retention": {}, "stores": {}, "vacuumed": []}
    for mp in manifest_paths:
        report["retention"][mp] = recover_retention(spark, mp, clock=clock)

    def _recover_lsh(sigs_path: str, bands_table: str) -> None:
        report["stores"][bands_table] = recover_compact_swap(
            spark, bands_table
        )
        report["stores"][sigs_path] = recover_sigs_swap(sigs_path)

    if lsh is not None:
        _recover_lsh(*lsh)
    for sigs_path, bands_table in lsh_sharded:
        _recover_lsh(sigs_path, bands_table)
    for path in vector_stores:
        # one dir-swap recover serves every vec_id family (cell-
        # partitioned, flat, raw-vector): the swap mechanics are
        # layout-generic, exactly like the rewrites that create them
        report["stores"][path] = recover_ivfpq_swap(path)
    for path in postings_stores:
        report["stores"][path] = recover_postings_swap(path)
    for table in content_hash_tables:
        report["stores"][table] = recover_compact_swap(spark, table)

    if vacuum:
        dir_stores = list(vector_stores) + list(postings_stores)
        tables = list(content_hash_tables)
        if lsh is not None:
            dir_stores.append(lsh[0])
            tables.append(lsh[1])
        for sigs_path, bands_table in lsh_sharded:
            dir_stores.append(sigs_path)
            tables.append(bands_table)
        report["vacuumed"] = vacuum_stores(
            spark,
            dir_stores=dir_stores,
            tables=tables,
            manifest_paths=list(manifest_paths),
        )
    return report


def vacuum_stores(
    spark: SparkSession,
    *,
    dir_stores: list[str] | tuple[str, ...] = (),
    tables: list[str] | tuple[str, ...] = (),
    manifest_paths: list[str] | tuple[str, ...] | None = None,
    allow_unmanifested_retention: bool = False,
) -> list[str]:
    """Garbage-collect swap debris next to HEALTHY stores: the
    ``__compact`` / ``__delete`` / ``__retention`` tmp and set-aside
    siblings a crash can strand (the lifecycle recovers clear them
    lazily on the next rewrite; this sweeps them eagerly in one
    operational pass across every family).

    Refuses three states that are NOT debris:

    - a store whose live copy is missing — that is a half-finished swap
      the matching recover must heal (``recover_*_swap`` /
      :func:`recover_retention`), not a cleanup target;
    - any sibling of a store listed in a live retention manifest under
      ``manifest_paths`` — those tmps are a committed transaction's
      roll-forward inputs; the whole store is skipped until
      :func:`recover_retention` completes it;
    - ANY ``__retention`` sibling when ``manifest_paths`` was not
      supplied at all (``None``, the default). Retention safety is
      only as good as the manifest list the caller hands over: a
      vacuum that never saw the manifest of a committed-but-unrolled
      transaction would eat its roll-forward tmps, after which
      :func:`recover_retention` sees missing-tmp + healthy-live and
      treats the store as already swapped — a GDPR delete silently
      unapplied. Passing ``manifest_paths`` (even ``[]``) is the
      caller's assertion "this is EVERY manifest directory my
      deployment uses"; only then are unlisted ``__retention``
      siblings provably uncommitted debris. Set
      ``allow_unmanifested_retention=True`` to waive the assertion
      (only sound when no retention transaction has ever run, or
      after :func:`recover_retention` was run on every manifest dir).

    Run it with no writer active (same single-writer discipline as
    compaction). Returns the list of removed sibling names."""
    sweep_retention = (
        manifest_paths is not None or allow_unmanifested_retention
    )
    suffixes = (
        _ALL_SUFFIXES if sweep_retention else ("__compact", "__delete")
    )
    protected_dirs: set[str] = set()
    protected_tables: set[str] = set()
    for mp in manifest_paths or ():
        mf = os.path.join(mp, MANIFEST_NAME)
        if not os.path.exists(mf):
            continue
        try:
            with open(mf) as fh:
                data = json.load(fh)
            listed = data["stores"]
            if not isinstance(listed, list) or not all(
                isinstance(st, dict) for st in listed
            ):
                raise TypeError
        except (ValueError, KeyError, TypeError):
            continue  # torn husk: recover_retention owns clearing it
        for st in listed:
            if st.get("medium") == "table":
                protected_tables.add(st["name"])
            else:
                protected_dirs.add(os.path.normpath(st["path"]))

    # validate EVERY store before removing ANYTHING: a missing live
    # copy aborting mid-sweep would leave a partial vacuum whose
    # already-removed names are lost with the exception
    for path in dir_stores:
        if os.path.normpath(path) not in protected_dirs and not os.path.exists(
            path
        ):
            raise ValueError(
                f"{path} has no live copy — a swap died mid-rename; run "
                "the store's recover (recover_*_swap / recover_retention) "
                "before vacuuming"
            )
    for table in tables:
        if table not in protected_tables and not spark.catalog.tableExists(
            table
        ):
            raise ValueError(
                f"table {table} does not exist — a swap died mid-rename; "
                "run recover_compact_swap (or recover_retention) before "
                "vacuuming"
            )

    removed: list[str] = []
    for path in dir_stores:
        if os.path.normpath(path) in protected_dirs:
            continue
        for sfx in suffixes:
            for side in _swap_names(path, sfx):
                if os.path.exists(side):
                    shutil.rmtree(side)
                    removed.append(side)
    for table in tables:
        if table in protected_tables:
            continue
        acted = False
        for sfx in suffixes:
            for side in (f"{table}{sfx}_tmp", f"{table}{sfx}_old"):
                if spark.catalog.tableExists(side):
                    # re-point the leftover's partition metadata at its
                    # own directories first — same law as the shared
                    # recover protocol: a renamed-aside table's stale
                    # per-partition locations can alias the live copy's
                    # directories, and DROP would delete through them
                    _sync_partitions(spark, side)
                    spark.sql(f"DROP TABLE {side}")
                    removed.append(side)
                    acted = True
        if acted:
            _sync_partitions(spark, table)
    return removed
