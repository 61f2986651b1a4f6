"""Cross-store retention: one right-to-be-forgotten operator over every
persisted index family.

A real 100 TB training-data pipeline holds one document in MANY derived
artifacts at once — MinHash signatures + LSH bands, IVF-PQ / IVF-OPQ
residual codes, flat PQ/OPQ codes, lexical postings with corpus
statistics. A GDPR/right-to-be-forgotten request must remove the
document from ALL of them, and a crash halfway through the fan-out must
not leave some stores forgetting and others still serving the id (an
auditor reading the half-deleted state would call either answer wrong).

:func:`delete_docs_everywhere` makes the fan-out transactional by
reusing the shared two-phase swap core (``sources.tables``):

1. **Prepare** — every target store's filtered replacement is written
   to its sibling ``__compact_tmp`` / ``__delete_tmp``. No live store
   changes. A crash here leaves only stale tmp directories, which the
   per-store recover functions already clear: implicit rollback.
2. **Manifest** — one ``_retention_manifest.json`` records the full
   store list. Its existence is the commit point: before it exists the
   transaction rolls back, after it exists it rolls forward.
3. **Commit** — each prepared copy is swapped in through the shared
   rename protocol, then the manifest is removed.

A process death anywhere is healed by :func:`recover_retention` at
startup: with no manifest it clears any prepared-but-uncommitted tmps
(rollback); with a manifest it completes every remaining swap
(roll-forward — every tmp was verified complete before the manifest was
written) and then removes the manifest. Re-running a delete converges.

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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import (
    CELL_STORE_KINDS,
    CODES_SWAP_MARKERS,
    FLAT_CODES_KINDS,
    POSTINGS_SWAP_MARKERS,
    _commit_bands_swap,
    _commit_dir_swap,
    _prepare_bands_rewrite,
    _prepare_ivfpq_rewrite,
    _prepare_postings_rewrite,
    _prepare_sigs_delete,
    _prepare_table_rewrite,
    _recover_dir_swap,
    _swap_names,
    recover_compact_swap,
)

MANIFEST_NAME = "_retention_manifest.json"

_ALL_CODES_KINDS = CELL_STORE_KINDS + FLAT_CODES_KINDS


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
    vector_stores: list[str] | tuple[str, ...] = (),
    postings_stores: list[str] | tuple[str, ...] = (),
    content_hash_tables: list[str] | tuple[str, ...] = (),
    sketch_stores: list[str] | tuple[str, ...] = (),
) -> None:
    """Remove ``delete_ids`` from every given persisted artifact,
    all-or-nothing.

    ``delete_ids``: a Python list of ids or a one-column DataFrame. The
    SAME id space addresses a document everywhere it lives: ``doc_id``
    in the LSH index and postings stores, ``vec_id`` for the document's
    embedding in the vector stores (the fixtures and the serving tiers
    keep these aligned; pass separate calls if yours diverge).

    ``lsh``: ``(sigs_path, bands_table)`` — both halves of the LSH
    index. ``vector_stores``: paths of IVF-PQ / IVF-OPQ / flat PQ / OPQ
    codes stores (the kind is read from each store's own sidecar).
    ``postings_stores``: lexical store paths (postings + doc-length +
    term-df sidecars all rewritten, so BM25 statistics reflect the
    post-delete corpus exactly). ``content_hash_tables``: bucketed
    exact-dedup history tables (:func:`~.tables.
    write_content_hashes_bucketed`) — a deleted doc's (doc_id,
    content_hash) row would otherwise keep flagging future re-ingests
    of its content as duplicates of a forgotten id. ``manifest_path``:
    a directory the transaction manifest lives under while the commit
    fan-out runs — run :func:`recover_retention` on it at startup.

    ``sketch_stores``: always raises — see the module docstring. CMS and
    HLL cannot unlearn; rebuild them from the surviving corpus with
    their batch builders instead.

    Scale shape: each store's rewrite is the SAME broadcast anti-join +
    layout-preserving rewrite its own ``delete_from_*`` runs (parquet
    is immutable, so a delete is O(store rewrite) per store — batch
    deletion requests into maintenance windows). The transaction adds
    no data movement, only the ordering guarantee: every rewrite is
    staged under its sibling tmp before any store swaps.
    """
    if sketch_stores:
        raise ValueError(
            "CMS/HLL sketch stores cannot unlearn a key (cell sums and "
            "register maxima keep every absorbed contribution): rebuild "
            f"{list(sketch_stores)} from the surviving corpus with "
            "cms_build / hll_registers instead of deleting from them"
        )
    stores: list[dict] = []
    doc_ids = _ids_df(spark, delete_ids, "doc_id")
    vec_ids = _ids_df(spark, delete_ids, "vec_id")

    # ---- phase 1: prepare every store's filtered replacement --------
    if lsh is not None:
        sigs_path, bands_table = lsh
        _prepare_bands_rewrite(
            spark,
            bands_table,
            lambda cur, _parts: cur.join(doc_ids, "doc_id", "left_anti"),
        )
        stores.append({"medium": "table", "name": bands_table})
        _prepare_sigs_delete(spark, doc_ids, sigs_path)
        stores.append(
            {"medium": "dir", "path": sigs_path, "suffix": "__delete",
             "markers": ["_SUCCESS"]}
        )
    for path in vector_stores:
        # kind validation happens inside the prepare (it reads the
        # sidecar anyway and raises on anything outside the kinds set)
        _prepare_ivfpq_rewrite(
            spark,
            path,
            lambda cur, _parts: cur.join(vec_ids, "vec_id", "left_anti"),
            kinds=_ALL_CODES_KINDS,
        )
        stores.append(
            {"medium": "dir", "path": path, "suffix": "__compact",
             "markers": list(CODES_SWAP_MARKERS)}
        )
    for table in content_hash_tables:
        _prepare_table_rewrite(
            spark,
            table,
            lambda cur, _parts: cur.join(doc_ids, "doc_id", "left_anti"),
            ("content_hash",),
        )
        stores.append({"medium": "table", "name": table})
    for path in postings_stores:
        _prepare_postings_rewrite(
            spark,
            path,
            lambda posts, dls: (
                posts.join(doc_ids, "doc_id", "left_anti"),
                dls.join(doc_ids, "doc_id", "left_anti"),
            ),
        )
        stores.append(
            {"medium": "dir", "path": path, "suffix": "__compact",
             "markers": list(POSTINGS_SWAP_MARKERS)}
        )

    # ---- phase 2: the commit point ----------------------------------
    os.makedirs(manifest_path, exist_ok=True)
    manifest_file = os.path.join(manifest_path, MANIFEST_NAME)
    tmp_manifest = manifest_file + ".tmp"
    with open(tmp_manifest, "w") as fh:
        json.dump({"stores": stores}, fh)
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
    os.remove(manifest_file)


def _commit_all(spark: SparkSession, stores: list[dict]) -> None:
    """Swap each prepared store in, tolerating already-committed
    entries (roll-forward re-runs this after a mid-fan death)."""
    for st in stores:
        if st["medium"] == "table":
            table = st["name"]
            tmp = f"{table}__compact_tmp"
            if spark.catalog.tableExists(tmp) and spark.catalog.tableExists(
                table
            ):
                _commit_bands_swap(spark, table)
            else:
                # death inside (or after) this store's swap window:
                # the per-store recover completes it idempotently
                recover_compact_swap(spark, table)
        else:
            path, suffix = st["path"], st["suffix"]
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


def recover_retention(spark: SparkSession, manifest_path: str) -> bool:
    """Startup recovery for a process death anywhere inside
    :func:`delete_docs_everywhere`. No manifest → the transaction never
    reached its commit point: nothing to do (per-store recover/prepare
    calls clear stale tmps lazily; the live stores were never touched).
    Manifest present → every prepared copy was complete when it was
    written, so roll the whole fan-out FORWARD: finish each remaining
    swap and drop the manifest. Returns True if a manifest was found
    and processed."""
    manifest_file = os.path.join(manifest_path, MANIFEST_NAME)
    if not os.path.exists(manifest_file):
        return False
    try:
        with open(manifest_file) as fh:
            stores = json.load(fh)["stores"]
    except (ValueError, KeyError):
        # torn commit point: the rename survived a power loss but the
        # data pages didn't (pre-fsync kernels / non-POSIX stores).
        # The transaction never durably committed — clear the husk and
        # report not-found; re-issuing the SAME delete converges (every
        # per-store rewrite is idempotent), which is the documented
        # remediation after a power event.
        os.remove(manifest_file)
        return False
    _commit_all(spark, stores)
    os.remove(manifest_file)
    return True
