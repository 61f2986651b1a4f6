"""Sources & sinks (SURVEY §2.1).

The reference's NPY/pickle shard files (S1-S5) become Parquet tables;
shard assignment/round-robin (S4) dissolves into Spark task scheduling.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.materialize import (
    materialize,
)

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def sf_dir_from_env(default: str = DEFAULT_SF_DIR) -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


def _scan_splits_estimate(spark: SparkSession, path: str, cap: int) -> int:
    """Estimated scan split count from file METADATA (one FS listing —
    no plan->RDD conversion, which cost ~40 ms per fresh DataFrame and
    re-planned the scan on every load_table call). Mirrors Spark's
    FilePartition packing: each file is charged openCostInBytes and
    sizes bin-pack into maxPartitionBytes bins. Returns early once
    ``cap`` splits are accounted for (a big table never pays a full
    walk)."""
    jvm = spark._jvm
    as_bytes = jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes
    max_pb = as_bytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "128m")
    )
    open_cost = as_bytes(
        spark.conf.get("spark.sql.files.openCostInBytes", "4m")
    )
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    charged = 0
    it = fs.listStatusIterator(jpath)
    while it.hasNext():
        st = it.next()
        base = st.getPath().getName()
        if not st.isFile() or base.startswith(("_", ".")):
            continue
        charged += st.getLen() + open_cost
        if charged >= cap * max_pb:
            return cap
    return max(1, -(-charged // max_pb))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """S1/S2: columnar scan with pushdown/pruning owned by Spark.

    The ``events`` fixture is written with TIMESTAMP(NANOS), which
    Spark refuses by default; read nanos as long and truncate to
    microseconds (exactly DuckDB's TIMESTAMP_NS -> TIMESTAMP behavior,
    keeping the oracle comparable).

    ORDERING CAVEAT: ``documents``/``embeddings`` may come back
    round-robin repartitioned (see below), so row order — and therefore
    any bare ``.limit(n)`` / ``.first()`` subset — is not stable across
    evaluations. Select subsets by predicate (``filter(id < n)``), as
    the tests and fixtures do.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            # integer `div`, not `/`: nanos ~1.7e18 exceed double's 53-bit
            # mantissa, so floor(ts/1000.0) is off by ±1us on some rows.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    df = spark.read.parquet(path)
    if name in ("documents", "embeddings"):
        # Spread under-split inputs for the compute-heavy tables: the
        # fixtures ship as ONE parquet row group, so every downstream
        # per-row pass (shingle+minhash signing, gram hashing, scoring,
        # encode kernels) would otherwise run as a single task no
        # matter how many cores the session has (guide §2.5 input
        # skew: "one huge unsplittable file — repartition immediately
        # after the read"). Scale-adaptive, not a local constant: the
        # target is the session's defaultParallelism and the
        # repartition only fires when the scan has FEWER splits than
        # that — a production-sized table with many files/row groups
        # passes through untouched, and filters/pruning still push
        # through the repartition to the scan. The split count comes
        # from file metadata, not df.rdd (which converted the plan to
        # an RDD on every call).
        target = spark.sparkContext.defaultParallelism
        if _scan_splits_estimate(spark, path, target) < target:
            df = df.repartition(target)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def write_sharded(df: DataFrame, path: str, num_shards: int, key: str = "doc_id") -> None:
    """S3 shard sink: contiguous key-range shards, as the reference's
    ``index_builder.split_and_save`` (``app/src/index_builder.py:22-36``)
    but expressed as range partitioning (deterministic per key, not per
    insertion order)."""
    df.repartitionByRange(num_shards, key).write.mode("overwrite").parquet(path)


def write_bands(bands: DataFrame, path: str, num_buckets: int = 64) -> None:
    """Persist the LSH index table partition-hashed on band_hash.

    Plain parquet carries no bucketing metadata, so a re-read does NOT
    avoid the probe-join shuffle — this sink is for layout/size
    control only. Use :func:`write_bands_bucketed` for a shuffle-free
    batch-probe index."""
    bands.repartition(num_buckets, "band_hash").write.mode("overwrite").parquet(path)


#: ingest_batch value for data written at initial build / compaction
#: time in batch-partitioned index layouts. Streaming micro-batch ids
#: are >= 0, so the base partition can never collide with (and be
#: clobbered by) a replayed epoch's dynamic partition overwrite.
BASE_INGEST_BATCH = -1


def write_bands_bucketed(
    bands: DataFrame,
    table: str,
    num_buckets: int = 64,
    batch_partitioned: bool = False,
) -> None:
    """Persist the LSH index as a BUCKETED table on the probe-join key
    (band_id, band_hash), sorted within buckets.

    Batch probes then join `spark.table(table)` without exchanging the
    corpus side — only the (small) query band set shuffles. At 100 TB
    this is the difference between re-shuffling the whole index per
    probe batch and a one-time shuffle at index-build. The reference's
    analogue is its shard layout + per-worker hash tables
    (``app/src/index_builder.py:22-36``, ``worker_tasks.py:84-113``);
    a bucketed table is the immutable Spark equivalent.

    ``batch_partitioned=True`` additionally partitions the table by an
    ``ingest_batch`` column (initial data lands in the
    :data:`BASE_INGEST_BATCH` partition). That layout is what
    :func:`append_to_index_exactly_once` requires: each micro-batch
    owns one partition directory, so a replayed epoch OVERWRITES its
    own partition instead of appending duplicates. Bucketing is
    per-partition-consistent, so probe joins stay shuffle-free on the
    index side either way."""
    writer = bands
    if batch_partitioned:
        writer = bands.withColumn("ingest_batch", F.lit(BASE_INGEST_BATCH))
    writer = writer.write.mode("overwrite")
    if batch_partitioned:
        writer = writer.partitionBy("ingest_batch")
    (
        writer.bucketBy(num_buckets, "band_id", "band_hash")
        .sortBy("band_id", "band_hash")
        .format("parquet")
        .saveAsTable(table)
    )


def append_to_index(
    new_docs: DataFrame,
    params,
    sigs_path: str,
    bands_table: str,
) -> None:
    """Incremental index maintenance: sign + band ONLY the new docs and
    append them to the persisted index — at 100 TB you never rebuild
    from scratch.

    The signature table appends as parquet; the bands table appends to
    the BUCKETED index (:func:`write_bands_bucketed`): each append
    writes its own bucket-hashed file set under the existing spec, so
    readers still get shuffle-free probe joins (multiple files per
    bucket merge at scan). The reference has no incremental path — its
    workers rebuild in-memory tables at startup
    (``app/src/worker_tasks.py:84-117``); an immutable append-only
    table is the Spark-native equivalent of not doing that.

    Caller contract: doc_ids of ``new_docs`` are new (the stable-key
    invariant every table relies on), and the index was built UNCAPPED
    (``params.max_bucket_size`` unset) — a bucket cap is a global
    smallest-ids property that per-append capping cannot maintain.

    The two appends are separate commits with no cross-table
    atomicity. Bands are written FIRST: a crash between the writes
    leaves doc_ids present in bands but absent from sigs, which the
    matrix/serving scorers reject loudly ("matrix does not cover the
    candidate ids") instead of probes silently missing documents the
    sigs-first order would cause. Recovery: :func:`validate_index`
    reports the orphaned doc_ids; re-append exactly their signature
    rows (re-running the sigs half of the failed call). For streaming
    / at-least-once callers use :func:`append_to_index_exactly_once`,
    which is replay-idempotent by construction.
    """
    if params.max_bucket_size is not None:
        raise ValueError(
            "append_to_index requires an uncapped index: max_bucket_size "
            "keeps the globally smallest doc_ids per bucket, which an "
            "append cannot re-decide; rebuild capped indexes instead"
        )
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import (
        lsh,
        minhash,
    )

    sigs = minhash.signatures(new_docs, params)
    bands = lsh.bands_table(sigs, params)
    # An append must restate the existing bucket spec verbatim (Spark
    # rejects a mismatch); read the bucket count from the catalog so
    # the caller cannot diverge from the table it is appending to.
    spark = new_docs.sparkSession
    num_buckets = _table_num_buckets(spark, bands_table)
    (
        bands.write.mode("append")
        .format("parquet")
        .bucketBy(num_buckets, "band_id", "band_hash")
        .sortBy("band_id", "band_hash")
        .saveAsTable(bands_table)
    )
    sigs.write.mode("append").parquet(sigs_path)


def _table_num_buckets(spark: SparkSession, table: str) -> int:
    desc = {
        r["col_name"]: r["data_type"]
        for r in spark.sql(f"DESCRIBE EXTENDED {table}").collect()
    }
    return int(desc["Num Buckets"])


def validate_index(
    spark: SparkSession, sigs_path: str, bands_table: str
) -> None:
    """Cross-table consistency check for the persisted index: every
    banded doc_id must have a signature row and vice versa (the
    invariant a crash between :func:`append_to_index`'s two commits
    breaks). Raises with the first few offending ids; cost is one
    doc_id-column scan of each side — run it after a suspected partial
    append, not per query."""
    sig_ids = spark.read.parquet(sigs_path).select("doc_id").distinct()
    band_ids = spark.table(bands_table).select("doc_id").distinct()
    orphan_bands = band_ids.join(sig_ids, "doc_id", "left_anti").limit(5).collect()
    if orphan_bands:
        ids = [r["doc_id"] for r in orphan_bands]
        raise ValueError(
            f"doc_ids {ids} are banded in {bands_table} but have no "
            f"signature in {sigs_path}: a partial append left the index "
            "inconsistent — re-append their signature rows"
        )
    orphan_sigs = sig_ids.join(band_ids, "doc_id", "left_anti").limit(5).collect()
    if orphan_sigs:
        ids = [r["doc_id"] for r in orphan_sigs]
        raise ValueError(
            f"doc_ids {ids} have signatures in {sigs_path} but no bands "
            f"in {bands_table}: probes will silently miss them — "
            "re-append their band rows"
        )


def append_to_index_exactly_once(
    new_docs: DataFrame,
    batch_id: int,
    params,
    sigs_path: str,
    bands_table: str,
) -> None:
    """Replay-idempotent incremental index maintenance for
    at-least-once callers (Structured Streaming ``foreachBatch``
    replays an epoch after failure; a blind append would then
    duplicate every doc in the replayed batch).

    Mechanism: both index halves are PARTITIONED by ``ingest_batch``
    and each micro-batch writes with dynamic partition OVERWRITE into
    its own ``ingest_batch=<batch_id>`` partition — a replayed epoch
    rewrites that partition instead of appending next to its previous
    attempt, whatever point the previous attempt crashed at. The
    signature half is a batch-partitioned parquet directory; the bands
    half is the batch-partitioned BUCKETED table
    (:func:`write_bands_bucketed` with ``batch_partitioned=True``) —
    bucketing is per-partition-consistent, so probe joins stay
    shuffle-free while each partition stays independently
    overwritable. Requires ``batch_id >= 0`` (the base build owns the
    :data:`BASE_INGEST_BATCH` partition).

    Same uncapped-index and new-doc_ids contract as
    :func:`append_to_index`.
    """
    if params.max_bucket_size is not None:
        raise ValueError(
            "append_to_index_exactly_once requires an uncapped index "
            "(see append_to_index)"
        )
    if batch_id < 0:
        raise ValueError(
            f"batch_id must be >= 0 (got {batch_id}); "
            f"{BASE_INGEST_BATCH} is reserved for the base build"
        )
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import (
        lsh,
        minhash,
    )

    spark = new_docs.sparkSession
    # catalog metadata, not spark.table(...): resolving the relation
    # would pin a pre-append file listing in this session's relation
    # cache (see stream_index_maintenance).
    table_cols = [c.name for c in spark.catalog.listColumns(bands_table)]
    if "ingest_batch" not in table_cols:
        raise ValueError(
            f"{bands_table} is not batch-partitioned; build it with "
            "write_bands_bucketed(..., batch_partitioned=True) for "
            "exactly-once appends (plain append_to_index is "
            "at-least-once under replay)"
        )
    # the sigs side must be batch-partitioned too: writing an
    # ingest_batch=N subdirectory next to FLAT part-files makes every
    # later read of the directory fail on a mixed layout — reject the
    # mismatch instead of corrupting the store
    from pyspark.errors import AnalysisException

    try:
        sig_cols = spark.read.parquet(sigs_path).columns
    except AnalysisException as ex:
        # ONLY a missing path means "first write creates it" — an
        # unreadable store (e.g. already-corrupt mixed layout) must
        # surface, not be appended into
        msg = str(ex)
        if "PATH_NOT_FOUND" not in msg and "Path does not exist" not in msg:
            raise
        sig_cols = None
    if sig_cols is not None and "ingest_batch" not in sig_cols:
        raise ValueError(
            f"{sigs_path} is a flat signature store; rebuild it with "
            "write_sigs_batch_partitioned for exactly-once appends — a "
            "partitioned write into a flat directory leaves a mixed "
            "layout that no reader can scan"
        )
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        sigs = minhash.signatures(new_docs, params).withColumn(
            "ingest_batch", F.lit(batch_id)
        )
        bands = lsh.bands_table(
            sigs.select("doc_id", "sig"), params
        ).withColumn("ingest_batch", F.lit(batch_id))
        # bands first: see append_to_index's ordering rationale — under
        # replay either order converges, this one also fails loud if a
        # NON-replayed crash is probed in between. insertInto matches
        # by position, so restate the table's own column order.
        bands.select(*table_cols).write.mode("overwrite").insertInto(bands_table)
        (
            sigs.write.mode("overwrite")
            .partitionBy("ingest_batch")
            .parquet(sigs_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)


def write_sigs_batch_partitioned(sigs: DataFrame, path: str) -> None:
    """Base build of the BATCH-PARTITIONED signature store that
    :func:`append_to_index_exactly_once` maintains: initial rows land
    in the ``ingest_batch=BASE_INGEST_BATCH`` partition so later
    micro-batches each own an overwritable partition directory. (A
    flat parquet dir cannot be upgraded in place: Spark's partition
    discovery rejects mixed flat/partitioned layouts.) Readers select
    (doc_id, sig) as usual — the partition column is bookkeeping."""
    (
        sigs.withColumn("ingest_batch", F.lit(BASE_INGEST_BATCH))
        .write.mode("overwrite")
        .partitionBy("ingest_batch")
        .parquet(path)
    )


def _write_store_meta(path: str, meta: dict) -> None:
    """Sidecar ``_index_meta.json`` inside the store directory (the
    underscore prefix makes parquet readers ignore it, like _SUCCESS).
    Records the quantizer config the data was written under, so appends
    can refuse a mismatched config instead of silently splitting the
    store across two incompatible bucketings."""
    import json

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "_index_meta.json"), "w") as f:
        json.dump(meta, f)


def read_store_meta(path: str) -> dict:
    import json

    with open(os.path.join(path, "_index_meta.json")) as f:
        return json.load(f)


def _check_store_meta(path: str, expect: dict) -> None:
    try:
        meta = read_store_meta(path)
    except FileNotFoundError:
        return  # pre-metadata store; caller keeps the old contract
    mismatch = {k: (meta.get(k), v) for k, v in expect.items() if meta.get(k) != v}
    if mismatch:
        raise ValueError(
            f"store {path} was written with a different quantizer config: "
            f"{mismatch} (got, append) — probes would look in the wrong "
            "partitions; rebuild or pass the store's own config"
        )


def write_embeddings_partitioned(
    embeddings: DataFrame,
    path: str,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> None:
    """ANN store: corpus written PARTITIONED on its hyperplane bucket.

    A probe filters ``bucket IN (<probe set>)``; with the bucket as a
    partition column the filter prunes whole directories at the source
    (PartitionFilters, no row ever read), so each query touches
    ~``n_probe * N / 2^n_planes`` rows of a 100 TB corpus. The bucket
    assignment is the one-time build cost, exactly like the bands
    table."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.ann import (
        hyperplane_bucket,
    )

    (
        embeddings.withColumn(
            "bucket", hyperplane_bucket(F.col(vec_col), dim, n_planes, seed)
        )
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )
    _write_store_meta(
        path,
        {"kind": "ann_hyperplane", "dim": dim, "n_planes": n_planes, "seed": seed},
    )


def write_ivf_partitioned(
    embeddings: DataFrame,
    path: str,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> None:
    """IVF store: corpus written PARTITIONED on its coarse-quantizer
    cell (:func:`operators.ann.ivf_assign`). Probes filter
    ``cell IN (<probe set>)`` against the partition column — directory
    pruning at the source, and the expensive assignment expression runs
    once at build, never per query. Pass :func:`operators.ann.ivf_train`
    output for a trained quantizer, or an
    :class:`operators.ann.HKMQuantizer` for corpus-scaled cell counts
    (tree-descent assignment; the tree itself lands in the sidecar so
    probes and appends self-configure)."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.ann import (
        HKMQuantizer,
        hkm_assign,
        ivf_assign,
    )

    if isinstance(centroids, HKMQuantizer):
        assigned = hkm_assign(embeddings, centroids, vec_col=vec_col)
        meta = {"kind": "ivf_hkm", "tree": centroids.to_dict()}
    else:
        assigned = ivf_assign(embeddings, centroids, vec_col=vec_col)
        meta = {
            "kind": "ivf",
            "centroids": [list(map(float, c)) for c in centroids],
        }
    assigned.write.mode("overwrite").partitionBy("cell").parquet(path)
    _write_store_meta(path, meta)


def append_ivf_partitioned(
    embeddings: DataFrame,
    path: str,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> None:
    """Incremental IVF-store maintenance: assign ONLY the new vectors
    against the store's quantizer (the caller must pass the same
    centroids — flat list or :class:`operators.ann.HKMQuantizer` —
    the store was built with; a mismatch raises via the sidecar check)
    and append under their cell directories."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.ann import (
        HKMQuantizer,
        hkm_assign,
        ivf_assign,
    )

    if isinstance(centroids, HKMQuantizer):
        _check_store_meta(
            path, {"kind": "ivf_hkm", "tree": centroids.to_dict()}
        )
        assigned = hkm_assign(embeddings, centroids, vec_col=vec_col)
    else:
        _check_store_meta(
            path,
            {"kind": "ivf", "centroids": [list(map(float, c)) for c in centroids]},
        )
        assigned = ivf_assign(embeddings, centroids, vec_col=vec_col)
    assigned.write.mode("append").partitionBy("cell").parquet(path)


def append_embeddings_partitioned(
    embeddings: DataFrame,
    path: str,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> None:
    """Incremental ANN-store maintenance: bucket ONLY the new vectors
    (same hyperplane family — the caller must pass the store's
    n_planes/seed, or probes will look in the wrong partitions) and
    append them under their partition directories. Source-level bucket
    pruning is unaffected: pruning is by directory, and appends only
    add files inside directories."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.ann import (
        hyperplane_bucket,
    )

    _check_store_meta(
        path,
        {"kind": "ann_hyperplane", "dim": dim, "n_planes": n_planes, "seed": seed},
    )
    (
        embeddings.withColumn(
            "bucket", hyperplane_bucket(F.col(vec_col), dim, n_planes, seed)
        )
        .write.mode("append")
        .partitionBy("bucket")
        .parquet(path)
    )


def write_bands_sharded(
    bands: DataFrame, table: str, n_shards: int, num_buckets: int = 64
) -> None:
    """Serving-replica layout: the bands index partitioned by a STABLE
    doc shard (``pmod(doc_id, n_shards)``) and bucketed on the probe
    key within each shard. A serving replica exports ONLY its shard's
    directories — partition pruning at export time, the Spark-native
    form of the reference's round-robin shard claim
    (``app/src/worker_tasks.py:47-56``) — while whole-table batch
    probes keep the shuffle-free bucketed join."""
    (
        bands.withColumn(
            "shard", F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("int")
        )
        .write.mode("overwrite")
        .partitionBy("shard")
        .bucketBy(num_buckets, "band_id", "band_hash")
        .sortBy("band_id", "band_hash")
        .format("parquet")
        .saveAsTable(table)
    )


def write_sigs_sharded(sigs: DataFrame, path: str, n_shards: int) -> None:
    """Signature table partitioned by the same stable doc shard, so a
    replica's signature export prunes to its shard's directories."""
    (
        sigs.withColumn(
            "shard", F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("int")
        )
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def write_qed_partitioned(
    embeddings: DataFrame,
    path: str,
    edges_rows: list,
    n_part_bins: int = 32,
    dim: int = 0,
    vec_col: str = "embedding",
) -> None:
    """QED store: corpus written PARTITIONED by a coarse bin of one
    leading dimension (``dim``), so P6's query-dependent window on
    that dimension prunes whole directories at the source — the same
    source-pruning story as the ANN/IVF stores, driven by the QED
    histogram instead of a quantizer. The partition granularity
    (``n_part_bins`` directories) is independent of the scoring
    resolution: probes translate their full-resolution window into a
    coarse-bin range, then apply the full all-dims predicate post-scan.
    ``edges_rows`` are :func:`operators.qed.histogram_edges` rows."""
    by_dim = {e["dim"]: e for e in edges_rows}
    e = by_dim[dim]
    lo = float(e["lo"])
    span = float(e["hi"]) - lo
    width = (span / n_part_bins) if span > 0 else 1.0
    elem = F.col(vec_col)[dim].cast("double")
    b = F.least(
        F.greatest(
            F.floor((elem - F.lit(lo)) / F.lit(width)).cast("int"), F.lit(0)
        ),
        F.lit(n_part_bins - 1),
    )
    (
        embeddings.withColumn("qed_bin", b)
        .write.mode("overwrite")
        .partitionBy("qed_bin")
        .parquet(path)
    )
    _write_store_meta(
        path,
        {
            "kind": "qed",
            "dim": dim,
            "n_part_bins": n_part_bins,
            "lo": lo,
            "width": width,
        },
    )


def synthetic_documents(
    spark: SparkSession,
    n_docs: int,
    vocab_size: int = 20,
    avg_words: int = 40,
    sigma_words: int = 10,
    seed: int = 42,
) -> DataFrame:
    """S11: seeded synthetic corpus (reference
    ``benchmarks/synth_data.py:86-120``): ``max(1, round(N(avg, σ)))``
    words drawn uniformly from vocab ``w0..w{V-1}``; ids ``doc_%06d``.

    Fully distributed: ``spark.range`` + seeded rand/randn — no driver
    loop, deterministic per (seed, n_docs) at any scale.
    """
    n_words = F.greatest(
        F.lit(1),
        F.round(F.randn(seed) * sigma_words + avg_words).cast("int"),
    )
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        # per-position uniform vocab pick; rand(seed+1) is row-and-
        # position deterministic via the id-dependent re-hash below
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(
                F.xxhash64(F.col("id"), i, F.lit(seed)), F.lit(vocab_size)
            ).cast("string"),
        ),
    )
    return (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.format_string("doc_%06d", F.col("id")).alias("doc_name"),
            F.array_join(words, " ").alias("text"),
        )
    )


# ---------------------------------------------------------------------------
# Shared store-swap core: ONE implementation of the crash-safe
# rename-aside / rename-in / drop-old protocol (and its recovery) for every
# persisted index family — LSH (bands table + signature directory), IVF-PQ,
# IVF-OPQ, lexical postings, flat PQ/OPQ codes, and the CMS/HLL sketch
# stores. The protocol is parameterized by its four primitives (exists /
# rename / drop / sync), instantiated once for directory stores
# (os.rename + shutil.rmtree; sync is a no-op) and once for the bucketed
# catalog table (ALTER TABLE RENAME + partition-metadata sync), so the
# crash-window semantics every maintenance test pins cannot diverge
# between families. Prepare (build the complete sibling copy) and commit
# (swap it in) are separate phases so a multi-store transaction can
# prepare every store before swapping any (retention.delete_docs_everywhere).
# ---------------------------------------------------------------------------


def _swap_names(path: str, suffix: str = "__compact") -> tuple[str, str]:
    """(tmp, old) sibling names for a store's swap window."""
    return path.rstrip("/") + suffix + "_tmp", path.rstrip("/") + suffix + "_old"


def _swap_in_protocol(live, tmp, old, rename, drop, sync=lambda name: None):
    """rename-aside / rename-in / drop-old: a complete copy exists under
    SOME name at every instant; an in-process failure restores the live
    name before re-raising; a process death inside the window is healed
    by :func:`_swap_recover_protocol`. ``sync`` re-points catalog
    partition metadata after each rename (tables only — a renamed
    partitioned managed table keeps per-partition locations at the old
    absolute paths, which the final drop would otherwise delete out
    from under the new copy)."""
    rename(live, old)
    sync(old)
    try:
        rename(tmp, live)
    except Exception:
        rename(old, live)
        sync(live)
        raise
    sync(live)
    drop(old)


def _swap_recover_protocol(
    live,
    tmp,
    old,
    *,
    exists,
    rename,
    drop,
    sync=lambda name: None,
    tmp_complete=lambda: True,
    healthy_drops=("tmp", "old"),
    label: str = "store",
    detail: str = "restore from backup",
) -> bool:
    """Startup recovery for a death anywhere inside
    :func:`_swap_in_protocol`: if the live name survives, clear the
    configured leftovers; otherwise re-install whichever complete copy
    survives (the rewritten tmp if ``tmp_complete()``, else the
    set-aside original). Every sync runs BEFORE the rename/drop that
    needs it so a leftover's stale partition locations can never alias
    (and then delete) the live copy's directories. Returns True if any
    action was taken; raises only if no copy survives."""
    by_name = {"tmp": tmp, "old": old}
    if exists(live):
        acted = False
        for name in healthy_drops:
            left = by_name[name]
            if exists(left):
                sync(left)
                drop(left)
                acted = True
        if acted:
            sync(live)
        return acted
    if exists(tmp) and tmp_complete():
        if exists(old):
            sync(old)
        rename(tmp, live)
        sync(live)
        if exists(old):
            drop(old)
        return True
    if exists(old):
        if exists(tmp):
            # incomplete rewrite: the set-aside original is the truth
            sync(tmp)
        rename(old, live)
        sync(live)
        if exists(tmp):
            drop(tmp)
        return True
    raise ValueError(
        f"no surviving copy of {label} {live} (neither the live copy, a "
        f"complete tmp, nor the set-aside old exists) — {detail}"
    )


def _prepare_dir_swap(path: str, suffix: str = "__compact") -> str:
    """Phase 1 for a directory store: clear stale leftovers and return
    the sibling tmp path the caller writes the COMPLETE replacement
    store into (data + sidecars + watermark). Phase 2 is
    :func:`_commit_dir_swap`."""
    import shutil

    tmp, old = _swap_names(path, suffix)
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    return tmp


def _commit_dir_swap(path: str, suffix: str = "__compact") -> None:
    """Phase 2 for a directory store: swap the prepared tmp in via the
    shared protocol (plain renames — atomic on one filesystem; on HDFS
    they map to ``FileSystem.rename``; object stores without atomic
    rename should hold the store under a table format instead)."""
    import shutil

    tmp, old = _swap_names(path, suffix)
    _swap_in_protocol(path, tmp, old, os.rename, shutil.rmtree)


def _recover_dir_swap(
    path: str,
    markers: tuple[str, ...] = ("_SUCCESS",),
    suffix: str = "__compact",
    label: str = "store",
) -> bool:
    """Directory-store recovery: ``markers`` are the files whose joint
    presence inside tmp means its rewrite completed (data ``_SUCCESS``
    plus whichever sidecars the family writes after it)."""
    import shutil

    tmp, old = _swap_names(path, suffix)
    return _swap_recover_protocol(
        path,
        tmp,
        old,
        exists=os.path.exists,
        rename=os.rename,
        drop=shutil.rmtree,
        tmp_complete=lambda: all(
            os.path.exists(os.path.join(tmp, m)) for m in markers
        ),
        label=label,
    )


def _carry_swap_sidecars(
    src: str, tmp: str, new_watermark: int | None = None, copy_meta: bool = True
) -> None:
    """Carry a store's non-parquet artifacts into the rewritten tmp:
    the absorbed-epoch watermark, rolled forward to cover any epochs
    this rewrite folds into the base, then the quantizer/meta sidecar
    (copied verbatim — a rewrite never changes the codec). Sidecars
    land AFTER the data write, and the meta copy lands LAST in this
    ordering: its presence next to ``_SUCCESS`` is what the recover
    markers treat as "tmp is complete", so a crash before the
    watermark write can never leave a complete-looking tmp whose
    replay protection was lost."""
    import shutil

    wm = read_absorbed_watermark(src)
    if new_watermark is not None:
        wm = new_watermark if wm is None else max(wm, new_watermark)
    if wm is not None:
        write_absorbed_watermark(tmp, wm)
    if copy_meta:
        shutil.copy2(
            os.path.join(src, "_index_meta.json"),
            os.path.join(tmp, "_index_meta.json"),
        )


def store_fingerprint(path: str) -> list:
    """Identity token of a directory store's CURRENT copy, for serving
    staleness checks: every swap (compaction, delete, retention)
    replaces the live directory with a freshly-written sibling, so the
    inode changes even though the path does not. An in-process serving
    index records this at export and compares on demand —
    ``ServingIndex.is_stale`` — instead of re-reading any data. Local
    filesystems only (the test/benchmark deployment); on HDFS/object
    stores a store-version sidecar written inside the swap would play
    this role."""
    st = os.stat(path)
    return [int(st.st_ino), int(st.st_mtime_ns)]


def _table_location(spark: SparkSession, table: str) -> str:
    """Filesystem directory backing a catalog table (file: prefix
    stripped)."""
    rows = spark.sql(f"DESCRIBE FORMATTED {table}").collect()
    for r in rows:
        if (r["col_name"] or "").strip() == "Location":
            loc = r["data_type"].strip()
            return loc[len("file:"):] if loc.startswith("file:") else loc
    raise ValueError(f"no Location in DESCRIBE FORMATTED {table}")


def table_fingerprint(spark: SparkSession, table: str) -> list:
    """:func:`store_fingerprint` for the catalog-table medium: the swap
    renames the prepared tmp TABLE in, which moves a freshly-written
    directory under the live table's location — new inode, same path."""
    return store_fingerprint(_table_location(spark, table))


def _fold_watermark(path: str) -> int | None:
    """The watermark a compaction must carry: the max real epoch
    partition it is about to fold into the base (None if the store has
    no epoch partitions)."""
    epochs = _store_epoch_partitions(path)
    return max(epochs) if epochs else None


def compact_index(
    spark: SparkSession,
    bands_table: str,
    validate_sigs_path: str | None = None,
) -> None:
    """Compact an append-maintained bucketed index: many small appends
    leave one file set per append inside every bucket; scans then pay
    per-file open cost and lose intra-bucket sort locality. Rewrite the
    table once under its own bucket spec (one shuffle — the same cost
    as the original build, amortized over many appends).

    ``validate_sigs_path``: optionally assert the signature table's
    doc_ids are unique first (the stable-key invariant appends rely
    on) — a duplicate means some append violated the new-ids contract
    and compaction would bake it in.

    Crash safety: the swap is rename-aside / rename-in / drop-old, so
    a servable copy of the index exists under SOME table name at every
    instant, and an in-process failure restores the original name
    before re-raising. If the PROCESS dies mid-swap, run
    :func:`recover_compact_swap` at startup — it re-registers whichever
    surviving copy is newest under the original name. The swap is
    still not atomic for CONCURRENT readers (a reader resolving the
    table name inside the two-rename window fails and must retry);
    run compaction in a maintenance window, like any offline rewrite.

    Batch-partitioned tables (``write_bands_bucketed`` with
    ``batch_partitioned=True``) compact their whole history into the
    ``BASE_INGEST_BATCH`` partition. Run this only while the
    maintenance stream is STOPPED at a committed checkpoint: a
    replayed epoch after compaction would overwrite-as-new a batch
    partition whose rows were already folded into the base.
    """
    if validate_sigs_path is not None:
        dup = (
            spark.read.parquet(validate_sigs_path)
            .groupBy("doc_id")
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"duplicate doc_id {dup[0]['doc_id']} in {validate_sigs_path}; "
                "an append violated the new-ids contract — dedup before compacting"
            )
    def fold_history(current: DataFrame, part_cols: list[str]) -> DataFrame:
        # batch-partitioned history folds into the base epoch; every
        # OTHER partition column (e.g. the serving shard) keeps its
        # values — the compacted table must preserve the layout
        # probes/exports rely on
        if "ingest_batch" in part_cols:
            current = current.withColumn("ingest_batch", F.lit(BASE_INGEST_BATCH))
        return current

    _rewrite_bands_swapped(spark, bands_table, fold_history)


def _table_swap_primitives(spark: SparkSession):
    """The shared swap protocol's primitives for the catalog-table
    medium: ALTER TABLE RENAME (the rename), DROP TABLE (the drop),
    and :func:`_sync_partitions` (the sync — CRITICAL for partitioned
    tables, whose rename moves the directory but leaves per-partition
    catalog locations at the old absolute paths; left stale, the final
    DROP would delete the new table's partition directories out from
    under it)."""
    return dict(
        exists=lambda t: spark.catalog.tableExists(t),
        rename=lambda src, dst: spark.sql(f"ALTER TABLE {src} RENAME TO {dst}"),
        drop=lambda t: spark.sql(f"DROP TABLE {t}"),
        sync=lambda t: _sync_partitions(spark, t),
    )


def _prepare_table_rewrite(
    spark: SparkSession,
    table: str,
    transform,
    bucket_cols: tuple[str, ...],
    suffix: str = "__compact",
) -> str:
    """Phase 1 of a bucketed-table rewrite: ``transform(current_df,
    part_cols)`` produces the replacement rows, written under the SAME
    bucket/partition spec to the sibling tmp table (stale leftovers
    cleared first). Returns the tmp table name; phase 2 is
    :func:`_commit_bands_swap`. Shared by the bands table
    (``band_id, band_hash``) and the content-hash history table
    (``content_hash``). ``suffix`` names the swap window — the
    lifecycle default ``__compact`` for compaction/delete, or a
    caller-owned suffix (retention uses ``__retention``) whose
    leftovers the per-store lifecycle recovers must never touch."""
    num_buckets = _table_num_buckets(spark, table)
    part_cols = _table_partition_columns(spark, table)
    tmp = f"{table}{suffix}_tmp"
    old = f"{table}{suffix}_old"
    spark.sql(f"DROP TABLE IF EXISTS {tmp}")
    spark.sql(f"DROP TABLE IF EXISTS {old}")
    current = transform(spark.table(table), part_cols)
    writer = current.write.mode("overwrite")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    (
        writer.bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(tmp)
    )
    return tmp


def _prepare_bands_rewrite(
    spark: SparkSession, bands_table: str, transform, suffix: str = "__compact"
) -> str:
    """:func:`_prepare_table_rewrite` under the bands table's probe-join
    bucket spec."""
    return _prepare_table_rewrite(
        spark, bands_table, transform, ("band_id", "band_hash"), suffix=suffix
    )


def _commit_bands_swap(
    spark: SparkSession, bands_table: str, suffix: str = "__compact"
) -> None:
    """Phase 2: swap the prepared tmp table in via the shared protocol
    under the catalog primitives."""
    ops = _table_swap_primitives(spark)
    _swap_in_protocol(
        bands_table,
        f"{bands_table}{suffix}_tmp",
        f"{bands_table}{suffix}_old",
        ops["rename"],
        ops["drop"],
        ops["sync"],
    )


def _rewrite_bands_swapped(spark: SparkSession, bands_table: str, transform) -> None:
    """Crash-safe full rewrite of the bucketed bands table: prepare the
    replacement under the sibling tmp name, then swap it in — a
    servable copy exists under some name at every instant, an
    in-process failure restores the original name, and a process death
    is healed by :func:`recover_compact_swap`. Shared by
    :func:`compact_index` and :func:`delete_from_index`."""
    _prepare_bands_rewrite(spark, bands_table, transform)
    _commit_bands_swap(spark, bands_table)


def _table_partition_columns(spark: SparkSession, table: str) -> list[str]:
    return [c.name for c in spark.catalog.listColumns(table) if c.isPartition]


def _sync_partitions(spark: SparkSession, table: str) -> None:
    """Re-point catalog partition metadata at the table's CURRENT
    location: renaming a partitioned managed table moves its directory
    but leaves per-partition locations at the old absolute paths, so a
    scan would silently read zero rows from every partition — and
    DROPPING the renamed-aside copy would delete data at those stale
    locations. Applies to ANY partition layout (ingest_batch, shard,
    qed_bin, ...)."""
    if _table_partition_columns(spark, table):
        spark.sql(f"MSCK REPAIR TABLE {table} SYNC PARTITIONS")
    spark.catalog.refreshTable(table)


def recover_compact_swap(
    spark: SparkSession, bands_table: str, suffix: str = "__compact"
) -> bool:
    """Startup recovery after a process death inside
    :func:`compact_index`'s swap: if ``bands_table`` is missing,
    re-register the surviving copy — the compacted ``__compact_tmp``
    if its write completed, else the set-aside ``__compact_old`` —
    under the original name, with partition metadata re-synced so a
    leftover's stale per-partition locations can never alias (and
    later DROP) the live table's directories. Also completes an
    interrupted final step: if the table is healthy but a superseded
    ``__compact_old`` lingers, it is safely sync'd and dropped.
    Returns True if any recovery action was performed, False if the
    table was already healthy with no leftovers. Raises only if no
    copy survives (which compact_index's ordering cannot produce).
    The signature-store twin is :func:`recover_sigs_swap` — run BOTH
    at startup when operating a full index (bands table + sig path).
    """
    # Catalog registration IS tmp-completeness for tables: an
    # interrupted saveAsTable never registers, so an existing tmp table
    # is always a complete copy. Healthy-case leftovers clear only the
    # set-aside old (a lingering tmp is dropped by the next rewrite's
    # DROP IF EXISTS); every sync runs before the rename/drop that
    # needs it — a death between the rename-aside and its sync leaves
    # __compact_old's per-partition locations pointing at the original
    # table path, exactly where the survivor is about to be renamed,
    # and a drop through those stale locations would silently delete
    # live partitions.
    ops = _table_swap_primitives(spark)
    return _swap_recover_protocol(
        bands_table,
        f"{bands_table}{suffix}_tmp",
        f"{bands_table}{suffix}_old",
        healthy_drops=("old",),
        label="bands table",
        detail=(
            "this state is unreachable from compact_index; restore from "
            "your table backup"
        ),
        **ops,
    )


def delete_from_index(
    spark: SparkSession,
    delete_ids,
    sigs_path: str,
    bands_table: str,
) -> None:
    """Targeted deletion from the persisted LSH index — the retention /
    right-to-be-forgotten operator the create/append/compact lifecycle
    was missing. Rewrites BOTH index halves without the given doc_ids,
    preserving the bucketed probe layout and any partition columns.

    ``delete_ids``: a single-column DataFrame of doc_ids, or a Python
    list of ids (folded to a broadcast anti-join either way — delete
    sets are small relative to the corpus; a corpus-scale delete is a
    rebuild, use ``write_bands_bucketed`` on the survivors).

    Ordering + crash safety: the BANDS half rewrites first through the
    same rename-aside swap as :func:`compact_index` (recoverable via
    :func:`recover_compact_swap`); a crash after it leaves deleted ids
    sig'd but unprobeable — the deletion is already effective, and
    re-running the delete converges. The SIGNATURE half then rewrites
    to ``<sigs_path>__delete_tmp`` and swaps by directory rename
    (:func:`recover_sigs_swap` heals a death inside that window).
    Parquet files are immutable, so a delete is inherently O(table
    rewrite); batch deletes and fold them into maintenance windows,
    exactly like compaction. On HDFS the renames map to
    ``FileSystem.rename``; object stores without atomic rename should
    keep the index under a table format instead.
    """
    if not isinstance(delete_ids, DataFrame):
        delete_ids = spark.createDataFrame(
            [(int(i),) for i in delete_ids], "doc_id bigint"
        )
    ids = F.broadcast(delete_ids.select("doc_id").distinct())

    _rewrite_bands_swapped(
        spark, bands_table, lambda cur, _parts: cur.join(ids, "doc_id", "left_anti")
    )

    _prepare_sigs_delete(spark, ids, sigs_path)
    _commit_dir_swap(sigs_path, suffix="__delete")


def _prepare_sigs_delete(
    spark: SparkSession, ids, sigs_path: str, suffix: str = "__delete"
) -> str:
    """Phase 1 of the signature-directory delete: write the filtered
    copy to the sibling ``{suffix}_tmp`` (partition layout preserved —
    including the ``ingest_batch`` level of a stream-maintained store
    and the ``shard`` level of a serving export) and return it; phase 2
    is ``_commit_dir_swap(sigs_path, suffix=suffix)``."""
    sigs = spark.read.parquet(sigs_path)
    part_cols = [c for c in ("ingest_batch", "shard") if c in sigs.columns]
    kept = sigs.join(ids, "doc_id", "left_anti")
    tmp = _prepare_dir_swap(sigs_path, suffix=suffix)
    writer = kept.write.mode("overwrite")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(tmp)
    return tmp


def recover_sigs_swap(sigs_path: str) -> bool:
    """Startup recovery after a process death inside
    :func:`delete_from_index`'s signature-directory swap: if the live
    path is missing, rename the surviving copy back — the filtered
    ``__delete_tmp`` if its write completed (``_SUCCESS`` present),
    else the set-aside ``__delete_old``. Returns True if any recovery
    action happened (including clearing leftovers next to a healthy
    store), False otherwise."""
    return _recover_dir_swap(
        sigs_path, suffix="__delete", label="signature store"
    )


def write_content_hashes_bucketed(
    hashed: DataFrame, table: str, num_buckets: int = 64
) -> None:
    """Persist the exact-dedup history artifact — (doc_id,
    content_hash) — as a table BUCKETED on content_hash. The
    incremental-ingest anti join (``dedup.incremental_exact_dedup``)
    against ``spark.table(table)`` then leaves the history side
    exchange-free: only the (small) ingest batch shuffles into the
    bucket layout. Same immutable-artifact pattern as the bucketed
    bands index."""
    (
        hashed.write.mode("overwrite")
        .bucketBy(num_buckets, "content_hash")
        .sortBy("content_hash")
        .format("parquet")
        .saveAsTable(table)
    )


def write_pq_index(
    embeddings: DataFrame,
    path: str,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """PQ store: the encoded codes table plus the quantizer in the
    ``_index_meta.json`` sidecar — the 64x-compressed artifact ADC
    search scans. Encoding (the expensive per-subspace argmin) runs
    once at build, never per query; probes self-configure from the
    sidecar so a mismatched-quantizer scoring bug cannot happen (the
    failure :func:`operators.ann.pq_topk` guards against for in-memory
    codes)."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.ann import (
        pq_encode,
    )

    pq_encode(embeddings, codebooks, id_col, vec_col).write.mode(
        "overwrite"
    ).parquet(path)
    _write_store_meta(path, _pq_meta(codebooks))


def read_pq_index(spark, path: str):
    """(codes DataFrame, codebooks) from a :func:`write_pq_index`
    store; raises on a non-PQ store rather than scoring garbage."""
    meta = read_store_meta(path)
    if meta.get("kind") != "pq":
        raise ValueError(f"{path} is not a PQ store (kind={meta.get('kind')!r})")
    return spark.read.parquet(path), meta["codebooks"]


def append_pq_index(
    embeddings: DataFrame,
    path: str,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental PQ-store maintenance: encode ONLY the new vectors
    with the store's quantizer and append. Rejects a mismatched
    quantizer (codes from different books are incomparable under one
    ADC table) — same contract as :func:`append_ivf_partitioned`."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.ann import (
        pq_encode,
    )

    _reject_stream_codes_store(path)
    _check_store_meta(path, _pq_meta(codebooks))
    pq_encode(embeddings, codebooks, id_col, vec_col).write.mode("append").parquet(
        path
    )


def _reject_stream_codes_store(
    path: str, ingest_hint: str = "stream_codes_ingest"
) -> None:
    """Plain appends refuse a stream-maintained (batch-partitioned)
    store: new vectors must land through the store's epoch loop
    (:func:`..streaming.codes.stream_codes_ingest` for flat codes,
    the :func:`..streaming.semantic.stream_semantic_ingest` codes
    feed for the cell stores — ``ingest_hint`` names the right one in
    the raised message) whose per-epoch partitions stay
    replay-idempotent — a plain append would not, and would also
    write rows without the ``ingest_batch`` partition column, leaving
    the directory tree at two conflicting depths (unreadable). Same
    contract as :func:`append_postings_index`.

    A store is stream-maintained if its sidecar says so OR if its
    directory tree carries ``ingest_batch=`` partitions — bases
    written before the sidecar grew the ``batch_partitioned`` flag
    lack it, and the layout itself is the ground truth the append
    would corrupt. The layout check runs even when the sidecar is
    MISSING entirely (a store whose meta predates sidecars, or lost
    it): the meta comparison downstream would skip too, so this guard
    is the only thing standing between the append and a two-depth
    directory tree."""
    if not os.path.isdir(path):
        return
    try:
        meta = read_store_meta(path)
    except FileNotFoundError:
        meta = {}
    batch_partitioned = meta.get("batch_partitioned") or any(
        name.startswith("ingest_batch=") for name in os.listdir(path)
    )
    if batch_partitioned:
        raise ValueError(
            f"{path} is a stream-maintained (batch-partitioned) store — "
            f"land new vectors through {ingest_hint}, whose "
            "per-epoch partitions stay replay-idempotent; a plain "
            "append would not"
        )

def _pq_meta(codebooks: list[list[list[float]]]) -> dict:
    """Flat-PQ sidecar dict — ONE builder for the base write, the
    append guard's expectation, and the stream base, so the
    field-by-field _check_store_meta comparison can never drift
    between copies of the literal."""
    return {
        "kind": "pq",
        "codebooks": [
            [[float(x) for x in code] for code in book] for book in codebooks
        ],
    }


def _opq_meta(
    r_cols: list[list[float]], codebooks: list[list[list[float]]]
) -> dict:
    return {
        "kind": "opq",
        "rotation_cols": [[float(x) for x in col] for col in r_cols],
        "codebooks": [
            [[float(x) for x in code] for code in book] for book in codebooks
        ],
    }


def write_opq_index(
    embeddings: DataFrame,
    path: str,
    r_cols: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """OPQ store: rotated-space codes plus BOTH halves of the quantizer
    (rotation columns + codebooks) in the sidecar — a code is only
    meaningful under the rotation that produced it, so they ship as one
    artifact. Same shape and guarantees as :func:`write_pq_index`."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.opq import (
        opq_encode,
    )

    opq_encode(embeddings, r_cols, codebooks, id_col, vec_col).write.mode(
        "overwrite"
    ).parquet(path)
    _write_store_meta(path, _opq_meta(r_cols, codebooks))


def read_opq_index(spark, path: str):
    """(codes DataFrame, rotation_cols, codebooks) from a
    :func:`write_opq_index` store; raises on a non-OPQ store."""
    meta = read_store_meta(path)
    if meta.get("kind") != "opq":
        raise ValueError(f"{path} is not an OPQ store (kind={meta.get('kind')!r})")
    return spark.read.parquet(path), meta["rotation_cols"], meta["codebooks"]


def append_opq_index(
    embeddings: DataFrame,
    path: str,
    r_cols: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental OPQ-store maintenance: rotate + encode ONLY the new
    vectors with the store's artifact and append. Rejects a mismatched
    rotation OR codebooks — codes from either are incomparable under
    one ADC table (same contract as :func:`append_pq_index`)."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.opq import (
        opq_encode,
    )

    _reject_stream_codes_store(path)
    _check_store_meta(path, _opq_meta(r_cols, codebooks))
    opq_encode(embeddings, r_cols, codebooks, id_col, vec_col).write.mode(
        "append"
    ).parquet(path)


def _ivfpq_meta(
    centroids, codebooks: list[list[list[float]]]
) -> dict:
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.ann import (
        HKMQuantizer,
    )

    books = [
        [[float(x) for x in code] for code in book] for book in codebooks
    ]
    if isinstance(centroids, HKMQuantizer):
        return {"kind": "ivfpq_hkm", "tree": centroids.to_dict(), "codebooks": books}
    return {
        "kind": "ivfpq",
        "centroids": [[float(x) for x in c] for c in centroids],
        "codebooks": books,
    }


def write_ivfpq_index(
    embeddings: DataFrame,
    path: str,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """IVF-PQ store (FAISS ``IndexIVFPQ`` layout): residual PQ codes
    written PARTITIONED on the coarse cell, both quantizers in the
    sidecar. This is the billion-scale serving artifact — 4 B + m bytes
    per vector, and a probe's ``cell IN (<probe set>)`` filter becomes
    directory pruning so a query touches ~n_probe/n_cells of the store.
    Encoding (assignment + residual argmin) runs once at build. Pass an
    :class:`operators.ann.HKMQuantizer` as ``centroids`` for
    corpus-scaled cell counts (tree descent assignment; the tree lands
    in the sidecar so probes and appends self-configure)."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.ann import (
        ivfpq_encode,
    )

    ivfpq_encode(embeddings, centroids, codebooks, id_col, vec_col).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(path)
    _write_store_meta(path, _ivfpq_meta(centroids, codebooks))


def read_ivfpq_index(spark, path: str):
    """(codes DataFrame, centroids, codebooks) from a
    :func:`write_ivfpq_index` store; raises on any other store kind
    rather than scoring garbage."""
    meta = read_store_meta(path)
    if meta.get("kind") == "ivfpq_hkm":
        from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.ann import (
            HKMQuantizer,
        )

        return (
            spark.read.parquet(path),
            HKMQuantizer.from_dict(meta["tree"]),
            meta["codebooks"],
        )
    if meta.get("kind") != "ivfpq":
        raise ValueError(
            f"{path} is not an IVF-PQ store (kind={meta.get('kind')!r})"
        )
    return spark.read.parquet(path), meta["centroids"], meta["codebooks"]


def append_ivfpq_index(
    embeddings: DataFrame,
    path: str,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental IVF-PQ maintenance: encode ONLY the new vectors with
    the store's quantizers and append under their cell directories.
    Rejects mismatched quantizers (residual codes from different
    centroids/books are incomparable under one LUT)."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.ann import (
        ivfpq_encode,
    )

    _reject_stream_codes_store(path, "the stream_semantic_ingest codes feed")
    _check_store_meta(path, _ivfpq_meta(centroids, codebooks))
    ivfpq_encode(embeddings, centroids, codebooks, id_col, vec_col).write.mode(
        "append"
    ).partitionBy("cell").parquet(path)


def _ivfopq_meta(
    r_cols: list[list[float]], centroids, codebooks: list[list[list[float]]]
) -> dict:
    base = _ivfpq_meta(centroids, codebooks)
    out = {
        "kind": "ivfopq_hkm" if base["kind"] == "ivfpq_hkm" else "ivfopq",
        "rotation_cols": [[float(x) for x in col] for col in r_cols],
    }
    out.update({k: v for k, v in base.items() if k != "kind"})
    return out


def write_ivfopq_index(
    embeddings: DataFrame,
    path: str,
    r_cols: list[list[float]],
    centroids,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """IVF-OPQ store — the persisted artifact of the full FAISS
    ``OPQ,IVF,PQ`` factory string (the codec you'd actually ship at
    100 TB): rotated-space residual codes written PARTITIONED on the
    coarse cell, with ALL THREE quantizer halves (rotation columns +
    coarse centroids/tree + codebooks) pinned in the sidecar — a code
    is only meaningful under the rotation AND cell set that produced
    it, so they ship as one artifact. Same layout, probe-time
    directory pruning, and self-configuration guarantees as
    :func:`write_ivfpq_index`; reference analog is the prebuilt-index
    regime (``app/src/index_builder.py:22-36``)."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.opq import (
        ivfopq_encode,
    )

    ivfopq_encode(
        embeddings, r_cols, centroids, codebooks, id_col, vec_col
    ).write.mode("overwrite").partitionBy("cell").parquet(path)
    _write_store_meta(path, _ivfopq_meta(r_cols, centroids, codebooks))


def read_ivfopq_index(spark, path: str):
    """(codes DataFrame, rotation_cols, centroids-or-tree, codebooks)
    from a :func:`write_ivfopq_index` store; raises on any other store
    kind rather than scoring garbage."""
    meta = read_store_meta(path)
    if meta.get("kind") == "ivfopq_hkm":
        from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.ann import (
            HKMQuantizer,
        )

        return (
            spark.read.parquet(path),
            meta["rotation_cols"],
            HKMQuantizer.from_dict(meta["tree"]),
            meta["codebooks"],
        )
    if meta.get("kind") != "ivfopq":
        raise ValueError(
            f"{path} is not an IVF-OPQ store (kind={meta.get('kind')!r})"
        )
    return (
        spark.read.parquet(path),
        meta["rotation_cols"],
        meta["centroids"],
        meta["codebooks"],
    )


def append_ivfopq_index(
    embeddings: DataFrame,
    path: str,
    r_cols: list[list[float]],
    centroids,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental IVF-OPQ maintenance: rotate + encode ONLY the new
    vectors with the store's artifact and append under their cell
    directories. Rejects a mismatched rotation, coarse quantizer, OR
    codebooks — rotated-residual codes from any other triple are
    incomparable under one LUT."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.opq import (
        ivfopq_encode,
    )

    _reject_stream_codes_store(path, "the stream_semantic_ingest codes feed")
    _check_store_meta(path, _ivfopq_meta(r_cols, centroids, codebooks))
    ivfopq_encode(
        embeddings, r_cols, centroids, codebooks, id_col, vec_col
    ).write.mode("append").partitionBy("cell").parquet(path)


# ---------------------------------------------------------------------------
# IVF-PQ store lifecycle: delete + compaction, crash-safe (the cell-store
# twin of compact_index / delete_from_index / recover_sigs_swap)
# ---------------------------------------------------------------------------

ABSORBED_WATERMARK_FILE = "_absorbed_watermark.json"


def read_absorbed_watermark(path: str) -> int | None:
    """Max stream epoch ever folded into a store's base partition by a
    compaction, or None if never compacted. Underscore-prefixed file:
    parquet scans ignore it, so it rides inside the store directory."""
    import json

    f = os.path.join(path, ABSORBED_WATERMARK_FILE)
    if not os.path.exists(f):
        return None
    with open(f) as fh:
        return int(json.load(fh)["max_absorbed_epoch"])


def epoch_absorbed(store_path: str, batch_id: int) -> bool:
    """True iff this stream epoch was already folded into the store's
    base partition by a compaction — a checkpoint-loss replay of an
    absorbed epoch must NOT re-land it as a fresh partition (its rows
    would then exist twice: in the base and in the replayed
    partition). ONE implementation for every exactly-once loop
    (MinHash, IVF-PQ/IVF-OPQ, lexical, flat codes) so replay
    semantics cannot diverge between them."""
    wm = read_absorbed_watermark(store_path)
    return wm is not None and int(batch_id) <= wm


def write_absorbed_watermark(path: str, epoch: int) -> None:
    import json

    with open(os.path.join(path, ABSORBED_WATERMARK_FILE), "w") as fh:
        json.dump({"max_absorbed_epoch": int(epoch)}, fh)


def _store_epoch_partitions(path: str) -> list[int]:
    """Real (>= 0) ``ingest_batch=`` partition ids under ``path``."""
    out = []
    for name in os.listdir(path):
        if name.startswith("ingest_batch="):
            b = int(name.split("=", 1)[1])
            if b >= 0:
                out.append(b)
    return sorted(out)


CELL_STORE_KINDS = ("ivfpq", "ivfpq_hkm", "ivfopq", "ivfopq_hkm")
FLAT_CODES_KINDS = ("pq", "opq")
# raw-vector partitioned stores (the document's embedding verbatim, not a
# quantized code): the bucket-partitioned ANN store, the IVF cell store,
# and the QED bin store — addressed by the same vec_id and rewritten
# through the same prepare as the codes stores (retention fan-out)
RAW_VECTOR_KINDS = ("ann_hyperplane", "ivf", "ivf_hkm", "qed")

CODES_SWAP_MARKERS = ("_SUCCESS", "_index_meta.json")


def _prepare_ivfpq_rewrite(
    spark: SparkSession,
    path: str,
    transform,
    kinds: tuple = CELL_STORE_KINDS,
    suffix: str = "__compact",
) -> str:
    """Phase 1 of a codes-store rewrite: ``transform(current_df,
    part_cols)`` produces the replacement rows, written to the sibling
    tmp directory under the SAME partition layout with the quantizer
    sidecar (and any absorbed-epoch watermark, rolled forward by the
    transform's ``new_watermark``) carried over. Returns the tmp path;
    phase 2 is :func:`_commit_dir_swap`. The partition restatement
    covers every vec_id-addressed family: codes stores (``cell`` and/or
    stream ``ingest_batch``), the hyperplane ANN store (``bucket``),
    and the QED store (``qed_bin``)."""
    meta = read_store_meta(path)
    if meta.get("kind") not in kinds:
        raise ValueError(
            f"{path} is not one of {kinds} (kind={meta.get('kind')!r})"
        )
    codes = spark.read.parquet(path)
    part_cols = [
        c
        for c in ("ingest_batch", "cell", "bucket", "qed_bin")
        if c in codes.columns
    ]
    tmp = _prepare_dir_swap(path, suffix=suffix)
    replacement = transform(codes, part_cols)
    writer = replacement.write.mode("overwrite")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(tmp)
    _carry_swap_sidecars(
        path, tmp, new_watermark=getattr(transform, "new_watermark", None)
    )
    return tmp


def _rewrite_ivfpq_swapped(
    spark: SparkSession,
    path: str,
    transform,
    kinds: tuple = CELL_STORE_KINDS,
) -> None:
    """Crash-safe full rewrite of a codes store through the shared
    prepare + swap core. Shared by the cell-partitioned (IVF-PQ,
    IVF-OPQ) and flat (PQ, OPQ) lifecycles — the flat stores simply
    have no ``cell`` partition column to restate."""
    _prepare_ivfpq_rewrite(spark, path, transform, kinds)
    _commit_dir_swap(path)


def compact_ivfpq_index(spark: SparkSession, path: str) -> None:
    """Compact an IVF-PQ codes store: many appends (or one stream epoch
    partition per micro-batch from ``stream_semantic_ingest``) leave
    small files / unbounded ``ingest_batch=`` directories; rewrite the
    store once, folding every epoch into ``BASE_INGEST_BATCH`` while
    KEEPING the cell partitioning (probe pruning must survive
    compaction). Crash-safe via the sibling-dir + rename swap
    (:func:`recover_ivfpq_swap` heals a mid-swap death). For
    batch-partitioned stores the swap carries an absorbed-epoch
    watermark so a stream replay of a folded epoch is dropped by the
    maintenance loop instead of double-landing (mirrors
    ``streaming.sketches``); still run compaction while the stream is
    stopped — the watermark protects the restart, not a concurrent
    writer."""

    def fold(codes: DataFrame, part_cols: list[str]) -> DataFrame:
        if "ingest_batch" in part_cols:
            codes = codes.withColumn(
                "ingest_batch", F.lit(BASE_INGEST_BATCH)
            )
        return codes

    fold.new_watermark = _fold_watermark(path)
    _rewrite_ivfpq_swapped(spark, path, fold)


def delete_from_ivfpq_index(
    spark: SparkSession,
    delete_ids,
    path: str,
    id_col: str = "vec_id",
) -> None:
    """Targeted deletion from a persisted IVF-PQ codes store — the
    retention / right-to-be-forgotten operator, completing the
    create/append/probe/compact lifecycle at parity with the LSH
    index's :func:`delete_from_index`. ``delete_ids``: a one-column
    DataFrame or a Python list of ids (broadcast anti-join — delete
    sets are small; a corpus-scale delete is a rebuild). The rewrite
    preserves the cell (and any ingest_batch) partition layout and the
    quantizer sidecar, and swaps in crash-safely; re-running a delete
    converges. Parquet files are immutable, so deletion is O(store
    rewrite) — batch deletes into maintenance windows."""
    if not isinstance(delete_ids, DataFrame):
        delete_ids = spark.createDataFrame(
            [(int(i),) for i in delete_ids], f"{id_col} bigint"
        )
    ids = F.broadcast(delete_ids.select(id_col).distinct())
    _rewrite_ivfpq_swapped(
        spark, path, lambda cur, _parts: cur.join(ids, id_col, "left_anti")
    )


def recover_ivfpq_swap(path: str) -> bool:
    """Startup recovery after a process death inside a codes-store
    rewrite's swap: re-install whichever complete copy survives under
    ``path`` (the rewritten tmp if its data AND sidecar landed, else
    the set-aside original) and clear leftovers. Returns True if any
    action was taken; raises only if no copy survives."""
    return _recover_dir_swap(path, CODES_SWAP_MARKERS, label="codes store")


def validate_ivfpq_store(spark: SparkSession, path: str) -> None:
    """Consistency check for a persisted cell-partitioned codes store
    (IVF-PQ or IVF-OPQ) against its own sidecar: every row's cell must
    be a valid quantizer cell, every
    codes array must have exactly m entries all within [0, n_codes),
    and vec_ids must be unique (the invariant appends rely on; a
    duplicate means some append violated the new-ids contract). Raises
    with the first few offending ids; cost is one scan of the codes
    columns — run it after a suspected partial append, like
    :func:`validate_index`."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.ann import (
        HKMQuantizer,
    )

    if read_store_meta(path).get("kind") in ("ivfopq", "ivfopq_hkm"):
        codes, _r, cents, books = read_ivfopq_index(spark, path)
    else:
        codes, cents, books = read_ivfpq_index(spark, path)
    n_cells = (
        cents.n_leaves if isinstance(cents, HKMQuantizer) else len(cents)
    )
    m, n_codes = len(books), len(books[0])
    bad_cell = (
        codes.filter((F.col("cell") < 0) | (F.col("cell") >= n_cells))
        .select("vec_id").limit(5).collect()
    )
    if bad_cell:
        ids = [r["vec_id"] for r in bad_cell]
        raise ValueError(
            f"vec_ids {ids} in {path} sit in cells outside the sidecar "
            f"quantizer's [0, {n_cells}) — store and quantizer disagree"
        )
    bad_codes = (
        codes.filter(
            (F.size("codes") != m)
            | F.exists(
                "codes", lambda c: (c < F.lit(0)) | (c >= F.lit(n_codes))
            )
        )
        .select("vec_id").limit(5).collect()
    )
    if bad_codes:
        ids = [r["vec_id"] for r in bad_codes]
        raise ValueError(
            f"vec_ids {ids} in {path} carry codes incompatible with the "
            f"sidecar codebooks (m={m}, n_codes={n_codes})"
        )
    dup = (
        codes.groupBy("vec_id").count().filter(F.col("count") > 1)
        .limit(5).collect()
    )
    if dup:
        ids = [r["vec_id"] for r in dup]
        raise ValueError(
            f"duplicate vec_ids {ids} in {path}: an append violated the "
            "new-ids contract — dedup (delete_from_ivfpq_index the "
            "stale copies) before serving"
        )


# ---------------------------------------------------------------------------
# Flat codes store lifecycle (PQ and OPQ): the same crash-safe
# sibling-dir-swap compact/delete/recover/validate the cell-partitioned
# (IVF-PQ/IVF-OPQ) and postings stores get — write/read/append alone left
# the flat serving artifacts without a retention or small-files story.
# The flat stores have no partition column; the shared rewrite simply has
# nothing to restate, and recovery is layout-generic already.
# ---------------------------------------------------------------------------


def compact_pq_index(spark: SparkSession, path: str) -> None:
    """Compact a flat PQ or OPQ codes store: many appends leave small
    files; rewrite the store once (coalesced to a bounded file count —
    codes are m bytes/vector, so even a billion-row store is a handful
    of parquet files), quantizer sidecar carried over, crash-safe via
    the sibling-dir + rename swap (:func:`recover_pq_swap` heals a
    mid-swap death)."""

    def fold(codes: DataFrame, part_cols: list[str]) -> DataFrame:
        if "ingest_batch" in part_cols:
            codes = codes.withColumn(
                "ingest_batch", F.lit(BASE_INGEST_BATCH)
            )
        return codes.coalesce(max(1, codes.rdd.getNumPartitions() // 8))

    fold.new_watermark = _fold_watermark(path)
    _rewrite_ivfpq_swapped(spark, path, fold, kinds=FLAT_CODES_KINDS)


def delete_from_pq_index(
    spark: SparkSession,
    delete_ids,
    path: str,
    id_col: str = "vec_id",
) -> None:
    """Targeted deletion from a flat PQ or OPQ codes store — the
    retention operator completing the create/append/probe/compact
    lifecycle at parity with :func:`delete_from_ivfpq_index`.
    ``delete_ids``: a one-column DataFrame or a Python list (broadcast
    anti-join). Crash-safe swap; re-running converges."""
    if not isinstance(delete_ids, DataFrame):
        delete_ids = spark.createDataFrame(
            [(int(i),) for i in delete_ids], f"{id_col} bigint"
        )
    ids = F.broadcast(delete_ids.select(id_col).distinct())
    _rewrite_ivfpq_swapped(
        spark,
        path,
        lambda cur, _parts: cur.join(ids, id_col, "left_anti"),
        kinds=FLAT_CODES_KINDS,
    )


def recover_pq_swap(path: str) -> bool:
    """Startup recovery for a flat PQ/OPQ store rewrite — the swap
    mechanics are layout-generic, so this is
    :func:`recover_ivfpq_swap` under the flat store's name."""
    return recover_ivfpq_swap(path)


def validate_pq_store(spark: SparkSession, path: str) -> None:
    """Consistency check for a flat PQ or OPQ codes store against its
    own sidecar: every codes array must have exactly m entries all in
    [0, n_codes), and vec_ids must be unique (the append invariant).
    One scan of the codes columns, like :func:`validate_ivfpq_store`."""
    meta = read_store_meta(path)
    if meta.get("kind") not in FLAT_CODES_KINDS:
        raise ValueError(
            f"{path} is not a flat codes store (kind={meta.get('kind')!r})"
        )
    books = meta["codebooks"]
    m, n_codes = len(books), len(books[0])
    codes = spark.read.parquet(path)
    bad_codes = (
        codes.filter(
            (F.size("codes") != m)
            | F.exists(
                "codes", lambda c: (c < F.lit(0)) | (c >= F.lit(n_codes))
            )
        )
        .select("vec_id").limit(5).collect()
    )
    if bad_codes:
        ids = [r["vec_id"] for r in bad_codes]
        raise ValueError(
            f"vec_ids {ids} in {path} carry codes incompatible with the "
            f"sidecar codebooks (m={m}, n_codes={n_codes})"
        )
    dup = (
        codes.groupBy("vec_id").count().filter(F.col("count") > 1)
        .limit(5).collect()
    )
    if dup:
        ids = [r["vec_id"] for r in dup]
        raise ValueError(
            f"duplicate vec_ids {ids} in {path}: an append violated the "
            "new-ids contract — dedup (delete_from_pq_index the stale "
            "copies) before serving"
        )


def write_codes_stream_base(
    embeddings: DataFrame,
    path: str,
    codebooks: list[list[list[float]]],
    r_cols: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Base epoch of a STREAM-maintained flat codes store (PQ, or OPQ
    when ``r_cols`` is given) — the flat twin of
    :func:`write_ivfpq_stream_base`: the same artifact as
    :func:`write_pq_index` / :func:`write_opq_index` with an
    ``ingest_batch`` partition level on top, so each stream micro-batch
    owns its partition directory and a replayed epoch OVERWRITES itself
    instead of appending duplicates. The quantizer (and rotation) stay
    pinned in the sidecar; every epoch encodes with it, never a
    retrained one — the codec ships offline, the stream only extends
    its coverage."""
    if r_cols is not None:
        from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.opq import (
            opq_encode,
        )

        encoded = opq_encode(embeddings, r_cols, codebooks, id_col, vec_col)
        meta = _opq_meta(r_cols, codebooks)
    else:
        from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.ann import (
            pq_encode,
        )

        encoded = pq_encode(embeddings, codebooks, id_col, vec_col)
        meta = _pq_meta(codebooks)
    (
        encoded.withColumn("ingest_batch", F.lit(BASE_INGEST_BATCH))
        .write.mode("overwrite")
        .partitionBy("ingest_batch")
        .parquet(path)
    )
    meta["batch_partitioned"] = True
    _write_store_meta(path, meta)


# ---------------------------------------------------------------------------
# Lexical postings store: the persisted BM25 index artifact, at lifecycle
# parity with the LSH (write_bands_bucketed/compact_index/delete_from_index)
# and IVF-PQ (write_ivfpq_index/compact_ivfpq_index/...) stores. The
# reference's design is "prebuilt index on shared storage, workers load
# shards" (app/src/index_builder.py:22-36, app/src/worker_tasks.py:88-117);
# this is that artifact for the lexical tier.
#
# Layout under `path`:
#   doc_shard=<s>/token_bucket=<b>/*.parquet   postings (doc_id, dl, token, tf)
#   _doc_lengths/                              (doc_id, dl) for ALL docs,
#                                              including zero-token docs —
#                                              N and sum_dl stay exact under
#                                              append and delete
#   _term_stats/                               (token, df) GLOBAL document
#                                              frequencies — replicas loading
#                                              a doc shard score with corpus
#                                              idf without being hand-fed
#   _index_meta.json                           {kind, k1, b, n_doc_shards,
#                                              n_token_buckets}
#
# The two partition levels are the two pruning axes: a serving replica
# exporting doc shard s reads only doc_shard=s/ directories (the lexical
# twin of the vector tier's cell-subset export), and a point query reads
# only the token_bucket=<hash(term)> directories of its query terms (the
# lexical twin of the IVF probe-cell partition pruning).
# ---------------------------------------------------------------------------


def _postings_rows(
    docs: DataFrame,
    n_doc_shards: int,
    n_token_buckets: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, dl, token, tf, doc_shard, token_bucket) rows for a doc
    set under the store's bucketing — shared by build and append so the
    two can never disagree on layout."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.text import tokenize

    toks = tokenize(F.col(text_col))
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(toks).alias("dl"),
            F.explode(toks).alias("token"),
        )
        .groupBy("doc_id", "dl", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn(
            "doc_shard", F.pmod(F.col("doc_id"), F.lit(n_doc_shards))
        )
        .withColumn(
            "token_bucket",
            F.pmod(F.xxhash64(F.col("token")), F.lit(n_token_buckets)),
        )
    )


def token_buckets_for(spark: SparkSession, terms: list[str], n_token_buckets: int) -> dict[str, int]:
    """token -> token_bucket under the store's hash, computed with the
    SAME JVM xxhash64 the writer used (one tiny local job, no corpus
    scan) so query-side literals prune the right directories."""
    rows = (
        spark.createDataFrame([(t,) for t in terms], "token string")
        .select(
            "token",
            F.pmod(F.xxhash64(F.col("token")), F.lit(n_token_buckets)).alias("b"),
        )
        .collect()
    )
    return {r["token"]: int(r["b"]) for r in rows}


def write_postings_index(
    docs: DataFrame,
    path: str,
    k1: float = 1.2,
    b: float = 0.75,
    n_doc_shards: int = 4,
    n_token_buckets: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Build the persisted lexical (BM25) index: one tokenize+aggregate
    pass lands token-bucketed, doc-sharded postings; the doc-length and
    term-df sidecars are derived next to them. k1/b land in the meta so
    every consumer scores under the config the index was built for."""
    spark = docs.sparkSession
    _postings_rows(
        docs, n_doc_shards, n_token_buckets, id_col, text_col
    ).write.mode("overwrite").partitionBy("doc_shard", "token_bucket").parquet(path)
    # BOTH sidecars derive from the store itself — posting rows carry
    # dl, so tokenize runs exactly once per build (the same one-pass
    # rule the streaming loop follows); zero-token docs have no
    # posting rows (explode drops them) and are backfilled with dl=0
    # from the id column, keeping N and sum_dl exact
    written = spark.read.parquet(path)
    dl = written.select("doc_id", "dl").distinct()
    zero = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(dl.select("doc_id"), "doc_id", "left_anti")
        .withColumn("dl", F.lit(0).cast("int"))
    )
    dl.unionByName(zero).write.mode("overwrite").parquet(
        os.path.join(path, "_doc_lengths")
    )
    (
        written
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .write.mode("overwrite")
        .parquet(os.path.join(path, "_term_stats"))
    )
    _write_store_meta(
        path,
        {
            "kind": "postings",
            "k1": float(k1),
            "b": float(b),
            "n_doc_shards": int(n_doc_shards),
            "n_token_buckets": int(n_token_buckets),
        },
    )


def write_postings_stream_base(
    docs: DataFrame,
    path: str,
    k1: float = 1.2,
    b: float = 0.75,
    n_doc_shards: int = 4,
    n_token_buckets: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Base epoch of a STREAM-maintained lexical store (the lexical
    twin of :func:`write_ivfpq_stream_base`): the same artifact as
    :func:`write_postings_index` with an ``ingest_batch`` partition
    level on top of every component — postings under
    ``ingest_batch=BASE/doc_shard/token_bucket``, doc lengths and
    per-term df DELTAS under ``ingest_batch=BASE`` — so each stream
    micro-batch owns its partition directories and a replayed epoch
    OVERWRITES itself instead of appending duplicates. Readers
    aggregate the df deltas per term (:func:`read_term_stats`), which
    also keeps per-epoch maintenance O(micro-batch), never a full
    postings rescan."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.text import tokenize

    posts = _postings_rows(
        docs, n_doc_shards, n_token_buckets, id_col, text_col
    ).withColumn("ingest_batch", F.lit(BASE_INGEST_BATCH))
    posts.write.mode("overwrite").partitionBy(
        "ingest_batch", "doc_shard", "token_bucket"
    ).parquet(path)
    (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(tokenize(F.col(text_col))).alias("dl"),
        )
        .withColumn("ingest_batch", F.lit(BASE_INGEST_BATCH))
        .write.mode("overwrite")
        .partitionBy("ingest_batch")
        .parquet(os.path.join(path, "_doc_lengths"))
    )
    (
        docs.sparkSession.read.parquet(path)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .withColumn("ingest_batch", F.lit(BASE_INGEST_BATCH))
        .write.mode("overwrite")
        .partitionBy("ingest_batch")
        .parquet(os.path.join(path, "_term_stats"))
    )
    _write_store_meta(
        path,
        {
            "kind": "postings",
            "k1": float(k1),
            "b": float(b),
            "n_doc_shards": int(n_doc_shards),
            "n_token_buckets": int(n_token_buckets),
            "batch_partitioned": True,
        },
    )


def read_postings_index(spark: SparkSession, path: str):
    """(postings DataFrame, meta dict) from a :func:`write_postings_index`
    store; raises on any other store kind rather than scoring garbage."""
    meta = read_store_meta(path)
    if meta.get("kind") != "postings":
        raise ValueError(
            f"{path} is not a lexical postings store (kind={meta.get('kind')!r})"
        )
    return spark.read.parquet(path), meta


def read_term_stats(spark: SparkSession, path: str) -> DataFrame:
    """GLOBAL (token, df) from the ``_term_stats`` sidecar. Flat stores
    hold it directly; stream-maintained stores hold one df DELTA per
    ``ingest_batch`` partition (epoch-local counts, so maintenance never
    rescans the index) — aggregated here. A doc's postings live in
    exactly one epoch, so the per-epoch counts sum to the corpus df."""
    stats = spark.read.parquet(os.path.join(path, "_term_stats"))
    if "ingest_batch" in stats.columns:
        return stats.groupBy("token").agg(F.sum("df").alias("df"))
    return stats.select("token", "df")


def read_postings_corpus_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_docs, sum_dl) from the ``_doc_lengths`` sidecar — one tiny agg,
    always consistent with the store's own doc set (a stale cached meta
    number can't drift from it because there isn't one)."""
    st = (
        spark.read.parquet(os.path.join(path, "_doc_lengths"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s"))
        .collect()[0]
    )
    return int(st["n"] or 0), int(st["s"] or 0)


def append_postings_index(
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Incremental lexical-index maintenance: tokenize ONLY the new docs
    under the store's own bucketing (read from the sidecar — appends
    cannot diverge from the build config) and append under their
    partition directories; then roll the doc-length and term-df sidecars
    forward. New doc_ids must be new (same contract as the LSH/IVF-PQ
    appends — :func:`validate_postings_store` catches violations).

    Write order is postings -> _doc_lengths -> _term_stats; a crash
    between steps leaves a detectable (validate) and healable
    (:func:`rebuild_postings_stats`) store, never a wrong-silently one.
    The _term_stats rewrite swaps via a sibling tmp directory because
    Spark refuses to overwrite a path its own plan reads."""
    meta = read_store_meta(path)
    if meta.get("kind") != "postings":
        raise ValueError(
            f"{path} is not a lexical postings store (kind={meta.get('kind')!r})"
        )
    if meta.get("batch_partitioned"):
        raise ValueError(
            f"{path} is a stream-maintained (batch-partitioned) store — "
            "land new docs through stream_lexical_ingest, whose per-epoch "
            "partitions stay replay-idempotent; a plain append would not"
        )
    spark = new_docs.sparkSession
    new_posts = _postings_rows(
        new_docs,
        int(meta["n_doc_shards"]),
        int(meta["n_token_buckets"]),
        id_col,
        text_col,
    )
    new_posts.write.mode("append").partitionBy(
        "doc_shard", "token_bucket"
    ).parquet(path)
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.text import tokenize

    new_docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokenize(F.col(text_col))).alias("dl"),
    ).write.mode("append").parquet(os.path.join(path, "_doc_lengths"))
    _refresh_term_stats(spark, path)


def _refresh_term_stats(spark: SparkSession, path: str) -> None:
    """Recompute ``_term_stats`` from the postings and swap it in via a
    sibling tmp dir + rename (never overwrite-in-place what the plan
    reads; a complete copy exists at every instant). On a
    stream-maintained store the recompute preserves the per-epoch delta
    layout (grouped by ``ingest_batch``), so later epoch replays keep
    overwriting their own partition consistently."""
    import shutil

    stats_dir = os.path.join(path, "_term_stats")
    tmp = stats_dir + "__tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    posts = spark.read.parquet(path)
    if "ingest_batch" in posts.columns:
        (
            posts.groupBy("ingest_batch", "token")
            .agg(F.count(F.lit(1)).alias("df"))
            .write.mode("overwrite")
            .partitionBy("ingest_batch")
            .parquet(tmp)
        )
    else:
        (
            posts.groupBy("token")
            .agg(F.count(F.lit(1)).alias("df"))
            .write.mode("overwrite")
            .parquet(tmp)
        )
    old = stats_dir + "__old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(stats_dir):
        os.rename(stats_dir, old)
    os.rename(tmp, stats_dir)
    shutil.rmtree(old, ignore_errors=True)


POSTINGS_SWAP_MARKERS = ("_SUCCESS", "_term_stats", "_index_meta.json")


def _prepare_postings_rewrite(
    spark: SparkSession, path: str, transform, suffix: str = "__compact"
) -> str:
    """Phase 1 of a lexical-store rewrite: ``transform(postings,
    doc_lengths)`` returns the replacement (postings, doc_lengths)
    pair, written to the sibling tmp directory under the same partition
    layout (including the ``ingest_batch`` level of a stream-maintained
    store) with the term-df sidecar recomputed from the surviving
    postings and the meta + any absorbed-epoch watermark carried over.
    Returns the tmp path; phase 2 is :func:`_commit_dir_swap` (shared
    law with :func:`_prepare_ivfpq_rewrite`; :func:`recover_postings_swap`
    heals a mid-swap death)."""
    meta = read_store_meta(path)
    if meta.get("kind") != "postings":
        raise ValueError(
            f"{path} is not a lexical postings store (kind={meta.get('kind')!r})"
        )
    postings = spark.read.parquet(path)
    doc_lengths = spark.read.parquet(os.path.join(path, "_doc_lengths"))
    part_cols = [
        c
        for c in ("ingest_batch", "doc_shard", "token_bucket")
        if c in postings.columns
    ]
    dl_part_cols = [c for c in ("ingest_batch",) if c in doc_lengths.columns]
    tmp = _prepare_dir_swap(path, suffix=suffix)
    new_posts, new_dls = transform(postings, doc_lengths)
    new_posts.write.mode("overwrite").partitionBy(*part_cols).parquet(tmp)
    dl_writer = new_dls.write.mode("overwrite")
    if dl_part_cols:
        dl_writer = dl_writer.partitionBy(*dl_part_cols)
    dl_writer.parquet(os.path.join(tmp, "_doc_lengths"))
    tmp_posts = spark.read.parquet(tmp)
    if "ingest_batch" in tmp_posts.columns:
        (
            tmp_posts.groupBy("ingest_batch", "token")
            .agg(F.count(F.lit(1)).alias("df"))
            .write.mode("overwrite")
            .partitionBy("ingest_batch")
            .parquet(os.path.join(tmp, "_term_stats"))
        )
    else:
        (
            tmp_posts.groupBy("token")
            .agg(F.count(F.lit(1)).alias("df"))
            .write.mode("overwrite")
            .parquet(os.path.join(tmp, "_term_stats"))
        )
    _carry_swap_sidecars(
        path, tmp, new_watermark=getattr(transform, "new_watermark", None)
    )
    return tmp


def _rewrite_postings_swapped(spark: SparkSession, path: str, transform) -> None:
    """Crash-safe full rewrite of a lexical postings store through the
    shared prepare + swap core."""
    _prepare_postings_rewrite(spark, path, transform)
    _commit_dir_swap(path)


def compact_postings_index(spark: SparkSession, path: str) -> None:
    """Compact a lexical postings store: many appends (or one stream
    epoch partition per micro-batch from ``stream_lexical_ingest``)
    leave small files / unbounded ``ingest_batch=`` directories;
    rewrite the store once, folding every epoch into
    :data:`BASE_INGEST_BATCH` while KEEPING the doc_shard/token_bucket
    levels (replica-export and query-bucket pruning must survive
    compaction) and refreshing the sidecars from the rewritten data.
    Crash-safe via the sibling-dir + rename swap; for epoch stores the
    swap carries an absorbed-epoch watermark so a stream replay of a
    folded epoch is dropped by the maintenance loop instead of
    double-landing."""

    def fold(posts: DataFrame, dls: DataFrame):
        if "ingest_batch" in posts.columns:
            posts = posts.withColumn("ingest_batch", F.lit(BASE_INGEST_BATCH))
        if "ingest_batch" in dls.columns:
            dls = dls.withColumn("ingest_batch", F.lit(BASE_INGEST_BATCH))
        return posts, dls

    fold.new_watermark = _fold_watermark(path)
    _rewrite_postings_swapped(spark, path, fold)


def delete_from_postings_index(
    spark: SparkSession,
    delete_ids,
    path: str,
    id_col: str = "doc_id",
) -> None:
    """Targeted deletion from a persisted lexical store — the
    retention / right-to-be-forgotten operator at parity with
    :func:`delete_from_index` (LSH) and :func:`delete_from_ivfpq_index`.
    Removes the docs' postings AND doc-length rows, so N, sum_dl and
    every term df reflect the post-delete corpus exactly (BM25 scores
    shift when the corpus does — stale stats would silently mis-rank).
    ``delete_ids``: a one-column DataFrame or Python list (broadcast
    anti-join). Re-running a delete converges."""
    if not isinstance(delete_ids, DataFrame):
        delete_ids = spark.createDataFrame(
            [(int(i),) for i in delete_ids], "doc_id bigint"
        )
    else:
        delete_ids = delete_ids.selectExpr(f"{id_col} AS doc_id")
    ids = F.broadcast(delete_ids.select("doc_id").distinct())
    _rewrite_postings_swapped(
        spark,
        path,
        lambda p, d: (
            p.join(ids, "doc_id", "left_anti"),
            d.join(ids, "doc_id", "left_anti"),
        ),
    )


def recover_postings_swap(path: str) -> bool:
    """Startup recovery after a process death inside a lexical-store
    rewrite's swap: re-install whichever complete copy survives (the
    rewritten tmp if its data AND sidecars landed, else the set-aside
    original) and clear leftovers. Returns True if any action was
    taken; raises only if no copy survives."""
    return _recover_dir_swap(
        path, POSTINGS_SWAP_MARKERS, label="postings store"
    )


def rebuild_postings_stats(spark: SparkSession, path: str) -> None:
    """Heal the sidecars after a crash between an append's steps:
    re-derive ``_term_stats`` from the postings, and backfill any
    doc_ids present in the postings but missing from ``_doc_lengths``
    (a zero-token doc lost in that window is unrecoverable from the
    postings alone — the one documented gap, caught by re-appending)."""
    dl_path = os.path.join(path, "_doc_lengths")
    have = spark.read.parquet(dl_path).select("doc_id")
    posts = spark.read.parquet(path)
    epoch_store = "ingest_batch" in posts.columns
    cols = ["doc_id", "dl"] + (["ingest_batch"] if epoch_store else [])
    missing = (
        posts.select(*cols)
        .distinct()
        .join(have, "doc_id", "left_anti")
        .transform(materialize, eager=True)  # cut lineage: the write reads dl_path
    )
    if missing.count() > 0:
        writer = missing.write.mode("append")
        if epoch_store:
            writer = writer.partitionBy("ingest_batch")
        writer.parquet(dl_path)
    _refresh_term_stats(spark, path)


def validate_postings_store(spark: SparkSession, path: str) -> None:
    """Consistency check for a persisted lexical store against its own
    sidecars: every postings doc must have exactly one doc-length row
    agreeing on dl; every term's sidecar df must equal its postings doc
    count; partition values must match the meta's bucketing. Raises
    with the first few offenders; cost is one scan — run it after a
    suspected partial append, like :func:`validate_ivfpq_store`."""
    posts, meta = read_postings_index(spark, path)
    dls = spark.read.parquet(os.path.join(path, "_doc_lengths"))
    dup = dls.groupBy("doc_id").count().filter("count > 1").limit(5).collect()
    if dup:
        ids = [r["doc_id"] for r in dup]
        raise ValueError(
            f"duplicate doc_ids {ids} in {path}/_doc_lengths: an append "
            "violated the new-ids contract — delete the stale copies"
        )
    bad_doc = (
        posts.select("doc_id", "dl")
        .distinct()
        .join(dls.withColumnRenamed("dl", "dl_sidecar"), "doc_id", "left")
        .filter(
            F.col("dl_sidecar").isNull() | (F.col("dl") != F.col("dl_sidecar"))
        )
        .select("doc_id")
        .limit(5)
        .collect()
    )
    if bad_doc:
        ids = [r["doc_id"] for r in bad_doc]
        raise ValueError(
            f"doc_ids {ids} in {path} postings disagree with (or are "
            "missing from) _doc_lengths — run rebuild_postings_stats"
        )
    real_df = posts.groupBy("token").agg(F.count(F.lit(1)).alias("real_df"))
    side_df = read_term_stats(spark, path)
    bad_df = (
        real_df.join(side_df, "token", "full_outer")
        .filter(
            F.col("df").isNull()
            | F.col("real_df").isNull()
            | (F.col("df") != F.col("real_df"))
        )
        .select("token")
        .limit(5)
        .collect()
    )
    if bad_df:
        toks = [r["token"] for r in bad_df]
        raise ValueError(
            f"terms {toks} in {path}/_term_stats disagree with the "
            "postings — run rebuild_postings_stats"
        )
    nshards, nbuckets = int(meta["n_doc_shards"]), int(meta["n_token_buckets"])
    bad_part = (
        posts.filter(
            (F.col("doc_shard") != F.pmod(F.col("doc_id"), F.lit(nshards)))
            | (
                F.col("token_bucket")
                != F.pmod(F.xxhash64(F.col("token")), F.lit(nbuckets))
            )
        )
        .select("doc_id")
        .limit(5)
        .collect()
    )
    if bad_part:
        ids = [r["doc_id"] for r in bad_part]
        raise ValueError(
            f"doc_ids {ids} in {path} sit in partition directories that "
            "disagree with the meta bucketing — store and meta diverged"
        )
