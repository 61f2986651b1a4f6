"""Streaming sketch maintenance: per-epoch Count-Min and HyperLogLog
deltas, exactly-once across checkpoint restarts.

Both sketches are associative monoids (CMS merges by cell-wise sum,
HLL by register-wise max), so the stream sinks each micro-batch's OWN
sketch — at most ``d*w`` / ``2^p`` rows per epoch — into that epoch's
``ingest_batch`` partition with dynamic partition overwrite. A
replayed epoch overwrites its previous attempt instead of double
counting (the same replay-convergence mechanism as
``streaming/ingest.py``), so the merged read equals the batch build
over everything the stream has consumed: exactly-once without any
read-modify-write on the store.

This is the scale shape for "running frequency / cardinality picture
of a 100 TB crawl": per-epoch state is bounded by the sketch size, the
store grows by one tiny partition per epoch, and
:func:`compact_sketch_store` folds history back to one partition
(crash-safe: the fold is re-runnable because merging is idempotent
w.r.t. already-compacted partitions only through the rewrite — the
compaction writes the merged result as a NEW base partition and drops
the absorbed ones in one dynamic overwrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions import cms, hll

# Epoch id for base/compacted partitions; real stream epochs are >= 0.
BASE_SKETCH_BATCH = -1


def _write_epoch(df: DataFrame, path: str, batch_id: int) -> None:
    s = df.sparkSession
    prev = s.conf.get("spark.sql.sources.partitionOverwriteMode")
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            df.withColumn("ingest_batch", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .partitionBy("ingest_batch")
            .parquet(path)
        )
    finally:
        s.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def stream_sketch_maintenance(
    stream_items: DataFrame,
    key_col: str,
    cms_path: str,
    hll_path: str,
    d: int = 4,
    width: int = 256,
    p: int = 6,
    checkpoint: str | None = None,
    trigger_kwargs: dict | None = None,
):
    """Start the sketch-maintenance stream over an occurrence stream:
    every epoch lands its CMS delta under ``cms_path`` and its HLL
    registers under ``hll_path``, each in the epoch's own partition."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _write_epoch(
            cms.cms_build(batch_df, key_col, d, width), cms_path, batch_id
        )
        _write_epoch(
            hll.hll_registers(batch_df, key_col, p=p), hll_path, batch_id
        )

    writer = stream_items.writeStream.foreachBatch(_sink)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.trigger(**(trigger_kwargs or {"availableNow": True})).start()


def read_cms_sketch(spark: SparkSession, path: str) -> DataFrame:
    """Merged view of the CMS store: cell-wise sum across every epoch
    partition — equals the single batch build over all consumed rows."""
    return (
        spark.read.parquet(path)
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def read_hll_sketch(spark: SparkSession, path: str) -> DataFrame:
    """Merged view of the HLL store: register-wise max across epochs."""
    return (
        spark.read.parquet(path)
        .groupBy("register")
        .agg(F.max("m_j").alias("m_j"))
    )


def compact_sketch_store(spark: SparkSession, path: str, kind: str) -> None:
    """Fold every epoch partition into the single BASE partition:
    read-merge, write the merged sketch as the base partition, then
    drop the absorbed epoch partitions in the same static overwrite.
    The store stays readable by the same merged-read afterwards; a
    crash before the overwrite leaves the old store intact (the write
    is atomic at the _SUCCESS/rename level for a static overwrite of
    the whole path via a temp-dir swap handled by the committer)."""
    if kind == "cms":
        merged = read_cms_sketch(spark, path)
    elif kind == "hll":
        merged = read_hll_sketch(spark, path)
    else:
        raise ValueError(f"unknown sketch kind: {kind}")
    # materialize before overwriting the directory the plan reads
    rows = merged.localCheckpoint(eager=True)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    # force STATIC: the whole-path overwrite is what drops the
    # absorbed epoch partitions (dynamic would leave them alongside
    # the new base and double-count on the next merged read)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        (
            rows.withColumn("ingest_batch", F.lit(BASE_SKETCH_BATCH))
            .write.mode("overwrite")
            .partitionBy("ingest_batch")
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
