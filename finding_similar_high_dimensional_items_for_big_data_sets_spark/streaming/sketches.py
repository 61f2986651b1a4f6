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
(crash-safe via a sibling-directory write + rename swap, healed by
:func:`recover_sketch_compact`; an absorbed-epoch watermark makes
checkpoint replays of folded epochs no-ops instead of double counts).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.materialize import (
    materialize,
)
from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions import cms, hll

# Epoch id for base/compacted partitions; real stream epochs are >= 0.
BASE_SKETCH_BATCH = -1

def _read_watermark(path: str) -> int | None:
    """Max epoch id ever folded into this store's base partition, or
    None if the store was never compacted (shared convention with the
    IVF-PQ codes store — see ``sources.tables.read_absorbed_watermark``)."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import (
        read_absorbed_watermark,
    )

    return read_absorbed_watermark(path)


def _write_epoch(df: DataFrame, path: str, batch_id: int) -> None:
    # Replay guard: an epoch at or below the absorbed watermark was
    # already folded into the base partition by compact_sketch_store —
    # re-landing it as its own partition would double-count CMS sums
    # (HLL max would survive, but the store contract is shared). A
    # replayed epoch keeps its batch_id, so the drop is exactly-once.
    wm = _read_watermark(path)
    if wm is not None and int(batch_id) <= wm:
        return
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


def _store_epochs(path: str) -> list[int]:
    """Real (>= 0) epoch partition ids currently in the store."""
    out = []
    for name in os.listdir(path):
        if name.startswith("ingest_batch="):
            b = int(name.split("=", 1)[1])
            if b >= 0:
                out.append(b)
    return sorted(out)


def compact_sketch_store(spark: SparkSession, path: str, kind: str) -> None:
    """Fold every epoch partition into the single BASE partition,
    crash-safely: the merged sketch is written to a SIBLING tmp
    directory first, then swapped in via rename-aside / rename-in /
    delete-old — a complete store exists under some directory at every
    instant (a same-path static overwrite would delete the store
    before the job writes, losing everything on a mid-write crash).
    A process death mid-swap is healed by :func:`recover_sketch_compact`.

    Replay safety: the swap carries an ``_absorbed_watermark.json``
    recording the max epoch folded into the base; ``_write_epoch``
    drops any replayed epoch at or below it, so a stream checkpoint
    that replays an absorbed epoch cannot re-land it as a fresh
    partition and double-count CMS sums. (Compaction itself should
    still run while the maintenance stream is stopped — the watermark
    protects the restart, not a concurrent writer.)"""
    if kind == "cms":
        merged = read_cms_sketch(spark, path)
    elif kind == "hll":
        merged = read_hll_sketch(spark, path)
    else:
        raise ValueError(f"unknown sketch kind: {kind}")
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import (
        _carry_swap_sidecars,
        _commit_dir_swap,
        _prepare_dir_swap,
    )

    new_wm = max(_store_epochs(path), default=None)
    # materialize before touching the directory the plan reads
    rows = merged.transform(materialize, eager=True)
    tmp = _prepare_dir_swap(path)
    (
        rows.withColumn("ingest_batch", F.lit(BASE_SKETCH_BATCH))
        .write.mode("overwrite")
        .partitionBy("ingest_batch")
        .parquet(tmp)
    )
    # sketch stores carry no quantizer sidecar — only the watermark
    _carry_swap_sidecars(path, tmp, new_watermark=new_wm, copy_meta=False)
    _commit_dir_swap(path)


def recover_sketch_compact(path: str) -> bool:
    """Startup recovery after a process death inside
    :func:`compact_sketch_store`'s swap: re-install whichever complete
    copy survives under ``path`` (the compacted tmp if its write
    finished — ``_SUCCESS`` present — else the set-aside original) and
    clear leftovers. Returns True if any action was taken. One shared
    implementation with every other store family
    (``sources.tables._recover_dir_swap``)."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import (
        _recover_dir_swap,
    )

    return _recover_dir_swap(path, label="sketch store")
