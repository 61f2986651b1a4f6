"""Streaming LEXICAL index maintenance: the BM25 postings store kept
current from a continuously-arriving document stream — the third tier
of the streaming index-maintenance family, next to the MinHash loop
(:func:`..sources.tables.append_to_index_exactly_once` via
:mod:`.ingest`) and the IVF-PQ codes loop (:mod:`.semantic`).

Per epoch, three writes, each a dynamic partition OVERWRITE of the
epoch's own ``ingest_batch`` partition (exactly-once under replay, the
same mechanics as the other two loops):

1. the micro-batch's postings under
   ``ingest_batch=<epoch>/doc_shard/token_bucket`` — self-configured
   from the store meta, so an epoch can never diverge from the build
   bucketing;
2. its (doc_id, dl) rows under ``_doc_lengths/ingest_batch=<epoch>``;
3. its per-term df DELTA under ``_term_stats/ingest_batch=<epoch>`` —
   counts of the EPOCH's postings only, so maintenance is
   O(micro-batch) however large the index; readers sum the deltas
   (:func:`..sources.tables.read_term_stats`), which is exact because
   every doc's postings live in exactly one epoch.

A crash between the writes is healed by the replay itself: the
checkpoint only commits after the sink returns, so the epoch re-runs
and each write overwrites its own partition. Compaction
(:func:`..sources.tables.compact_postings_index`) folds epochs into the
base partition and records an absorbed-epoch watermark; a
checkpoint-loss replay of a folded epoch is dropped here (same guard
as the codes store) instead of double-landing.

New doc_ids must be new across epochs (the same contract as every
index append; ``validate_postings_store`` catches violations). Compose
with :mod:`.ingest`'s dedup loop upstream when the stream itself may
carry duplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.materialize import (
    materialize,
)
from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import (
    _postings_rows,
    read_store_meta,
)


def _epoch_absorbed(store_path: str, batch_id: int) -> bool:
    """Delegates to the one shared implementation in sources.tables —
    replay semantics must be identical across every epoch loop."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import (
        epoch_absorbed,
    )

    return epoch_absorbed(store_path, batch_id)


def stream_lexical_ingest(
    stream_docs: DataFrame,
    store_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    trigger_kwargs: dict | None = None,
):
    """Start the lexical index-maintenance stream over a store laid
    down by :func:`..sources.tables.write_postings_stream_base`.
    Raises on a flat (non-batch-partitioned) store rather than degrade
    to at-least-once. Returns the StreamingQuery."""
    meta = read_store_meta(store_path)
    if meta.get("kind") != "postings":
        raise ValueError(
            f"{store_path} is not a lexical postings store "
            f"(kind={meta.get('kind')!r})"
        )
    if not meta.get("batch_partitioned"):
        raise ValueError(
            f"{store_path} is not batch-partitioned; build it with "
            "write_postings_stream_base — a flat store cannot absorb "
            "replayed epochs idempotently"
        )
    n_shards = int(meta["n_doc_shards"])
    n_buckets = int(meta["n_token_buckets"])

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if _epoch_absorbed(store_path, batch_id):
            return
        # conf must be set on the CLONE session foreachBatch hands us —
        # conf set on the outer session never reaches the clone's writes
        s = batch_df.sparkSession

        posts = _postings_rows(
            batch_df, n_shards, n_buckets, id_col, text_col
        ).withColumn("ingest_batch", F.lit(int(batch_id)))
        # one tokenize pass feeds all three writes: materialize + cut
        # lineage so the posting rows aren't recomputed per write —
        # doc lengths and term df both derive from the checkpointed
        # posts below (posting rows carry dl), so tokenize() runs
        # exactly once per epoch
        posts = posts.transform(materialize, eager=True)
        # (doc_id, dl) from the postings themselves; zero-token docs
        # have no posting rows (explode drops them), so backfill them
        # with dl=0 from the batch's id column — no second tokenize
        doc_lengths = (
            posts.select("doc_id", "dl")
            .distinct()
            .unionByName(
                batch_df.select(F.col(id_col).alias("doc_id"))
                .join(
                    posts.select("doc_id").distinct(),
                    "doc_id",
                    "left_anti",
                )
                .withColumn("dl", F.lit(0).cast("int"))
            )
        )
        prev = s.conf.get("spark.sql.sources.partitionOverwriteMode")
        s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                posts.write.mode("overwrite")
                .partitionBy("ingest_batch", "doc_shard", "token_bucket")
                .parquet(store_path)
            )
            (
                doc_lengths
                .withColumn("ingest_batch", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .partitionBy("ingest_batch")
                .parquet(store_path + "/_doc_lengths")
            )
            (
                posts.groupBy("token")
                .agg(F.count(F.lit(1)).alias("df"))
                .withColumn("ingest_batch", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .partitionBy("ingest_batch")
                .parquet(store_path + "/_term_stats")
            )
        finally:
            s.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    writer = stream_docs.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint
    )
    return writer.trigger(**(trigger_kwargs or {"availableNow": True})).start()
