"""Streaming ingest dedup: a continuously-crawled document stream,
exact-deduped per micro-batch against the persisted content-hash
history — the streaming half of
:func:`..operators.dedup.incremental_exact_dedup`.

Each epoch computes its genuinely-new rows against the history table,
lands them in the kept-rows output store, and adds their hashes to the
history so later batches (and replays) drop them. Both writes are
dynamic partition OVERWRITES of the epoch's own ``ingest_batch``
partition — the same replay-convergence mechanism as
``append_to_index_exactly_once`` — and the dedup reference EXCLUDES
the epoch's own partition (partition-pruned filter), so a replayed
epoch neither sees its previous half-written attempt as "history" nor
appends next to it. Net delivery: exactly-once into both stores.

The history table keeps the content-hash bucket layout per partition
(bucketing is per-partition-consistent), so the per-batch anti join
continues to read the history without an exchange no matter how many
stream epochs it has absorbed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.materialize import (
    materialize,
)
from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import (
    BASE_INGEST_BATCH,
)


def write_hash_history_partitioned(
    hashed: DataFrame, table: str, num_buckets: int = 64
) -> None:
    """Base build of the batch-partitioned, content-hash-bucketed
    history that :func:`stream_ingest_dedup` maintains. ``hashed`` is
    (doc_id, content_hash); initial rows own the
    :data:`BASE_INGEST_BATCH` partition."""
    (
        hashed.withColumn("ingest_batch", F.lit(BASE_INGEST_BATCH))
        .write.mode("overwrite")
        .partitionBy("ingest_batch")
        .bucketBy(num_buckets, "content_hash")
        .sortBy("content_hash")
        .format("parquet")
        .saveAsTable(table)
    )


def stream_ingest_dedup(
    stream_docs: DataFrame,
    history_table: str,
    out_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    trigger_kwargs: dict | None = None,
    index_params=None,
    sigs_path: str | None = None,
    bands_table: str | None = None,
):
    """Start the ingest-dedup stream. Kept rows (all input columns +
    ``content_hash``) land under ``out_path`` partitioned by
    ``ingest_batch``; their hashes join ``history_table``.

    With ``index_params`` + ``sigs_path`` + ``bands_table`` the same
    epoch ALSO signs and bands the kept rows into the LSH index via
    ``append_to_index_exactly_once`` — the complete production ingest
    loop (crawl stream → dedup vs history → index the survivors) with
    every store converging under replay: all three writes are dynamic
    overwrites of the epoch's own ``ingest_batch`` partition.

    Requires a history built by :func:`write_hash_history_partitioned`
    (the ``ingest_batch`` partition column is what makes replayed
    epochs converge); raises otherwise rather than degrade to
    at-least-once silently.
    """
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.dedup import (
        incremental_exact_dedup,
    )

    index_args = (index_params, sigs_path, bands_table)
    if any(a is not None for a in index_args) and not all(
        a is not None for a in index_args
    ):
        raise ValueError(
            "index maintenance needs all of index_params, sigs_path, "
            "bands_table (or none)"
        )
    with_index = index_params is not None
    spark = stream_docs.sparkSession
    # catalog metadata, NOT spark.table(...): resolving the relation
    # here would pin a pre-stream file listing in the relation cache
    # (see stream_index_maintenance).
    table_cols = [c.name for c in spark.catalog.listColumns(history_table)]
    if "ingest_batch" not in table_cols:
        raise ValueError(
            f"{history_table} is not batch-partitioned; build it with "
            "write_hash_history_partitioned — a flat history cannot "
            "absorb replayed epochs idempotently"
        )
    if with_index and "ingest_batch" not in {
        c.name for c in spark.catalog.listColumns(bands_table)
    }:
        raise ValueError(
            f"{bands_table} is not batch-partitioned; build it with "
            "write_bands_bucketed(batch_partitioned=True) so index "
            "appends converge under replay like the other two stores"
        )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # everything runs on the micro-batch CLONE session: a conf set
        # on the outer session never reaches the clone executing the
        # writes, so "dynamic" would silently degrade to a static
        # (all-partition) overwrite
        s = batch_df.sparkSession
        s.catalog.refreshTable(history_table)
        hist = s.table(history_table).filter(
            F.col("ingest_batch") != F.lit(int(batch_id))
        )
        # the dedup result READS the history table; Spark (correctly)
        # refuses to overwrite a table that feeds the write's own plan,
        # so materialize the epoch's small result first and cut lineage
        new_rows = incremental_exact_dedup(
            batch_df, hist, id_col=id_col, text_col=text_col
        ).transform(materialize, eager=True)
        kept = batch_df.join(
            new_rows.withColumnRenamed("doc_id", id_col), id_col
        ).withColumn("ingest_batch", F.lit(int(batch_id)))
        prev = s.conf.get("spark.sql.sources.partitionOverwriteMode")
        s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            # history first: if the epoch dies between the writes, the
            # replay sees its own partition excluded from the reference
            # and overwrites BOTH stores — either order converges, this
            # one also keeps the invariant "every output row's hash is
            # in history" true at every instant for concurrent readers.
            (
                new_rows.withColumn("ingest_batch", F.lit(int(batch_id)))
                .select(*table_cols)
                .write.mode("overwrite")
                .insertInto(history_table)
            )
            (
                kept.write.mode("overwrite")
                .partitionBy("ingest_batch")
                .parquet(out_path)
            )
        finally:
            s.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        if with_index:
            from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import (
                append_to_index_exactly_once,
            )

            survivors = kept.select(F.col(id_col).alias("doc_id"), text_col)
            if not survivors.isEmpty():
                append_to_index_exactly_once(
                    survivors, int(batch_id), index_params, sigs_path, bands_table
                )

    writer = stream_docs.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint
    )
    return writer.trigger(**(trigger_kwargs or {"availableNow": True})).start()
