"""Streaming SEMANTIC ingest dedup: the embedding-side twin of
:mod:`.ingest` — a continuously-arriving embedding stream, deduped per
micro-batch against a persisted cell store (SemDeDup semantics:
cosine >= threshold within the same coarse-quantizer cell), with every
write converging under replay.

Per epoch: assign the micro-batch to cells (flat centroids or an
:class:`..operators.ann.HKMQuantizer`), drop batch vectors that have a
>= threshold neighbor in the cell store OR a smaller-id >= threshold
neighbor inside the batch (the deterministic greedy rule — order-free:
it depends on ids, never arrival order within the batch), land the
survivors under the epoch's ``ingest_batch`` partition, and add their
(vec_id, embedding, cell) rows to the cell store so later epochs (and
replays) dedup against them.

Exactly-once mechanics are inherited wholesale from the MinHash loop
(:func:`.ingest.stream_ingest_dedup`): both writes are dynamic
partition OVERWRITES of the epoch's own partition, and the dedup
reference excludes the epoch's own partition, so a replayed epoch
neither sees its half-written attempt as history nor appends next to
it.

The quantizer is part of the store's identity: every epoch must assign
with the SAME centroids/tree the store was built with (cells are only
comparable under one quantizer). Pin it next to the store exactly like
the LSH index pins its params in ``_index_meta``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.materialize import (
    materialize,
)
from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.arrays import (
    cosine_similarity,
)
from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import (
    BASE_INGEST_BATCH,
)


def _assign_cells(df: DataFrame, centroids, vec_col: str) -> DataFrame:
    """Cell assignment for either quantizer form: flat centroid list
    (exact argmin via ``ivf_assign``'s fold expression — bounded cell
    counts) or an HKMQuantizer (greedy tree descent — corpus-scaled
    cell counts)."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.ann import (
        HKMQuantizer,
        hkm_assign,
        ivf_assign,
    )

    if isinstance(centroids, HKMQuantizer):
        return hkm_assign(df, centroids, vec_col=vec_col, cell_col="cell")
    return ivf_assign(df, centroids, vec_col=vec_col)


def write_cell_store_partitioned(
    embeddings: DataFrame,
    table: str,
    centroids,
    num_buckets: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Base build of the batch-partitioned, cell-bucketed store that
    :func:`stream_semantic_ingest` maintains: (vec_id, embedding,
    cell) rows, initial corpus under :data:`BASE_INGEST_BATCH`.
    Bucketing by cell keeps the per-epoch within-cell join from
    exchanging the store side, no matter how many epochs it absorbs
    (bucketing is per-partition-consistent, same argument as the hash
    history)."""
    assigned = _assign_cells(
        embeddings.select(id_col, vec_col), centroids, vec_col
    )
    (
        assigned.withColumn("ingest_batch", F.lit(BASE_INGEST_BATCH))
        .write.mode("overwrite")
        .partitionBy("ingest_batch")
        .bucketBy(num_buckets, "cell")
        .sortBy("cell")
        .format("parquet")
        .saveAsTable(table)
    )


def semantic_new_rows(
    batch: DataFrame,
    history: DataFrame,
    centroids,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Genuinely-new vectors of an ingest batch against a cell-store
    history — the semantic twin of
    :func:`..operators.dedup.incremental_exact_dedup`, and the
    batch-mode core the stream sink applies per epoch (kept separate
    so batch/stream parity is testable).

    Greedy rule (deterministic, arrival-order-free): a batch vector is
    DROPPED iff it has a cosine >= ``threshold`` neighbor in its cell
    among (a) the history or (b) batch vectors with a SMALLER id.
    Unlike connected-components dedup this never revives a vector
    because its near-neighbor was itself dropped — the streaming
    trade: each decision is final the epoch it lands.

    ``history`` must carry (id, vec, cell) assigned under the SAME
    quantizer. Scale shape: the batch (small) is assigned and
    broadcast into the cell join; a cell-bucketed history never
    exchanges. Output: the batch's surviving rows + ``cell``.
    """
    assigned = _assign_cells(
        batch.select(id_col, vec_col), centroids, vec_col
    )
    hist = history.select(
        F.col(id_col).alias("__hid"),
        F.col(vec_col).alias("__hvec"),
        "cell",
    )
    # round(6) BEFORE the threshold compare: the shared boundary-
    # stability contract of the blocked-cosine family.
    hist_dup_ids = (
        hist.join(F.broadcast(assigned), "cell")
        .filter(
            F.round(cosine_similarity(F.col(vec_col), F.col("__hvec")), 6)
            >= threshold
        )
        .select(id_col)
        .distinct()
    )
    a = assigned.select(
        F.col(id_col).alias("__ida"), F.col(vec_col).alias("__va"), "cell"
    )
    b = assigned.select(
        F.col(id_col).alias(id_col), F.col(vec_col).alias("__vb"), "cell"
    )
    batch_dup_ids = (
        a.join(b, "cell")
        .filter(F.col("__ida") < F.col(id_col))
        .filter(
            F.round(cosine_similarity(F.col("__va"), F.col("__vb")), 6)
            >= threshold
        )
        .select(id_col)
        .distinct()
    )
    return assigned.join(
        hist_dup_ids.unionByName(batch_dup_ids).distinct(), id_col, "left_anti"
    )


def _epoch_absorbed(codes_path: str, batch_id: int) -> bool:
    """Delegates to the one shared implementation in sources.tables —
    replay semantics must be identical across every epoch loop."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import (
        epoch_absorbed,
    )

    return epoch_absorbed(codes_path, batch_id)


def write_ivfpq_stream_base(
    embeddings: DataFrame,
    codes_path: str,
    centroids,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    r_cols: list[list[float]] | None = None,
) -> None:
    """Base epoch of the SERVING codes store the ingest loop maintains:
    IVF-PQ codes of the initial corpus under partition
    ``ingest_batch=BASE_INGEST_BATCH / cell=<c>``, quantizers in the
    sidecar (same layout :func:`..operators.ann.ivfpq_topk_store`
    probes — the batch level adds exactly-once replay semantics, the
    cell level keeps directory pruning). Pass ``r_cols`` for an
    IVF-OPQ base instead: rotated-space residual codes with the
    rotation pinned alongside both quantizers
    (:func:`..operators.opq.ivfopq_topk_store` layout)."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import (
        _ivfopq_meta,
        _ivfpq_meta,
        _write_store_meta,
    )

    if r_cols is not None:
        from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.opq import (
            ivfopq_encode,
        )

        encoded = ivfopq_encode(
            embeddings.select(id_col, vec_col), r_cols, centroids,
            codebooks, id_col, vec_col,
        )
        meta = _ivfopq_meta(r_cols, centroids, codebooks)
    else:
        from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.ann import (
            ivfpq_encode,
        )

        encoded = ivfpq_encode(
            embeddings.select(id_col, vec_col), centroids, codebooks,
            id_col, vec_col,
        )
        meta = _ivfpq_meta(centroids, codebooks)
    # mark the store stream-maintained: plain append_ivfpq_index /
    # append_ivfopq_index refuse it (they write at cell-only depth,
    # which would leave the directory tree unreadable)
    meta["batch_partitioned"] = True
    (
        encoded.withColumn("ingest_batch", F.lit(BASE_INGEST_BATCH))
        .write.mode("overwrite")
        .partitionBy("ingest_batch", "cell")
        .parquet(codes_path)
    )
    _write_store_meta(codes_path, meta)


def stream_semantic_ingest(
    stream_emb: DataFrame,
    cell_store_table: str,
    out_path: str,
    checkpoint: str,
    centroids,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trigger_kwargs: dict | None = None,
    pq_codebooks: list[list[list[float]]] | None = None,
    codes_path: str | None = None,
    pq_r_cols: list[list[float]] | None = None,
):
    """Start the semantic ingest-dedup stream. Survivors (id, vec,
    cell) land under ``out_path`` partitioned by ``ingest_batch``;
    the same rows join ``cell_store_table`` so later epochs and
    replays dedup against them. Exactly-once: both writes are dynamic
    overwrites of the epoch's own partition and the store reference
    excludes that partition — identical replay-convergence argument
    (and the same crash-between-writes analysis) as
    :func:`.ingest.stream_ingest_dedup`.

    Requires a store built by :func:`write_cell_store_partitioned`
    (raises on a flat store rather than degrade to at-least-once),
    assigned with the SAME ``centroids``.

    Pass ``pq_codebooks`` + ``codes_path`` (base laid down by
    :func:`write_ivfpq_stream_base`) to ALSO land each epoch's
    survivors in the IVF-PQ serving index — the embedding twin of the
    MinHash loop's survivors-feed-the-LSH-index step. Codes are
    derived deterministically from the survivor rows (same quantizer
    ⇒ same cell; residual argmin is pure), and the epoch's
    ``ingest_batch`` partition is dynamically overwritten, so the
    codes store converges under replay exactly like the other two
    writes. With ``pq_r_cols`` the serving index is IVF-OPQ instead
    (base laid down by :func:`write_ivfpq_stream_base` with
    ``r_cols``): each epoch's survivors are rotated with the pinned
    rotation before the residual encode — the rotation never retrains
    mid-stream, same contract as :mod:`.codes`.
    """
    if (pq_codebooks is None) != (codes_path is None):
        raise ValueError(
            "pq_codebooks and codes_path must be passed together"
        )
    if pq_r_cols is not None and pq_codebooks is None:
        raise ValueError("pq_r_cols requires pq_codebooks and codes_path")
    if codes_path is not None:
        # the codes store's sidecar pins the codec; a stream started
        # with a different rotation/centroids/codebooks would land
        # codes the store's own query path cannot read (garbage ADC
        # distances, silently) — refuse up front, like the append guard
        from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import (
            _check_store_meta,
            _ivfopq_meta,
            _ivfpq_meta,
        )

        if pq_r_cols is not None:
            _check_store_meta(
                codes_path, _ivfopq_meta(pq_r_cols, centroids, pq_codebooks)
            )
        else:
            _check_store_meta(
                codes_path, _ivfpq_meta(centroids, pq_codebooks)
            )
    spark = stream_emb.sparkSession
    table_cols = [c.name for c in spark.catalog.listColumns(cell_store_table)]
    if "ingest_batch" not in table_cols:
        raise ValueError(
            f"{cell_store_table} is not batch-partitioned; build it with "
            "write_cell_store_partitioned — a flat store cannot absorb "
            "replayed epochs idempotently"
        )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        s = batch_df.sparkSession
        s.catalog.refreshTable(cell_store_table)
        hist = s.table(cell_store_table).filter(
            F.col("ingest_batch") != F.lit(int(batch_id))
        )
        # the survivors READ the store; materialize + cut lineage
        # before overwriting it (same self-read rule as the hash loop)
        new_rows = semantic_new_rows(
            batch_df, hist, centroids, threshold, id_col, vec_col
        ).transform(materialize, eager=True)
        stamped = new_rows.withColumn("ingest_batch", F.lit(int(batch_id)))
        prev = s.conf.get("spark.sql.sources.partitionOverwriteMode")
        s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            # store first: keeps "every published survivor is in the
            # store" true at every instant; either order converges
            stamped.select(*table_cols).write.mode("overwrite").insertInto(
                cell_store_table
            )
            (
                stamped.write.mode("overwrite")
                .partitionBy("ingest_batch")
                .parquet(out_path)
            )
            if codes_path is not None and not _epoch_absorbed(
                codes_path, batch_id
            ):
                if pq_r_cols is not None:
                    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.opq import (
                        ivfopq_encode,
                    )

                    epoch_codes = ivfopq_encode(
                        stamped.select(id_col, vec_col), pq_r_cols,
                        centroids, pq_codebooks, id_col, vec_col,
                    )
                else:
                    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.ann import (
                        ivfpq_encode,
                    )

                    epoch_codes = ivfpq_encode(
                        stamped.select(id_col, vec_col), centroids,
                        pq_codebooks, id_col, vec_col,
                    )
                (
                    epoch_codes
                    .withColumn("ingest_batch", F.lit(int(batch_id)))
                    .write.mode("overwrite")
                    .partitionBy("ingest_batch", "cell")
                    .parquet(codes_path)
                )
        finally:
            s.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    writer = stream_emb.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint
    )
    return writer.trigger(**(trigger_kwargs or {"availableNow": True})).start()
