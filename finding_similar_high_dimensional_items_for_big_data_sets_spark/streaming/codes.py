"""Streaming maintenance for the FLAT codes stores (PQ and OPQ) — the
fourth exactly-once index loop, completing the set the MinHash
(:mod:`.ingest`), IVF-PQ (:mod:`.semantic`), and lexical
(:mod:`.lexical`) stores already have.

Division of labor: the codec (codebooks, and for OPQ the rotation) is
TRAINED OFFLINE and pinned in the store sidecar at base-build time —
a streamed vector never retrains it (codes from two codecs are
incomparable under one ADC table). The loop's only job is coverage:
encode each micro-batch with the sidecar artifact and land the codes
under the epoch's own ``ingest_batch`` partition.

Exactly-once mechanics are inherited wholesale from the other loops:
the write is a dynamic partition OVERWRITE of the epoch's own
partition, so a checkpoint-loss replay overwrites its half-written
attempt instead of appending next to it; an epoch folded into the base
by :func:`..sources.tables.compact_pq_index` is dropped via the
absorbed-epoch watermark rather than re-landed. Plain
``append_pq_index`` / ``append_opq_index`` REFUSE a stream store, so
the two maintenance regimes cannot interleave.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import (
    read_store_meta,
)


def _epoch_absorbed(store_path: str, batch_id: int) -> bool:
    """Delegates to the one shared implementation in sources.tables —
    replay semantics must be identical across every epoch loop."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import (
        epoch_absorbed,
    )

    return epoch_absorbed(store_path, batch_id)


def stream_codes_ingest(
    stream_emb: DataFrame,
    store_path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trigger_kwargs: dict | None = None,
):
    """Start the flat-codes maintenance stream over a store laid down
    by :func:`..sources.tables.write_codes_stream_base`. Every epoch is
    encoded with the SIDECAR's codec (codebooks; rotation too for an
    OPQ store) — self-configuring, so a mismatched-quantizer landing
    cannot happen. Raises on a flat (non-batch-partitioned) store
    rather than degrade to at-least-once. Returns the StreamingQuery."""
    meta = read_store_meta(store_path)
    if meta.get("kind") not in ("pq", "opq"):
        raise ValueError(
            f"{store_path} is not a flat codes store "
            f"(kind={meta.get('kind')!r})"
        )
    if not meta.get("batch_partitioned"):
        raise ValueError(
            f"{store_path} is not batch-partitioned; build it with "
            "write_codes_stream_base — a flat store cannot absorb "
            "replayed epochs idempotently"
        )
    codebooks = meta["codebooks"]
    r_cols = meta.get("rotation_cols")

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if _epoch_absorbed(store_path, batch_id):
            return
        # conf must be set on the CLONE session foreachBatch hands us
        s = batch_df.sparkSession
        if r_cols is not None:
            from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.opq import (
                opq_encode,
            )

            encoded = opq_encode(
                batch_df, r_cols, codebooks, id_col, vec_col
            )
        else:
            from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.ann import (
                pq_encode,
            )

            encoded = pq_encode(batch_df, codebooks, id_col, vec_col)
        prev = s.conf.get("spark.sql.sources.partitionOverwriteMode")
        s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                encoded.withColumn("ingest_batch", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .partitionBy("ingest_batch")
                .parquet(store_path)
            )
        finally:
            s.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    writer = stream_emb.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint
    )
    return writer.trigger(**(trigger_kwargs or {"availableNow": True})).start()
