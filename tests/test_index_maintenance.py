"""Index lifecycle hardening: crash-safe compaction swap, cross-table
consistency validation, and replay-idempotent (exactly-once) appends
for the batch-partitioned index layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.config import MinHashParams
from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import lsh, minhash
from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources import tables as T

PARAMS = MinHashParams()


@pytest.fixture(scope="module")
def corpus(spark):
    docs = T.load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    sigs = minhash.signatures(docs, PARAMS).cache()
    sigs.count()
    return docs, sigs


def _probe(spark, sigs, bands_table, qdoc=13, k=10):
    qdf = sigs.filter(F.col("doc_id") == qdoc).select(
        F.col("doc_id").alias("query_id"), "sig"
    )
    return sorted(
        map(
            tuple,
            lsh.lsh_topk(
                sigs, spark.table(bands_table), qdf, PARAMS, k=k, n_queries=1
            ).collect(),
        )
    )


def test_compact_swap_failure_restores_table(spark, corpus, monkeypatch):
    """A failure on the rename-in step must leave the ORIGINAL table
    servable under its original name (the old DROP-then-RENAME order
    left no table at all)."""
    _docs, sigs = corpus
    table = "t_swapfail_idx"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        T.write_bands_bucketed(lsh.bands_table(sigs, PARAMS), table, num_buckets=4)
        before = _probe(spark, sigs, table)
        n_before = spark.table(table).count()

        real_sql = spark.sql

        def failing_sql(stmt, *a, **kw):
            if stmt.startswith(f"ALTER TABLE {table}__compact_tmp RENAME TO"):
                raise RuntimeError("injected failure between the two renames")
            return real_sql(stmt, *a, **kw)

        monkeypatch.setattr(spark, "sql", failing_sql)
        with pytest.raises(RuntimeError, match="injected failure"):
            T.compact_index(spark, table)
        monkeypatch.undo()

        # the original name must still resolve to the full index
        assert spark.catalog.tableExists(table)
        assert spark.table(table).count() == n_before
        assert _probe(spark, sigs, table) == before
    finally:
        for t in (table, f"{table}__compact_tmp", f"{table}__compact_old"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_recover_compact_swap_after_process_death(spark, corpus):
    """If the process dies between the two renames, recovery must
    re-register the surviving copy under the original name (preferring
    the completed compacted copy)."""
    _docs, sigs = corpus
    table = "t_recover_idx"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        T.write_bands_bucketed(lsh.bands_table(sigs, PARAMS), table, num_buckets=4)
        assert T.recover_compact_swap(spark, table) is False  # healthy: no-op
        before = _probe(spark, sigs, table)

        # reproduce the mid-swap state: compacted copy under __compact_tmp,
        # original renamed aside, nothing under the serving name
        spark.table(table).write.mode("overwrite").bucketBy(
            4, "band_id", "band_hash"
        ).sortBy("band_id", "band_hash").format("parquet").saveAsTable(
            f"{table}__compact_tmp"
        )
        spark.sql(f"ALTER TABLE {table} RENAME TO {table}__compact_old")
        assert not spark.catalog.tableExists(table)

        assert T.recover_compact_swap(spark, table) is True
        assert _probe(spark, sigs, table) == before
    finally:
        for t in (table, f"{table}__compact_tmp", f"{table}__compact_old"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_validate_index_detects_partial_append(spark, corpus, tmp_path):
    _docs, sigs = corpus
    table = "t_validate_idx"
    sigs_p = str(tmp_path / "sigs")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        half = sigs.filter(F.col("doc_id") % 2 == 0)
        half.write.mode("overwrite").parquet(sigs_p)
        T.write_bands_bucketed(lsh.bands_table(half, PARAMS), table, num_buckets=4)
        T.validate_index(spark, sigs_p, table)  # consistent: no raise

        # bands-without-sigs (the bands-first crash window): loud
        orphan = lsh.bands_table(
            sigs.filter(F.col("doc_id") % 2 == 1).limit(1), PARAMS
        )
        orphan.write.mode("append").format("parquet").bucketBy(
            4, "band_id", "band_hash"
        ).sortBy("band_id", "band_hash").saveAsTable(table)
        with pytest.raises(ValueError, match="no\nsignature|no signature"):
            T.validate_index(spark, sigs_p, table)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_exactly_once_append_replay_is_idempotent(spark, corpus, tmp_path):
    """Replaying a micro-batch (foreachBatch's at-least-once failure
    mode) against the batch-partitioned layout must converge to the
    same index — including when the partition holds a PARTIAL previous
    attempt."""
    docs, sigs = corpus
    table = "t_eo_idx"
    sigs_p = str(tmp_path / "sigs_eo")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        base_sigs = sigs.filter(F.col("doc_id") % 2 == 0)
        new_docs = docs.filter(F.col("doc_id") % 2 == 1)
        T.write_sigs_batch_partitioned(base_sigs, sigs_p)
        T.write_bands_bucketed(
            lsh.bands_table(base_sigs, PARAMS),
            table,
            num_buckets=4,
            batch_partitioned=True,
        )

        # simulate a PARTIAL earlier attempt of batch 5: garbage rows
        # already sitting in its bands partition
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        garbage = spark.createDataFrame(
            [(999_999, 0, 123456789, 5)],
            "doc_id long, band_id int, band_hash long, ingest_batch int",
        )
        garbage.select(*spark.table(table).columns).write.mode(
            "overwrite"
        ).insertInto(table)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        assert spark.table(table).filter(F.col("doc_id") == 999_999).count() == 1

        T.append_to_index_exactly_once(new_docs, 5, PARAMS, sigs_p, table)
        first_sigs = spark.read.parquet(sigs_p).count()
        first_bands = spark.table(table).count()
        # garbage from the partial attempt is gone (partition overwritten)
        assert spark.table(table).filter(F.col("doc_id") == 999_999).count() == 0

        # replay the SAME batch: nothing changes
        T.append_to_index_exactly_once(new_docs, 5, PARAMS, sigs_p, table)
        assert spark.read.parquet(sigs_p).count() == first_sigs
        assert spark.table(table).count() == first_bands

        sigs_all = spark.read.parquet(sigs_p).select("doc_id", "sig")
        assert sigs_all.select("doc_id").distinct().count() == docs.count()
        # probe-identical to a from-scratch batch build
        got = _probe(spark, sigs_all, table)
        bands_full = lsh.bands_table(sigs, PARAMS)
        qdf = sigs.filter(F.col("doc_id") == 13).select(
            F.col("doc_id").alias("query_id"), "sig"
        )
        expect = sorted(
            map(
                tuple,
                lsh.lsh_topk(sigs, bands_full, qdf, PARAMS, k=10, n_queries=1).collect(),
            )
        )
        assert [t[:3] for t in got] == [t[:3] for t in expect]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_exactly_once_append_rejects_flat_table_and_base_batch(
    spark, corpus, tmp_path
):
    docs, sigs = corpus
    table = "t_eo_guard_idx"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        T.write_bands_bucketed(lsh.bands_table(sigs, PARAMS), table, num_buckets=4)
        with pytest.raises(ValueError, match="not batch-partitioned"):
            T.append_to_index_exactly_once(
                docs.limit(1), 0, PARAMS, str(tmp_path / "s"), table
            )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"DROP TABLE IF EXISTS {table}2")
    try:
        T.write_bands_bucketed(
            lsh.bands_table(sigs, PARAMS), f"{table}2", num_buckets=4,
            batch_partitioned=True,
        )
        with pytest.raises(ValueError, match="batch_id must be >= 0"):
            T.append_to_index_exactly_once(
                docs.limit(1), -1, PARAMS, str(tmp_path / "s2"), f"{table}2"
            )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}2")


def test_stream_maintenance_uses_exactly_once_on_partitioned_layout(
    spark, corpus, tmp_path
):
    """stream_index_maintenance must route micro-batches through the
    idempotent partition-overwrite sink when the index is
    batch-partitioned: epochs land in their own ingest_batch
    partitions and the final index is probe-identical to a batch
    build."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.streaming import (
        queries as SQ,
    )

    docs, sigs = corpus
    table = "t_eo_stream_idx"
    sigs_p = str(tmp_path / "sigs_eos")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        half_a = sigs.filter(F.col("doc_id") % 2 == 0)
        half_b = docs.filter(F.col("doc_id") % 2 == 1)
        T.write_sigs_batch_partitioned(half_a, sigs_p)
        T.write_bands_bucketed(
            lsh.bands_table(half_a, PARAMS), table, num_buckets=4,
            batch_partitioned=True,
        )
        src = str(tmp_path / "src_eos")
        half_b.repartition(2).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(half_b.schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        SQ.stream_index_maintenance(
            stream, PARAMS, sigs_p, table, str(tmp_path / "ckpt_eos")
        ).awaitTermination(180)

        batches = sorted(
            r["ingest_batch"]
            for r in spark.table(table).select("ingest_batch").distinct().collect()
        )
        assert batches[0] == T.BASE_INGEST_BATCH and len(batches) >= 2

        sigs_all = spark.read.parquet(sigs_p).select("doc_id", "sig")
        assert sigs_all.select("doc_id").distinct().count() == docs.count()
        got = _probe(spark, sigs_all, table)
        bands_full = lsh.bands_table(sigs, PARAMS)
        qdf = sigs.filter(F.col("doc_id") == 13).select(
            F.col("doc_id").alias("query_id"), "sig"
        )
        expect = sorted(
            map(
                tuple,
                lsh.lsh_topk(sigs, bands_full, qdf, PARAMS, k=10, n_queries=1).collect(),
            )
        )
        assert [t[:3] for t in got] == [t[:3] for t in expect]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_compact_batch_partitioned_folds_history_into_base(spark, corpus, tmp_path):
    """Compacting a batch-partitioned index folds every epoch into the
    BASE_INGEST_BATCH partition while keeping probes identical."""
    docs, sigs = corpus
    table = "t_eo_compact_idx"
    sigs_p = str(tmp_path / "sigs_cp")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        base_sigs = sigs.filter(F.col("doc_id") % 3 == 0)
        T.write_sigs_batch_partitioned(base_sigs, sigs_p)
        T.write_bands_bucketed(
            lsh.bands_table(base_sigs, PARAMS), table, num_buckets=4,
            batch_partitioned=True,
        )
        T.append_to_index_exactly_once(
            docs.filter(F.col("doc_id") % 3 == 1), 0, PARAMS, sigs_p, table
        )
        T.append_to_index_exactly_once(
            docs.filter(F.col("doc_id") % 3 == 2), 1, PARAMS, sigs_p, table
        )
        sigs_all = spark.read.parquet(sigs_p).select("doc_id", "sig")
        before = _probe(spark, sigs_all, table)
        n_before = spark.table(table).count()

        T.compact_index(spark, table)
        assert spark.table(table).count() == n_before
        batches = [
            r["ingest_batch"]
            for r in spark.table(table).select("ingest_batch").distinct().collect()
        ]
        assert batches == [T.BASE_INGEST_BATCH]
        assert _probe(spark, sigs_all, table) == before
    finally:
        for t in (table, f"{table}__compact_tmp", f"{table}__compact_old"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_serving_export_raises_on_orphan_band_ids(spark, corpus):
    """Bands-without-sigs (the append crash window) must fail LOUDLY at
    serving export, not silently map to another document's row."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.serving import (
        ServingIndex,
    )

    _docs, sigs = corpus
    half = sigs.filter(F.col("doc_id") % 2 == 0)
    bands = lsh.bands_table(sigs, PARAMS)  # bands over ALL docs
    with pytest.raises(ValueError, match="no signature row"):
        ServingIndex.from_dataframes(half, bands, PARAMS)


def test_compact_preserves_shard_partitioned_layout(spark, corpus):
    """Compacting a SHARD-partitioned serving index must keep the
    partition layout (replica export pruning depends on it) and the
    table's contents."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.serving import (
        ServingIndex,
    )

    _docs, sigs = corpus
    table = "t_shard_compact_idx"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        T.write_bands_sharded(lsh.bands_table(sigs, PARAMS), table, 2, num_buckets=4)
        n_before = spark.table(table).count()
        before = _probe(spark, sigs, table)
        T.compact_index(spark, table)
        assert spark.table(table).count() == n_before
        part_cols = [
            c.name for c in spark.catalog.listColumns(table) if c.isPartition
        ]
        assert part_cols == ["shard"]
        shards = sorted(
            r["shard"] for r in spark.table(table).select("shard").distinct().collect()
        )
        assert shards == [0, 1]
        assert _probe(spark, sigs, table) == before
    finally:
        for t in (table, f"{table}__compact_tmp", f"{table}__compact_old"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_exactly_once_append_rejects_flat_sigs_store(spark, corpus, tmp_path):
    docs, sigs = corpus
    table = "t_eo_flats_idx"
    sigs_p = str(tmp_path / "flat_sigs")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        sigs.write.mode("overwrite").parquet(sigs_p)  # FLAT layout
        T.write_bands_bucketed(
            lsh.bands_table(sigs, PARAMS), table, num_buckets=4,
            batch_partitioned=True,
        )
        with pytest.raises(ValueError, match="flat signature store"):
            T.append_to_index_exactly_once(docs.limit(1), 0, PARAMS, sigs_p, table)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_delete_from_index_removes_ids_from_both_halves(spark, corpus, tmp_path):
    """Deleted doc_ids disappear from probes AND from the signature
    store; the bucket layout and everything else survives."""
    _docs, sigs = corpus
    table = "t_delete_idx"
    sigs_path = str(tmp_path / "sigs_del")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        T.write_bands_bucketed(lsh.bands_table(sigs, PARAMS), table, num_buckets=4)
        sigs.write.parquet(sigs_path)
        victims = [13, 14, 15]
        assert any(r[1] == 13 for r in _probe(spark, sigs, table, qdoc=13))

        T.delete_from_index(spark, victims, sigs_path, table)

        left_sigs = spark.read.parquet(sigs_path)
        assert left_sigs.filter(F.col("doc_id").isin(victims)).count() == 0
        band_ids = {r["doc_id"] for r in spark.table(table).select("doc_id").distinct().collect()}
        assert not band_ids & set(victims)
        # probing with a surviving query no longer surfaces the victims
        res = _probe(spark, left_sigs, table, qdoc=20)
        assert res and not {r[1] for r in res} & set(victims)
        # layout preserved: appends still accept the bucketed spec
        T.validate_index(spark, sigs_path, table)
        # a DataFrame of ids works too, and re-running converges (no-op)
        T.delete_from_index(
            spark,
            spark.createDataFrame([(13,)], "doc_id bigint"),
            sigs_path,
            table,
        )
        T.validate_index(spark, sigs_path, table)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_delete_preserves_batch_partitioned_layout(spark, corpus, tmp_path):
    """On the exactly-once (ingest_batch-partitioned) layout, deletion
    keeps the partition column on both halves so streaming appends keep
    working afterwards."""
    docs, sigs = corpus
    table = "t_delete_part_idx"
    sigs_path = str(tmp_path / "sigs_del_part")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        T.write_bands_bucketed(
            lsh.bands_table(sigs, PARAMS), table, num_buckets=4, batch_partitioned=True
        )
        T.write_sigs_batch_partitioned(sigs, sigs_path)
        T.append_to_index_exactly_once(
            docs.filter(F.col("doc_id") < 3).select(
                (F.col("doc_id") + 10_000).alias("doc_id"), "text"
            ),
            0,
            PARAMS,
            sigs_path,
            table,
        )
        T.delete_from_index(spark, [10_000, 5], sigs_path, table)
        left = spark.read.parquet(sigs_path)
        assert "ingest_batch" in left.columns
        assert left.filter(F.col("doc_id").isin([10_000, 5])).count() == 0
        assert spark.table(table).filter(F.col("doc_id").isin([10_000, 5])).count() == 0
        # appends after the delete still go through the exactly-once path
        T.append_to_index_exactly_once(
            docs.filter(F.col("doc_id") == 7).select(
                (F.col("doc_id") + 20_000).alias("doc_id"), "text"
            ),
            1,
            PARAMS,
            sigs_path,
            table,
        )
        T.validate_index(spark, sigs_path, table)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_recover_sigs_swap_after_process_death(spark, corpus, tmp_path):
    """Both death windows of the signature-directory swap heal: tmp
    complete + live missing -> tmp renamed in; only old left -> old
    renamed back; healthy store -> no-op."""
    import os

    _docs, sigs = corpus
    sigs_path = str(tmp_path / "sigs_recover")
    sigs.write.parquet(sigs_path)
    n = spark.read.parquet(sigs_path).count()
    assert T.recover_sigs_swap(sigs_path) is False  # healthy

    # death after rename-aside, before rename-in (tmp complete)
    tmp = sigs_path + "__delete_tmp"
    old = sigs_path + "__delete_old"
    sigs.filter(F.col("doc_id") != 13).write.parquet(tmp)
    os.rename(sigs_path, old)
    assert T.recover_sigs_swap(sigs_path) is True
    assert spark.read.parquet(sigs_path).count() == n - 1

    # death before the tmp write finished (only old survives).
    # recovery leaves the set-aside copy in place (the next delete
    # clears it) — drop it before simulating the second death.
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    os.rename(sigs_path, old)
    assert T.recover_sigs_swap(sigs_path) is True
    assert spark.read.parquet(sigs_path).count() == n - 1


def test_recover_compact_swap_stale_old_partitions_never_alias_live(
    spark, corpus
):
    """The ADVICE-flagged booby trap: a death between the rename-aside
    and _sync_partitions(old) leaves __compact_old's per-partition
    catalog locations pointing at the ORIGINAL table path — exactly
    where recovery renames the compacted copy. Recovery must re-sync
    (then drop) the set-aside copy so no later DROP can reach through
    stale locations and delete the live table's partition directories.
    """
    docs, sigs = corpus
    table = "t_recover_stale_idx"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        T.write_bands_bucketed(
            lsh.bands_table(sigs, PARAMS), table, num_buckets=4,
            batch_partitioned=True,
        )
        n_before = spark.table(table).count()
        before = _probe(spark, sigs, table)

        # compacted copy complete under __compact_tmp (same layout)
        spark.table(table).write.mode("overwrite").partitionBy(
            "ingest_batch"
        ).bucketBy(4, "band_id", "band_hash").sortBy(
            "band_id", "band_hash"
        ).format("parquet").saveAsTable(f"{table}__compact_tmp")
        # death IMMEDIATELY after the rename-aside: old's partition
        # locations still point at the original (soon-to-be-live) path
        spark.sql(f"ALTER TABLE {table} RENAME TO {table}__compact_old")

        assert T.recover_compact_swap(spark, table) is True
        # recovery completed the whole swap: old is gone, live is whole
        assert not spark.catalog.tableExists(f"{table}__compact_old")
        assert not spark.catalog.tableExists(f"{table}__compact_tmp")
        assert spark.table(table).count() == n_before
        assert _probe(spark, sigs, table) == before

        # the next maintenance cycle's defensive drops must be harmless
        spark.sql(f"DROP TABLE IF EXISTS {table}__compact_old")
        spark.sql(f"DROP TABLE IF EXISTS {table}__compact_tmp")
        spark.catalog.refreshTable(table)
        assert spark.table(table).count() == n_before

        # and a full follow-up compaction still works end-to-end
        T.compact_index(spark, table)
        assert spark.table(table).count() == n_before
        assert _probe(spark, sigs, table) == before
    finally:
        for t in (table, f"{table}__compact_tmp", f"{table}__compact_old"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_recover_compact_swap_drops_lingering_old_when_healthy(spark, corpus):
    """Death between the tmp rename-in and the final DROP: the live
    table is healthy but a superseded __compact_old lingers. Recovery
    must finish the job (sync + drop the leftover) without touching
    live data."""
    _docs, sigs = corpus
    table = "t_recover_linger_idx"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        T.write_bands_bucketed(
            lsh.bands_table(sigs, PARAMS), table, num_buckets=4,
            batch_partitioned=True,
        )
        n_before = spark.table(table).count()
        # a synced set-aside copy, as the normal flow leaves it
        spark.table(table).write.mode("overwrite").partitionBy(
            "ingest_batch"
        ).bucketBy(4, "band_id", "band_hash").sortBy(
            "band_id", "band_hash"
        ).format("parquet").saveAsTable(f"{table}__compact_old")

        assert T.recover_compact_swap(spark, table) is True
        assert not spark.catalog.tableExists(f"{table}__compact_old")
        spark.catalog.refreshTable(table)
        assert spark.table(table).count() == n_before
        # idempotent: second run is a no-op
        assert T.recover_compact_swap(spark, table) is False
    finally:
        for t in (table, f"{table}__compact_old"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
