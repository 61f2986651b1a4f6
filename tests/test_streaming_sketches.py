"""Streaming sketch maintenance: batch/stream parity for CMS and HLL,
exactly-once across checkpoint restarts, and store compaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions import cms, hll
from finding_similar_high_dimensional_items_for_big_data_sets_spark.streaming import (
    sketches as SK,
)

D, W, P = 4, 32, 6


def _items(spark, rows):
    return spark.createDataFrame([(k,) for k in rows], "key string")


def _paths(tmp_path, tag):
    return (
        str(tmp_path / f"src_{tag}"),
        str(tmp_path / f"cms_{tag}"),
        str(tmp_path / f"hll_{tag}"),
        str(tmp_path / f"ckpt_{tag}"),
    )


def test_stream_sketches_match_batch_build(spark, tmp_path):
    src, cms_p, hll_p, ckpt = _paths(tmp_path, "a")
    rows_a = [f"k{i % 13}" for i in range(150)]
    rows_b = [f"k{i % 29}" for i in range(200)]
    _items(spark, rows_a).coalesce(1).write.mode("overwrite").parquet(src)
    _items(spark, rows_b).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("key string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    SK.stream_sketch_maintenance(
        stream, "key", cms_p, hll_p, d=D, width=W, p=P, checkpoint=ckpt
    ).awaitTermination(180)
    all_items = _items(spark, rows_a + rows_b)
    got_cms = sorted(map(tuple, SK.read_cms_sketch(spark, cms_p).collect()))
    want_cms = sorted(map(tuple, cms.cms_build(all_items, "key", D, W).collect()))
    assert got_cms == want_cms
    got_hll = sorted(map(tuple, SK.read_hll_sketch(spark, hll_p).collect()))
    want_hll = sorted(
        map(tuple, hll.hll_registers(all_items, "key", p=P).collect())
    )
    assert got_hll == want_hll


def test_stream_sketches_checkpoint_restart_exactly_once(spark, tmp_path):
    src, cms_p, hll_p, ckpt = _paths(tmp_path, "b")
    rows_a = [f"x{i % 7}" for i in range(100)]
    _items(spark, rows_a).coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("key string").parquet(src)
    SK.stream_sketch_maintenance(
        stream, "key", cms_p, hll_p, d=D, width=W, p=P, checkpoint=ckpt
    ).awaitTermination(120)
    # restart over the same checkpoint with one new file: the old file
    # must not be re-consumed, the new one must land exactly once
    rows_b = [f"y{i % 5}" for i in range(60)]
    _items(spark, rows_b).coalesce(1).write.mode("append").parquet(src)
    stream2 = spark.readStream.schema("key string").parquet(src)
    SK.stream_sketch_maintenance(
        stream2, "key", cms_p, hll_p, d=D, width=W, p=P, checkpoint=ckpt
    ).awaitTermination(120)
    all_items = _items(spark, rows_a + rows_b)
    got = sorted(map(tuple, SK.read_cms_sketch(spark, cms_p).collect()))
    want = sorted(map(tuple, cms.cms_build(all_items, "key", D, W).collect()))
    assert got == want
    # total mass check: every occurrence counted exactly once per row
    per_row = {
        r["d"]: r["s"]
        for r in SK.read_cms_sketch(spark, cms_p)
        .groupBy("d")
        .agg(F.sum("cnt").alias("s"))
        .collect()
    }
    assert all(v == len(rows_a) + len(rows_b) for v in per_row.values())


def test_compact_sketch_store_preserves_merged_view(spark, tmp_path):
    src, cms_p, hll_p, ckpt = _paths(tmp_path, "c")
    rows = [f"z{i % 11}" for i in range(120)]
    _items(spark, rows[:60]).coalesce(1).write.mode("overwrite").parquet(src)
    _items(spark, rows[60:]).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("key string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    SK.stream_sketch_maintenance(
        stream, "key", cms_p, hll_p, d=D, width=W, p=P, checkpoint=ckpt
    ).awaitTermination(180)
    before_cms = sorted(map(tuple, SK.read_cms_sketch(spark, cms_p).collect()))
    before_hll = sorted(map(tuple, SK.read_hll_sketch(spark, hll_p).collect()))
    SK.compact_sketch_store(spark, cms_p, "cms")
    SK.compact_sketch_store(spark, hll_p, "hll")
    assert sorted(map(tuple, SK.read_cms_sketch(spark, cms_p).collect())) == before_cms
    assert sorted(map(tuple, SK.read_hll_sketch(spark, hll_p).collect())) == before_hll
    # history folded to the single base partition
    batches = {
        r["ingest_batch"]
        for r in spark.read.parquet(cms_p).select("ingest_batch").distinct().collect()
    }
    assert batches == {SK.BASE_SKETCH_BATCH}
