"""Stateful streaming ops (streaming/stateful.py): cross-micro-batch
semantics driven through a real file-source streaming query, two
explicit micro-batches."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.streaming import stateful

SCHEMA = "doc_id long, content_hash string, text string"


def _write_batch(spark, path, rows, name):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(path, name))


@pytest.fixture()
def stream_dirs(tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    return src, ckpt


def test_first_seen_dedup_across_microbatches(spark, stream_dirs):
    src, ckpt = stream_dirs
    # batch 1: key A twice (docs 2, 1 -> keep 1), key B once
    _write_batch(
        spark,
        src,
        [(2, "A", "a-copy"), (1, "A", "a-orig"), (10, "B", "b")],
        "b1",
    )
    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src + "/*")
    q = (
        stateful.first_seen(stream, ["content_hash"], "doc_id")
        .writeStream.format("memory")
        .queryName("first_seen_t")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["content_hash"]: r["doc_id"]
            for r in spark.sql("select * from first_seen_t").collect()
        }
        assert got == {"A": 1, "B": 10}

        # batch 2: A again (must NOT re-emit), new key C
        _write_batch(spark, src, [(99, "A", "a-late"), (7, "C", "c")], "b2")
        q.processAllAvailable()
        rows = spark.sql("select * from first_seen_t").collect()
        got = [(r["content_hash"], r["doc_id"]) for r in rows]
        assert sorted(got) == [("A", 1), ("B", 10), ("C", 7)]  # A once, batch-1 row
    finally:
        q.stop()


def test_running_topk_improves_across_microbatches(spark, stream_dirs):
    src, ckpt = stream_dirs
    scored_schema = "query_id long, doc_id long, score double"
    spark.createDataFrame(
        [(1, 100, 0.5), (1, 101, 0.9), (1, 102, 0.7)], scored_schema
    ).coalesce(1).write.mode("overwrite").parquet(src + "/b1")

    stream = spark.readStream.schema(scored_schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src + "/*")
    q = (
        stateful.running_topk(stream, k=2)
        .writeStream.format("memory")
        .queryName("topk_t")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        latest = {
            r["rank"]: r["doc_id"]
            for r in spark.sql(
                "select * from topk_t"
            ).collect()
        }
        assert latest == {1: 101, 2: 102}

        # batch 2: a better candidate arrives -> refreshed top-2
        spark.createDataFrame([(1, 103, 0.95)], scored_schema).coalesce(
            1
        ).write.mode("overwrite").parquet(src + "/b2")
        q.processAllAvailable()
        rows = spark.sql("select * from topk_t").collect()
        # memory sink in update mode appends refreshed rows; the LAST
        # emission for query 1 is the current truth
        assert {r["rank"]: r["doc_id"] for r in rows[-2:]} == {1: 103, 2: 101}
    finally:
        q.stop()


def test_first_seen_batch_parity_with_exact_dedup(spark):
    """The stateful op's one-batch semantics == deterministic batch
    first-seen (min doc_id per key)."""
    df = spark.createDataFrame(
        [(5, "X", "x1"), (3, "X", "x2"), (9, "Y", "y")], SCHEMA
    )
    batch_first = (
        df.groupBy("content_hash")
        .agg(F.min("doc_id").alias("doc_id"))
        .collect()
    )
    assert {(r["content_hash"], r["doc_id"]) for r in batch_first} == {
        ("X", 3),
        ("Y", 9),
    }
