"""Distributed Bloom filter + incremental ingest dedup: membership
guarantees, false-positive sanity, exactness with the prefilter on,
and the bucketed-history shuffle contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions import bloom
from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.hashing import (
    portable_hash64,
)
from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import dedup
from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import (
    write_content_hashes_bucketed,
)


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    n = 5000
    keys = spark.range(n).select(F.xxhash64("id").alias("k")).repartition(7)
    n_bits, n_hashes = bloom.optimal_params(n, 0.01)
    bits = bloom.build_bloom(keys, "k", n_bits, n_hashes)
    mc = bloom.might_contain(spark, bits, n_hashes)
    members = spark.range(n).select(F.xxhash64("id").alias("k"))
    assert members.filter(~mc(F.col("k"))).count() == 0  # never a false negative
    non = spark.range(10_000_000, 10_020_000).select(F.xxhash64("id").alias("k"))
    fp = non.filter(mc(F.col("k"))).count() / 20_000
    assert fp < 0.03, fp


def test_bloom_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        bloom.build_bloom(spark.range(1), "id", 1000, 3)  # not a power of two
    with pytest.raises(ValueError):
        bloom.optimal_params(10, 1.5)
    with pytest.raises(ValueError):
        bloom.might_contain(spark, b"abc", 3)  # 24 bits: not a power of two


def test_bloom_build_is_partitioning_invariant(spark):
    keys = spark.range(2000).select(F.xxhash64("id").alias("k"))
    a = bloom.build_bloom(keys.repartition(1), "k", 1 << 14, 5)
    b = bloom.build_bloom(keys.repartition(13), "k", 1 << 14, 5, fan_in=4)
    assert a == b


def _hashes(df):
    return df.select(
        portable_hash64(dedup.normalize_text(F.col("text"))).alias("content_hash")
    )


def test_incremental_dedup_semantics_with_and_without_bloom(spark):
    history = spark.createDataFrame(
        [(i, f"old doc {i}") for i in range(100)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (1000, "new doc a"),
            (1001, "new doc a"),        # within-batch dup -> keep 1000 only
            (1002, "OLD DOC 7  "),      # normalized-equal to history -> dropped
            (1003, "new doc b"),
        ],
        "doc_id long, text string",
    )
    hh = _hashes(history)
    expected = {1000, 1003}
    plain = dedup.incremental_exact_dedup(batch, hh)
    assert {r["doc_id"] for r in plain.collect()} == expected
    n_bits, n_hashes = bloom.optimal_params(100, 0.01)
    bits = bloom.build_bloom(hh, "content_hash", n_bits, n_hashes)
    with_bloom = dedup.incremental_exact_dedup(
        batch, hh, bloom_bits=bits, bloom_hashes=n_hashes
    )
    assert {r["doc_id"] for r in with_bloom.collect()} == expected


def test_incremental_dedup_bucketed_history_avoids_history_shuffle(spark, tmp_path):
    history = spark.createDataFrame(
        [(i, f"old doc {i}") for i in range(200)], "doc_id long, text string"
    )
    hashed = history.select(
        "doc_id",
        portable_hash64(dedup.normalize_text(F.col("text"))).alias("content_hash"),
    )
    spark.sql("DROP TABLE IF EXISTS test_hash_history")
    # a crashed earlier run may leave the managed location behind with
    # no catalog entry; saveAsTable refuses to claim an existing path
    import shutil

    shutil.rmtree(
        spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        + "/test_hash_history",
        ignore_errors=True,
    )
    write_content_hashes_bucketed(hashed, "test_hash_history", num_buckets=8)
    batch = spark.createDataFrame(
        [(1000 + i, f"new doc {i}") for i in range(20)] + [(2000, "old doc 3")],
        "doc_id long, text string",
    )
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        hist = spark.table("test_hash_history")
        out = dedup.incremental_exact_dedup(batch, hist)
        assert {r["doc_id"] for r in out.collect()} == {1000 + i for i in range(20)}
        # a 100 TB history is far past any broadcast threshold — force
        # the sort-merge regime the bucketing exists for
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = dedup.incremental_exact_dedup(batch, hist)
        assert {r["doc_id"] for r in out.collect()} == {1000 + i for i in range(20)}
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        # the bucketed history enters the anti join WITHOUT its own
        # exchange: nothing between the join and the history scan but
        # sort/filter (any batch-side re-bucketing shuffles only the
        # small side)
        lines = plan.splitlines()
        idx = next(
            i for i, l in enumerate(lines) if "FileScan" in l and "test_hash_history" in l
        )
        assert not any("Exchange" in l for l in lines[max(0, idx - 3) : idx]), lines[
            max(0, idx - 3) : idx
        ]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS test_hash_history")


def test_bloom_null_keys_build_and_probe(spark):
    # nulls in the build are skipped; nulls at probe report "maybe"
    # (True) so they fall through to the exact verify join
    keys = spark.createDataFrame(
        [(1,), (None,), (2,)], "k long"
    )
    bits = bloom.build_bloom(keys, "k", 1 << 10, 3)
    mc = bloom.might_contain(spark, bits, 3)
    got = {
        (r["k"], r["m"])
        for r in keys.select("k", mc(F.col("k")).alias("m")).collect()
    }
    assert (1, True) in got and (2, True) in got and (None, True) in got


def test_bloom_large_keys_with_null_in_same_batch_keep_precision(spark):
    # Arrow hands a long column with any null to pandas as float64;
    # an int64 round-trip through float64 rounds 60-bit keys. Both the
    # build and the probe must keep exact keys even when nulls share
    # the batch: a member key > 2^53 must never probe negative.
    big = [(576460752315769165 + i,) for i in range(50)]  # ~2^59, odd lsbs
    keys = spark.createDataFrame(big + [(None,)], "k long").coalesce(1)
    bits = bloom.build_bloom(keys, "k", 1 << 12, 4)
    mc = bloom.might_contain(spark, bits, 4)
    got = keys.select("k", mc(F.col("k")).alias("m")).collect()
    assert all(r["m"] for r in got)  # no false negative, null -> maybe


def test_bloom_fan_in_tree_bounds_group_size(spark):
    # more input partitions than fan_in**2: the coalesce caps the
    # partition-bitset count; correctness is unchanged
    keys = spark.range(500).select(F.xxhash64("id").alias("k")).repartition(30)
    bits = bloom.build_bloom(keys, "k", 1 << 12, 4, fan_in=5)
    mc = bloom.might_contain(spark, bits, 4)
    members = spark.range(500).select(F.xxhash64("id").alias("k"))
    assert members.filter(~mc(F.col("k"))).count() == 0
