"""Adversarial band skew (SURVEY §7 M7): a dup-heavy corpus drives
every band of the duplicated text into one mega-bucket. Validates the
deterministic bucket cap and the distinct-signature compression of the
dedup self-join under that skew."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.config import MinHashParams
from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import lsh, minhash

DUP_TEXT = "the same exact duplicated payload text for every clone"
N_DUP = 300
N_UNIQ = 60


@pytest.fixture(scope="module")
def skewed(spark):
    rows = [(i, DUP_TEXT) for i in range(N_DUP)] + [
        (1000 + i, f"unique doc number {i} alpha{i * 7 % 13} beta{i * 3 % 7} gamma{i}")
        for i in range(N_UNIQ)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    params = MinHashParams()
    sigs = minhash.signatures(docs, params).cache()
    return params, sigs


def test_bucket_cap_bounds_megabucket_keeping_smallest_ids(skewed):
    params, sigs = skewed
    capped = lsh.cap_buckets(lsh.bands_table(sigs, params), cap=20)
    sizes = capped.groupBy("band_id", "band_hash").count()
    assert sizes.agg(F.max("count")).collect()[0][0] <= 20
    # the mega-bucket (every clone bands identically) must keep exactly
    # the 20 smallest clone ids in every band
    mega = (
        capped.filter(F.col("doc_id") < N_DUP)
        .groupBy("band_id")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .collect()
    )
    assert len(mega) == params.bands
    for r in mega:
        assert r["ids"] == list(range(20))


def test_compressed_self_join_equals_raw_under_skew(spark, skewed):
    params, sigs = skewed
    bands = lsh.bands_table(sigs, params)
    fast = lsh.self_join_pairs(bands, sigs, params, 0.5, compress_identical=True)
    slow = lsh.self_join_pairs(bands, sigs, params, 0.5, compress_identical=False)
    a = {(r["doc_a"], r["doc_b"], round(r["score"], 9)) for r in fast.collect()}
    b = {(r["doc_a"], r["doc_b"], round(r["score"], 9)) for r in slow.collect()}
    assert a == b
    # all clone pairs present at score 1.0
    n_clone_pairs = N_DUP * (N_DUP - 1) // 2
    clones = {(x, y) for (x, y, s) in a if x < N_DUP and y < N_DUP}
    assert len(clones) == n_clone_pairs


def test_compression_shrinks_the_quadratic_stage(skewed):
    params, sigs = skewed
    # the raw band join would see N_DUP rows per band for the clone
    # bucket; compression must collapse them to 1 representative
    groups = sigs.groupBy("sig").agg(F.count(F.lit(1)).alias("n"))
    assert groups.agg(F.max("n")).collect()[0][0] == N_DUP
    assert groups.count() <= N_UNIQ + 1
