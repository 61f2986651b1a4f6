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


# --- hyperplane-bucket family under scale and clone skew --------------------

from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import (  # noqa: E402
    ann,
    dedup,
)

EMB_DIM = 8
N_CLONES = 80
N_UNIQ_VECS = 40


@pytest.fixture(scope="module")
def clone_embeddings(spark):
    import numpy as np

    rs = np.random.RandomState(7)
    clone_vec = [float(x) for x in rs.randn(EMB_DIM)]
    rows = [(i, clone_vec) for i in range(N_CLONES)]
    rows += [
        (1000 + i, [float(x) for x in rs.randn(EMB_DIM)]) for i in range(N_UNIQ_VECS)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_auto_n_planes_scales_with_corpus():
    # fixed floor at small N (the sf fixtures), then log2 growth: a
    # 100x corpus gets ~log2(100) ~ 6-7 more planes, keeping the
    # EXPECTED bucket population near the target instead of 100x-ing it
    assert ann.auto_n_planes(500) == 8
    assert ann.auto_n_planes(256 * (1 << 10)) == 10
    assert ann.auto_n_planes(256 * (1 << 20)) == 20
    assert ann.auto_n_planes(10**12) == 24  # hi clamp
    assert ann.auto_n_planes(0) == 8
    sizes = [ann.auto_n_planes(n) for n in (10**4, 10**6, 10**8, 10**10)]
    assert sizes == sorted(sizes)
    # in the unclamped regime the expected bucket size stays bounded
    for n in (10**6, 10**7, 10**8):
        planes = ann.auto_n_planes(n)
        assert n / (1 << planes) <= 2 * 256


def test_embedding_clone_skew_compressed_matches_uncompressed(clone_embeddings):
    fast = dedup.embedding_cosine_duplicates(
        clone_embeddings, dim=EMB_DIM, threshold=0.9, compress_identical=True
    )
    slow = dedup.embedding_cosine_duplicates(
        clone_embeddings, dim=EMB_DIM, threshold=0.9, compress_identical=False
    )
    a = {(r["vec_a"], r["vec_b"], r["cos_sim"]) for r in fast.collect()}
    b = {(r["vec_a"], r["vec_b"], r["cos_sim"]) for r in slow.collect()}
    assert a == b
    # every clone pair present at self-cosine 1.0
    clone_pairs = {(x, y) for (x, y, s) in a if x < N_CLONES and y < N_CLONES}
    assert len(clone_pairs) == N_CLONES * (N_CLONES - 1) // 2
    assert all(s == 1.0 for (x, y, s) in a if x < N_CLONES and y < N_CLONES)


def test_embedding_clone_skew_quadratic_stage_is_on_distinct_vectors(clone_embeddings):
    # the clone mega-bucket is irreducible by plane count (identical
    # vectors always share a bucket); compression must collapse the
    # scoring input to one representative per distinct vector
    groups = clone_embeddings.groupBy("embedding").count()
    assert groups.count() == N_UNIQ_VECS + 1
    assert groups.agg(F.max("count")).collect()[0][0] == N_CLONES


def test_embedding_auto_planes_equals_explicit(clone_embeddings):
    auto = dedup.embedding_cosine_duplicates(
        clone_embeddings, dim=EMB_DIM, threshold=0.9, n_planes=None, n_rows=120
    )
    explicit = dedup.embedding_cosine_duplicates(
        clone_embeddings, dim=EMB_DIM, threshold=0.9, n_planes=ann.auto_n_planes(120)
    )
    assert {tuple(r) for r in auto.collect()} == {
        tuple(r) for r in explicit.collect()
    }


def test_multiprobe_auto_planes_scales_and_equals_explicit(clone_embeddings):
    """The multiprobe variant exposes the same n_planes=None auto lever
    as its single-bucket sibling: the hint picks the plane count, and
    two corpus sizes pick DIFFERENT counts (the 100x-rows hazard)."""
    small, large = ann.auto_n_planes(120), ann.auto_n_planes(10**7)
    assert small != large  # different corpus size -> different planes
    for hint, planes in ((120, small), (10**7, large)):
        auto = dedup.embedding_cosine_duplicates_multiprobe(
            clone_embeddings, dim=EMB_DIM, threshold=0.9, n_planes=None, n_rows=hint
        )
        explicit = dedup.embedding_cosine_duplicates_multiprobe(
            clone_embeddings, dim=EMB_DIM, threshold=0.9, n_planes=planes
        )
        assert {tuple(r) for r in auto.collect()} == {
            tuple(r) for r in explicit.collect()
        }


def test_batch_ann_auto_planes_equals_explicit(spark, clone_embeddings):
    from pyspark.sql import functions as F

    qe = clone_embeddings.filter(F.col("vec_id").isin(0, 1000)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    auto = ann.ann_lsh_topk_batch(
        clone_embeddings, qe, k=3, n_planes=None, n_rows=10**7
    )
    explicit = ann.ann_lsh_topk_batch(
        clone_embeddings, qe, k=3, n_planes=ann.auto_n_planes(10**7)
    )
    assert {tuple(r) for r in auto.collect()} == {
        tuple(r) for r in explicit.collect()
    }


def test_multiprobe_embedding_clone_skew_compression_lossless(clone_embeddings):
    """Multiprobe blocking under clone skew: the compressed path must
    equal the uncompressed one exactly (identical vectors emit
    identical probe sets, so compression is lossless there too)."""
    fast = dedup.embedding_cosine_duplicates_multiprobe(
        clone_embeddings, dim=EMB_DIM, threshold=0.9, compress_identical=True
    )
    slow = dedup.embedding_cosine_duplicates_multiprobe(
        clone_embeddings, dim=EMB_DIM, threshold=0.9, compress_identical=False
    )
    a = {(r["vec_a"], r["vec_b"], r["cos_sim"]) for r in fast.collect()}
    b = {(r["vec_a"], r["vec_b"], r["cos_sim"]) for r in slow.collect()}
    assert a == b and len(a) > 0
    clone_pairs = {(x, y) for (x, y, s) in a if x < N_CLONES and y < N_CLONES}
    assert len(clone_pairs) == N_CLONES * (N_CLONES - 1) // 2
