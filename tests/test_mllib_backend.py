"""MLlib MinHashLSH parity backend (SURVEY §7.3 M5): the stock-Spark
alternative must agree with the native signature/bands pipeline on
what it retrieves, measured by the engine's own metric harness
(recall vs exact true-Jaccard), mirroring how the reference compares
LSH against FAISS (``benchmarks/benchmark_runner.py:133-157``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark import contract as C
from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import (
    bruteforce,
    mllib_backend,
)
from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


@pytest.fixture(scope="module")
def vectors(docs):
    return mllib_backend.shingle_vectors(docs, C.PARAMS).cache()


@pytest.fixture(scope="module")
def model(vectors):
    return mllib_backend.fit_lsh(vectors, num_hash_tables=C.PARAMS.bands, seed=42)


def test_topk_finds_self_with_jaccard_one(docs, vectors, model):
    key = vectors.filter(F.col("doc_id") == C.QUERY_DOC).first()["features"]
    rows = mllib_backend.topk(model, vectors, key, k=5).collect()
    assert rows[0]["doc_id"] == C.QUERY_DOC
    assert rows[0]["jaccard"] == pytest.approx(1.0)
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))


def test_similar_pairs_jaccard_is_exact(spark, docs, vectors, model):
    """approxSimilarityJoin's distCol is EXACT Jaccard on the shingle
    vectors — every returned pair must match the engine's own
    true-Jaccard computation."""
    pairs = mllib_backend.similar_pairs(model, vectors, threshold=0.5).collect()
    assert pairs, "fixture corpus should contain at least one near-dup pair"
    shingled = docs.select(
        "doc_id",
        F.array_distinct(
            F.split(F.trim(F.col("text")), r"\s+")
        ).alias("sh"),
    )
    a = shingled.alias("a")
    b = shingled.alias("b")
    truth = {
        (r["doc_a"], r["doc_b"]): r["j"]
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (
                F.size(F.array_intersect("a.sh", "b.sh"))
                / F.size(F.array_union("a.sh", "b.sh"))
            ).alias("j"),
        )
        .filter(F.col("j") >= 0.5)
        .collect()
    }
    for r in pairs:
        key = (r["doc_a"], r["doc_b"])
        assert key in truth
        assert r["jaccard"] == pytest.approx(truth[key], abs=1e-9)


def test_mllib_recall_comparable_to_native(spark, docs, vectors, model):
    """Recall@5 vs the true-Jaccard oracle for the fixture query:
    the MLlib backend must retrieve substantially the same neighbors
    as the exact oracle (the corpus has strong near-dups, so any
    working LSH lands >= 3 of 5)."""
    truth = bruteforce.true_jaccard_topk(
        docs.select(
            "doc_id",
            F.array_distinct(F.split(F.trim(F.col("text")), r"\s+")).alias("shingles"),
        ),
        docs.filter(F.col("doc_id") == C.QUERY_DOC).select(
            F.col("doc_id").alias("query_id"),
            F.array_distinct(F.split(F.trim(F.col("text")), r"\s+")).alias("shingles"),
        ),
        k=5,
    )
    truth_ids = {r["doc_id"] for r in truth.collect()}
    key = vectors.filter(F.col("doc_id") == C.QUERY_DOC).first()["features"]
    got_ids = {r["doc_id"] for r in mllib_backend.topk(model, vectors, key, k=5).collect()}
    assert len(got_ids & truth_ids) >= 3
