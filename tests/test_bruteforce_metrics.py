"""Brute-force oracles (J2/T4) + quality metrics (A6) vs NumPy."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import (
    bruteforce,
    metrics,
)
from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, mat


def test_l2_topk_matches_numpy(spark, emb, emb_np):
    ids, mat = emb_np
    qidx = int(np.where(ids == 7)[0][0])
    dists = np.sqrt(((mat - mat[qidx]) ** 2).sum(axis=1))
    order = np.lexsort((ids, dists))[:5]
    expected = [int(ids[i]) for i in order]

    q = emb.filter(F.col("vec_id") == 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = [
        r["vec_id"]
        for r in bruteforce.l2_topk(emb, q, k=5).orderBy("rank").collect()
    ]
    assert got == expected


def test_cosine_topk_matches_numpy(spark, emb, emb_np):
    ids, mat = emb_np
    qidx = int(np.where(ids == 7)[0][0])
    qv = mat[qidx]
    sims = (mat @ qv) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(qv))
    order = np.lexsort((ids, -sims))[:5]
    expected = [int(ids[i]) for i in order]

    q = emb.filter(F.col("vec_id") == 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = [
        r["vec_id"]
        for r in bruteforce.cosine_topk(emb, q, k=5).orderBy("rank").collect()
    ]
    assert got == expected


def test_filtered_cosine_topk_prefilter_semantics(spark, sf_dir, emb):
    """Pre-filter semantics: every returned neighbor satisfies the
    metadata predicate, each query still gets exactly k of them, and
    the result equals cosine_topk over the pre-filtered corpus — while
    the naive post-filter of an unfiltered top-k under-fills k on a
    selective filter (the trap this operator is the baseline for).
    The predicate reaches the parquet metadata scan (PushedFilters)."""
    docs = load_table(spark, sf_dir, "documents")
    fr_ids = {
        r["doc_id"] for r in docs.filter(F.col("lang") == "fr").collect()
    }
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    out = bruteforce.filtered_cosine_topk(
        emb, docs, F.col("lang") == "fr", q, k=5
    )
    rows = out.collect()
    assert all(r["vec_id"] in fr_ids for r in rows)
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2} and all(
        len(v) == 5 for v in by_q.values()
    )
    # identical to brute force over the pre-filtered corpus
    want = bruteforce.cosine_topk(
        emb.join(
            docs.filter(F.col("lang") == "fr").select(
                F.col("doc_id").alias("vec_id")
            ),
            "vec_id",
            "left_semi",
        ),
        q,
        k=5,
    )
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(
        [(r["query_id"], r["rank"], r["vec_id"], r["cos_sim"]) for r in rows]
    ) == sorted(
        [
            (r["query_id"], r["rank"], r["vec_id"], r["cos_sim"])
            for r in want.collect()
        ]
    )
    # the post-filter composition visibly under-fills k: fewer than
    # 5 of the UNfiltered top-5 are French for at least one query
    # (lang='fr' is ~13% of the corpus)
    unfiltered = bruteforce.cosine_topk(emb, q, k=5).collect()
    post = [r for r in unfiltered if r["vec_id"] in fr_ids]
    assert len(post) < 15
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "lang" in plan


def test_quality_metrics_hand_case(spark):
    # pred:  q1 -> [1,2,3];       truth: q1 -> [1,9,3]   (2 hits, first at rank 1)
    # pred:  q2 -> [4,5,6];       truth: q2 -> [7,8,5]   (1 hit, first at rank 2)
    pred = spark.createDataFrame(
        [(1, 1, 1), (1, 2, 2), (1, 3, 3), (2, 4, 1), (2, 5, 2), (2, 6, 3)],
        "query_id int, doc_id int, rank int",
    )
    truth = spark.createDataFrame(
        [(1, 1, 1), (1, 9, 2), (1, 3, 3), (2, 7, 1), (2, 8, 2), (2, 5, 3)],
        "query_id int, doc_id int, rank int",
    )
    row = metrics.quality_metrics(pred, truth, k=3).collect()[0]
    assert abs(row["recall_at_k"] - (2 / 3 + 1 / 3) / 2) < 1e-12
    assert abs(row["precision_at_k"] - (2 / 3 + 1 / 3) / 2) < 1e-12
    assert abs(row["mrr"] - (1.0 + 0.5) / 2) < 1e-12
    assert row["n_queries"] == 2


def test_mrr_zero_when_no_hits(spark):
    pred = spark.createDataFrame([(1, 1, 1), (1, 2, 2)], "query_id int, doc_id int, rank int")
    truth = spark.createDataFrame([(1, 8, 1), (1, 9, 2)], "query_id int, doc_id int, rank int")
    row = metrics.quality_metrics(pred, truth, k=2).collect()[0]
    assert row["recall_at_k"] == 0.0 and row["mrr"] == 0.0


def test_cosine_topk_vectorized_matches_fold(spark, emb):
    """The Arrow matmul path must rank identically to the JVM fold
    (scores agree at the shared 6-dp rounding) for point and batch."""
    for pred in (F.col("vec_id") == 7, F.col("vec_id") < 8):
        q = emb.filter(pred).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        fold = bruteforce.cosine_topk(emb, q, k=5).collect()
        fast = bruteforce.cosine_topk_vectorized(emb, q, k=5).collect()
        a = sorted((r["query_id"], r["rank"], r["vec_id"], round(r["cos_sim"], 6)) for r in fold)
        b = sorted((r["query_id"], r["rank"], r["vec_id"], round(r["cos_sim"], 6)) for r in fast)
        assert a == b and len(a) > 0


def test_cosine_topk_vectorized_rejects_zero_norm(spark, emb):
    q = spark.createDataFrame(
        [(99, [0.0] * 64)], "query_id long, query_vec array<double>"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="zero-norm"):
        bruteforce.cosine_topk_vectorized(emb, q, k=5).collect()


def test_cosine_topk_vectorized_empty_query_set(spark, emb):
    q = emb.filter(F.col("vec_id") == -1).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = bruteforce.cosine_topk_vectorized(emb, q, k=5)
    assert out.count() == 0
    assert out.columns == ["query_id", "vec_id", "cos_sim", "rank"]


def test_mrl_rerank_exact_when_shortlist_covers_corpus(spark, emb):
    """Identity law of the two-stage shape: with the shortlist as deep
    as the corpus, the truncated prefilter prunes nothing and the
    rerank must equal full exact cosine top-k, column-for-column."""
    n = emb.count()
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    got = bruteforce.mrl_rerank_topk(
        emb, qs, k=5, d_prime=16, shortlist=n
    ).select("query_id", "vec_id", "cos_sim", "rank")
    want = bruteforce.cosine_topk(emb, qs, k=5)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # a tight shortlist is a genuine prefilter: self stays rank-1 (its
    # truncated prefix matches itself perfectly, so it always survives)
    tight = bruteforce.mrl_rerank_topk(emb, qs, k=5, d_prime=16, shortlist=10)
    top = {r["query_id"]: r["vec_id"] for r in tight.filter("rank = 1").collect()}
    assert top == {0: 0, 1: 1, 2: 2}
