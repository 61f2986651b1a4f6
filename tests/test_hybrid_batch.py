"""Batch hybrid RRF: each query's fused list must be identical to
fusing its two point lists with rrf_fuse — the batch twin law every
*_batch kernel in the repo obeys."""

from __future__ import annotations

from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark import contract as C
from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import (
    bruteforce,
    retrieval,
)
from finding_similar_high_dimensional_items_for_big_data_sets_spark.plans.queries import (
    _docs,
    _emb,
    q_hybrid_rrf_topk_batch,
)

SF = "/root/testdata/sf0.001"


def test_batch_equals_point_fusion_per_query(spark):
    batch = q_hybrid_rrf_topk_batch(spark, SF).collect()
    emb = _emb(spark, SF)
    docs = _docs(spark, SF)
    for qid, qtext in C.BM25_BATCH_QUERIES:
        lex = retrieval.bm25_topk(
            docs, query=qtext, k=C.BM25_K, k1=C.BM25_K1, b=C.BM25_B
        )
        qs = emb.filter(F.col("vec_id") == qid).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        vec = bruteforce.cosine_topk(emb, qs, k=C.BM25_K).select(
            F.col("vec_id").alias("doc_id"), "rank"
        )
        point = retrieval.rrf_fuse(lex, vec, k=C.BM25_K, c=C.RRF_C).collect()
        got = [
            (r["doc_id"], r["rank_lex"], r["rank_vec"], r["rrf_score"], r["rank"])
            for r in batch
            if r["query_id"] == qid
        ]
        want = [
            (r["doc_id"], r["rank_lex"], r["rank_vec"], r["rrf_score"], r["rank"])
            for r in point
        ]
        assert got == want, f"query {qid} drifted"


def test_fusion_window_partitions_by_query(spark):
    df = q_hybrid_rrf_topk_batch(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the rank window partitions by query_id — parallel across queries
    assert "hashpartitioning(query_id" in plan
