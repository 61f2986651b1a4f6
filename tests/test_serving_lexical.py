"""Lexical + hybrid serving tier: answer identity with the engine's
bm25_topk / RRF rule, doc-sharded replicas, HTTP envelopes."""

from __future__ import annotations

import json
import urllib.request

import pytest
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark import contract as C
from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.text import tokenize
from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import retrieval

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _post(port: int, path: str, payload: dict) -> tuple[int, dict]:
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_serving_lexical_identity_with_engine(spark):
    docs = _docs(spark)
    engine = {
        (r["doc_id"], r["score"], r["rank"])
        for r in retrieval.bm25_topk(
            docs, C.BM25_QUERY, k=C.BM25_K, k1=C.BM25_K1, b=C.BM25_B
        ).collect()
    }
    idx = retrieval.ServingLexicalIndex.from_dataframe(
        docs, k1=C.BM25_K1, b=C.BM25_B
    )
    served = set(idx.query(C.BM25_QUERY, k=C.BM25_K))
    assert served == engine
    # unseen-terms-only query -> empty, not an error
    assert idx.query("qqqqzzzz", k=5) == []
    with pytest.raises(ValueError, match="no terms"):
        idx.query("  ")
    with pytest.raises(ValueError, match="k must"):
        idx.query(C.BM25_QUERY, k=0)


def test_serving_lexical_doc_sharded_replicas(spark):
    docs = _docs(spark)
    toks = tokenize(F.col("text"))
    st = docs.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.size(toks)).alias("s")
    ).collect()[0]
    global_df = {
        r["token"]: r["df"]
        for r in docs.select(F.col("doc_id"), F.explode(toks).alias("token"))
        .distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .collect()
    }
    stats = (st["n"], st["s"], global_df)
    full = retrieval.ServingLexicalIndex.from_dataframe(docs)
    shards = [
        retrieval.ServingLexicalIndex.from_dataframe(
            docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == i),
            global_stats=stats,
        )
        for i in range(2)
    ]
    q = C.BM25_QUERY
    merged = retrieval.merge_topk_scores(
        [s.query(q, k=C.BM25_K) for s in shards], k=C.BM25_K
    )
    assert merged == full.query(q, k=C.BM25_K)


class _StubVecIndex:
    """Fixed vector point answers (id, dist, rank) for fusion tests."""

    dim = 3

    def __init__(self, hits):
        self.hits = hits

    def query(self, vec, k=10, n_probe=4, shortlist=None):
        return self.hits[:k]


def test_hybrid_rrf_point_matches_rrf_fuse(spark):
    docs = _docs(spark)
    lex_idx = retrieval.ServingLexicalIndex.from_dataframe(docs)
    lex_hits = lex_idx.query(C.BM25_QUERY, k=C.BM25_K)
    vec_hits = [(7, 0.11, 1), (int(lex_hits[0][0]), 0.22, 2), (9001, 0.33, 3)]
    point = retrieval.hybrid_rrf_point(
        lex_idx,
        _StubVecIndex(vec_hits),
        C.BM25_QUERY,
        [0.0, 0.0, 0.0],
        k=C.BM25_K,
        c=C.RRF_C,
    )
    lex_df = spark.createDataFrame(
        [(d, r) for d, _s, r in lex_hits], "doc_id long, rank int"
    )
    vec_df = spark.createDataFrame(
        [(d, r) for d, _s, r in vec_hits], "doc_id long, rank int"
    )
    fused = retrieval.rrf_fuse(lex_df, vec_df, k=C.BM25_K, c=C.RRF_C).collect()
    assert [(r["doc_id"], r["rrf_score"], r["rank"]) for r in fused] == [
        (d, s, r) for d, s, r in point
    ]


def test_lexical_and_hybrid_http_endpoints(spark):
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.serving_http import (
        start_lexical_server,
    )

    docs = _docs(spark)
    lex_idx = retrieval.ServingLexicalIndex.from_dataframe(docs)
    vec_stub = _StubVecIndex([(1, 0.1, 1), (2, 0.2, 2)])
    server, _t = start_lexical_server(lex_idx, vec_stub)
    port = server.server_address[1]
    try:
        status, body = _post(port, "/query", {"query": C.BM25_QUERY, "k": 5})
        assert status == 200 and len(body["candidates"]) == 5
        expected = lex_idx.query(C.BM25_QUERY, k=5)
        assert [(c["id"], c["score"], c["rank"]) for c in body["candidates"]] == [
            (d, s, r) for d, s, r in expected
        ]
        status, body = _post(
            port, "/hybrid",
            {"query": C.BM25_QUERY, "vector": [0.0, 0.0, 0.0], "k": 5},
        )
        assert status == 200 and body["candidates"][0]["rank"] == 1
        # envelope guards
        assert _post(port, "/query", {"query": 7})[0] == 400
        assert _post(port, "/hybrid", {"query": "x", "vector": [0.0]})[0] == 400
        assert _post(port, "/nope", {})[0] == 404
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/health"
        ) as resp:
            health = json.loads(resp.read())
        assert health["hybrid"] is True and health["n_docs"] == 500
    finally:
        server.shutdown()
