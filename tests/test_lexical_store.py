"""Persisted lexical postings store: round-trip identity with the
engine query and the in-process serving tier, sidecar-driven global
stats, partition pruning on both axes, and the append/delete/compact/
recover lifecycle — the lexical twin of ``test_ivfpq_maintenance.py``.

Reference parity: the reference builds its index once on shared storage
and workers load shards at startup (``app/src/index_builder.py:22-36``,
``app/src/worker_tasks.py:88-117``); this store is that artifact for
the BM25 tier.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import retrieval
from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import (
    append_postings_index,
    compact_postings_index,
    delete_from_postings_index,
    load_table,
    read_postings_corpus_stats,
    read_postings_index,
    rebuild_postings_stats,
    recover_postings_swap,
    validate_postings_store,
    write_postings_index,
)

QUERY = "column window scan merge"
K = 10


def _docs(spark):
    return load_table(spark, "/root/testdata/sf0.001", "documents")


def _engine_rows(spark, docs, query=QUERY, k=K):
    return [
        (r["doc_id"], r["score"], r["rank"])
        for r in retrieval.bm25_topk(docs, query, k=k).collect()
    ]


def _store_rows(spark, path, query=QUERY, k=K):
    return [
        (r["doc_id"], r["score"], r["rank"])
        for r in retrieval.bm25_topk_store(spark, path, query, k=k).collect()
    ]


def test_store_roundtrip_identity_and_pruning(spark, tmp_path):
    """from_store ≡ from_dataframe ≡ engine query (the r6 verdict's
    'Done' bar), with both pruning axes visible in the plans."""
    docs = _docs(spark)
    p = str(tmp_path / "lex")
    write_postings_index(docs, p, n_doc_shards=4, n_token_buckets=16)
    want = _engine_rows(spark, docs)

    # Spark-side store query: bit-identical rows
    got_df = retrieval.bm25_topk_store(spark, p, QUERY, k=K)
    assert [(r["doc_id"], r["score"], r["rank"]) for r in got_df.collect()] == want
    # ... and its scan is pruned to the query terms' token_bucket dirs
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "token_bucket" in plan, plan

    # serving tier: from_store ≡ from_dataframe ≡ engine
    idx_store = retrieval.ServingLexicalIndex.from_store(spark, p)
    idx_df = retrieval.ServingLexicalIndex.from_dataframe(docs)
    assert idx_store.query(QUERY, k=K) == want
    assert idx_df.query(QUERY, k=K) == want
    # store meta drove the scoring config
    assert (idx_store.k1, idx_store.b) == (1.2, 0.75)
    # sidecar stats equal the corpus stats
    n, s = read_postings_corpus_stats(spark, p)
    assert (idx_df.n_docs, idx_df.sum_dl) == (n, s)


def test_batch_store_identical_to_batch_table(spark, tmp_path):
    """bm25_topk_batch_store ≡ bm25_topk_batch per query, and its one
    pruned scan carries the union-of-buckets partition filter."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark import contract as C

    docs = _docs(spark)
    p = str(tmp_path / "lex_batch")
    write_postings_index(docs, p, n_doc_shards=2, n_token_buckets=8)
    qdf = spark.createDataFrame(
        list(C.BM25_BATCH_QUERIES), "query_id long, query_text string"
    )
    got_df = retrieval.bm25_topk_batch_store(spark, p, qdf, k=5)
    got = sorted(map(tuple, got_df.collect()))
    want = sorted(
        map(tuple, retrieval.bm25_topk_batch(docs, qdf, k=5).collect())
    )
    assert got == want
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "token_bucket" in plan, plan
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no query terms"):
        retrieval.bm25_topk_batch_store(
            spark, p,
            spark.createDataFrame([(0, " ")], "query_id long, query_text string"),
        )


def test_doc_shard_replicas_merge_to_full_answer(spark, tmp_path):
    """Doc-shard replicas loaded from the store (global df from the
    sidecar, NOT hand-fed) scatter-gather to the full index's answer;
    the replica export prunes to its doc_shard directories."""
    docs = _docs(spark)
    p = str(tmp_path / "lex_shards")
    write_postings_index(docs, p, n_doc_shards=4, n_token_buckets=8)
    want = _engine_rows(spark, docs)

    replicas = [
        retrieval.ServingLexicalIndex.from_store(spark, p, doc_shards=sh)
        for sh in ([0, 1], [2], [3])
    ]
    merged = retrieval.merge_topk_scores(
        [r.query(QUERY, k=K) for r in replicas], k=K
    )
    assert merged == want
    # a single-shard replica alone does NOT see the whole corpus...
    assert replicas[1].query(QUERY, k=K) != want
    # ...but scores its shard's docs with GLOBAL idf: every row it
    # returns appears with the same score in the full answer's pool
    full = {
        (d, s)
        for d, s, _ in retrieval.ServingLexicalIndex.from_store(spark, p).query(
            QUERY, k=10**6
        )
    }
    assert all((d, s) in full for d, s, _ in replicas[1].query(QUERY, k=K))
    # export pruning: the shard filter reaches the partition directories
    posts, _ = read_postings_index(spark, p)
    pruned = posts.filter(F.col("doc_shard").isin([2]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "doc_shard" in plan, plan


def test_append_matches_fresh_build(spark, tmp_path):
    docs = _docs(spark)
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    p = str(tmp_path / "lex_app")
    write_postings_index(half_a, p, n_doc_shards=2, n_token_buckets=8)
    append_postings_index(half_b, p)
    validate_postings_store(spark, p)
    assert _store_rows(spark, p) == _engine_rows(spark, docs)
    assert retrieval.ServingLexicalIndex.from_store(spark, p).query(
        QUERY, k=K
    ) == _engine_rows(spark, docs)


def test_delete_shifts_corpus_stats_exactly(spark, tmp_path):
    """Deletion must rewrite N, sum_dl and df — a deleted doc changes
    every surviving doc's idf, so the post-delete store must answer
    exactly like a store never containing those docs."""
    docs = _docs(spark)
    gone = [r["doc_id"] for r in
            retrieval.bm25_topk(docs, QUERY, k=3).collect()]
    kept = docs.filter(~F.col("doc_id").isin(gone))
    p = str(tmp_path / "lex_del")
    write_postings_index(docs, p)
    delete_from_postings_index(spark, gone, p)
    validate_postings_store(spark, p)
    assert _store_rows(spark, p) == _engine_rows(spark, kept)
    assert read_postings_corpus_stats(spark, p) == (
        kept.count(),
        kept.agg(
            F.sum(
                F.size(
                    __import__(
                        "finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.text",
                        fromlist=["tokenize"],
                    ).tokenize(F.col("text"))
                )
            )
        ).collect()[0][0],
    )
    # idempotent
    delete_from_postings_index(spark, gone, p)
    assert _store_rows(spark, p) == _engine_rows(spark, kept)
    assert not os.path.exists(p + "__compact_tmp")
    assert not os.path.exists(p + "__compact_old")


def test_compact_preserves_answers_and_layout(spark, tmp_path):
    docs = _docs(spark)
    p = str(tmp_path / "lex_cmp")
    write_postings_index(
        docs.filter(F.col("doc_id") % 2 == 0), p, n_doc_shards=2, n_token_buckets=4
    )
    append_postings_index(docs.filter(F.col("doc_id") % 2 == 1), p)
    want = _store_rows(spark, p)
    compact_postings_index(spark, p)
    validate_postings_store(spark, p)
    assert _store_rows(spark, p) == want
    # both partition levels survive the rewrite
    shard_dirs = [n for n in os.listdir(p) if n.startswith("doc_shard=")]
    assert shard_dirs
    assert any(
        n.startswith("token_bucket=")
        for n in os.listdir(os.path.join(p, shard_dirs[0]))
    )


def test_zero_token_docs_count_in_stats(spark, tmp_path):
    """A doc with no tokens contributes to N (it shifts avgdl and idf)
    but has no postings — _doc_lengths carries it where a postings-only
    derivation could not."""
    docs = spark.createDataFrame(
        [(1, "apple banana"), (2, ""), (3, "apple cherry apple")],
        "doc_id long, text string",
    )
    p = str(tmp_path / "lex_zero")
    write_postings_index(docs, p)
    assert read_postings_corpus_stats(spark, p) == (3, 5)
    assert _store_rows(spark, p, "apple", k=3) == _engine_rows(
        spark, docs, "apple", k=3
    )
    assert retrieval.ServingLexicalIndex.from_store(spark, p).query(
        "apple", k=3
    ) == _engine_rows(spark, docs, "apple", k=3)


def test_crash_between_append_steps_detected_and_healed(spark, tmp_path):
    """Postings landed but sidecars stale (a death between the append's
    writes): validate raises, rebuild heals, answers recover."""
    docs = _docs(spark)
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    p = str(tmp_path / "lex_crash")
    write_postings_index(half_a, p, n_doc_shards=2, n_token_buckets=8)
    # simulate the crash: land ONLY the postings half of the append
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import _postings_rows

    _postings_rows(half_b, 2, 8).write.mode("append").partitionBy(
        "doc_shard", "token_bucket"
    ).parquet(p)
    with pytest.raises(ValueError, match="rebuild_postings_stats"):
        validate_postings_store(spark, p)
    rebuild_postings_stats(spark, p)
    validate_postings_store(spark, p)
    assert _store_rows(spark, p) == _engine_rows(spark, docs)


def test_recover_postings_swap_windows(spark, tmp_path):
    docs = _docs(spark)
    p = str(tmp_path / "lex_rec")
    write_postings_index(docs, p, n_doc_shards=2, n_token_buckets=4)
    want = _store_rows(spark, p)
    # healthy store, stale leftover -> cleared
    os.makedirs(p + "__compact_tmp")
    assert recover_postings_swap(p) is True
    assert not os.path.exists(p + "__compact_tmp")
    assert recover_postings_swap(p) is False
    # death between rename-aside and rename-in with a COMPLETE tmp
    compact_postings_index(spark, p)
    os.rename(p, p + "__compact_tmp")
    assert recover_postings_swap(p) is True
    assert _store_rows(spark, p) == want
    # death mid-tmp-write (incomplete tmp): original wins
    os.rename(p, p + "__compact_old")
    os.makedirs(p + "__compact_tmp")
    assert recover_postings_swap(p) is True
    assert _store_rows(spark, p) == want
    assert not os.path.exists(p + "__compact_tmp")
    # nothing survives -> raise
    shutil.rmtree(p)
    with pytest.raises(ValueError, match="no surviving copy"):
        recover_postings_swap(p)


def test_store_guards(spark, tmp_path):
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import _write_store_meta

    bad = str(tmp_path / "not_postings")
    _docs(spark).limit(1).write.parquet(bad)
    _write_store_meta(bad, {"kind": "pq"})
    with pytest.raises(ValueError, match="not a lexical postings store"):
        read_postings_index(spark, bad)
    with pytest.raises(ValueError, match="not a lexical postings store"):
        append_postings_index(_docs(spark).limit(1), bad)
    p = str(tmp_path / "lex_g")
    write_postings_index(_docs(spark).limit(20), p)
    with pytest.raises(ValueError, match="k must"):
        retrieval.bm25_topk_store(spark, p, QUERY, k=0)
    with pytest.raises(ValueError, match="no terms"):
        retrieval.bm25_topk_store(spark, p, "  ")
