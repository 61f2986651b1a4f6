"""Round-6 corpus-governance operators: per-source quota sampling and
kNN label-vote classification (deterministic tie rules, guards)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import bruteforce, prep


def test_per_group_quota_caps_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(30)], "doc_id long, source string"
    )
    out = prep.per_group_quota(df, "source", 4).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append((r["pick_rank"], r["doc_id"]))
    assert set(by_src) == {"s0", "s1", "s2"}
    for src, rows in by_src.items():
        assert sorted(r[0] for r in rows) == [1, 2, 3, 4]
    # deterministic: a second run picks the identical rows
    again = prep.per_group_quota(df, "source", 4).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))
    # quota >= group size keeps everything
    assert prep.per_group_quota(df, "source", 100).count() == 30
    with pytest.raises(ValueError, match="quota"):
        prep.per_group_quota(df, "source", 0)


def test_knn_label_vote_majority_tie_and_self_exclusion(spark):
    # 1-d embeddings: query 100 at 0.0; nearest 4 neighbors are two
    # label-7 and two label-3 rows (tie) -> smaller label 3 wins at
    # k=4; at k=5 the fifth neighbor (label 7) breaks the tie -> 7.
    rows = [
        (1, [0.1], 7),
        (2, [0.2], 3),
        (3, [0.3], 7),
        (4, [0.4], 3),
        (5, [0.5], 7),
        (6, [9.0], 0),
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    qs = spark.createDataFrame(
        [(100, [0.0])], "query_id long, query_vec array<double>"
    )
    got4 = bruteforce.knn_label_vote(corpus, qs, k=4).collect()
    assert (got4[0]["pred_label"], got4[0]["n_votes"]) == (3, 2)
    got5 = bruteforce.knn_label_vote(corpus, qs, k=5).collect()
    assert (got5[0]["pred_label"], got5[0]["n_votes"]) == (7, 3)
    # self exclusion: a corpus row queried by its own id never votes
    # for itself — at k=1 the prediction comes from its neighbor
    qs_self = spark.createDataFrame(
        [(1, [0.1])], "query_id long, query_vec array<double>"
    )
    got_self = bruteforce.knn_label_vote(corpus, qs_self, k=1).collect()
    assert got_self[0]["pred_label"] == 3  # vec 2 (dist 0.1), not itself


def test_remove_duplicate_spans_cuts_shared_grams(spark):
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import dedup

    shared = "a b c d e f g h"  # one exact 8-gram shared by docs 1 and 2
    docs = spark.createDataFrame(
        [
            (1, f"u1 {shared} v1"),
            (2, f"u2 u2b {shared}"),
            (3, "solo text with no duplicated spans at all"),
            (4, ""),  # empty doc survives with empty text
            (5, "short doc"),  # < n tokens: no grams, untouched
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dedup.remove_duplicate_spans(docs, n=8, min_doc_freq=2).collect()
    }
    assert out[1]["clean_text"] == "u1 v1" and out[1]["n_removed"] == 8
    assert out[2]["clean_text"] == "u2 u2b" and out[2]["n_removed"] == 8
    assert out[3]["n_removed"] == 0
    assert out[3]["clean_text"] == "solo text with no duplicated spans at all"
    assert out[4]["clean_text"] == "" and out[4]["n_tokens"] == 0
    assert out[5]["clean_text"] == "short doc" and out[5]["n_removed"] == 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="min_doc_freq"):
        dedup.remove_duplicate_spans(docs, n=8, min_doc_freq=1)


def test_remove_duplicate_spans_overlapping_windows(spark):
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import dedup

    # 3-grams: "a b c" (docs 1+2) and "c d e" (docs 1+3) overlap in doc
    # 1 at token c -> coverage is the UNION [0,5), all five tokens cut
    docs = spark.createDataFrame(
        [
            (1, "a b c d e tail1 tail2"),
            (2, "x a b c y"),
            (3, "z c d e w"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dedup.remove_duplicate_spans(docs, n=3, min_doc_freq=2).collect()
    }
    assert out[1]["clean_text"] == "tail1 tail2" and out[1]["n_removed"] == 5
    assert out[2]["clean_text"] == "x y"
    assert out[3]["clean_text"] == "z w"


def test_naive_bayes_classify_separable_corpus(spark):
    # Two vocabularies that never mix: the held-out docs (id % 3 == 0)
    # must be classified by their own class's tokens.
    rows = []
    for i in range(30):
        lbl = "aa" if i % 2 == 0 else "bb"
        words = ("apple banana cherry" if lbl == "aa" else "dog emu ferret")
        rows.append((i, f"{words} {words}", lbl))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = prep.naive_bayes_classify(docs, test_mod=3).collect()
    assert len(out) == 10
    assert all(r["correct"] for r in out)
    assert all(r["pred_label"] == r["true_label"] for r in out)


def test_naive_bayes_tie_breaks_to_smaller_label(spark):
    # a test doc with only unseen tokens scores every class by prior
    # alone; equal priors -> round-10 tie -> smaller label wins
    docs = spark.createDataFrame(
        [
            (0, "zz qq ww", "bb"),  # test doc, tokens unseen in training
            (1, "foo bar", "bb"),
            (2, "foo baz", "aa"),
            (3, "bar baz", "aa"),
            (4, "foo bar baz", "bb"),
        ],
        "doc_id long, text string, lang string",
    )
    out = prep.naive_bayes_classify(docs, test_mod=5).collect()
    assert len(out) == 1
    r = out[0]
    # equal doc priors (2 aa / 2 bb) but UNSEEN tokens still pay each
    # class's ln(T_l + V): equal here too (3 tokens each) -> tie -> aa
    assert r["pred_label"] == "aa"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="test_mod"):
        prep.naive_bayes_classify(docs, test_mod=1)


def test_winnow_fingerprints_rightmost_min_and_guarantee(spark):
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import dedup

    # identical docs -> identical fingerprint sets at identical offsets
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, "completely different material here xyz")],
        "doc_id long, text string",
    )
    out = dedup.winnow_fingerprints(docs, k=5, w=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    assert by_doc[1] == by_doc[2]
    assert by_doc[1] != by_doc[3]
    # density: winnowing selects ~2/(w+1) of the grams, never zero
    n_grams = len(base) - 5 + 1
    assert 0 < len(by_doc[1]) < n_grams
    # guarantee: a shared substring of >= k+w-1 chars yields at least
    # one shared fingerprint VALUE between otherwise-different docs
    shared = "abcdefghijklmnopqrstuvwxyz0123456789"  # 36 >= 5+4-1
    docs2 = spark.createDataFrame(
        [(10, f"prefix one {shared} tail A"), (20, f"other start {shared} Z")],
        "doc_id long, text string",
    )
    fps = dedup.winnow_fingerprints(docs2, k=5, w=4).collect()
    s10 = {r["fp"] for r in fps if r["doc_id"] == 10}
    s20 = {r["fp"] for r in fps if r["doc_id"] == 20}
    assert s10 & s20
    # docs shorter than k yield no fingerprints
    short = spark.createDataFrame([(9, "ab")], "doc_id long, text string")
    assert dedup.winnow_fingerprints(short, k=5, w=4).count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k"):
        dedup.winnow_fingerprints(docs, k=0, w=4)
    with _pytest.raises(ValueError, match="w"):
        dedup.winnow_fingerprints(docs, k=5, w=0)


def test_winnow_fingerprints_short_gram_list_single_window(spark):
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import dedup

    # text with k <= len < k+w-1: fewer grams than the window -> ONE
    # window over all grams, exactly one fingerprint selected
    docs = spark.createDataFrame([(1, "abcdef")], "doc_id long, text string")
    out = dedup.winnow_fingerprints(docs, k=5, w=8).collect()
    assert len(out) == 1


def test_winnow_pairs_clones_pair_up(spark):
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import dedup

    t1 = "a long enough piece of shared text that winnowing will select from"
    docs = spark.createDataFrame(
        [(1, t1), (2, t1 + " plus suffix"), (3, "unrelated content entirely so")],
        "doc_id long, text string",
    )
    pairs = dedup.winnow_pairs(docs, k=5, w=4, min_shared=2).collect()
    assert [(p["doc_a"], p["doc_b"]) for p in pairs] == [(1, 2)]
    assert pairs[0]["shared_fps"] >= 2


def test_bm25_topk_ranking_and_guards(spark):
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import retrieval

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple cherry"),     # 2 query terms, tf(apple)=2
            (2, "apple kiwi melon grape"),        # 1 query term
            (3, "banana banana banana banana"),   # 1 term, high tf, same dl
            (4, "nothing relevant here at all"),  # no terms -> absent
            (5, "apple banana"),                  # both terms, shortest doc
        ],
        "doc_id long, text string",
    )
    out = retrieval.bm25_topk(docs, "apple banana", k=10).collect()
    ids = [r["doc_id"] for r in out]
    assert 4 not in ids and len(ids) == 4
    assert [r["rank"] for r in out] == [1, 2, 3, 4]
    # the short doc containing BOTH terms outranks everything (length
    # normalization + both idfs); the two-term doc beats single-term
    assert ids[0] == 5
    assert ids[1] == 1
    # k caps the result
    assert retrieval.bm25_topk(docs, "apple banana", k=2).count() == 2
    # duplicate query terms are deduped: identical scores
    a = {r["doc_id"]: r["score"] for r in out}
    bdup = {
        r["doc_id"]: r["score"]
        for r in retrieval.bm25_topk(docs, "banana apple apple", k=10).collect()
    }
    assert a == bdup
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must"):
        retrieval.bm25_topk(docs, "apple", k=0)
    with _pytest.raises(ValueError, match="no terms"):
        retrieval.bm25_topk(docs, "  ")


def test_bm25_topk_plan_is_take_ordered(spark):
    """Plan-shape guard (r6 verdict item #1): the global top-k tail must
    be a TakeOrderedAndProject (per-partition partial top-k) — never a
    full-matched-set sort/window through a single partition. The rank
    window may only run over the <=k limit survivors."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import retrieval

    docs = spark.createDataFrame(
        [(i, "apple banana word%d" % i) for i in range(50)],
        "doc_id long, text string",
    )
    df = retrieval.bm25_topk(docs, "apple banana", k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    # Spark prints parents above children: the rank Window must sit ABOVE
    # the TakeOrderedAndProject (i.e. it consumes the k survivors, not the
    # full matched set).
    assert plan.index("Window") < plan.index("TakeOrderedAndProject"), plan
    # no single-partition exchange below the top-k (the window's own
    # SinglePartition exchange above it carries only k rows)
    below_topk = plan[plan.index("TakeOrderedAndProject"):]
    assert "Exchange SinglePartition" not in below_topk, plan


def test_rrf_fuse_full_outer_and_ties(spark):
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import retrieval

    a = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(2, 1), (4, 2)], "doc_id long, rank int"
    )
    out = retrieval.rrf_fuse(a, b, k=10, c=60).collect()
    by_id = {r["doc_id"]: r for r in out}
    # doc 2 is in both lists and must win
    assert out[0]["doc_id"] == 2 and out[0]["rank"] == 1
    assert by_id[2]["rrf_score"] == round(1 / 61 + 1 / 62, 6)
    # one-sided docs carry a null rank on the missing side
    assert by_id[1]["rank_vec"] is None and by_id[4]["rank_lex"] is None
    # doc 1 (lex rank 1) ties doc 4's... 1/61 vs 1/62: doc 1 > doc 4
    assert by_id[1]["rrf_score"] > by_id[4]["rrf_score"]
    # equal scores tie-break by doc_id: doc 3 (1/63) unique here, but
    # two docs at the same single-list rank never happens within one
    # list; verify k cap instead
    assert retrieval.rrf_fuse(a, b, k=2).count() == 2
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must"):
        retrieval.rrf_fuse(a, b, k=0)
    with _pytest.raises(ValueError, match="c must"):
        retrieval.rrf_fuse(a, b, c=0)


def test_temperature_mixture_sample_sqrt_masses_and_exact_boundary(spark):
    import math

    from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.hashing import (
        portable_hash64,
    )

    # three sources with token masses ~ 1x / 4x / 16x (one doc = one
    # token of mass via count_col)
    rows = []
    did = 0
    for src, n in (("a", 250), ("b", 1000), ("c", 4000)):
        for _ in range(n):
            rows.append((did, src, 1))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, source string, w int")
    scale = 1000
    out = prep.temperature_mixture_sample(
        docs, group_col="source", count_col="w", seed=7, scale=scale
    ).collect()
    kept = {}
    for r in out:
        kept.setdefault(r["source"], 0)
        kept[r["source"]] += 1
    # smallest group kept whole; others ~ sqrt(T_min/T_g): 1/2 and 1/4
    assert kept["a"] == 250
    assert abs(kept["b"] / 1000 - 0.5) < 0.08
    assert abs(kept["c"] / 4000 - 0.25) < 0.08
    # exact boundary identity: the engine's isqrt threshold keeps a row
    # iff h^2 * T_g < scale^2 * T_min (the oracle's HUGEINT rule)
    t = {"a": 250, "b": 1000, "c": 4000}
    t_min = 250
    buckets = {
        r["doc_id"]: r["sample_bucket"]
        for r in docs.select(
            "doc_id",
            F.pmod(
                portable_hash64(F.concat(F.col("doc_id").cast("string"), F.lit(":7"))),
                F.lit(scale),
            ).cast("int").alias("sample_bucket"),
        ).collect()
    }
    kept_ids = {r["doc_id"] for r in out}
    for doc_id, src, _w in rows:
        h = buckets[doc_id]
        expect = h * h * t[src] < scale * scale * t_min
        assert (doc_id in kept_ids) == expect, (doc_id, src, h)
    # determinism
    again = prep.temperature_mixture_sample(
        docs, group_col="source", count_col="w", seed=7, scale=scale
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_bm25_topk_batch_identical_to_point(spark):
    from finding_similar_high_dimensional_items_for_big_data_sets_spark import contract as C2
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import retrieval

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    qdf = spark.createDataFrame(
        list(C2.BM25_BATCH_QUERIES), "query_id long, query_text string"
    )
    batch = retrieval.bm25_topk_batch(docs, qdf, k=5).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["score"], r["rank"])
        )
    for qid, qtext in C2.BM25_BATCH_QUERIES:
        point = [
            (r["doc_id"], r["score"], r["rank"])
            for r in retrieval.bm25_topk(docs, qtext, k=5).collect()
        ]
        assert sorted(by_q[qid]) == sorted(point), qid
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no query terms"):
        retrieval.bm25_topk_batch(
            docs,
            spark.createDataFrame([(0, " ")], "query_id long, query_text string"),
        )


def test_containment_pairs_catches_subset_docs(spark):
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import dedup

    long_doc = " ".join(f"tok{i}" for i in range(60))
    short_doc = " ".join(f"tok{i}" for i in range(20, 30))  # embedded span
    docs = spark.createDataFrame(
        [(1, long_doc), (2, short_doc), (3, "entirely unrelated words here now")],
        "doc_id long, text string",
    )
    out = {(r["doc_a"], r["doc_b"]): r for r in
           dedup.containment_pairs(docs, n=3, threshold=0.9).collect()}
    assert (1, 2) in out
    r = out[(1, 2)]
    # the short doc's 3-grams are ALL inside the long doc: ba == 1.0,
    # while symmetric jaccard stays far below the threshold
    assert r["containment_ba"] == 1.0
    assert r["containment_ab"] < 0.2
    assert r["jaccard"] < 0.2
    assert (1, 3) not in out and (2, 3) not in out
