"""Round-4 additions: Gopher-style repetition metrics, substring-level
contamination pairs (shared exact n-grams), and balanced mixture
sampling. Unit semantics against plain-Python references, plus plan
audits for the shuffle contracts the 100 TB story relies on."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions import textstats
from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.text import tokenize
from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import dedup, prep


def _ngrams(words: list[str], n: int) -> list[str]:
    if len(words) < n:
        return []
    return [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]


def test_ngram_counts_match_python_counter(spark):
    texts = [
        "a b a b a b c",          # heavy bigram repetition
        "x y z x y z x y z x",    # repeated trigrams
        "one two",                # too short for trigrams
        "solo",                   # too short for bigrams
        "",                       # empty
        "w w w w",                # single repeated token
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    toks = tokenize(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            textstats.top_ngram_count(textstats.word_ngram_multiset(toks, 2)).alias("top2"),
            textstats.dup_ngram_occurrences(textstats.word_ngram_multiset(toks, 3)).alias("dup3"),
            F.size(textstats.word_ngram_multiset(toks, 3)).alias("n3"),
        ).collect()
    }
    for i, t in enumerate(texts):
        words = [w for w in t.split(" ") if w]
        bg, tg = Counter(_ngrams(words, 2)), Counter(_ngrams(words, 3))
        assert out[i]["top2"] == (max(bg.values()) if bg else 0), t
        assert out[i]["dup3"] == sum(c for c in tg.values() if c >= 2), t
        assert out[i]["n3"] == len(_ngrams(words, 3)), t


def test_repetition_stats_is_shuffle_free(spark, sf_dir):
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.plans.queries import q_repetition_stats

    plan = q_repetition_stats(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # row-local HOF work only


def test_shared_ngram_spans_finds_planted_overlap(spark):
    shared = "q w e r t y u i"  # one exact 8-gram
    rows = [
        (1, shared + " alpha beta"),
        (2, "gamma " + shared),
        (3, "k l m n o p q r s t"),  # no overlap with anyone
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = dedup.shared_ngram_spans(df, n=8, max_doc_freq=4).collect()
    assert [(r["doc_a"], r["doc_b"], r["shared_ngrams"]) for r in got] == [(1, 2, 1)]


def test_shared_ngram_spans_doc_freq_cap_drops_boilerplate(spark):
    boiler = "b1 b2 b3 b4 b5 b6 b7 b8"
    rows = [(i, f"{boiler} tail{i}") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # gram appears in 5 docs; cap 4 -> boilerplate dropped, no pairs
    assert dedup.shared_ngram_spans(df, n=8, max_doc_freq=4).count() == 0
    # raise the cap: all C(5,2)=10 pairs appear with 1 shared gram each
    got = dedup.shared_ngram_spans(df, n=8, max_doc_freq=8).collect()
    assert len(got) == 10
    assert all(r["doc_a"] < r["doc_b"] and r["shared_ngrams"] == 1 for r in got)


def test_shared_ngram_spans_counts_multiple_spans(spark):
    a = "s1 s2 s3 s4 s5 s6 s7 s8"
    b = "t1 t2 t3 t4 t5 t6 t7 t8"
    df = spark.createDataFrame(
        [(1, f"{a} mid {b}"), (2, f"{b} other {a}")], "doc_id long, text string"
    )
    got = dedup.shared_ngram_spans(df, n=8, max_doc_freq=4).collect()
    assert len(got) == 1
    assert got[0]["doc_a"] == 1 and got[0]["doc_b"] == 2
    assert got[0]["shared_ngrams"] == 2  # both planted grams, not bridge grams
    # min_shared prunes pairs below the bar
    assert dedup.shared_ngram_spans(df, n=8, max_doc_freq=4, min_shared=3).count() == 0


def test_mixture_sample_balances_toward_smallest_source(spark):
    rows = []
    for i in range(300):
        rows.append((i, "big", "tok " * 10))
    for i in range(300, 400):
        rows.append((i, "small", "tok " * 10))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = prep.balanced_mixture_sample(df, group_col="source", seed=7)
    kept = out.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()
    t = {r["source"]: r["t"] for r in kept}
    assert t["small"] == 100 * 10  # floor source is never downsampled
    # big is binomially thinned toward the floor mass: 1000 +- sampling noise
    assert 700 <= t["big"] <= 1300
    # determinism: identical output on a re-run
    again = prep.balanced_mixture_sample(df, group_col="source", seed=7)
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
    # a different seed keeps the floor source intact but reshuffles big
    other = prep.balanced_mixture_sample(df, group_col="source", seed=8)
    small_ids = {r["doc_id"] for r in other.collect() if r["source"] == "small"}
    assert small_ids == set(range(300, 400))


def test_mixture_sample_filter_stage_has_no_shuffle(spark):
    df = spark.createDataFrame(
        [(i, f"s{i % 3}", "a b c") for i in range(30)],
        "doc_id long, source string, text string",
    )
    out = prep.balanced_mixture_sample(df, group_col="source")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # thresholds are folded in as literals: the kept-rows scan is one
    # stage, no join/exchange against a thresholds table
    assert "Exchange" not in plan
    assert "Join" not in plan
