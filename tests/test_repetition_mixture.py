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
    # row-local HOF work only: the ONLY allowed exchange is load_table's
    # round-robin spread of the single-row-group fixture scan — no
    # data-dependent (hash/range) shuffle may appear
    stripped = plan.replace("Exchange RoundRobinPartitioning", "")
    assert "Exchange" not in stripped


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


def test_mixture_sample_balances_token_mass(spark):
    # source A has ~10x the token mass of source B; after sampling the
    # expected masses are equal (binomial draw -> allow wide tolerance)
    rows = [(i, "tok " * 20, "A") for i in range(500)] + [
        (1000 + i, "tok " * 20, "B") for i in range(50)
    ]
    df = spark.createDataFrame(
        [(i, t.strip(), s) for i, t, s in rows], "doc_id long, text string, source string"
    )
    out = prep.balanced_mixture_sample(df, group_col="source").collect()
    mass = {}
    for r in out:
        mass[r["source"]] = mass.get(r["source"], 0) + r["n_tokens"]
    assert mass["B"] == 50 * 20  # floor group kept whole
    assert 0.5 * mass["B"] <= mass["A"] <= 1.5 * mass["B"], mass


def test_mixture_sample_deterministic_and_shuffle_bounded(spark, sf_dir):
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.plans.queries import q_mixture_sample

    a = sorted(r["doc_id"] for r in q_mixture_sample(spark, sf_dir).collect())
    b = sorted(r["doc_id"] for r in q_mixture_sample(spark, sf_dir).collect())
    assert a == b and len(a) > 0
    # the kept-rows side is a pure filter: no data-dependent
    # (hash/range) shuffle in its plan — only load_table's round-robin
    # spread of the single-row-group fixture scan is allowed
    plan = q_mixture_sample(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.replace(
        "Exchange RoundRobinPartitioning", ""
    )


def test_token_entropy_matches_python(spark):
    import math
    from collections import Counter

    texts = ["a a a a", "a b c d", "a a b b c", "solo", ""]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["ent"]
        for r in df.select(
            "doc_id",
            F.round(textstats.token_entropy(tokenize(F.col("text"))), 6).alias("ent"),
        ).collect()
    }
    for i, t in enumerate(texts):
        words = [w for w in t.split() if w]
        n = len(words)
        exp = 0.0
        if n:
            exp = math.log(n) - sum(
                c * math.log(c) for c in Counter(words).values()
            ) / n
        assert abs(got[i] - exp) < 1e-6, (t, got[i], exp)


def test_unigram_lm_scores_match_python(spark):
    import math
    from collections import Counter

    texts = ["a a b", "b c a a b", "x1 x2 x3", ""]  # x* are singletons
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    corpus = Counter(w for t in texts for w in t.split())
    total = sum(corpus.values())
    got = {r["doc_id"]: r for r in prep.unigram_lm_scores(df).collect()}
    assert len(got) == len(texts)  # empty doc retained
    for i, t in enumerate(texts):
        words = t.split()
        exp = 0.0
        if words:
            exp = math.log(total) - sum(math.log(corpus[w]) for w in words) / len(words)
        assert abs(got[i]["lm_nll"] - exp) < 1e-6, (t, got[i]["lm_nll"], exp)
    # common-token doc scores lower (more corpus-like) than rare-token doc
    assert got[0]["lm_nll"] < got[2]["lm_nll"]


def test_unigram_lm_scores_scan_economy_and_vocab_artifact(spark, tmp_path):
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    df = prep.unigram_lm_scores(docs)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # self-contained plan: per-doc pass + vocab pass, never a third
    # corpus scan from a duplicated frequency subtree
    assert plan.count("FileScan parquet") == 2
    # production path: prebuilt vocab artifact -> exactly ONE corpus scan
    vocab = (
        docs.select(F.explode(tokenize(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cf"))
    )
    vpath = str(tmp_path / "vocab")
    vocab.write.parquet(vpath)
    df2 = prep.unigram_lm_scores(docs, vocab=spark.read.parquet(vpath))
    plan2 = df2._jdf.queryExecution().executedPlan().toString()
    assert plan2.count("documents.parquet") == 1
    a = sorted((r["doc_id"], r["lm_nll"]) for r in df.collect())
    b = sorted((r["doc_id"], r["lm_nll"]) for r in df2.collect())
    assert a == b and len(a) > 0


def test_lm_quality_bands_terciles_and_validation(spark):
    import pytest

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(i % 7 + 1)) + f" t{i}") for i in range(90)],
        "doc_id long, text string",
    )
    out = prep.lm_quality_bands(docs).collect()
    assert len(out) == 90
    counts = {}
    for r in out:
        counts[r["band"]] = counts.get(r["band"], 0) + 1
    # terciles up to cutoff ties: each band is a nonempty ~third
    assert set(counts) == {"head", "middle", "tail"}
    assert all(10 <= c <= 60 for c in counts.values()), counts
    # head has the lowest scores, tail the highest
    by_band = {b: [r["lm_nll"] for r in out if r["band"] == b] for b in counts}
    assert max(by_band["head"]) <= min(by_band["tail"])
    with pytest.raises(ValueError):
        prep.lm_quality_bands(docs, cuts=(0.5, 0.4))


def test_mixture_sample_degenerate_groups(spark):
    # a zero-mass source must not crash or empty the other sources, and
    # a null source key must not crash the literal map
    rows = [(1, "a", "tok tok"), (2, "b", ""), (3, None, "tok"), (4, "a", "tok")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = prep.balanced_mixture_sample(df, group_col="source").collect()
    ids = {r["doc_id"] for r in out}
    assert ids == {1, 4}  # source a (the only positive-mass source) kept whole
    # all-empty corpus: empty result, no ZeroDivisionError
    empty = spark.createDataFrame([(1, "a", "")], "doc_id long, source string, text string")
    assert prep.balanced_mixture_sample(empty, group_col="source").count() == 0


def test_repetition_stats_empty_doc_fractions_are_zero(spark):
    import math

    # exercise q_repetition_stats' guarded fraction expr on a frame
    # with an empty doc (the fixtures carry none)
    docs = spark.createDataFrame([(0, ""), (1, "a a a a")], "doc_id long, text string")
    toks = tokenize(F.col("text"))
    bigrams = textstats.word_ngram_multiset(toks, 2)
    out = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id",
            F.size(toks).alias("n_tokens"),
            textstats.top_ngram_count(bigrams).alias("top_bigram_count"),
        )
        .select(
            "doc_id",
            F.when(
                F.col("n_tokens") > 0,
                F.least(F.lit(1.0), (2.0 * F.col("top_bigram_count")) / F.col("n_tokens")),
            )
            .otherwise(F.lit(0.0))
            .alias("f"),
        )
        .collect()
    }
    assert out[0]["f"] == 0.0 and not math.isnan(out[0]["f"])
    assert out[1]["f"] == 1.0


def test_chunk_documents_windows_and_edges(spark):
    import pytest

    texts = {
        0: " ".join(f"t{i}" for i in range(10)),  # 10 toks: chunks at 0,4,8
        1: "a b c",                                # shorter than window
        2: "",                                     # no chunks
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    out = prep.chunk_documents(df, window=5, stride=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 2 not in by_doc
    c0 = sorted(by_doc[0], key=lambda r: r["chunk_idx"])
    assert [r["chunk_text"] for r in c0] == [
        "t0 t1 t2 t3 t4", "t4 t5 t6 t7 t8", "t8 t9"
    ]
    assert [r["n_chunk_tokens"] for r in c0] == [5, 5, 2]
    assert by_doc[1][0]["chunk_text"] == "a b c" and len(by_doc[1]) == 1
    # overlap reconstruction: stride tokens of each non-final chunk
    # prefix-concatenated + final chunk == original doc
    rebuilt = " ".join(
        " ".join(r["chunk_text"].split(" ")[:4]) for r in c0[:-1]
    ) + " " + c0[-1]["chunk_text"]
    assert rebuilt == texts[0]
    with pytest.raises(ValueError):
        prep.chunk_documents(df, window=0, stride=4)
    # shuffle-free plan
    plan = prep.chunk_documents(df, 5, 4)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_snapshot_diff_semantics(spark):
    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "Gamma  ")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "alpha"), (3, "something else"), (4, "delta")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["change"] for r in prep.snapshot_diff(old, new).collect()}
    assert got == {2: "removed", 3: "modified", 4: "added"}  # 1 unchanged, omitted
    # normalization: case/whitespace-only changes are NOT modifications
    new2 = spark.createDataFrame([(3, "gamma")], "doc_id long, text string")
    old2 = spark.createDataFrame([(3, "Gamma  ")], "doc_id long, text string")
    assert prep.snapshot_diff(old2, new2).count() == 0


def test_mine_triplets_determinism_and_filters(spark):
    import pytest

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(50)], "doc_id long, text string"
    )
    positives = spark.createDataFrame(
        [(1, 2, 3), (10, 11, 1)], "doc_a long, doc_b long, shared_ngrams int"
    )
    a = prep.mine_triplets(positives, docs, n_negatives=4, seed=11).collect()
    b = prep.mine_triplets(positives, docs, n_negatives=4, seed=11).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)) and len(a) > 0
    for r in a:
        assert r["negative_id"] not in (r["anchor_id"], r["positive_id"])
        assert 0 <= r["slot"] < 4
    # a different seed changes the sampled negatives
    c = prep.mine_triplets(positives, docs, n_negatives=4, seed=12).collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))
    with pytest.raises(ValueError):
        prep.mine_triplets(positives, docs, n_negatives=0)


def test_weighted_mixture_hits_target_ratios(spark):
    import pytest

    # three sources with masses 4000/2000/1000; target 50/25/25 ->
    # the binding constraint is C (1000 tokens must be 25%), so the
    # expected kept masses are 2000/1000/1000
    rows = (
        [(i, "A", "t " * 40) for i in range(100)]
        + [(200 + i, "B", "t " * 40) for i in range(50)]
        + [(400 + i, "C", "t " * 40) for i in range(25)]
    )
    df = spark.createDataFrame(
        [(i, s, t.strip()) for i, s, t in rows], "doc_id long, source string, text string"
    )
    out = prep.weighted_mixture_sample(
        df, weights={"A": 500, "B": 250, "C": 250}
    ).collect()
    mass = {}
    for r in out:
        mass[r["source"]] = mass.get(r["source"], 0) + r["n_tokens"]
    assert mass["C"] == 1000  # binding group kept whole
    assert 1400 <= mass["A"] <= 2600  # expect 2000 +- binomial noise
    assert 700 <= mass["B"] <= 1300   # expect 1000
    # a group without a weight is dropped entirely
    out2 = prep.weighted_mixture_sample(df, weights={"A": 1, "B": 1}).collect()
    assert all(r["source"] != "C" for r in out2)
    with pytest.raises(ValueError):
        prep.weighted_mixture_sample(df, weights={})
    with pytest.raises(ValueError):
        prep.weighted_mixture_sample(df, weights={"A": 0})
    # equal weights reproduce the balanced variant exactly
    eq = prep.weighted_mixture_sample(df, weights={"A": 1, "B": 1, "C": 1})
    bal = prep.balanced_mixture_sample(df)
    assert sorted(r["doc_id"] for r in eq.collect()) == sorted(
        r["doc_id"] for r in bal.collect()
    )


def test_snapshot_diff_null_text_presence(spark):
    # presence comes from markers, not hash nullability: NULL-text docs
    # present in both snapshots must not be reported added/removed
    old = spark.createDataFrame([(1, None), (2, None), (3, "x")], "doc_id long, text string")
    new = spark.createDataFrame([(1, None), (2, "now set"), (4, None)], "doc_id long, text string")
    got = {r["doc_id"]: r["change"] for r in prep.snapshot_diff(old, new).collect()}
    assert got == {2: "modified", 3: "removed", 4: "added"}  # 1 unchanged


def test_ngram_decontamination_catches_embedded_benchmark(spark):
    bench = spark.createDataFrame(
        [(1, "q1 q2 q3 q4 q5 q6 q7 q8"), (2, "r1 r2 r3 r4 r5 r6 r7 r8")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (10, "header q1 q2 q3 q4 q5 q6 q7 q8 footer"),  # embedded bench 1
            (11, "clean x1 x2 x3 x4 x5 x6 x7 x8 page"),     # no overlap
            (12, "r1 r2 r3 r4 r5 r6 r7 r8"),                # verbatim bench 2
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n_contaminated_ngrams"]
        for r in dedup.cross_corpus_ngram_hits(train, bench, n=8).collect()
    }
    assert got == {10: 1, 12: 1}
    # min_hits prunes single-gram overlaps
    assert dedup.cross_corpus_ngram_hits(train, bench, n=8, min_hits=2).count() == 0
    # MinHash whole-doc decontamination DILUTES the embedded case: the
    # n-gram filter exists precisely for containment
    assert 10 in got


def test_ngram_operators_preserve_string_id_type(spark):
    # the gram-hash kernel's output schema must come from the caller's
    # id column type, not a hardcoded long (regression: string ids
    # raised an Arrow type error after the kernel rewrite)
    shared = "q w e r t y u i"
    docs = spark.createDataFrame(
        [("a", shared + " alpha beta"), ("b", "gamma " + shared)],
        "doc_id string, text string",
    )
    got = dedup.shared_ngram_spans(docs, n=8, max_doc_freq=4).collect()
    assert [(r["doc_a"], r["doc_b"], r["shared_ngrams"]) for r in got] == [
        ("a", "b", 1)
    ]
    bench = spark.createDataFrame(
        [("x", shared)], "doc_id string, text string"
    )
    hits = {
        r["doc_id"]: r["n_contaminated_ngrams"]
        for r in dedup.cross_corpus_ngram_hits(docs, bench, n=8).collect()
    }
    assert hits == {"a": 1, "b": 1}
