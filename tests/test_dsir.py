"""DSIR importance resampling (Xie et al., NeurIPS 2023).

Semantics: target-like raw docs must outscore off-target ones; the
Gumbel-top-k selection must be deterministic with a lawful rank
column. Parity: the engine's fold must equal a from-scratch Python
recompute (hashlib md5, math.log) on a controlled corpus. Plans: the
scoring pass must be shuffle-free (the trained ratios ride the plan
as a literal array) and selection must be TakeOrderedAndProject —
never a global sort — with the rank window over the <= n survivors.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.prep import (
    dsir_feature_log_ratios,
    dsir_importance_weights,
    dsir_select,
)

B = 64


def _docs(spark):
    """Targets (id % 10 == 0) speak vocabulary A; raw docs 1/2 speak A
    (target-like), raw docs 3/4 speak B (off-target)."""
    a = "alpha beta gamma delta alpha beta"
    b = "omega sigma tau kappa omega sigma"
    rows = [(0, a), (10, a), (20, a)] + [(1, a), (2, a), (3, b), (4, b)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_buckets(text: str, n_buckets: int) -> list[int]:
    toks = [t for t in text.split(" ") if t]
    grams = list(toks)
    if len(toks) >= 2:
        grams += [f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)]
    return [
        int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % n_buckets
        for g in grams
    ]


def _py_weight(docs: list[tuple[int, str]], doc: str, n_buckets: int) -> float:
    ct: dict[int, int] = {}
    cr: dict[int, int] = {}
    for did, text in docs:
        side = ct if did % 10 == 0 else cr
        for f in _py_buckets(text, n_buckets):
            side[f] = side.get(f, 0) + 1
    t_tot, r_tot = sum(ct.values()), sum(cr.values())
    acc = 0.0
    for f in sorted(_py_buckets(doc, n_buckets)):
        acc += (
            math.log(ct.get(f, 0) + 1)
            - math.log(t_tot + n_buckets)
            - math.log(cr.get(f, 0) + 1)
            + math.log(r_tot + n_buckets)
        )
    return acc


def test_target_like_docs_outscore_off_target(spark):
    w = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_importance_weights(_docs(spark), n_buckets=B).collect()
    }
    assert set(w) == {1, 2, 3, 4}  # raw pool only, targets excluded
    assert w[1] > w[3] and w[2] > w[4]
    assert w[1] > 0.0 > w[3]  # A-docs target-like, B-docs raw-like


def test_weight_matches_python_recompute(spark):
    rows = [(r["doc_id"], r["text"]) for r in _docs(spark).collect()]
    w = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_importance_weights(_docs(spark), n_buckets=B).collect()
    }
    for did, text in rows:
        if did % 10 == 0:
            continue
        assert w[did] == pytest.approx(
            round(_py_weight(rows, text, B), 6), abs=2e-6
        )


def test_select_rank_law_and_determinism(spark):
    docs = _docs(spark)
    got = dsir_select(docs, n_select=3, n_buckets=B).collect()
    assert [r["sel_rank"] for r in got] == [1, 2, 3]
    keys = [r["sel_key"] for r in got]
    assert keys == sorted(keys, reverse=True)
    again = dsir_select(docs, n_select=3, n_buckets=B).collect()
    assert got == again
    # ranks 1..2 are a prefix of ranks 1..3: Gumbel-top-k without
    # replacement nests across budgets
    two = dsir_select(docs, n_select=2, n_buckets=B).collect()
    assert [(r["doc_id"], r["sel_key"]) for r in two] == [
        (r["doc_id"], r["sel_key"]) for r in got[:2]
    ]


def test_ratios_are_bounded_model(spark):
    lam = dsir_feature_log_ratios(_docs(spark), n_buckets=B)
    assert len(lam) == B
    # unseen buckets carry the constant prior ratio ln(R+B) - ln(T+B)
    seen = set()
    for _, text in [(r["doc_id"], r["text"]) for r in _docs(spark).collect()]:
        seen.update(_py_buckets(text, B))
    unseen = [lam[f] for f in range(B) if f not in seen]
    assert len(set(round(x, 12) for x in unseen)) == 1


def test_empty_split_raises(spark):
    only_raw = spark.createDataFrame(
        [(1, "alpha beta")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="empty DSIR split"):
        dsir_feature_log_ratios(only_raw, n_buckets=B)


def test_plans_scoring_shuffle_free_selection_take_ordered(spark):
    docs = _docs(spark)
    pw = dsir_importance_weights(
        docs, n_buckets=B
    )._jdf.queryExecution().executedPlan().toString()
    # the trained ratios are a plan literal: scoring is a pure map
    assert "Exchange" not in pw
    ps = dsir_select(
        docs, n_select=3, n_buckets=B
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in ps
    assert "Exchange" not in ps  # rank window runs over <= n survivors


def test_select_tokens_budget_law_and_prefix_consistency(spark):
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.prep import (
        dsir_select_tokens,
    )

    docs = _docs(spark)
    got = sorted(
        dsir_select_tokens(docs, token_budget=18, n_buckets=B,
                           partitions=3).collect(),
        key=lambda r: r["cum_tokens"],
    )
    assert got, "budget of 18 tokens fits at least one 6-token doc"
    # running total includes each doc and never exceeds the budget
    run = 0
    for r in got:
        run += r["n_tokens"]
        assert r["cum_tokens"] == run
    assert run <= 18
    # greedy maximality + prefix consistency: the kept docs are exactly
    # the first |kept| of the count-budget selection (same key order)
    ranked = dsir_select(docs, n_select=4, n_buckets=B).collect()
    kept_ids = [r["doc_id"] for r in got]
    assert kept_ids == [r["doc_id"] for r in ranked[: len(got)]]
    nxt = ranked[len(got)]["doc_id"]
    nxt_tokens = {
        r["doc_id"]: len([t for t in r["text"].split(" ") if t])
        for r in docs.collect()
    }[nxt]
    assert run + nxt_tokens > 18  # the next doc would not have fit


def test_select_tokens_plan_has_no_global_window(spark):
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.prep import (
        dsir_select_tokens,
    )

    df = dsir_select_tokens(_docs(spark), token_budget=18, n_buckets=B,
                            partitions=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "Window" not in plan


def test_divergence_orders_distribution_distance(spark):
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.prep import (
        dsir_divergence,
    )

    a = "alpha beta gamma delta alpha beta"
    b_txt = "omega sigma tau kappa omega sigma"
    same = spark.createDataFrame(
        [(0, a), (10, a), (1, a), (2, a)], "doc_id long, text string"
    )
    far = spark.createDataFrame(
        [(0, a), (10, a), (1, b_txt), (2, b_txt)], "doc_id long, text string"
    )
    r_same = dsir_divergence(same, n_buckets=B).collect()[0]
    r_far = dsir_divergence(far, n_buckets=B).collect()[0]
    # smoothed distributions are proper: both KLs are non-negative
    for r in (r_same, r_far):
        assert r["kl_target_raw"] >= 0.0 and r["kl_raw_target"] >= 0.0
    # disjoint vocabularies diverge far more than identical ones
    assert r_far["kl_target_raw"] > 10 * r_same["kl_target_raw"]
    assert r_far["kl_raw_target"] > 10 * r_same["kl_raw_target"]
    assert 0 < r_same["active_buckets"] <= B


def test_null_text_scores_like_empty(spark):
    a = "alpha beta gamma delta alpha beta"
    docs = spark.createDataFrame(
        [(0, a), (10, a), (1, a), (2, None), (3, "")],
        "doc_id long, text string",
    )
    w = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_importance_weights(docs, n_buckets=B).collect()
    }
    # NULL text must fold like the empty doc (0.0), matching the
    # oracle's zero-occurrence + coalesce semantics — not a NULL that
    # poisons the fold and silently drops the doc from selection
    assert w[2] == 0.0 == w[3]
    sel = dsir_select(docs, n_select=3, n_buckets=B).collect()
    assert {r["doc_id"] for r in sel} == {1, 2, 3}
    assert all(r["sel_key"] is not None for r in sel)
