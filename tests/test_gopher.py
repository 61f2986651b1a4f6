"""Gopher quality rules: each heuristic fires on a targeted violation,
boundaries are exact, and the contract query splits the fixture
non-trivially with every rule non-vacuous."""

from __future__ import annotations

from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import prep
from finding_similar_high_dimensional_items_for_big_data_sets_spark.plans.queries import (
    q_gopher_rules,
)


def _rules(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = prep.gopher_rules(df, **kw)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_each_rule_fires_on_its_violation(spark):
    ok = "the big row value " + " ".join(f"word{i}" for i in range(46))  # 50 words
    rows = [
        (0, ok),
        (1, "the big row value"),  # too few words
        (2, ok + " " + " ".join(["#"] * 20)),  # symbols
        (3, "- " + ok),  # all lines bulleted
        (4, ok + " more..."),  # all lines ellipsis-ended
        (5, ok + " " + " ".join(["12345"] * 30)),  # non-alpha words
        (6, " ".join(f"word{i}" for i in range(50))),  # no stopwords
        (7, " ".join(["the", "big"] + ["ab" * 30] * 48)),  # mean len > 10
    ]
    got = _rules(
        spark, rows, min_words=50, max_words=200,
        stopwords=("the", "big", "row", "value"),
    )
    assert got[0]["keep"]
    assert not got[1]["r_word_count"] and got[1]["r_symbol"]
    assert not got[2]["r_symbol"] and got[2]["r_word_count"]
    assert not got[3]["r_bullet"] and got[3]["r_ellipsis"]
    assert not got[4]["r_ellipsis"] and got[4]["r_bullet"]
    assert not got[5]["r_alpha"]
    assert not got[6]["r_stopwords"]
    assert not got[7]["r_mean_len"]
    for i in range(1, 8):
        assert not got[i]["keep"], i


def test_word_count_boundary_exact(spark):
    rows = [
        (0, " ".join(["the", "big"] + [f"w{i}" for i in range(8)])),  # 10
        (1, " ".join(["the", "big"] + [f"w{i}" for i in range(7)])),  # 9
    ]
    got = _rules(spark, rows, min_words=10, max_words=10,
                 stopwords=("the", "big"))
    assert got[0]["r_word_count"] and not got[1]["r_word_count"]


def test_multiline_fractions(spark):
    text = "- first\nplain line...\n- third\nlast..."
    got = _rules(
        spark, [(0, text)], min_words=1, max_words=100,
        stopwords=("first", "plain"),
    )[0]
    assert got["n_lines"] == 4
    assert got["bullet_lines"] == 2
    assert got["ellipsis_lines"] == 2
    assert got["r_bullet"]  # 2/4 < 9/10
    assert not got["r_ellipsis"]  # 2/4 >= 3/10


def test_contract_query_nonvacuous(spark):
    out = q_gopher_rules(spark, "/root/testdata/sf0.001").cache()
    n = out.count()
    kept = out.filter("keep").count()
    assert 0 < kept < n  # the bundle splits the corpus
    for rule in ("r_word_count", "r_symbol", "r_bullet", "r_ellipsis",
                 "r_alpha", "r_stopwords"):
        assert out.filter(f"NOT {rule}").count() > 0, rule
    out.unpersist()
