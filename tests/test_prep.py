"""Training-data prep primitives: deterministic hash split and
distributed sequence packing (two-phase prefix sum)."""

from __future__ import annotations

from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import prep


def test_pack_chunks_matches_single_process_reference(spark):
    """The two-phase distributed prefix sum must equal a plain Python
    cumulative sum in id order — across multiple input AND range
    partitions, with non-contiguous ids."""
    import numpy as np

    rs = np.random.RandomState(3)
    rows = [(int(i * 7 % 997), int(rs.randint(1, 300))) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long").repartition(7)
    out = prep.pack_chunks(df, budget=256, partitions=5).collect()
    got = {r["doc_id"]: (r["chunk_id"], r["chunk_offset"]) for r in out}
    assert len(got) == 500
    before = 0
    for doc_id, n in sorted(rows):
        assert got[doc_id] == (before // 256, before % 256)
        before += n
    assert all(0 <= off < 256 for (_c, off) in got.values())
    # chunk ids are dense-ish and monotone in id order
    chunks = [got[d][0] for d, _ in sorted(rows)]
    assert chunks == sorted(chunks)


def test_pack_chunks_oversized_doc_and_bad_budget(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 2000), (3, 100)], "doc_id long, n_tokens long"
    )
    got = {r["doc_id"]: (r["chunk_id"], r["chunk_offset"]) for r in
           prep.pack_chunks(df, budget=512).collect()}
    # doc 2 spans chunks, doc 3 starts in the chunk holding doc 2's tail
    assert got[1] == (0, 0)
    assert got[2] == (0, 100)
    assert got[3] == (2100 // 512, 2100 % 512)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="budget"):
        prep.pack_chunks(df, budget=0)


def test_hash_split_deterministic_and_proportional(spark):
    df = spark.range(5000).select(F.col("id").alias("doc_id"))
    s1 = prep.hash_split(df, val_permille=100, seed=42)
    n_val = s1.filter(F.col("split") == "val").count()
    assert 0.06 * 5000 < n_val < 0.14 * 5000  # ~10%
    # deterministic across evaluations
    a = sorted(map(tuple, s1.collect()))
    b = sorted(
        map(tuple, prep.hash_split(df, val_permille=100, seed=42).collect())
    )
    assert a == b
    # a different salt reassigns some docs
    c = sorted(
        map(tuple, prep.hash_split(df, val_permille=100, seed=7).collect())
    )
    assert a != c
    # permille bounds validated
    import pytest as _pytest

    with _pytest.raises(ValueError, match="val_permille"):
        prep.hash_split(df, val_permille=1001)


def test_prep_plans_have_no_single_partition_exchange(spark):
    """pack_chunks must scale: range-partition exchange only, never the
    SinglePartition exchange a global orderBy window would plan;
    hash_split is projection-only (no exchange at all)."""
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 37 + 1).alias("n_tokens")
    )
    packed = prep.pack_chunks(df, budget=64, partitions=4)
    plan = packed._jdf.queryExecution().executedPlan().toString()
    # the range exchange runs ONCE inside the localCheckpoint
    # materialization (pinning partition assignment for both jobs); the
    # scan job reads the pinned partitions — and nothing ever plans the
    # SinglePartition exchange a global orderBy window would
    assert "Scan ExistingRDD" in plan
    assert "SinglePartition" not in plan
    assert packed.rdd.getNumPartitions() == 4
    split_plan = (
        prep.hash_split(df.select("doc_id"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in split_plan


def test_collocations_pmi_values_and_plan(spark):
    """PMI on a hand-computable corpus: 'a b' occurs 3x adjacent among
    known totals; score must equal the closed form in the same ln
    order, min_count prunes the singleton pair, and selection plans as
    TakeOrderedAndProject (per-partition top-n, no global sort)."""
    import math

    docs = spark.createDataFrame(
        [
            (0, "a b a b c"),
            (1, "a b d"),
            (2, "c d c"),
        ],
        "doc_id long, text string",
    )
    out = prep.collocations_pmi(docs, min_count=3, top_n=10)
    rows = {(r["left"], r["right"]): r for r in out.collect()}
    # tokens: a=3, b=3, c=3, d=2, n_tok=11; bigrams total 8; (a,b)=3
    assert set(rows) == {("a", "b")}
    got = rows[("a", "b")]
    want = (
        math.log(3.0) + math.log(11.0) + math.log(11.0)
        - math.log(8.0) - math.log(3.0) - math.log(3.0)
    )
    assert got["pair_count"] == 3
    assert abs(got["pmi"] - round(want, 6)) < 1e-12
    assert got["rank"] == 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_url_dedup_first_wins_semantics_and_plan(spark):
    """Normalization collapses scheme/www/query/fragment/trailing-slash
    variants; the smallest id per canonical URL wins; and the plan is
    the scale shape the docstring promises — a partial-aggregated
    groupBy + equi-join, NO per-group sort window."""
    rows = [
        (1, "https://www.A.example.org/page/1?utm=x#top"),
        (2, "http://a.example.org/page/1/"),
        (3, "HTTPS://a.example.org/page/1"),
        (4, "http://a.example.org/page/2"),
        (5, "ftp://b.example.org//"),
        (6, "b.example.org"),  # already scheme-less
        (7, None),  # lost header: not dedup-able by URL
        (8, None),  # second null must NOT first-wins against 7
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = prep.url_dedup_first_wins(df)
    got = {r["doc_id"]: (r["norm_url"], r["keep"]) for r in out.collect()}
    assert len(got) == len(rows)  # no row silently dropped
    assert got[1] == ("a.example.org/page/1", True)
    assert got[2] == ("a.example.org/page/1", False)
    assert got[3] == ("a.example.org/page/1", False)
    assert got[4] == ("a.example.org/page/2", True)
    assert got[5] == ("b.example.org", True)
    assert got[6] == ("b.example.org", False)
    # EVERY null-URL row survives keep=true — an equi-join would drop
    # them; a null-safe join would wrongly dedup them against each other
    assert got[7] == (None, True)
    assert got[8] == (None, True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "HashAggregate" in plan  # map-side partial min per norm_url


def test_source_temperature_mix_hand_values(spark):
    """alpha=0.5 hand case: tokens A=4, B=16 -> weights 2 and 4 of 6;
    alpha=1 degenerates to the raw token share; the plan is one
    aggregation plus a broadcast of the single totals row — no window,
    no second shuffle of the corpus."""
    rows = [
        (0, "A", "a b c"),
        (1, "A", "d"),
        (2, "B", " ".join(["w"] * 16)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["source"]: r for r in prep.source_temperature_mix(df, 0.5).collect()}
    assert (out["A"]["n_docs"], out["A"]["n_tokens"]) == (2, 4)
    assert (out["B"]["n_docs"], out["B"]["n_tokens"]) == (1, 16)
    assert out["A"]["p_raw"] == 0.2 and out["B"]["p_raw"] == 0.8
    assert out["A"]["p_temp"] == round(2 / 6, 6)
    assert out["B"]["p_temp"] == round(4 / 6, 6)
    # effective epochs: p_temp * total_tokens / n_tokens — the small
    # source repeats (oversampled), the big one is undersampled
    assert out["A"]["effective_epochs"] == round(2 / 6 * 20 / 4, 6)
    assert out["B"]["effective_epochs"] == round(4 / 6 * 20 / 16, 6)
    # alpha=1: temperature off, p_temp == p_raw
    flat = {r["source"]: r for r in prep.source_temperature_mix(df, 1.0).collect()}
    assert all(flat[s]["p_temp"] == flat[s]["p_raw"] for s in flat)
    plan = (
        prep.source_temperature_mix(df, 0.5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    assert "Broadcast" in plan  # totals row rides a broadcast join


def test_stratified_split_exact_proportions_and_determinism(spark):
    """Every stratum contributes exactly floor(val_frac * n) rows to
    val regardless of group size; assignment is deterministic and
    content-free; bad fractions raise; the plan shares ONE exchange
    between the two windows."""
    import pytest

    rows = [(i, "big" if i < 80 else "small") for i in range(95)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = prep.stratified_split(df, "lang", 0.2)
    got = out.collect()
    by_group = {}
    for r in got:
        by_group.setdefault(r["lang"], []).append(r)
    assert sum(1 for r in by_group["big"] if r["split"] == "val") == 16
    # floor(0.2 * 15) = 3: the small stratum is GUARANTEED val rows —
    # the coverage a global hash split only gives in expectation
    assert sum(1 for r in by_group["small"] if r["split"] == "val") == 3
    # deterministic on re-run
    again = {(r["doc_id"], r["split"]) for r in out.collect()}
    assert again == {(r["doc_id"], r["split"]) for r in got}
    with pytest.raises(ValueError, match="val_frac"):
        prep.stratified_split(df, "lang", 1.5)
    # both window functions share one lang partitioning: exactly one
    # shuffle in the FINAL plan (AQE's toString repeats the exchange
    # in its Initial Plan section — count only the executed half)
    plan = (
        out._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert plan.count("Exchange hashpartitioning(lang") == 1
