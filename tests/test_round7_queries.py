"""Round-7 operators: exact directional containment (the blocking-
recall closer for containment_pairs) and the governance rollup over
alternate pair sources."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark import contract as C
from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import dedup
from finding_similar_high_dimensional_items_for_big_data_sets_spark.plans import queries as Q


def test_exact_containment_finds_what_lsh_blocking_misses(spark):
    """The planted tiny-in-huge pair (Jaccard ~0.01, far below MinHash
    banding recall at the contract params): the LSH-blocked mode must
    MISS it, the inverted-index exact mode must report it at
    containment 1.0 — the r6 verdict's 'Done' bar for item 5."""
    sf = "/root/testdata/sf0.001"
    exact = Q.q_containment_pairs_exact(spark, sf)
    tiny_vs_huge = exact.filter(
        (F.col("doc_a") == C.CONT_PLANT_TINY_ID)
        & (F.col("doc_b") == C.CONT_PLANT_HUGE_ID)
    ).collect()
    assert len(tiny_vs_huge) == 1
    r = tiny_vs_huge[0]
    # every tiny gram sits inside the huge doc; symmetric Jaccard is
    # far below both the report threshold and banding recall
    assert r["containment_ab"] == 1.0
    assert r["jaccard"] < 0.05

    # rebuild the same planted corpus and show the LSH-blocked mode
    # does NOT surface the pair (this is the documented recall gap)
    docs = Q._docs(spark, sf).select("doc_id", "text")
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.text import tokenize

    huge = (
        docs.filter(F.col("doc_id").isin(list(C.CONT_PLANT_COMPONENTS)))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
                    lambda s: s["text"],
                ),
                " ",
            ).alias("text")
        )
        .select(F.lit(C.CONT_PLANT_HUGE_ID).cast("long").alias("doc_id"), "text")
    )
    tiny = docs.filter(F.col("doc_id") == C.CONT_PLANT_TINY_SRC).select(
        F.lit(C.CONT_PLANT_TINY_ID).cast("long").alias("doc_id"),
        F.array_join(
            F.slice(
                tokenize(F.col("text")),
                C.CONT_PLANT_SLICE_START,
                C.CONT_PLANT_SLICE_LEN,
            ),
            " ",
        ).alias("text"),
    )
    planted = docs.unionByName(huge).unionByName(tiny)
    blocked = dedup.containment_pairs(
        planted, n=C.CONT_EXACT_N, threshold=C.CONT_EXACT_THRESHOLD
    )
    assert (
        blocked.filter(
            (F.col("doc_a") == C.CONT_PLANT_TINY_ID)
            & (F.col("doc_b") == C.CONT_PLANT_HUGE_ID)
        ).count()
        == 0
    )


def test_exact_containment_semantics_small(spark):
    """Hand-checkable corpus: directional ratios, boilerplate df cap,
    and the df-capped bucket guarantee."""
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),          # 6 3-grams
            (2, "c d e f"),                  # 2 3-grams, both inside doc 1
            (3, "x y z w"),                  # unrelated
            (4, "x y z w"),                  # exact clone of 3
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc_a"], r["doc_b"]): r
        for r in dedup.containment_pairs_exact(
            docs, n=3, max_doc_freq=8, threshold=0.9
        ).collect()
    }
    assert set(out) == {(1, 2), (3, 4)}
    r = out[(1, 2)]
    assert r["containment_ba"] == 1.0  # doc 2 fully inside doc 1
    assert r["containment_ab"] == round(2 / 6, 6)
    assert r["jaccard"] == round(2 / 6, 6)
    assert out[(3, 4)]["containment_ab"] == 1.0
    assert out[(3, 4)]["jaccard"] == 1.0
    # boilerplate cap: a gram shared by EVERY doc is excluded from
    # intersections AND sizes when df > cap
    many = spark.createDataFrame(
        [(i, f"common prefix here tail{i} end{i} x{i}") for i in range(6)],
        "doc_id long, text string",
    )
    assert (
        dedup.containment_pairs_exact(
            many, n=3, max_doc_freq=5, threshold=0.5
        ).count()
        == 0
    )
    with pytest.raises(ValueError, match="max_doc_freq"):
        dedup.containment_pairs_exact(docs, max_doc_freq=1)


def test_source_rollup_pair_source_parameterized(spark):
    """The contamination matrix totals must equal the pair counts of
    whatever pair source feeds the rollup."""
    sf = "/root/testdata/sf0.001"
    for qf, pairs_fn in (
        (Q.q_source_overlap_winnow, Q.q_winnow_pairs),
        (Q.q_source_overlap_containment, None),
    ):
        roll = qf(spark, sf)
        total = roll.agg(F.sum("n_pairs")).collect()[0][0]
        if pairs_fn is not None:
            assert total == pairs_fn(spark, sf).count()
        else:
            assert total == dedup.containment_pairs_exact(
                Q._docs(spark, sf),
                n=C.CONT_EXACT_N,
                max_doc_freq=C.CONT_EXACT_MAX_DF,
                threshold=C.CONT_EXACT_THRESHOLD,
            ).count()
