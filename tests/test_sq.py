"""SQ8 scalar quantization: encoding semantics vs numpy, code range,
degenerate dims, prebuilt-codes identity, ADC accuracy, and the
full-shortlist rerank == exact-brute-force guarantee."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import ann, bruteforce
from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import load_table

DIM, LEVELS = 64, 255


def _emb(spark):
    return load_table(spark, "/root/testdata/sf0.001", "embeddings")


def test_sq_encode_matches_numpy(spark):
    emb = _emb(spark).filter(F.col("vec_id") < 50)
    mins, maxs = ann.sq_train(_emb(spark), DIM)
    got = {
        r["vec_id"]: r["codes"]
        for r in ann.sq_encode(emb, mins, maxs, LEVELS).collect()
    }
    mn, mx = np.array(mins), np.array(maxs)
    scale = np.where(mx > mn, LEVELS / np.where(mx > mn, mx - mn, 1.0), 0.0)
    for r in emb.collect():
        v = np.array(r["embedding"], dtype=np.float64)
        want = np.clip(np.floor((v - mn) * scale + 0.5), 0, LEVELS).astype(int)
        assert list(got[r["vec_id"]]) == want.tolist(), r["vec_id"]


def test_sq_codes_in_range_and_dim_preserved(spark):
    emb = _emb(spark)
    mins, maxs = ann.sq_train(emb, DIM)
    codes = ann.sq_encode(emb, mins, maxs, LEVELS)
    bad = codes.filter(
        (F.array_min("codes") < 0)
        | (F.array_max("codes") > LEVELS)
        | (F.size("codes") != DIM)
    ).count()
    assert bad == 0


def test_sq_constant_dim_codes_zero(spark):
    df = spark.createDataFrame(
        [(0, [1.5, 2.0]), (1, [1.5, 3.0])], "vec_id long, embedding array<double>"
    )
    mins, maxs = ann.sq_train(df, 2)
    assert mins[0] == maxs[0] == 1.5
    rows = {r["vec_id"]: r["codes"] for r in ann.sq_encode(df, mins, maxs).collect()}
    assert rows[0][0] == 0 and rows[1][0] == 0  # constant dim -> code 0
    assert rows[0][1] == 0 and rows[1][1] == LEVELS  # range dim spans codes


def test_sq_topk_prebuilt_codes_identical(spark):
    emb = _emb(spark)
    mins, maxs = ann.sq_train(emb, DIM)
    q = [float(v) for v in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    inline = ann.sq_topk(emb, q, mins, maxs, k=10).collect()
    prebuilt = ann.sq_topk(
        None, q, mins, maxs, k=10, codes=ann.sq_encode(emb, mins, maxs)
    ).collect()
    assert sorted(map(tuple, inline)) == sorted(map(tuple, prebuilt))


def test_sq_adc_tracks_exact_l2(spark):
    """8-bit per-dim rounding keeps ADC within a tight bound of true
    L2 — the property PQ gives up on unclustered data."""
    emb = _emb(spark).cache()
    mins, maxs = ann.sq_train(emb, DIM)
    q = [float(v) for v in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    adc = {r["vec_id"]: r["dist"] for r in ann.sq_topk(emb, q, mins, maxs, k=100).collect()}
    qdf = emb.filter(F.col("vec_id") == 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        r["vec_id"]: r["dist"]
        for r in bruteforce.l2_topk(emb, qdf, k=100).collect()
    }
    # per-dim max error = step/2; total L2 perturbation << fixture scale
    max_step = max(
        (mx - mn) / LEVELS for mn, mx in zip(mins, maxs) if mx > mn
    )
    bound = (DIM ** 0.5) * max_step / 2 + 1e-6
    both = set(adc) & set(exact)
    assert len(both) >= 90  # rankings nearly coincide
    for vid in both:
        assert abs(adc[vid] - exact[vid]) <= bound, vid


def test_sq_recall_near_perfect_on_fixture(spark):
    emb = _emb(spark).cache()
    mins, maxs = ann.sq_train(emb, DIM)
    q = [float(v) for v in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    qdf = emb.filter(F.col("vec_id") == 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {r["vec_id"] for r in bruteforce.l2_topk(emb, qdf, k=10).collect()}
    adc = {r["vec_id"] for r in ann.sq_topk(emb, q, mins, maxs, k=10).collect()}
    assert len(exact & adc) >= 9  # SQ8 ADC ~exact on isotropic fixture


def test_sq_rerank_with_full_shortlist_equals_exact(spark):
    emb = _emb(spark).cache()
    n = emb.count()
    mins, maxs = ann.sq_train(emb, DIM)
    q = [float(v) for v in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    qdf = emb.filter(F.col("vec_id") == 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = [
        (r["vec_id"], r["dist"], r["rank"])
        for r in sorted(bruteforce.l2_topk(emb, qdf, k=10).collect(), key=lambda r: r["rank"])
    ]
    got = [
        (r["vec_id"], r["dist"], r["rank"])
        for r in sorted(
            ann.sq_topk_rerank(emb, q, mins, maxs, k=10, shortlist=n).collect(),
            key=lambda r: r["rank"],
        )
    ]
    assert got == exact
