"""As-of join: >= tie semantics, deterministic right-side tiebreak,
tolerance null-out, no-match rows, and parity with a brute-force
reference implementation on random data."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import temporal


def _df(spark, rows, schema="id long, k long, ts long, v string"):
    return spark.createDataFrame(rows, schema)


def _matches(spark, left_rows, right_rows, tolerance_us=None):
    left = _df(spark, left_rows)
    right = _df(spark, right_rows)
    out = temporal.asof_join(
        left, right, on="k", ts_col="ts",
        tolerance_us=tolerance_us, tiebreak_col="id",
    )
    return {
        r["id"]: (r["_match"]["id"] if r["_match"] else None)
        for r in out.collect()
    }


def test_asof_picks_latest_at_or_before(spark):
    got = _matches(
        spark,
        [(1, 7, 100, "l"), (2, 7, 250, "l"), (3, 7, 50, "l")],
        [(10, 7, 100, "r"), (11, 7, 200, "r"), (12, 7, 300, "r")],
    )
    assert got == {1: 10, 2: 11, 3: None}  # ts=100 matches >= (tie), ts=50 none


def test_asof_keys_do_not_leak(spark):
    got = _matches(
        spark,
        [(1, 1, 100, "l"), (2, 2, 100, "l")],
        [(10, 1, 90, "r")],
    )
    assert got == {1: 10, 2: None}


def test_asof_right_tiebreak_largest_id(spark):
    got = _matches(
        spark,
        [(1, 5, 100, "l")],
        [(10, 5, 80, "r"), (13, 5, 80, "r"), (11, 5, 80, "r")],
    )
    assert got == {1: 13}


def test_asof_tolerance_nulls_stale_matches(spark):
    got = _matches(
        spark,
        [(1, 9, 1_000_000, "l"), (2, 9, 10_000_000, "l")],
        [(10, 9, 900_000, "r")],
        tolerance_us=500_000,
    )
    assert got == {1: 10, 2: None}  # lag 100ms ok; 9.1s exceeds 0.5s


def test_asof_matches_bruteforce_reference(spark):
    rng = random.Random(7)
    left_rows = [
        (i, rng.randrange(5), rng.randrange(10_000), "l") for i in range(300)
    ]
    right_rows = [
        (1000 + i, rng.randrange(5), rng.randrange(10_000), "r")
        for i in range(300)
    ]
    got = _matches(spark, left_rows, right_rows)

    def brute(lk, lts):
        cand = [(rid, rts) for rid, rk, rts, _ in right_rows if rk == lk and rts <= lts]
        if not cand:
            return None
        best_ts = max(ts for _, ts in cand)
        return max(rid for rid, ts in cand if ts == best_ts)

    for lid, lk, lts, _ in left_rows:
        assert got[lid] == brute(lk, lts), (lid, lk, lts)


def test_asof_left_columns_preserved(spark):
    left = _df(spark, [(1, 3, 10, "payload")])
    right = _df(spark, [(2, 3, 5, "r")])
    out = temporal.asof_join(left, right, on="k", ts_col="ts")
    row = out.first()
    assert row["id"] == 1 and row["v"] == "payload" and row["_match"]["id"] == 2
