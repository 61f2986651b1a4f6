"""Deterministic epoch shuffle: permutation law, per-epoch variation,
reproducibility, and the distributed-prefix-count plan shape (range
partitioning, never a single-partition global window)."""

from __future__ import annotations

import pytest

from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.prep import epoch_shuffle


def _docs(spark, n=40):
    return spark.range(n).selectExpr("id AS doc_id", "'x' AS text")


def _order(rows):
    return [r["doc_id"] for r in sorted(rows, key=lambda r: r["shuffle_pos"])]


def test_positions_are_a_permutation(spark):
    rows = epoch_shuffle(_docs(spark), epoch=1, partitions=3).collect()
    assert sorted(r["shuffle_pos"] for r in rows) == list(range(40))
    assert len({r["doc_id"] for r in rows}) == 40


def test_same_epoch_reproducible_different_epochs_differ(spark):
    docs = _docs(spark)
    a = _order(epoch_shuffle(docs, epoch=1).collect())
    b = _order(epoch_shuffle(docs, epoch=1).collect())
    c = _order(epoch_shuffle(docs, epoch=2).collect())
    assert a == b
    assert a != c  # 1/40! chance of colliding by accident
    assert a != list(range(40))  # and it actually shuffles


def test_matches_driver_side_rank(spark):
    import hashlib

    def key(i):
        return int(
            hashlib.md5(f"{i}:shuffle:1".encode()).hexdigest()[:15], 16
        )

    want = [i for i in sorted(range(40), key=lambda i: (key(i), i))]
    got = _order(epoch_shuffle(_docs(spark), epoch=1, partitions=4).collect())
    assert got == want


def test_negative_epoch_raises(spark):
    with pytest.raises(ValueError, match="epoch must be >= 0"):
        epoch_shuffle(_docs(spark), epoch=-1)


def test_plan_uses_range_partitioning_not_global_window(spark):
    df = epoch_shuffle(_docs(spark), epoch=1, partitions=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "Window" not in plan
