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
