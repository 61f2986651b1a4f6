"""QED operator family (A5, F7, P5, P6, F6) vs NumPy histogram logic."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import qed
from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import load_table

N_BINS = 16


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


@pytest.fixture(scope="module")
def edges_rows(emb):
    return [r.asDict() for r in qed.histogram_edges(emb, N_BINS).collect()]


def test_histogram_edges_match_numpy(emb, edges_rows):
    mat = np.array(
        [r["embedding"] for r in emb.select("embedding").collect()], dtype=np.float64
    )
    by_dim = {e["dim"]: e for e in edges_rows}
    for d in (0, 13, 63):
        assert by_dim[d]["lo"] == pytest.approx(float(mat[:, d].min()), abs=1e-6)
        assert by_dim[d]["hi"] == pytest.approx(float(mat[:, d].max()), abs=1e-6)


def test_histogram_counts_total(emb, edges_rows):
    hist = qed.histogram_counts(emb, qed.histogram_edges(emb, N_BINS), N_BINS)
    n_vec = emb.count()
    dim = len(emb.select("embedding").first()["embedding"])
    assert hist.agg(F.sum("cnt")).collect()[0][0] == n_vec * dim
    # every count positive, bins within range
    bad = hist.filter((F.col("bin") < 0) | (F.col("bin") >= N_BINS)).count()
    assert bad == 0


def test_query_windows_contain_query_bin(emb, edges_rows):
    qvec = list(emb.filter(F.col("vec_id") == 7).first()["embedding"])
    wins = qed.query_windows(qvec, edges_rows, N_BINS, p_fraction=0.1)
    assert len(wins) == len(qvec)
    by_dim = {e["dim"]: e for e in edges_rows}
    for d, lo_b, hi_b in wins:
        e = by_dim[d]
        b = int((qvec[d] - e["lo"]) / e["width"]) if e["width"] else 0
        b = min(max(b, 0), N_BINS - 1)
        assert lo_b <= b <= hi_b
        assert 0 <= lo_b <= hi_b <= N_BINS - 1


def test_prune_keeps_query_and_topk_deterministic(emb, edges_rows):
    qvec = list(emb.filter(F.col("vec_id") == 7).first()["embedding"])
    top = qed.qed_prune_score_topk(
        emb, qvec, edges_rows, k=5, n_bins=N_BINS, p_fraction=0.25
    ).collect()
    assert top[0]["vec_id"] == 7  # query survives its own windows
    assert abs(top[0]["score"]) == 0.0
    # prune actually reduces the candidate set
    wins = qed.query_windows(qvec, edges_rows, N_BINS, 0.25)
    survivors = qed.bin_window_filter(emb, edges_rows, wins, N_BINS).count()
    assert survivors < emb.count()
