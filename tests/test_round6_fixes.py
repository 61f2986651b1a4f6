"""Round-6 hardening: sketch-store compaction crash windows and replay
watermark, HLL parameter validation, distinct k-means reseeds, and the
degenerate-query (d1 == 0) alpha-probe/calibration convention."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pytest

from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions import cms, hll
from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import ann
from finding_similar_high_dimensional_items_for_big_data_sets_spark.streaming import (
    sketches as SK,
)

D, W, P = 4, 32, 6


def _items(spark, rows):
    return spark.createDataFrame([(k,) for k in rows], "key string")


def _build_store(spark, tmp_path, tag):
    """Two-epoch CMS+HLL store via the real stream."""
    src = str(tmp_path / f"src_{tag}")
    cms_p = str(tmp_path / f"cms_{tag}")
    hll_p = str(tmp_path / f"hll_{tag}")
    ckpt = str(tmp_path / f"ckpt_{tag}")
    rows = [f"k{i % 11}" for i in range(120)]
    _items(spark, rows[:60]).coalesce(1).write.mode("overwrite").parquet(src)
    _items(spark, rows[60:]).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("key string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    SK.stream_sketch_maintenance(
        stream, "key", cms_p, hll_p, d=D, width=W, p=P, checkpoint=ckpt
    ).awaitTermination(180)
    return src, cms_p, hll_p, ckpt, rows


# ---------- compaction crash windows ----------


def test_compact_sketch_swap_leaves_no_leftovers(spark, tmp_path):
    _, cms_p, _, _, rows = _build_store(spark, tmp_path, "clean")
    before = sorted(map(tuple, SK.read_cms_sketch(spark, cms_p).collect()))
    SK.compact_sketch_store(spark, cms_p, "cms")
    assert sorted(map(tuple, SK.read_cms_sketch(spark, cms_p).collect())) == before
    assert not os.path.exists(cms_p + "__compact_tmp")
    assert not os.path.exists(cms_p + "__compact_old")
    # watermark records the max absorbed epoch (two epochs: 0 and 1)
    assert SK._read_watermark(cms_p) == 1
    # recovery on a healthy store is a no-op
    assert SK.recover_sketch_compact(cms_p) is False


def test_recover_sketch_compact_mid_swap_tmp_complete(spark, tmp_path):
    """Death between rename-aside and rename-in, with a complete tmp:
    recovery must install the compacted copy."""
    _, cms_p, _, _, _ = _build_store(spark, tmp_path, "w1")
    before = sorted(map(tuple, SK.read_cms_sketch(spark, cms_p).collect()))
    SK.compact_sketch_store(spark, cms_p, "cms")
    # reconstruct the mid-swap state: store renamed aside, tmp complete
    os.rename(cms_p, cms_p + "__compact_tmp")  # compacted copy as tmp
    # (no __compact_old: simulate old already renamed but tmp not yet in)
    assert SK.recover_sketch_compact(cms_p) is True
    assert sorted(map(tuple, SK.read_cms_sketch(spark, cms_p).collect())) == before
    assert not os.path.exists(cms_p + "__compact_tmp")


def test_recover_sketch_compact_incomplete_tmp_restores_old(spark, tmp_path):
    """Death mid-tmp-write (no _SUCCESS): recovery restores the
    set-aside original and clears the partial tmp."""
    _, cms_p, _, _, _ = _build_store(spark, tmp_path, "w2")
    before = sorted(map(tuple, SK.read_cms_sketch(spark, cms_p).collect()))
    tmp = cms_p + "__compact_tmp"
    old = cms_p + "__compact_old"
    os.rename(cms_p, old)
    os.makedirs(tmp)
    with open(os.path.join(tmp, "part-00000.parquet"), "wb") as fh:
        fh.write(b"partial")  # no _SUCCESS -> incomplete
    assert SK.recover_sketch_compact(cms_p) is True
    assert sorted(map(tuple, SK.read_cms_sketch(spark, cms_p).collect())) == before
    assert not os.path.exists(tmp) and not os.path.exists(old)


def test_recover_sketch_compact_healthy_store_clears_leftovers(spark, tmp_path):
    _, cms_p, _, _, _ = _build_store(spark, tmp_path, "w3")
    os.makedirs(cms_p + "__compact_tmp")
    assert SK.recover_sketch_compact(cms_p) is True
    assert not os.path.exists(cms_p + "__compact_tmp")


def test_recover_sketch_compact_nothing_survives_raises(tmp_path):
    with pytest.raises(ValueError, match="no surviving copy"):
        SK.recover_sketch_compact(str(tmp_path / "absent"))


# ---------- replay watermark ----------


def test_replayed_absorbed_epoch_is_dropped(spark, tmp_path):
    """Checkpoint-loss replay after compaction: every epoch re-fires
    with its original batch id; the watermark must drop them all so the
    merged view stays equal to the batch build (no CMS double count)."""
    src, cms_p, hll_p, ckpt, rows = _build_store(spark, tmp_path, "rp")
    SK.compact_sketch_store(spark, cms_p, "cms")
    SK.compact_sketch_store(spark, hll_p, "hll")
    want = sorted(map(tuple, cms.cms_build(_items(spark, rows), "key", D, W).collect()))
    assert sorted(map(tuple, SK.read_cms_sketch(spark, cms_p).collect())) == want
    # lose the checkpoint -> the restarted stream replays epochs 0..1
    shutil.rmtree(ckpt)
    stream = (
        spark.readStream.schema("key string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    SK.stream_sketch_maintenance(
        stream, "key", cms_p, hll_p, d=D, width=W, p=P, checkpoint=ckpt
    ).awaitTermination(180)
    assert sorted(map(tuple, SK.read_cms_sketch(spark, cms_p).collect())) == want
    got_hll = sorted(map(tuple, SK.read_hll_sketch(spark, hll_p).collect()))
    want_hll = sorted(
        map(tuple, hll.hll_registers(_items(spark, rows), "key", p=P).collect())
    )
    assert got_hll == want_hll
    # and a genuinely NEW epoch (id above the watermark) still lands
    extra = [f"new{i % 3}" for i in range(30)]
    _items(spark, extra).coalesce(1).write.mode("append").parquet(src)
    stream2 = (
        spark.readStream.schema("key string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    SK.stream_sketch_maintenance(
        stream2, "key", cms_p, hll_p, d=D, width=W, p=P, checkpoint=ckpt
    ).awaitTermination(180)
    want2 = sorted(
        map(tuple, cms.cms_build(_items(spark, rows + extra), "key", D, W).collect())
    )
    assert sorted(map(tuple, SK.read_cms_sketch(spark, cms_p).collect())) == want2


# ---------- HLL p validation ----------


def test_hll_rejects_out_of_range_p(spark):
    df = _items(spark, ["a", "b"])
    for bad in (0, 5, 10):
        with pytest.raises(ValueError, match=r"p must be in \[6, 9\]"):
            hll.hll_registers(df, "key", p=bad)
    regs = hll.hll_registers(df, "key", p=P)
    with pytest.raises(ValueError, match=r"p must be in \[6, 9\]"):
        hll.hll_estimate(regs, p=5)
    # valid bounds still work
    assert hll.hll_estimate(hll.hll_registers(df, "key", p=9), p=9).count() == 1


# ---------- k-means reseed distinctness ----------


def test_kmeans_node_concurrent_empty_reseeds_are_distinct():
    """All-identical init centers empty k-1 clusters simultaneously;
    each must reseed to a DISTINCT farthest row, not one shared argmax."""
    X = np.array([[0.0], [0.0], [0.0], [0.0], [100.0], [200.0]])
    # find a seed whose init picks 3 of the four 0-rows
    seed = next(
        s
        for s in range(200)
        if all(
            i < 4
            for i in np.random.RandomState(s).choice(6, size=3, replace=False)
        )
    )
    cents, assign = ann._kmeans_node(
        X, 3, np.random.RandomState(seed), n_iters=1
    )
    # after one iteration the reseeds took the two farthest rows (200,
    # 100) as distinct centers — the old code put 200.0 in both
    vals = sorted(float(c[0]) for c in cents)
    assert len(set(vals)) == 3
    assert vals[1:] == [100.0, 200.0]


# ---------- degenerate-query alpha convention ----------


def test_alpha_probe_and_calibration_agree_on_centroid_query():
    """Query exactly on a centroid (d1 == 0): the probe rule scans only
    the distance-0 cell at ANY alpha, and calibration must describe
    exactly that — estimated recall == realized recall of the probe."""
    cents = [[0.0, 0.0], [10.0, 10.0]]
    queries = [(1, [0.0, 0.0])]
    truth = {1: {5, 6}}
    cell_of = {5: 0, 6: 1}
    a, rec = ann.ivf_alpha_for_recall(queries, truth, cell_of, cents, 0.5)
    assert rec == pytest.approx(0.5)
    probed = ann.ivf_probe_cells_alpha([0.0, 0.0], cents, a)
    captured = sum(1 for v in truth[1] if cell_of[v] in probed) / len(truth[1])
    assert captured == pytest.approx(rec)
    # huge alpha still cannot reach the far cell for this query — the
    # documented convention, consistent across probe and calibration
    assert ann.ivf_probe_cells_alpha([0.0, 0.0], cents, 1e9) == [0]
