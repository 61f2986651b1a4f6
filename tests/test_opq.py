"""Optimized Product Quantization (Ge et al.): training invariants,
parity of the Spark encoder with the numpy trainer, the rotation-
invariance of the exact rerank, and the plan shape (rotation
materialized once, TakeOrderedAndProject tail)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark import contract as C
from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import ann, opq

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sample():
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    order = np.argsort(np.asarray(t["vec_id"]), kind="stable")
    ids = np.asarray(t["vec_id"])[order]
    X = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)[order]
    return ids, X


@pytest.fixture(scope="module")
def artifact():
    return opq.opq_train_offline()


def test_rotation_is_orthonormal(artifact):
    r_cols, _ = artifact
    R = np.asarray(r_cols).T
    assert np.allclose(R.T @ R, np.eye(R.shape[0]), atol=1e-10)


def test_training_is_deterministic(sample):
    _, X = sample
    a = opq.opq_train(X, iters=2, kmeans_iters=3)
    b = opq.opq_train(X, iters=2, kmeans_iters=3)
    assert a == b


def test_opq_objective_beats_plain_pq(sample, artifact):
    """The whole point of the rotation: quantization MSE must improve
    on trained PQ (identity rotation, same k-means budget) and crush
    the seeded random codebooks the plain-PQ contract queries use."""
    _, X = sample
    r_cols, books = artifact
    ident = np.eye(X.shape[1]).tolist()
    pq_books = [
        opq._kmeans(
            X[:, s * 8:(s + 1) * 8], C.PQ_CODES, C.OPQ_KMEANS_ITERS,
            np.random.RandomState(C.OPQ_SEED + 1000 * C.OPQ_ITERS + s),
        ).tolist()
        for s in range(C.PQ_M)
    ]
    seeded = ann.random_codebooks(C.EMB_DIM, C.PQ_M, C.PQ_CODES, C.PQ_SEED)
    mse_opq = opq.quantization_mse(X, r_cols, books)
    mse_pq = opq.quantization_mse(X, ident, pq_books)
    mse_seeded = opq.quantization_mse(X, ident, seeded)
    assert mse_opq < mse_pq < mse_seeded
    # the gain is real, not float noise (measured ~14% on the fixture)
    assert mse_opq < 0.95 * mse_pq


def test_adc_recall_beats_seeded_pq(sample, artifact):
    """ADC-only recall@k vs exact L2 truth, numpy end-to-end: the
    trained rotated codec must beat the seeded random codebooks by a
    wide margin on the fixture corpus."""
    ids, X = sample
    r_cols, books = artifact
    R = np.asarray(r_cols).T
    Xr = X @ R
    nb = [np.asarray(b) for b in books]
    codes = opq._encode_np(Xr, nb)
    seeded = [np.asarray(b) for b in ann.random_codebooks(C.EMB_DIM, C.PQ_M, C.PQ_CODES, C.PQ_SEED)]
    codes_pq = opq._encode_np(X, seeded)

    def adc_topk(q, cb, cd, k):
        dsub = cb[0].shape[1]
        lut = np.stack([((b - q[s * dsub:(s + 1) * dsub][None, :]) ** 2).sum(1)
                        for s, b in enumerate(cb)])
        d = lut[np.arange(len(cb))[None, :], cd].sum(1)
        return set(ids[np.lexsort((ids, d))[:k]])

    k = C.K_VEC
    hits_opq = hits_pq = 0
    for qi in range(20):
        q = X[qi]
        truth = set(ids[np.lexsort((ids, ((X - q) ** 2).sum(1)))[:k]])
        hits_opq += len(adc_topk(q @ R, nb, codes, k) & truth)
        hits_pq += len(adc_topk(q, seeded, codes_pq, k) & truth)
    recall_opq, recall_pq = hits_opq / (20 * k), hits_pq / (20 * k)
    assert recall_opq > recall_pq + 0.2, (recall_opq, recall_pq)


def test_spark_encode_matches_numpy(spark, sample, artifact):
    """The JVM fold encoder and the float64 numpy encoder agree on the
    codes (both argmin the same distances; fold-order float drift can
    flip only exact near-ties, which the fixture doesn't produce)."""
    ids, X = sample
    r_cols, books = artifact
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = {
        r["vec_id"]: r["codes"]
        for r in opq.opq_encode(emb, r_cols, books).collect()
    }
    R = np.asarray(r_cols).T
    want = opq._encode_np(X @ R, [np.asarray(b) for b in books])
    agree = sum(got[int(i)] == list(map(int, w)) for i, w in zip(ids, want))
    assert agree == len(ids)


def test_rerank_is_exact_l2(spark, sample):
    """Rotation preserves L2: the reranked top-k must equal the brute-
    force exact top-k whenever the shortlist covers it (shortlist =
    corpus here, so equality is unconditional)."""
    ids, X = sample
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = [float(v) for v in X[int(np.where(ids == C.QUERY_VEC)[0][0])]]
    got = opq.opq_topk_rerank(emb, q, k=5, shortlist=len(ids)).collect()
    d = np.sqrt(((X - np.asarray(q)) ** 2).sum(1))
    want = ids[np.lexsort((ids, np.round(d, 6)))[:5]]
    assert [r["vec_id"] for r in got] == [int(v) for v in want]
    for r, wi in zip(got, want):
        exact = float(np.sqrt(((X[ids == wi][0] - np.asarray(q)) ** 2).sum()))
        assert abs(r["dist"] - exact) < 1e-5


def test_ivfopq_rerank_full_coverage_is_exact(spark, sample, artifact):
    """Composition sanity for the FAISS OPQ,IVF,PQ pipeline: probing
    ALL cells with a corpus-sized shortlist must reduce to the exact
    brute-force top-k — the rotation and the coarse quantizer can only
    re-order the APPROXIMATE stage, never the exact rerank."""
    ids, X = sample
    r_cols, _ = artifact
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = [float(v) for v in X[int(np.where(ids == C.QUERY_VEC)[0][0])]]
    got = opq.ivfopq_topk_rerank(
        emb, q, k=5, shortlist=len(ids), n_probe=16, r_cols=r_cols
    ).collect()
    d = np.sqrt(((X - np.asarray(q)) ** 2).sum(1))
    want = ids[np.lexsort((ids, np.round(d, 6)))[:5]]
    assert [r["vec_id"] for r in got] == [int(v) for v in want]


def test_ivfopq_codes_match_numpy_recompute(spark, sample, artifact):
    """Cell assignment and residual codes recomputed in float64 numpy
    on the rotated corpus must agree with the JVM fold encoder."""
    ids, X = sample
    r_cols, _ = artifact
    cents = np.asarray(ann.random_centroids(C.EMB_DIM, 16, 43))
    books = [np.asarray(b) for b in
             ann.random_codebooks(C.EMB_DIM, C.PQ_M, C.PQ_CODES, C.PQ_SEED)]
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = {
        r["vec_id"]: (r["cell"], r["codes"])
        for r in opq.ivfopq_encode(
            emb, r_cols, cents.tolist(), [b.tolist() for b in books]
        ).collect()
    }
    Xr = X @ np.asarray(r_cols).T
    cell = ((Xr[:, None, :] - cents[None]) ** 2).sum(2).argmin(1)
    res = Xr - cents[cell]
    codes = opq._encode_np(res, books)
    for i, vid in enumerate(ids):
        assert got[int(vid)] == (int(cell[i]), [int(c) for c in codes[i]])


def test_ivfopq_batch_identical_to_point(spark, sample, artifact):
    """The one-job batch kernel must answer exactly what the point
    path answers per query — the same identity the IVF-PQ batch path
    guarantees, now through the rotation."""
    ids, X = sample
    r_cols, _ = artifact
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    batch = opq.ivfopq_topk_batch(emb, qs, k=5, n_probe=4, r_cols=r_cols)
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append((r["vec_id"], r["dist"], r["rank"]))
    for qid in range(3):
        q = [float(v) for v in X[int(np.where(ids == qid)[0][0])]]
        want = [
            (r["vec_id"], r["dist"], r["rank"])
            for r in opq.ivfopq_topk(emb, q, k=5, n_probe=4, r_cols=r_cols).collect()
        ]
        assert sorted(got[qid]) == sorted(want), qid


def test_ivfopq_batch_rerank_identical_to_point_rerank(spark, sample, artifact):
    """The batch serving kernel (rotated-space ADC shortlist, exact
    original-space L2 rerank) must answer per query exactly what the
    point rerank answers — and with full shortlist coverage it must
    equal exact brute-force L2."""
    ids, X = sample
    r_cols, _ = artifact
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = emb.count()
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    batch = opq.ivfopq_topk_batch_rerank(
        emb, qs, k=5, shortlist=10, n_probe=4, r_cols=r_cols
    )
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append((r["vec_id"], r["dist"], r["rank"]))
    for qid in range(3):
        q = [float(v) for v in X[int(np.where(ids == qid)[0][0])]]
        want = [
            (r["vec_id"], r["dist"], r["rank"])
            for r in opq.ivfopq_topk_rerank(
                emb, q, k=5, shortlist=10, n_probe=4, r_cols=r_cols
            ).collect()
        ]
        assert got[qid] == want, qid
    # full coverage: every cell probed + corpus-wide shortlist => exact
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import bruteforce

    full = opq.ivfopq_topk_batch_rerank(
        emb, qs, k=5, shortlist=n, n_probe=16, r_cols=r_cols
    )
    exact = bruteforce.l2_topk(emb, qs, k=5)
    lhs = sorted(map(tuple, full.collect()))
    rhs = sorted(map(tuple, exact.collect()))
    assert lhs == rhs


def test_store_roundtrip_append_and_guards(spark, sample, artifact, tmp_path):
    """Store lifecycle at parity with the PQ store: from-store answers
    identical to in-memory, incremental append encodes only the new
    vectors, and a mismatched rotation or wrong store kind refuses to
    score garbage."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources import tables as T

    ids, X = sample
    r_cols, books = artifact
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    old, new = emb.filter("vec_id < 400"), emb.filter("vec_id >= 400")
    path = str(tmp_path / "opq_store")
    T.write_opq_index(old, path, r_cols, books)
    q = [float(v) for v in X[int(np.where(ids == C.QUERY_VEC)[0][0])]]
    got = opq.opq_topk_store(spark, path, q, k=5).collect()
    want = opq.opq_topk(old, q, k=5, r_cols=r_cols, codebooks=books).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]

    T.append_opq_index(new, path, r_cols, books)
    got = opq.opq_topk_store(spark, path, q, k=5, shortlist=20, embeddings=emb).collect()
    want = opq.opq_topk_rerank(
        emb, q, k=5, shortlist=20, r_cols=r_cols, codebooks=books
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]

    bad_r = [list(col) for col in r_cols]
    bad_r[0] = list(bad_r[0][1:]) + [bad_r[0][0]]
    with pytest.raises(ValueError):
        T.append_opq_index(new, path, bad_r, books)
    with pytest.raises(ValueError):
        T.read_pq_index(spark, path)
    pq_path = str(tmp_path / "pq_store")
    T.write_pq_index(old, pq_path, books)
    with pytest.raises(ValueError):
        T.read_opq_index(spark, pq_path)


def test_plan_materializes_rotation_once_and_takeordered_tail(spark, artifact):
    """Plan-shape guards: (a) the encode is ONE Arrow kernel — the
    64x64 rotation travels as a broadcast into the fused MapInPandas
    node, never inlined into the plan as a literal (the old expression
    form needed a let-binding projection to avoid m x n_codes copies;
    the kernel removes the literal entirely); (b) the ADC top-k tail
    is a TakeOrderedAndProject with the rank window above it, same as
    the audited pq_topk/bm25_topk shape."""
    r_cols, books = artifact
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    enc = opq.opq_encode(emb, r_cols, books)
    plan = enc._jdf.queryExecution().executedPlan().toString()
    # no rotation literal in the plan; exactly one Python boundary
    marker = repr(float(r_cols[0][0]))[:12]
    assert plan.count(marker) == 0, plan.count(marker)
    assert plan.count("MapInPandas") == 1, plan
    q = [0.0] * C.EMB_DIM
    df = opq.opq_topk(emb, q, k=5, r_cols=r_cols, codebooks=books)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert plan.index("Window") < plan.index("TakeOrderedAndProject")
    below = plan[plan.index("TakeOrderedAndProject"):]
    assert "Exchange SinglePartition" not in below
