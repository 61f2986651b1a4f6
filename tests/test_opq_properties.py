"""Property-based tests (hypothesis) for the OPQ trainer's pure-numpy
core: rotation orthonormality, the Procrustes objective never losing
to identity-rotation PQ at the same k-means budget, determinism, and
the rotate_py fold tracking the numpy matmul. No SparkSession."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import opq


def _corpus(seed: int, n: int, dim: int, stretch: float) -> np.ndarray:
    """Anisotropic Gaussian: per-dim scales spread geometrically so the
    rotation has real structure to find."""
    rs = np.random.RandomState(seed)
    scales = stretch ** (np.arange(dim) / max(dim - 1, 1))
    return rs.randn(n, dim) * scales[None, :]


@given(st.integers(0, 10_000), st.sampled_from([8, 16]), st.floats(1.0, 8.0))
@settings(max_examples=15, deadline=None)
def test_rotation_orthonormal_and_deterministic(seed, dim, stretch):
    X = _corpus(seed, 80, dim, stretch)
    m, codes = (2, 4) if dim == 8 else (4, 4)
    a = opq.opq_train(X, m=m, n_codes=codes, iters=2, kmeans_iters=3, seed=7)
    b = opq.opq_train(X, m=m, n_codes=codes, iters=2, kmeans_iters=3, seed=7)
    assert a == b
    R = np.asarray(a[0]).T
    assert np.allclose(R.T @ R, np.eye(dim), atol=1e-9)


@given(st.integers(0, 10_000), st.floats(2.0, 10.0))
@settings(max_examples=10, deadline=None)
def test_opq_mse_never_worse_than_identity_pq(seed, stretch):
    """On anisotropic data the learned rotation's quantization MSE must
    not lose to identity-rotation PQ trained with the same k-means
    budget (the Procrustes step can always return to identity)."""
    dim, m, codes = 16, 4, 8
    X = _corpus(seed, 120, dim, stretch)
    r_cols, books = opq.opq_train(X, m=m, n_codes=codes, iters=4,
                                  kmeans_iters=6, seed=9)
    ident = np.eye(dim).tolist()
    pq_books = [
        opq._kmeans(X[:, s * 4:(s + 1) * 4], codes, 6,
                    np.random.RandomState(9 + 1000 * 4 + s)).tolist()
        for s in range(m)
    ]
    mse_opq = opq.quantization_mse(X, r_cols, books)
    mse_pq = opq.quantization_mse(X, ident, pq_books)
    # allow float slack: equality happens when the data is already
    # subspace-aligned, but OPQ must never be meaningfully worse
    assert mse_opq <= mse_pq * 1.05, (mse_opq, mse_pq)


@given(
    st.lists(st.floats(-100, 100, allow_nan=False), min_size=8, max_size=8),
    st.integers(0, 10_000),
)
@settings(max_examples=100, deadline=None)
def test_rotate_py_tracks_matmul(vec, seed):
    rs = np.random.RandomState(seed)
    R, _ = np.linalg.qr(rs.randn(8, 8))
    r_cols = R.T.tolist()
    got = np.asarray(opq.rotate_py(vec, r_cols))
    want = np.asarray(vec, dtype=np.float64) @ R
    assert np.allclose(got, want, rtol=1e-9, atol=1e-9)


@given(st.integers(0, 10_000))
@settings(max_examples=20, deadline=None)
def test_encode_reconstruct_roundtrip_shapes(seed):
    X = _corpus(seed, 40, 16, 3.0)
    books = [opq._kmeans(X[:, s * 4:(s + 1) * 4], 4, 3,
                         np.random.RandomState(s)) for s in range(4)]
    codes = opq._encode_np(X, books)
    assert codes.shape == (40, 4)
    assert codes.min() >= 0 and codes.max() < 4
    Y = opq._reconstruct_np(codes, books)
    assert Y.shape == X.shape
    # reconstruction picks the argmin code, so no other code of the
    # same subspace can be closer
    for s in range(4):
        d_chosen = ((X[:, s * 4:(s + 1) * 4] - Y[:, s * 4:(s + 1) * 4]) ** 2).sum(1)
        for c in range(4):
            d_c = ((X[:, s * 4:(s + 1) * 4] - books[s][c][None, :]) ** 2).sum(1)
            assert (d_chosen <= d_c + 1e-12).all()
