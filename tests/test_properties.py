"""Property-based tests (hypothesis) for the engine's pure math:
invariants that must hold for ANY input, not just the fixtures.

No SparkSession here — these check the driver-side/pure-python logic
whose Spark expressions mirror it 1:1 (each property names the
operator it protects).
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from finding_similar_high_dimensional_items_for_big_data_sets_spark.config import MinHashParams
from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.ann import (
    probe_buckets,
)
from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.lsh import (
    min_matching_bands,
)

PARAMS = MinHashParams()


# --- min_matching_bands: the self-join prefilter must be LOSSLESS ----------

sig_pair = st.tuples(
    st.lists(st.integers(0, 2**61 - 2), min_size=128, max_size=128),
    st.sets(st.integers(0, 127), max_size=128),
)


@settings(max_examples=200, deadline=None)
@given(sig_pair, st.floats(0.05, 1.0))
def test_min_matching_bands_is_lossless(pair, threshold):
    """For any signature pair with est-Jaccard >= t, the number of
    fully-matching bands is >= min_matching_bands(t) — so filtering
    candidate pairs on matching-band count before scoring
    (lsh._self_join_pairs_raw) can never drop a true result."""
    base, flip_positions = pair
    other = list(base)
    for p in flip_positions:
        other[p] = (other[p] + 1) % (2**61 - 1)
    matches = sum(1 for a, b in zip(base, other) if a == b)
    score = matches / PARAMS.num_perm
    r = PARAMS.rows_per_band
    full_bands = sum(
        1
        for b in range(PARAMS.bands)
        if all(base[b * r + i] == other[b * r + i] for i in range(r))
    )
    if score >= threshold:
        assert full_bands >= min_matching_bands(threshold, PARAMS)


@settings(max_examples=50, deadline=None)
@given(st.floats(0.01, 1.0))
def test_min_matching_bands_bounds(threshold):
    m = min_matching_bands(threshold, PARAMS)
    assert 1 <= m <= PARAMS.bands
    need = math.ceil(threshold * PARAMS.num_perm)
    slack = PARAMS.bands * (PARAMS.rows_per_band - 1)
    assert m == max(1, need - slack)
    # a perfect match (t=1.0) must require all bands to match
    assert min_matching_bands(1.0, PARAMS) == PARAMS.bands


# --- simhash chunk blocking: pigeonhole completeness -----------------------


@settings(max_examples=200, deadline=None)
@given(
    st.integers(0, 2**64 - 1),
    st.sets(st.integers(0, 63), min_size=0, max_size=3),
)
def test_simhash_chunk_blocking_complete(fp, flip_bits):
    """dedup.simhash_duplicates blocks on 4 16-bit chunks; any pair
    within hamming distance n_bands-1 = 3 must share >= 1 exact chunk
    (pigeonhole), so the chunk join misses no qualifying pair."""
    other = fp
    for b in flip_bits:
        other ^= 1 << b
    hamming = bin(fp ^ other).count("1")
    chunks_a = [(fp >> (16 * i)) & 0xFFFF for i in range(4)]
    chunks_b = [(other >> (16 * i)) & 0xFFFF for i in range(4)]
    shared = any(a == b for a, b in zip(chunks_a, chunks_b))
    if hamming <= 3:
        assert shared


# --- multi-probe buckets ---------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.floats(-10, 10, allow_nan=False), min_size=8, max_size=8),
    st.integers(1, 8),
)
def test_probe_buckets_shape(query, n_probe):
    buckets = probe_buckets(query, n_planes=8, seed=42, n_probe=n_probe)
    assert len(buckets) == n_probe
    assert len(set(buckets)) == n_probe  # single-bit flips are distinct
    assert all(0 <= b < 256 for b in buckets)
    # probe sets are nested as n_probe grows (stable margin ordering)
    more = probe_buckets(query, n_planes=8, seed=42, n_probe=min(8, n_probe + 1))
    assert more[:n_probe] == buckets


# --- result padding (T6) ---------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 10**9), max_size=20), st.integers(1, 12))
def test_padding_semantics(ids, k):
    """Reference pads id lists with -1 to width k then truncates
    (app/src/minhash_lsh.py:128-133); the Spark expression in
    q_padded_topk mirrors concat + slice. Model both here."""
    padded = (ids + [-1] * k)[:k]
    assert len(padded) == k
    assert padded[: min(len(ids), k)] == ids[:k]
    assert all(v == -1 for v in padded[min(len(ids), k) :])


def test_probe_buckets_exhaustive_and_cost_ordered():
    """Property: for any margin configuration, probing 2^n buckets
    enumerates every bucket exactly once, in nondecreasing total
    flipped-|margin| cost."""
    from unittest.mock import patch

    import random as _random

    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import ann

    rng = _random.Random(99)
    for trial in range(10):
        n = rng.randint(1, 6)
        margins = [rng.uniform(-2, 2) for _ in range(n)]
        with patch.object(
            ann, "random_planes", lambda dim, np_, seed: [[m] for m in margins]
        ):
            out = ann.probe_buckets([1.0], n_planes=n, n_probe=1 << n)
        assert sorted(out) == list(range(1 << n)), (margins, out)
        base = out[0]
        costs = [
            sum(abs(margins[j]) for j in range(n) if (b ^ base) >> j & 1)
            for b in out
        ]
        assert all(costs[i] <= costs[i + 1] + 1e-12 for i in range(len(costs) - 1)), (
            margins,
            costs,
        )


# --- probe_plan_for_recall: targeted plans are honest prefixes -------------

from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.ann import (  # noqa: E402
    probe_plan_for_recall,
)

qvec = st.lists(
    st.floats(-10, 10, allow_nan=False, allow_infinity=False),
    min_size=4,
    max_size=16,
).filter(lambda v: any(abs(x) > 1e-6 for x in v))


@settings(max_examples=150, deadline=None)
@given(qvec, st.floats(0.05, 0.95), st.floats(0.1, 0.98))
def test_probe_plan_is_probe_buckets_prefix_with_honest_estimate(
    q, target_recall, target_cos
):
    """For ANY query and targets: the plan is an exact prefix of
    probe_buckets' sequence, the estimate is a probability, it reaches
    the target unless the budget capped it, and it is monotone in the
    number of probes taken."""
    buckets, est = probe_plan_for_recall(
        q, n_planes=6, seed=42, target_recall=target_recall,
        target_cos=target_cos, max_probe=64,
    )
    assert 1 <= len(buckets) <= 64
    assert len(set(buckets)) == len(buckets)
    full = probe_buckets(q, n_planes=6, seed=42, n_probe=64)
    assert buckets == full[: len(buckets)]
    assert 0.0 < est <= 1.0
    assert est >= target_recall or len(buckets) == 64
    # fewer probes can never claim more estimated recall
    if len(buckets) > 1:
        shorter, est_short = probe_plan_for_recall(
            q, n_planes=6, seed=42, target_recall=target_recall / 2,
            target_cos=target_cos, max_probe=len(buckets) - 1,
        )
        assert est_short <= est + 1e-12


# --- pack_chunks arithmetic: chunk math invariants -------------------------


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.integers(1, 5000), min_size=1, max_size=200),
    st.integers(1, 2048),
)
def test_pack_chunk_arithmetic_invariants(counts, budget):
    """The concatenate-then-cut layout (what prep.pack_chunks computes
    distributedly): offsets stay inside the budget, chunk ids are
    nondecreasing in order, and consecutive docs are contiguous in the
    token stream."""
    before = 0
    prev_chunk = -1
    for n in counts:
        chunk, off = before // budget, before % budget
        assert 0 <= off < budget
        assert chunk >= prev_chunk
        assert chunk * budget + off == before  # contiguous stream
        prev_chunk = chunk
        before += n
