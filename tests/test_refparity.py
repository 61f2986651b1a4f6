"""Bit-compat reference hash family (operators/refparity.py).

The expected values are recomputed here with pure-Python big-int
arithmetic that *explicitly* emulates two's-complement int64 wrap —
an independent derivation of the reference's executed numpy semantics
(reference ``benchmarks/synth_data.py:38-60``), not a second copy of
the numpy code under test.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.config import (
    PRIME61,
    MinHashParams,
    ref61_perm_coeffs,
)
from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import refparity

U64 = 1 << 64
I64_MAX = 1 << 63


def wrap64(v: int) -> int:
    """Interpret an arbitrary-precision int as a two's-complement int64."""
    v &= U64 - 1
    return v - U64 if v >= I64_MAX else v


def expected_signature(text, params: MinHashParams) -> list[int]:
    a, b = ref61_perm_coeffs(params.num_perm, params.seed)
    shingles = refparity.ref_shingle_set(text, params.k_shingle, params.by_word)
    if not shingles:
        return [PRIME61] * params.num_perm
    fps = [
        int.from_bytes(hashlib.sha1(s.encode()).digest()[:8], "big") % PRIME61
        for s in shingles
    ]
    sig = []
    for i in range(params.num_perm):
        ai, bi = int(a[i]), int(b[i])
        # int64 multiply wraps, int64 add wraps, then floor-mod by p
        # (Python % on a positive divisor == numpy's floor-mod).
        sig.append(min(wrap64(wrap64(ai * x) + bi) % PRIME61 for x in fps))
    return sig


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox"),
    (2, "one"),  # fewer tokens than any k>1 -> whole-doc shingle
    (3, ""),  # empty doc -> shingle set {""} (NOT the sentinel)
    (4, None),  # null doc -> sentinel signature
    (5, "pack my box with five dozen liquor jugs"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.mark.parametrize(
    "params",
    [
        MinHashParams(num_perm=16, bands=4),
        MinHashParams(num_perm=16, bands=4, k_shingle=3),
        MinHashParams(num_perm=16, bands=4, k_shingle=4, by_word=False),
        MinHashParams(num_perm=32, bands=8, seed=7),
    ],
    ids=["word-k1", "word-k3", "char-k4", "seed7"],
)
def test_matches_independent_bigint_recomputation(docs_df, params):
    got = {
        r["doc_id"]: list(r["sig"])
        for r in refparity.reference_signatures(docs_df, params).collect()
    }
    for doc_id, text in DOCS:
        assert got[doc_id] == expected_signature(text, params), (doc_id, text)


def test_null_is_sentinel_but_empty_string_is_not(docs_df):
    params = MinHashParams(num_perm=16, bands=4)
    got = {
        r["doc_id"]: list(r["sig"])
        for r in refparity.reference_signatures(docs_df, params).collect()
    }
    assert got[4] == [PRIME61] * 16
    assert got[3] != [PRIME61] * 16  # hash of the "" shingle, per reference


def test_deterministic_across_runs(docs_df):
    params = MinHashParams(num_perm=16, bands=4)
    one = refparity.reference_signatures(docs_df, params).collect()
    two = refparity.reference_signatures(docs_df, params).collect()
    assert sorted(map(str, one)) == sorted(map(str, two))


def test_long_view_shape(docs_df):
    params = MinHashParams(num_perm=16, bands=4)
    long = refparity.reference_signatures_long(docs_df, params)
    assert long.columns == ["doc_id", "perm_id", "sig_value"]
    assert long.count() == len(DOCS) * 16
    assert long.filter(F.col("sig_value") < 0).count() == 0
