"""Vector/array math over ARRAY columns (SURVEY §2.8 F6/F8, §2.4 A4).

Sequential-fold semantics everywhere (``F.aggregate`` left fold) so the
DuckDB oracle's ``list_reduce`` reproduces results bit-for-bit — the
IEEE op sequence is identical (verified empirically).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def est_jaccard(a: Column, b: Column, num_perm: int) -> Column:
    """Estimated Jaccard: fraction of equal signature positions.

    The system's similarity semantic (reference
    ``app/src/minhash_lsh.py:110-113``). Exact in binary when num_perm
    is a power of two (n/128 has an exact double representation).

    Implementation: ``zip_with`` + ``aggregate`` fold. Measured A/B at
    sf0.1 against (a) positional-tag ``array_intersect`` and (b) a flat
    128-term GetArrayItem sum: the fold is 3x faster than both on the
    broadcast-join scoring path (no per-row allocations, single pass).
    """
    return sig_match_count(a, b) / F.lit(num_perm)


def sig_match_count(a: Column, b: Column) -> Column:
    """Integer count of equal positions (numerator of est_jaccard)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def l2_distance(a: Column, b: Column) -> Column:
    """Euclidean distance between float/double arrays.

    Reference oracle semantics (``benchmarks/benchmark_runner.py:
    109-117``); elements cast to double before arithmetic.
    """
    sq = F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: F.pow(x.cast("double") - y.cast("double"), F.lit(2)),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.sqrt(sq)


def neg_l2_score(a: Column, b: Column) -> Column:
    """Negative L2 (higher = more similar), reference ``app/src/qed.py:65-73``."""
    return -l2_distance(a, b)


def dot_product(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    # try_divide: zero-norm vectors yield NULL instead of an ANSI
    # divide-by-zero failure that would kill the whole job.
    return F.try_divide(dot_product(a, b), l2_norm(a) * l2_norm(b))


def jaccard_arrays(a: Column, b: Column) -> Column:
    """Exact Jaccard over two (distinct-element) arrays: |A∩B| / |A∪B|."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)
