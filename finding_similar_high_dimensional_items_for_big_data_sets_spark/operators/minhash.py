"""MinHash signature computation (SURVEY §2.4 A1-A2, §2.8 F5).

Spark-first design: the reference materializes a dense ``(N, 128)``
uint64 NumPy matrix via a Python double loop (reference
``benchmarks/synth_data.py:38-60``). Here a signature is an
``ARRAY<BIGINT>`` column computed entirely inside whole-stage codegen:

    shingles -> hashed = transform(shingles, H)          (hash once)
             -> sig_i  = min over hashed of (a_i*h + b_i) mod p

This is **shuffle-free** — per-document array work, no explode/groupBy
— so it scales linearly with the corpus and parallelizes per input
split. At 100 TB the signature build is a single map stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.config import (
    EMPTY_SENTINEL,
    MERSENNE31,
    MinHashParams,
    perm_coeffs,
)
from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.hashing import (
    shingle_hash,
)
from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.text import (
    char_shingles,
    tokenize,
    word_shingles,
)


def shingles_col(text: Column, params: MinHashParams) -> Column:
    """Shingle-set column for a text column (reference
    ``benchmarks/synth_data.py:65-81``: word or char k-grams, distinct).
    """
    if params.by_word:
        return word_shingles(tokenize(text), params.k_shingle)
    return char_shingles(text, params.k_shingle)


def with_shingles(
    docs: DataFrame, params: MinHashParams, text_col: str = "text"
) -> DataFrame:
    return docs.withColumn("shingles", shingles_col(F.col(text_col), params))


def signature_col(shingles: Column, params: MinHashParams) -> Column:
    """ARRAY<BIGINT> MinHash signature of a shingle-array column.

    Reference semantics (``benchmarks/synth_data.py:38-55``): per
    permutation i, min over shingles x of ``(a_i*H(x)+b_i) mod p``;
    empty shingle set -> sentinel (max field value).

    Implementation note: the permutation coefficients enter the plan as
    ONE literal array of (a, b) structs and the whole signature is a
    single fused fold — not 128 separate expressions. Evaluation order::

        hashed = transform(shingles, H)            -- S hash calls
        sig    = aggregate(hashed, [sentinel]*P,
                   (acc, h) -> zip_with(acc, coeffs, (x, c) ->
                     least(x, (c.a*h + c.b) mod p)))

    Each shingle is hashed exactly once and each (shingle, perm) cell
    computed exactly once (the reference's NumPy loop does the same
    work, ``benchmarks/synth_data.py:47-54``) — and the fold never
    materializes the S x P permutation matrix, only one P-length
    accumulator per step (~30% faster than the matrix-then-reduce form
    at sf0.1). The flat tree also keeps Catalyst optimize time O(1) in
    num_perm instead of O(num_perm) — the naive 128-column form costs
    minutes of planning per query.
    """
    a, b = perm_coeffs(params.num_perm, params.seed)
    coeffs = F.array(
        *[
            F.struct(
                F.lit(a[i]).cast("long").alias("a"), F.lit(b[i]).cast("long").alias("b")
            )
            for i in range(params.num_perm)
        ]
    )
    hashed = F.transform(shingles, lambda s: shingle_hash(s, params.hash_family))
    init = F.array_repeat(F.lit(EMPTY_SENTINEL).cast("long"), params.num_perm)
    return F.aggregate(
        hashed,
        init,
        lambda acc, h: F.zip_with(
            acc,
            coeffs,
            lambda x, c: F.least(x, F.pmod(c["a"] * h + c["b"], F.lit(MERSENNE31))),
        ),
    )


def with_signature(
    docs_with_shingles: DataFrame,
    params: MinHashParams,
    shingles_column: str = "shingles",
) -> DataFrame:
    return docs_with_shingles.withColumn(
        "sig", signature_col(F.col(shingles_column), params)
    )


def signatures(
    docs: DataFrame, params: MinHashParams, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """docs(doc_id, text) -> sigs(doc_id, sig ARRAY<BIGINT>[num_perm])."""
    return (
        with_signature(with_shingles(docs, params, text_col), params)
        .select(id_col, "sig")
    )


def signatures_long(
    docs: DataFrame, params: MinHashParams, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exploded signature view ``(doc_id, perm_id, sig_value)``.

    Used by the correctness oracle (scalar columns hash stably across
    engines); the array form is the production layout.
    """
    sigs = signatures(docs, params, id_col, text_col)
    return sigs.select(
        id_col, F.posexplode("sig").alias("perm_id", "sig_value")
    )
