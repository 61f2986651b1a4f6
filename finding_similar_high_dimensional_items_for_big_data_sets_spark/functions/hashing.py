"""Hash primitives (SURVEY §2.8 F4/F5, §2.4 A2).

Two families, one structure:

- ``portable``: ``H(s) = int(hex(md5(s))[0:15], 16)`` — a 60-bit value
  computable bit-identically by Spark (``conv(substring(md5(s),1,15),
  16, 10)``) and DuckDB (``cast('0x' || substr(md5(s),1,15) as
  bigint)``). This is the analog of the reference's truncated-SHA1
  shingle fingerprint (reference ``benchmarks/synth_data.py:22-25``)
  and is what the DuckDB correctness oracle checks.
- ``xxhash64``: Spark's JVM-native 64-bit hash — the fast path for
  benchmarks and production; same pipeline shape, cheaper per row.

Both are reduced mod the Mersenne prime 2^31-1 before entering the
affine MinHash permutations so ``a*x + b`` stays within int64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.config import (
    HASH_FAMILY_PORTABLE,
    HASH_FAMILY_XXHASH,
    MERSENNE31,
)


def portable_hash64(col: Column) -> Column:
    """60-bit stable string hash, identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def portable_hash64_sql(expr: str) -> str:
    """DuckDB SQL rendering of :func:`portable_hash64` over ``expr``."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def shingle_hash(col: Column, family: str = HASH_FAMILY_PORTABLE) -> Column:
    """Map a shingle string into the Mersenne-31 field [0, 2^31-1)."""
    if family == HASH_FAMILY_PORTABLE:
        return F.pmod(portable_hash64(col), F.lit(MERSENNE31))
    if family == HASH_FAMILY_XXHASH:
        return F.pmod(F.xxhash64(col), F.lit(MERSENNE31))
    raise ValueError(f"unknown hash family: {family}")


def shingle_hash_sql(expr: str) -> str:
    """DuckDB SQL for the portable :func:`shingle_hash`."""
    # DuckDB's % follows the dividend sign, but portable_hash64 output is
    # always non-negative (15 hex digits < 2^60), so plain % == pmod.
    return f"({portable_hash64_sql(expr)} % {MERSENNE31})"


def band_hash(elements_csv: Column, family: str = HASH_FAMILY_PORTABLE) -> Column:
    """Bucket key for one LSH band from its comma-joined signature slice.

    The reference keys buckets by the raw bytes of the band slice
    (``app/src/minhash_lsh.py:54``); byte-equality there == equality of
    the joined decimal string here, so hashing the string preserves the
    bucket partition exactly (modulo negligible 60-bit collisions).
    """
    if family == HASH_FAMILY_PORTABLE:
        return portable_hash64(elements_csv)
    if family == HASH_FAMILY_XXHASH:
        return F.xxhash64(elements_csv)
    raise ValueError(f"unknown hash family: {family}")
