"""Bit-compatible replication of the reference's MinHash family
(SURVEY §1.3 option 3, §7.4 "exactness is a flag").

The engine's production signature path (operators/minhash.py) uses a
Mersenne-31 field so every intermediate fits in int64 and the DuckDB
oracle can check it. The *reference* instead works over p = 2^61 - 1
(reference ``benchmarks/synth_data.py:20-60``):

- shingle fingerprint = first 8 bytes of SHA1(utf-8), big-endian,
  mod p (reference ``benchmarks/synth_data.py:22-25``);
- signature value i = min over shingles x of ``(a_i*x + b_i) mod p``
  where the multiply/add are executed on **numpy int64** values, so the
  ~2^122 intermediate WRAPS mod 2^64 (two's complement) before the
  floor-mod (the executed loop at reference
  ``benchmarks/synth_data.py:52-55`` operates on the int64 ``sh_ints``
  array, not the unused object-dtype copies above it);
- empty shingle set -> all-``p`` sentinel; a doc with fewer than k
  tokens contributes ONE shingle of the whole (possibly empty) doc
  (reference ``benchmarks/synth_data.py:38-42,67-81``).

None of that is expressible in Spark SQL int64 arithmetic (and DuckDB
has no sha1), so this path runs as an Arrow-batched pandas UDF —
exactly the case SURVEY §2.10 reserves pandas UDFs for. It exists for
parity evidence and migration testing, not as the production path, and
is checked by an independent big-int recomputation in
``tests/test_refparity.py`` rather than the SQL oracle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from finding_similar_high_dimensional_items_for_big_data_sets_spark.config import (
    PRIME61,
    MinHashParams,
    ref61_perm_coeffs,
)


def ref_shingle_fingerprint(shingle: str) -> int:
    """SHA1-derived 61-bit fingerprint, bit-identical to the reference
    (``benchmarks/synth_data.py:22-25``)."""
    digest = hashlib.sha1(shingle.encode("utf-8")).digest()
    return int.from_bytes(digest[:8], "big") % PRIME61


def ref_shingle_set(text: str | None, k: int, by_word: bool) -> set[str]:
    """The reference's shingling semantics, including its edge cases:
    None -> empty set; a doc shorter than k units -> one shingle of the
    whole doc (which is the EMPTY STRING for an empty doc — not the
    empty set; reference ``benchmarks/synth_data.py:67-81``)."""
    if text is None:
        return set()
    if by_word:
        toks = text.split()
        if len(toks) < k:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
    if len(text) < k:
        return {text}
    return {text[i : i + k] for i in range(len(text) - k + 1)}


def reference_signature_udf(params: MinHashParams):
    """pandas UDF text -> ARRAY<BIGINT> signature in the reference's
    family. Vectorized over perms per doc; int64 wrap is reproduced by
    doing the arithmetic on int64 arrays, as the reference does."""
    a, b = ref61_perm_coeffs(params.num_perm, params.seed)
    a_col, b_col = a[:, None], b[:, None]
    p64 = np.int64(PRIME61)
    sentinel = [PRIME61] * params.num_perm
    k, by_word = params.k_shingle, params.by_word

    @F.pandas_udf(ArrayType(LongType()))
    def _sig(texts: pd.Series) -> pd.Series:
        out = []
        for text in texts:
            shingles = ref_shingle_set(text, k, by_word)
            if not shingles:
                out.append(sentinel)
                continue
            fps = np.fromiter(
                (ref_shingle_fingerprint(s) for s in shingles),
                dtype=np.int64,
                count=len(shingles),
            )
            with np.errstate(over="ignore"):
                vals = (a_col * fps[np.newaxis, :] + b_col) % p64
            out.append([int(v) for v in vals.min(axis=1)])
        return pd.Series(out)

    return _sig


def reference_signatures(
    docs: DataFrame,
    params: MinHashParams | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """docs(doc_id, text) -> sigs(doc_id, sig ARRAY<BIGINT>[num_perm])
    bit-identical to the reference's ``MinHash.batch_signature`` at the
    same (num_perm, k_shingle, by_word, seed)."""
    params = params or MinHashParams()
    return docs.select(
        id_col, reference_signature_udf(params)(F.col(text_col)).alias("sig")
    )


def reference_signatures_long(
    docs: DataFrame,
    params: MinHashParams | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exploded ``(doc_id, perm_id, sig_value)`` view for stable
    cross-run hashing (rows-only driver check)."""
    sigs = reference_signatures(docs, params, id_col, text_col)
    return sigs.select(id_col, F.posexplode("sig").alias("perm_id", "sig_value"))
