"""Distributed Bloom filter over 64-bit hash keys, from scratch.

PySpark 4 exposes no public ``bloom_filter_agg`` / ``might_contain``
(they are Catalyst-internal, reserved for the runtime-filter rewrite),
so this module provides the same capability as a library primitive:
build a fixed-size bitset over a corpus-scale key column, broadcast
it, and use it to prune the small side of an anti join BEFORE the
exact verify join ever sees rows that cannot match.

The intended use is incremental ingest against a massive history
(:func:`...operators.dedup.incremental_exact_dedup`): a Bloom filter
of the history's content hashes is orders of magnitude smaller than
the history itself (~1.2 GB for 10^9 keys at 1% fp), and a batch row
whose hash the filter rejects is DEFINITELY new — only the (few)
maybe-duplicates proceed to the exact join, so correctness never
depends on the filter's false-positive rate.

Build plan: one pass over the key column; each input partition folds
its keys into a local bitset (numpy, vectorized double hashing) and
emits that single bitset row; partition bitsets are OR-combined in a
bounded-fan-in tree (``applyInPandas`` per group of ``fan_in``
partitions, then a driver OR of <= ``fan_in`` survivors) so no single
task ever aggregates more than ``fan_in`` bitsets regardless of the
input's partition count.

Probe: the packed bitset rides a SparkContext broadcast; membership is
an Arrow-vectorized pandas UDF doing ``n_hashes`` masked loads per key
(bit positions via double hashing ``h1 + i*h2`` with ``m`` a power of
two and ``h2`` forced odd, Kirsch–Mitzenmacher construction).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType


def optimal_params(n_keys: int, fp_rate: float = 0.01) -> tuple[int, int]:
    """(n_bits, n_hashes) for a target false-positive rate; n_bits is
    rounded UP to a power of two so probes mask instead of mod."""
    if not 0 < fp_rate < 1:
        raise ValueError("fp_rate must be in (0, 1)")
    n_keys = max(1, n_keys)
    m = -n_keys * math.log(fp_rate) / (math.log(2) ** 2)
    n_bits = 1 << max(3, math.ceil(math.log2(m)))
    n_hashes = max(1, round(n_bits / n_keys * math.log(2)))
    return n_bits, min(n_hashes, 16)


def _positions(keys: np.ndarray, i: int, n_bits: int) -> np.ndarray:
    """Bit index of hash function ``i`` for each key (vectorized)."""
    u = keys.astype(np.int64, copy=False).view(np.uint64)
    h1 = u & np.uint64(n_bits - 1)
    h2 = (u >> np.uint64(33)) | np.uint64(1)  # odd => full cycle mod 2^b
    return (h1 + np.uint64(i) * h2) & np.uint64(n_bits - 1)


def _fold_into(bits: np.ndarray, keys: np.ndarray, n_bits: int, n_hashes: int) -> None:
    for i in range(n_hashes):
        pos = _positions(keys, i, n_bits)
        np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64),
                         np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)))


def build_bloom(
    keys_df: DataFrame,
    key_col: str,
    n_bits: int,
    n_hashes: int,
    fan_in: int = 64,
) -> bytes:
    """One-pass distributed build; returns the packed bitset.

    Null keys are dropped JVM-side before Arrow: a long batch with any
    null converts to float64 in pandas, and an int64 round-trip through
    float64 silently rounds 60-bit hash keys to 53-bit precision —
    corrupted bit positions would make real history members probe as
    "definitely new". The same reasoning caps the number of partition
    bitsets with ``coalesce`` (narrow, no shuffle) at ``fan_in**2``
    BEFORE the fold, so the tree is two genuinely bounded levels:
    <= fan_in bitsets per OR task, <= fan_in rows collected.
    """
    if n_bits & (n_bits - 1):
        raise ValueError("n_bits must be a power of two")
    n_bytes = n_bits >> 3

    def partition_bitset(batches):
        from pyspark import TaskContext

        bits = np.zeros(n_bytes, dtype=np.uint8)
        seen = False
        for pdf in batches:
            keys = pdf.iloc[:, 0]
            if len(keys):
                seen = True
                _fold_into(
                    bits, keys.to_numpy(dtype=np.int64), n_bits, n_hashes
                )
        if seen:
            pid = TaskContext.get().partitionId()
            yield pd.DataFrame({"gid": [pid // fan_in], "bits": [bits.tobytes()]})

    def or_group(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(n_bytes, dtype=np.uint8)
        for b in pdf["bits"]:
            acc |= np.frombuffer(b, dtype=np.uint8)
        return pd.DataFrame({"gid": [pdf["gid"].iloc[0]], "bits": [acc.tobytes()]})

    keys = keys_df.select(F.col(key_col).cast("long").alias("k")).filter(
        F.col("k").isNotNull()
    )
    if keys.rdd.getNumPartitions() > fan_in * fan_in:
        keys = keys.coalesce(fan_in * fan_in)
    partial = keys.mapInPandas(partition_bitset, schema="gid int, bits binary")
    rows = partial.groupBy("gid").applyInPandas(
        or_group, schema="gid int, bits binary"
    ).collect()
    acc = np.zeros(n_bytes, dtype=np.uint8)
    for r in rows:
        acc |= np.frombuffer(r["bits"], dtype=np.uint8)
    return acc.tobytes()


def might_contain(
    spark, bloom_bits: bytes, n_hashes: int
) -> "callable[[Column], Column]":
    """Returns a column function testing membership against the
    broadcast bitset — Arrow-vectorized, no per-row Python."""
    n_bits = len(bloom_bits) << 3
    if n_bits == 0 or n_bits & (n_bits - 1):
        raise ValueError("bitset length must be a nonzero power of two bytes")
    bc = spark.sparkContext.broadcast(bloom_bits)

    @F.pandas_udf(BooleanType())
    def _probe(keys: pd.Series) -> pd.Series:
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        arr = keys.to_numpy(dtype=np.int64)
        ok = np.ones(len(arr), dtype=bool)
        for i in range(n_hashes):
            pos = _positions(arr, i, n_bits)
            ok &= (
                bits[(pos >> np.uint64(3)).astype(np.int64)]
                >> (pos & np.uint64(7)).astype(np.uint8)
            ) & np.uint8(1) != 0
        return pd.Series(ok)

    # Nulls are handled JVM-side, BEFORE Arrow: one null in a batch
    # makes pandas deliver the whole long column as float64, and the
    # float64 round-trip silently rounds every 60-bit key in that batch
    # to 53-bit precision — false NEGATIVES for genuine members. The
    # coalesce keeps the UDF input null-free (so Arrow stays int64) and
    # the when() reports null keys as "maybe", which routes them to the
    # exact verify join.
    return lambda c: F.when(c.isNull(), F.lit(True)).otherwise(
        _probe(F.coalesce(c.cast("long"), F.lit(0)))
    )
