"""QED (Quantization/Edge-Determination) operator family (SURVEY §2.2
P5-P6, §2.4 A5, §2.8 F6-F7).

The reference ships histogram utilities (``app/src/qed.py:18-73``)
that are disconnected from its hot path (SURVEY §4.3); this engine
wires them into a coherent prune-then-score pipeline over float
vectors (the ``embeddings`` table):

  1. ``histogram_edges``  — per-dimension uniform bin edges (A5 pass 1)
  2. ``histogram_counts`` — per-(dim, bin) counts        (A5 pass 2)
  3. ``query_windows``    — query-dependent ±r bin windows per dim (P6)
  4. ``bin_window_filter``— rows whose every dim falls in-window (P5)
  5. score survivors by -L2 (F6) and take top-k

At scale the filter is a conjunction of per-dim range predicates over
literal bounds — pushdown-friendly, no shuffle; the histogram build is
two aggregations (min/max, then counts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.arrays import (
    neg_l2_score,
)


def explode_dims(
    vectors: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(vec_id, dim, value) long form of an ARRAY<FLOAT/DOUBLE> column."""
    return vectors.select(
        id_col, F.posexplode(vec_col).alias("dim", "value")
    ).withColumn("value", F.col("value").cast("double"))


def histogram_edges(
    vectors: DataFrame,
    n_bins: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dim (lo, hi, width) for uniform binning — A5 pass 1
    (reference ``app/src/qed.py:27-33`` uses np.histogram's uniform
    edges from data min/max). Output: (dim, lo, hi, width)."""
    return (
        explode_dims(vectors, id_col, vec_col)
        .groupBy("dim")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .select(
            "dim",
            "lo",
            "hi",
            ((F.col("hi") - F.col("lo")) / F.lit(n_bins)).alias("width"),
        )
    )


def bin_index(value: Column, lo: Column, width: Column, n_bins: int) -> Column:
    """searchsorted-style bin lookup (F7, reference ``app/src/qed.py:47,59``):
    clamped to [0, n_bins-1]; right edge closed like np.histogram.
    A constant dimension has width 0 — guard to width 1 so every value
    (== lo) lands in bin 0 instead of NaN (same policy as
    ``query_windows`` / ``bin_window_filter``)."""
    safe_width = F.when(width != 0, width).otherwise(F.lit(1.0))
    raw = F.floor((value - lo) / safe_width).cast("int")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))


def histogram_counts(
    vectors: DataFrame,
    edges: DataFrame,
    n_bins: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-(dim, bin) occupancy — A5 pass 2. Output: (dim, bin, cnt)."""
    long = explode_dims(vectors, id_col, vec_col)
    return (
        long.join(F.broadcast(edges), "dim")
        .select(
            "dim", bin_index(F.col("value"), F.col("lo"), F.col("width"), n_bins).alias("bin")
        )
        .groupBy("dim", "bin")
        .count()
        .withColumnRenamed("count", "cnt")
    )


def query_windows(
    query: list[float],
    edges_rows: list[dict],
    n_bins: int = 256,
    p_fraction: float = 0.02,
) -> list[tuple[int, int, int]]:
    """P6: per-dim [lo_bin, hi_bin] window around the query's bin,
    widened by ``r = max(1, int(p_fraction * n_bins))`` (reference
    ``app/src/qed.py:38-52``). Driver-side on the tiny edges table;
    emits literal bounds that Catalyst can push down.

    Returns [(dim, lo_bin, hi_bin)].
    """
    r = max(1, int(p_fraction * n_bins))
    out = []
    by_dim = {e["dim"]: e for e in edges_rows}
    for d, qv in enumerate(query):
        e = by_dim[d]
        width = e["width"] if e["width"] else 1.0
        b = int((qv - e["lo"]) / width)
        b = min(max(b, 0), n_bins - 1)
        out.append((d, max(0, b - r), min(n_bins - 1, b + r)))
    return out


def bin_window_filter(
    vectors: DataFrame,
    edges_rows: list[dict],
    windows: list[tuple[int, int, int]],
    n_bins: int = 256,
    vec_col: str = "embedding",
) -> DataFrame:
    """P5: keep rows whose EVERY dimension's bin lies inside the
    query window (reference ``app/src/qed.py:54-63``).

    Expressed as a single conjunctive range predicate over array
    elements with literal bounds — no join, no shuffle; on
    bin-partitioned layouts this prunes files via min/max stats.
    """
    by_dim = {e["dim"]: e for e in edges_rows}
    conds = []
    for d, lo_b, hi_b in windows:
        e = by_dim[d]
        width = e["width"] if e["width"] else 1.0
        elem = F.col(vec_col)[d].cast("double")
        b = F.least(
            F.greatest(F.floor((elem - F.lit(e["lo"])) / F.lit(width)).cast("int"), F.lit(0)),
            F.lit(n_bins - 1),
        )
        conds.append((b >= lo_b) & (b <= hi_b))
    pred = conds[0]
    for c in conds[1:]:
        pred = pred & c
    return vectors.filter(pred)


def qed_topk_store(
    spark,
    path: str,
    query: list[float],
    edges_rows: list[dict],
    k: int = 10,
    n_bins: int = 256,
    p_fraction: float = 0.1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """:func:`qed_prune_score_topk` against a
    :func:`sources.tables.write_qed_partitioned` store: the query's P6
    window on the store's partition dimension is translated into a
    coarse-bin RANGE filter on the partition column, so out-of-window
    directories are pruned at the source listing (PartitionFilters —
    same story as the ANN/IVF stores); the full all-dims predicate
    then runs on the surviving rows. Answers are identical to the
    in-memory pipeline at the same (edges, n_bins, p_fraction): the
    partition filter is implied by the window predicate on that
    dimension (widened one coarse bin each side so boundary float
    rounding can never exclude a legal row)."""
    import math

    from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import (
        read_store_meta,
    )

    meta = read_store_meta(path)
    d = int(meta["dim"])
    n_part = int(meta["n_part_bins"])
    windows = query_windows(query, edges_rows, n_bins, p_fraction)
    by_dim = {e["dim"]: e for e in edges_rows}
    e = by_dim[d]
    width = e["width"] if e["width"] else 1.0
    _d, lo_b, hi_b = windows[d]
    # value bounds implied by the window on the partition dimension;
    # the clamped extreme bins absorb out-of-range values, so they
    # translate to unbounded sides
    lo_val = -math.inf if lo_b == 0 else e["lo"] + lo_b * width
    hi_val = math.inf if hi_b == n_bins - 1 else e["lo"] + (hi_b + 1) * width
    mlo, mw = float(meta["lo"]), float(meta["width"])
    plo = 0 if lo_val == -math.inf else int((lo_val - mlo) // mw) - 1
    phi = n_part - 1 if hi_val == math.inf else int((hi_val - mlo) // mw) + 1
    plo, phi = max(0, plo), min(n_part - 1, phi)
    store = spark.read.parquet(path).filter(
        (F.col("qed_bin") >= plo) & (F.col("qed_bin") <= phi)
    )
    survivors = bin_window_filter(store, edges_rows, windows, n_bins, vec_col)
    qlit = F.array(*[F.lit(float(v)) for v in query])
    scored = survivors.select(
        id_col, F.round(neg_l2_score(F.col(vec_col), qlit), 6).alias("score")
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy(F.pmod(F.col(id_col), F.lit(1))).orderBy(
                    F.col("score").desc(), F.col(id_col).asc()
                )
            ),
        )
    )


def qed_prune_score_topk(
    vectors: DataFrame,
    query: list[float],
    edges_rows: list[dict],
    k: int = 10,
    n_bins: int = 256,
    p_fraction: float = 0.1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The repaired end-to-end QED pipeline: prune by bin windows (P5/P6)
    then score survivors by -L2 (F6) and take deterministic top-k.
    Output: (vec_id, score, rank)."""
    windows = query_windows(query, edges_rows, n_bins, p_fraction)
    survivors = bin_window_filter(vectors, edges_rows, windows, n_bins, vec_col)
    qlit = F.array(*[F.lit(float(v)) for v in query])
    # round(6): keep 1-ULP fold differences vs the DuckDB oracle out of
    # ranking and value hashes (same policy as operators/bruteforce.py).
    scored = survivors.select(
        id_col, F.round(neg_l2_score(F.col(vec_col), qlit), 6).alias("score")
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
        .withColumn(
            "rank",
            # constant-valued but non-foldable partition key (pmod(id,1))
            # over the k surviving rows keeps the partition spec alive so
            # WindowExec stops warning about a global window
            F.row_number().over(
                Window.partitionBy(F.pmod(F.col(id_col), F.lit(1))).orderBy(
                    F.col("score").desc(), F.col(id_col).asc()
                )
            ),
        )
    )
