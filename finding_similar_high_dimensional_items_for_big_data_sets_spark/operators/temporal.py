"""Temporal joins over event streams: the as-of join.

``asof_join`` matches every left row to the single right row with the
greatest timestamp <= the left timestamp within the same key — the
"latest quote before the trade" operator that plain SQL needs a
correlated subquery (or an exploding range join) to express, and that
Spark lacks as a built-in.

Spark-first plan (the canonical distributed shape): UNION the two
tagged sides, then ONE window per key ordered by (ts, side-tag,
right-id) carrying ``last(right_payload, ignorenulls=True)`` forward —
a single shuffle on the key plus a per-partition sort, never a
range-join blowup. Cost at 100 TB: exactly the cost of sorting both
inputs by (key, ts) — the same work a merge-based ASOF needs on any
engine; the carried state is ONE struct per partition-scan position.
Ties: right rows sort BEFORE left rows at equal timestamps (>=
semantics) and among equal right timestamps the largest tiebreak id
wins (deterministic).

The DuckDB oracle uses its native ``ASOF LEFT JOIN`` — an independent
implementation of the same semantics, which makes the correctness
check genuinely cross-validating rather than twin-coded
(``oracle/duckdb_sql.py sql_events_asof``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    tolerance_us: int | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """As-of join: each left row gains ``_match`` — the right row
    (full struct) with the greatest ``ts_col`` <= the left row's,
    same ``on`` key — or NULL if none (or none within
    ``tolerance_us`` microseconds, when given).

    Output: every left column plus ``_match`` (struct of right
    columns); callers project/rename from the struct.
    """
    if ts_col not in left.columns or ts_col not in right.columns:
        raise ValueError(f"both sides need the {ts_col} column")
    rp_fields = right.schema
    lp = F.struct(*[F.col(c) for c in left.columns])
    rp = F.struct(*[F.col(c) for c in right.columns])
    null_rp = F.lit(None).cast(
        "struct<" + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in rp_fields) + ">"
    )
    null_lp = F.lit(None).cast(
        "struct<" + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in left.schema) + ">"
    )
    tb = (
        F.col("_rp")[tiebreak_col]
        if tiebreak_col
        else F.lit(0)
    )
    u = left.select(
        F.col(on).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"),
        lp.alias("_lp"),
        null_rp.alias("_rp"),
    ).unionByName(
        right.select(
            F.col(on).alias("_k"),
            F.col(ts_col).alias("_ts"),
            F.lit(0).alias("_side"),
            null_lp.alias("_lp"),
            rp.alias("_rp"),
        )
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), tb.asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_match", F.last("_rp", ignorenulls=True).over(w))
    out = matched.filter(F.col("_side") == 1).select("_lp", "_match")
    if tolerance_us is not None:
        ts_type = left.schema[ts_col].dataType.simpleString()
        # microseconds for TIMESTAMP columns; raw units for numeric ts
        def _units(c):
            return F.unix_micros(c) if ts_type == "timestamp" else c.cast("long")

        out = out.withColumn(
            "_match",
            F.when(
                _units(F.col("_lp")[ts_col]) - _units(F.col("_match")[ts_col])
                <= F.lit(int(tolerance_us)),
                F.col("_match"),
            ),
        )
    return out.select(*[F.col("_lp")[c].alias(c) for c in left.columns], "_match")
