"""Retrieval quality metrics (SURVEY §2.4 A6): recall@k, precision@k,
MRR — plain DataFrame aggregations over (prediction, truth) id arrays.

Reference definitions (``benchmarks/benchmark_runner.py:71-103``):
  recall@k    = mean over queries of |pred ∩ truth| / k
  precision@k = mean over queries of |pred ∩ truth| / |set(pred)|
  MRR         = mean over queries of 1 / (rank of first predicted id
                that appears in truth), 0 if none.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _id_lists(result: DataFrame, id_col: str, query_id_col: str) -> DataFrame:
    """(query_id, ids ARRAY) ordered by the result's rank column."""
    return result.groupBy(query_id_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("rank"), F.col(id_col).alias("id")))
        ).alias("__ranked")
    ).select(
        query_id_col,
        F.transform(F.col("__ranked"), lambda s: s["id"]).alias("ids"),
    )


def quality_metrics(
    predicted: DataFrame,
    truth: DataFrame,
    k: int,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Per-method aggregate metrics from two ranked result DataFrames.

    Both inputs: (query_id, <id_col>, rank). Output: one row
    (recall_at_k, precision_at_k, mrr, n_queries).
    """
    pred = _id_lists(predicted, id_col, query_id_col).withColumnRenamed("ids", "pred_ids")
    tru = _id_lists(truth, id_col, query_id_col).withColumnRenamed("ids", "truth_ids")
    per_query = (
        pred.join(tru, query_id_col)
        .select(
            query_id_col,
            (
                F.size(F.array_intersect("pred_ids", "truth_ids")) / F.lit(k)
            ).alias("recall"),
            (
                F.size(F.array_intersect("pred_ids", "truth_ids"))
                / F.size(F.array_distinct("pred_ids"))
            ).alias("precision"),
            # rank of first predicted id present in truth; 0 when none
            # (array_position yields 0 when absent -> nullif -> 0.0)
            F.coalesce(
                F.try_divide(
                    F.lit(1.0),
                    F.nullif(
                        F.array_position(
                            F.transform(
                                "pred_ids",
                                lambda p: F.array_contains("truth_ids", p),
                            ),
                            True,
                        ).cast("double"),
                        F.lit(0.0),
                    ),
                ),
                F.lit(0.0),
            ).alias("rr"),
        )
    )
    return per_query.agg(
        F.avg("recall").alias("recall_at_k"),
        F.avg("precision").alias("precision_at_k"),
        F.avg("rr").alias("mrr"),
        F.count("*").alias("n_queries"),
    )
