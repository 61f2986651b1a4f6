"""Result sinks (SURVEY §2.1 S8/S9).

- S8: the reference answers ``POST /query`` with
  ``{"candidates": [{"id": ..., "score": ..., "vector_preview":
  [...]}]}`` (``app/src/query_service.py:196``). Here the stable
  ``doc_id`` replaces the physical ``(shard, row)`` address (J3 —
  SURVEY §2.3) and the envelope is built from the top-k DataFrame.
- S9: the reference writes its benchmark metrics table to CSV
  (``benchmarks/benchmark_runner.py:248``).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def topk_response(result: DataFrame, query_id: int | None = None) -> dict:
    """S8: serialize a (query_id, doc_id, score[, vector_preview])
    top-k DataFrame into the reference's response envelope.

    Collects — by contract the input is a top-k result (<= k rows per
    query); never call on an unlimited frame.
    """
    rows = result.collect()
    if query_id is not None:
        rows = [r for r in rows if r["query_id"] == query_id]
    rows.sort(key=lambda r: (-r["score"], r["doc_id"]))
    has_preview = "vector_preview" in result.columns
    return {
        "candidates": [
            {
                "id": r["doc_id"],
                "score": float(r["score"]),
                "vector_preview": list(r["vector_preview"]) if has_preview else [],
            }
            for r in rows
        ]
    }


def topk_response_json(result: DataFrame, query_id: int | None = None) -> str:
    return json.dumps(topk_response(result, query_id))


def write_metrics_csv(metrics: DataFrame, path: str) -> None:
    """S9: metrics table -> CSV with header (one file — metrics frames
    are tiny aggregates by construction)."""
    metrics.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
