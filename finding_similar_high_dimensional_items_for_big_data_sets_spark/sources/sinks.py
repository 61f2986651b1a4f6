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


def save_curl_for_query(
    vectors: DataFrame,
    doc_id: int,
    k: int = 5,
    out_path: str = "curl_query.sh",
    url: str = "http://localhost:8000/query",
    id_col: str = "doc_id",
    vec_col: str = "sig",
) -> str:
    """S10: write a ``curl_query.sh`` replaying one vector as a
    ``POST /query`` (reference ``benchmarks/benchmark_runner.py:36-66``,
    payload ``{"vector": [...], "k": k}``). The reference loads row
    ``index`` of ``sigs.npy``; here the row comes from any
    (id, vector) DataFrame — signatures, embeddings, or a migrated
    ``.npy`` shard (sources.migration). Returns the script path.
    """
    row = vectors.filter(F.col(id_col) == doc_id).select(vec_col).first()
    if row is None:
        raise ValueError(f"{id_col}={doc_id} not found")
    payload = json.dumps({"vector": [float(v) for v in row[vec_col]], "k": k})
    cmd = (
        f'curl -X POST "{url}" -H "Content-Type: application/json" '
        f'-d "{payload.replace(chr(34), chr(92) + chr(34))}"'
    )
    with open(out_path, "w") as f:
        f.write(cmd + "\n")
    return out_path
