"""Network query endpoint: the reference's ``POST /query`` REST
surface (``app/src/query_service.py:34-46,139-196``) bound to the
engine's in-process :class:`~.serving.ServingIndex`.

The reference serves FastAPI over a Dask cluster; this environment
ships no web framework, so the binding is the stdlib
``http.server.ThreadingHTTPServer`` — deliberately thin, because all
request semantics already live in library code:

- envelope: ``{"vector": List[int], "k": int = 10}`` with the same
  validation rules as :func:`sources.query_source.validate_envelopes`
  (non-null vector of exactly ``num_perm`` integers, ``k`` floored at
  1, default 10);
- response: ``{"candidates": [{"id", "score", "vector_preview"}]}``
  matching ``sources.sinks.topk_response`` / reference
  ``query_service.py:196``, preview = first 10 signature values
  (reference ``worker_tasks.py:164``).

Scale note: one process serves one exported index (or one shard via
``serving.shard_dataframes`` + ``serving.merge_topk`` at a router
tier). Queries never launch Spark jobs — Spark builds the artifact,
the endpoint probes it, same division of labor as the reference's
offline build / online probe split.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.serving import (
    ServingIndex,
)

DEFAULT_K = 10
PREVIEW_N = 10


class QueryService:
    """Transport-free request handler: dict in, (status, dict) out.
    The HTTP layer below is a socket binding for exactly this."""

    def __init__(self, index: ServingIndex, preview_n: int = PREVIEW_N):
        self.index = index
        self.preview_n = preview_n

    def handle_query(self, payload) -> tuple[int, dict]:
        if not isinstance(payload, dict):
            return 400, {"error": "body must be a JSON object"}
        vector = payload.get("vector")
        if not isinstance(vector, list) or any(
            not isinstance(v, int) or isinstance(v, bool) for v in vector
        ):
            return 400, {"error": "vector must be a list of integers"}
        if len(vector) != self.index.params.num_perm:
            return 400, {
                "error": (
                    f"vector width {len(vector)} != num_perm "
                    f"{self.index.params.num_perm}"
                )
            }
        k = payload.get("k", DEFAULT_K)
        if not isinstance(k, int) or isinstance(k, bool):
            return 400, {"error": "k must be an integer"}
        k = max(1, k)
        hits = self.index.query(vector, k=k)
        return 200, {
            "candidates": [
                {
                    "id": doc_id,
                    "score": score,
                    "vector_preview": self._preview(doc_id),
                }
                for (doc_id, score, _rank) in hits
            ]
        }

    def _preview(self, doc_id: int) -> list[int]:
        row = int(np.searchsorted(self.index.doc_ids, doc_id))
        return [int(v) for v in self.index.sigs[row, : self.preview_n]]


def _make_handler(service: QueryService):
    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802 (http.server API)
            if self.path.rstrip("/") != "/query":
                self._reply(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"null")
            except (ValueError, json.JSONDecodeError):
                self._reply(400, {"error": "invalid JSON body"})
                return
            status, body = service.handle_query(payload)
            self._reply(status, body)

        def do_GET(self):  # noqa: N802
            if self.path.rstrip("/") == "/health":
                self._reply(
                    200, {"status": "ok", "n_docs": int(service.index.doc_ids.size)}
                )
            else:
                self._reply(404, {"error": "not found"})

        def _reply(self, status: int, body: dict) -> None:
            data = json.dumps(body).encode("utf-8")
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, fmt, *args):  # silence per-request stderr
            pass

    return Handler


def start_server(
    index: ServingIndex, host: str = "127.0.0.1", port: int = 0
) -> tuple[ThreadingHTTPServer, threading.Thread]:
    """Bind the query service to a socket (``port=0`` = ephemeral).
    Returns (server, daemon thread); call ``server.shutdown()`` then
    ``server.server_close()`` to stop."""
    server = ThreadingHTTPServer((host, port), _make_handler(QueryService(index)))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server, thread


class VectorQueryService:
    """Embedding-index twin of :class:`QueryService`: dict in,
    (status, dict) out, backed by an in-process
    :class:`~.serving_vector.ServingVectorIndex` (IVF-PQ ADC point
    queries, optional exact rerank). Envelope:
    ``{"vector": List[float], "k": int = 10, "n_probe": int = 4,
    "shortlist": int | null}``."""

    def __init__(self, index):
        self.index = index

    def handle_query(self, payload) -> tuple[int, dict]:
        if not isinstance(payload, dict):
            return 400, {"error": "body must be a JSON object"}
        vector = payload.get("vector")
        if not isinstance(vector, list) or any(
            not isinstance(v, (int, float)) or isinstance(v, bool) for v in vector
        ):
            return 400, {"error": "vector must be a list of numbers"}
        if len(vector) != self.index.dim:
            return 400, {
                "error": f"vector width {len(vector)} != dim {self.index.dim}"
            }
        k = payload.get("k", DEFAULT_K)
        if not isinstance(k, int) or isinstance(k, bool):
            return 400, {"error": "k must be an integer"}
        n_probe = payload.get("n_probe", 4)
        if not isinstance(n_probe, int) or isinstance(n_probe, bool) or n_probe < 1:
            return 400, {"error": "n_probe must be a positive integer"}
        shortlist = payload.get("shortlist")
        if shortlist is not None and (
            not isinstance(shortlist, int) or isinstance(shortlist, bool)
        ):
            return 400, {"error": "shortlist must be an integer or null"}
        try:
            hits = self.index.query(
                vector, k=max(1, k), n_probe=n_probe, shortlist=shortlist
            )
        except ValueError as e:
            return 400, {"error": str(e)}
        return 200, {
            "candidates": [
                {"id": vec_id, "dist": dist, "rank": rank}
                for (vec_id, dist, rank) in hits
            ]
        }


def start_vector_server(
    index, host: str = "127.0.0.1", port: int = 0
) -> tuple[ThreadingHTTPServer, threading.Thread]:
    """Bind the EMBEDDING query service to a socket: ``POST /query``
    with the vector envelope, ``GET /health`` reporting the indexed
    count — the IVF-PQ twin of :func:`start_server`."""
    service = VectorQueryService(index)

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802 (http.server API)
            if self.path.rstrip("/") != "/query":
                self._reply(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"null")
            except (ValueError, json.JSONDecodeError):
                self._reply(400, {"error": "invalid JSON body"})
                return
            status, body = service.handle_query(payload)
            self._reply(status, body)

        def do_GET(self):  # noqa: N802
            if self.path.rstrip("/") == "/health":
                self._reply(
                    200, {"status": "ok", "n_vecs": int(index.vec_ids.size)}
                )
            else:
                self._reply(404, {"error": "not found"})

        def _reply(self, status: int, body: dict) -> None:
            data = json.dumps(body).encode("utf-8")
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, fmt, *args):  # silence per-request stderr
            pass

    server = ThreadingHTTPServer((host, port), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server, thread


class LexicalQueryService:
    """Keyword twin of :class:`VectorQueryService`, backed by an
    in-process :class:`~.retrieval.ServingLexicalIndex`. Envelope:
    ``{"query": str, "k": int = 10}``."""

    def __init__(self, index):
        self.index = index

    def handle_query(self, payload) -> tuple[int, dict]:
        if not isinstance(payload, dict):
            return 400, {"error": "body must be a JSON object"}
        query = payload.get("query")
        if not isinstance(query, str):
            return 400, {"error": "query must be a string"}
        k = payload.get("k", DEFAULT_K)
        if not isinstance(k, int) or isinstance(k, bool):
            return 400, {"error": "k must be an integer"}
        try:
            hits = self.index.query(query, k=max(1, k))
        except ValueError as e:
            return 400, {"error": str(e)}
        return 200, {
            "candidates": [
                {"id": int(doc_id), "score": score, "rank": rank}
                for (doc_id, score, rank) in hits
            ]
        }


class HybridQueryService:
    """Hybrid point service: BM25 + vector lists fused in-process by
    the contract RRF rule (``retrieval.hybrid_rrf_point``). Envelope:
    ``{"query": str, "vector": List[float], "k": int = 10,
    "n_probe": int = 4, "c": int = 60}``."""

    def __init__(self, lex_index, vec_index):
        self.lex_index = lex_index
        self.vec_index = vec_index

    def handle_query(self, payload) -> tuple[int, dict]:
        from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.retrieval import (
            hybrid_rrf_point,
        )

        if not isinstance(payload, dict):
            return 400, {"error": "body must be a JSON object"}
        query = payload.get("query")
        if not isinstance(query, str):
            return 400, {"error": "query must be a string"}
        vector = payload.get("vector")
        if not isinstance(vector, list) or any(
            not isinstance(v, (int, float)) or isinstance(v, bool) for v in vector
        ):
            return 400, {"error": "vector must be a list of numbers"}
        if len(vector) != self.vec_index.dim:
            return 400, {
                "error": f"vector width {len(vector)} != dim {self.vec_index.dim}"
            }
        k = payload.get("k", DEFAULT_K)
        if not isinstance(k, int) or isinstance(k, bool):
            return 400, {"error": "k must be an integer"}
        n_probe = payload.get("n_probe", 4)
        if not isinstance(n_probe, int) or isinstance(n_probe, bool) or n_probe < 1:
            return 400, {"error": "n_probe must be a positive integer"}
        c = payload.get("c", 60)
        if not isinstance(c, int) or isinstance(c, bool) or c < 1:
            return 400, {"error": "c must be a positive integer"}
        try:
            hits = hybrid_rrf_point(
                self.lex_index, self.vec_index, query, vector,
                k=max(1, k), c=c, n_probe=n_probe,
            )
        except ValueError as e:
            return 400, {"error": str(e)}
        return 200, {
            "candidates": [
                {"id": int(doc_id), "rrf": score, "rank": rank}
                for (doc_id, score, rank) in hits
            ]
        }


def start_lexical_server(
    lex_index, vec_index=None, host: str = "127.0.0.1", port: int = 0
) -> tuple[ThreadingHTTPServer, threading.Thread]:
    """Bind the keyword (and, with ``vec_index``, the hybrid) service:
    ``POST /query`` with the keyword envelope, ``POST /hybrid`` with
    the hybrid envelope, ``GET /health``."""
    lex_service = LexicalQueryService(lex_index)
    hybrid_service = (
        HybridQueryService(lex_index, vec_index) if vec_index is not None else None
    )

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802 (http.server API)
            path = self.path.rstrip("/")
            if path == "/query":
                service = lex_service
            elif path == "/hybrid" and hybrid_service is not None:
                service = hybrid_service
            else:
                self._reply(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"null")
            except (ValueError, json.JSONDecodeError):
                self._reply(400, {"error": "invalid JSON body"})
                return
            status, body = service.handle_query(payload)
            self._reply(status, body)

        def do_GET(self):  # noqa: N802
            if self.path.rstrip("/") == "/health":
                self._reply(
                    200,
                    {
                        "status": "ok",
                        "n_docs": int(lex_index.n_docs),
                        "hybrid": hybrid_service is not None,
                    },
                )
            else:
                self._reply(404, {"error": "not found"})

        def _reply(self, status: int, body: dict) -> None:
            data = json.dumps(body).encode("utf-8")
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, fmt, *args):  # silence per-request stderr
            pass

    server = ThreadingHTTPServer((host, port), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server, thread
