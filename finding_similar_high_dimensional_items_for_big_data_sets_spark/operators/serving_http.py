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


def _handle_reload(spark, holders, payload, lock) -> tuple[int, dict]:
    """Shared ``POST /reload`` law for every replica tier: for each
    served index, check staleness against its persisted artifacts and
    re-snapshot when stale (or when the body says ``{"force": true}``).
    The swap is one attribute assignment — in-flight queries finish on
    the old snapshot, the socket never drops. ``holders``: (name,
    get_index, set_index) triples; an index without persisted
    provenance (built from DataFrames) is reported ``tracked: false``
    and left alone. Requires the server to have been started with a
    SparkSession (the export runs Spark jobs).

    ``lock``: the server's per-instance reload mutex. ThreadingHTTPServer
    handles each request on its own thread, so without it two
    concurrent reloads (or a reload racing the documented manual
    ``server.service.index = ...`` swap under the same lock) would
    both pass ``is_stale`` and run duplicate Spark export jobs. The
    acquire is NON-blocking: the loser answers 409 immediately — the
    winner's swap is exactly the snapshot the loser wanted, so
    queueing a second export behind the first would only re-do its
    work (round-11 ADVICE)."""
    if spark is None:
        return 400, {
            "error": "server started without a SparkSession — pass "
            "spark= to start_* to enable /reload"
        }
    if not lock.acquire(blocking=False):
        return 409, {"error": "reload already in progress"}
    try:
        return _reload_locked(spark, holders, payload)
    finally:
        lock.release()


def _staleness(spark, holders) -> dict:
    """Per-index staleness for ``GET /health``: True/False from
    ``is_stale`` (O(stat), no data read), ``None`` when it cannot be
    known — untracked index (no persisted provenance), server started
    without a SparkSession, or a probe failure mid-swap. Health stays
    a cheap liveness endpoint: a failed staleness probe degrades to
    unknown, never to a 500 (round-11 — lets an operator see a
    pending reload from the router without probing each replica)."""
    out = {}
    for name, get_index, _set_index in holders:
        index = get_index()
        if spark is None or getattr(index, "source", None) is None:
            out[name] = None
            continue
        try:
            out[name] = bool(index.is_stale(spark))
        except Exception:  # noqa: BLE001 — store mid-swap etc.: unknown
            out[name] = None
    return out


def _reload_locked(spark, holders, payload) -> tuple[int, dict]:
    force = isinstance(payload, dict) and bool(payload.get("force", False))
    report = {}
    failed = False
    for name, get_index, set_index in holders:
        index = get_index()
        # untracked is a PROPERTY (no persisted provenance), not an
        # exception: a ValueError out of is_stale on a tracked index
        # is a real staleness-probe failure and must surface below,
        # not be silently reported as untracked
        if getattr(index, "source", None) is None:
            report[name] = {"tracked": False, "reloaded": False}
            continue
        try:
            stale = index.is_stale(spark)
            reloaded = stale or force
            if reloaded:
                set_index(index.reload(spark))
        except Exception as e:  # noqa: BLE001 — a probe/reload failure
            # (store mid-swap, broken table, export error) must become
            # an HTTP error the operator can read and retry, never a
            # dropped connection; the old snapshot stays in place
            failed = True
            report[name] = {"tracked": True, "error": str(e)}
            continue
        report[name] = {
            "tracked": True,
            "was_stale": stale,
            "reloaded": reloaded,
        }
    return (500 if failed else 200), {"indexes": report}


def _make_handler(routes: dict, health):
    """ONE HTTP handler for every server in this module, so the body
    parsing, dispatch, reply, and logging behavior cannot diverge
    between tiers. ``routes``: path -> ``payload -> (status, body)``
    for POST; ``health``: ``() -> (status, body)`` for ``GET
    /health``."""

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802 (http.server API)
            handle = routes.get(self.path.rstrip("/"))
            if handle is None:
                self._reply(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"null")
            except (ValueError, json.JSONDecodeError):
                self._reply(400, {"error": "invalid JSON body"})
                return
            status, body = handle(payload)
            self._reply(status, body)

        def do_GET(self):  # noqa: N802
            if self.path.rstrip("/") == "/health":
                self._reply(*health())
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


def _serve(handler, host: str, port: int):
    server = ThreadingHTTPServer((host, port), handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server, thread


def start_server(
    index: ServingIndex, host: str = "127.0.0.1", port: int = 0, spark=None
) -> tuple[ThreadingHTTPServer, threading.Thread]:
    """Bind the query service to a socket (``port=0`` = ephemeral).
    Returns (server, daemon thread); call ``server.shutdown()`` then
    ``server.server_close()`` to stop. With ``spark`` given, ``POST
    /reload`` re-snapshots a store-loaded index after a rewrite
    (compaction / retention) without dropping the socket."""
    service = QueryService(index)

    def _set_index(idx):
        service.index = idx

    holders = [("lsh", lambda: service.index, _set_index)]
    reload_lock = threading.Lock()
    server, thread = _serve(
        _make_handler(
            {
                "/query": service.handle_query,
                "/reload": lambda p: _handle_reload(
                    spark, holders, p, reload_lock
                ),
            },
            lambda: (
                200,
                {
                    "status": "ok",
                    "n_docs": int(service.index.doc_ids.size),
                    "stale": _staleness(spark, holders),
                },
            ),
        ),
        host,
        port,
    )
    # hot-swap hook: after a store rewrite (compaction / retention),
    # `server.service.index = server.service.index.reload(spark)`
    # re-snapshots without dropping the socket (POST /reload does the
    # same over the wire). Hold server.reload_lock around a manual swap
    # so it cannot race a concurrent POST /reload's check-and-swap.
    server.service = service
    server.reload_lock = reload_lock
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
    index, host: str = "127.0.0.1", port: int = 0, spark=None
) -> tuple[ThreadingHTTPServer, threading.Thread]:
    """Bind the EMBEDDING query service to a socket: ``POST /query``
    with the vector envelope, ``GET /health`` reporting the indexed
    count, and (with ``spark``) ``POST /reload`` — the IVF-PQ twin of
    :func:`start_server`."""
    service = VectorQueryService(index)

    def _set_index(idx):
        service.index = idx

    holders = [("vector", lambda: service.index, _set_index)]
    reload_lock = threading.Lock()
    server, thread = _serve(
        _make_handler(
            {
                "/query": service.handle_query,
                "/reload": lambda p: _handle_reload(
                    spark, holders, p, reload_lock
                ),
            },
            lambda: (
                200,
                {
                    "status": "ok",
                    "n_vecs": int(service.index.vec_ids.size),
                    "stale": _staleness(spark, holders),
                },
            ),
        ),
        host,
        port,
    )
    server.service = service  # hot-swap hook (see start_server)
    server.reload_lock = reload_lock
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
    lex_index, vec_index=None, host: str = "127.0.0.1", port: int = 0,
    spark=None,
) -> tuple[ThreadingHTTPServer, threading.Thread]:
    """Bind the keyword (and, with ``vec_index``, the hybrid) service:
    ``POST /query`` with the keyword envelope, ``POST /hybrid`` with
    the hybrid envelope, ``GET /health``, and (with ``spark``)
    ``POST /reload`` re-snapshotting BOTH served indexes."""
    lex_service = LexicalQueryService(lex_index)
    hybrid_service = (
        HybridQueryService(lex_index, vec_index) if vec_index is not None else None
    )

    def _set_lex(idx):
        # the hybrid service shares the lexical index object: swap both
        lex_service.index = idx
        if hybrid_service is not None:
            hybrid_service.lex_index = idx

    def _set_vec(idx):
        hybrid_service.vec_index = idx

    holders = [("lexical", lambda: lex_service.index, _set_lex)]
    if hybrid_service is not None:
        holders.append(
            ("vector", lambda: hybrid_service.vec_index, _set_vec)
        )
    reload_lock = threading.Lock()
    routes = {
        "/query": lex_service.handle_query,
        "/reload": lambda p: _handle_reload(spark, holders, p, reload_lock),
    }
    if hybrid_service is not None:
        routes["/hybrid"] = hybrid_service.handle_query
    server, thread = _serve(
        _make_handler(
            routes,
            lambda: (
                200,
                {
                    "status": "ok",
                    "n_docs": int(lex_service.index.n_docs),
                    "hybrid": hybrid_service is not None,
                    "stale": _staleness(spark, holders),
                },
            ),
        ),
        host,
        port,
    )
    # hot-swap hooks (see start_server): the hybrid service shares the
    # lexical service's index objects, so swap BOTH attributes together
    server.service = lex_service
    server.hybrid_service = hybrid_service
    server.reload_lock = reload_lock
    return server, thread


# ---------------------------------------------------------------------------
# Scatter-gather router: the reference's online topology
# (app/src/query_service.py:167-192 fans one query out to every worker
# and merges the partial top-k lists). Each replica server binds ONE
# shard of an index (start_server / start_vector_server /
# start_lexical_server); the router fans a request across all of them
# over HTTP and merges with the SAME in-process laws the tiers already
# prove exact (serving.merge_topk, serving_vector.merge_topk_dist,
# retrieval.merge_topk_scores) — so N replicas answer identically to
# one full index.
# ---------------------------------------------------------------------------


class RouterService:
    """Transport-free scatter-gather: fan ``payload`` to every replica's
    ``POST /query``, merge by tier law, answer in the tier's own
    response shape.

    tier: ``"lsh"`` (signature envelope, score-desc merge),
    ``"vector"`` (embedding envelope, dist-asc merge), or ``"lexical"``
    (keyword envelope, round-10 score merge). A lexical router given
    ``vector_replicas`` also serves ``POST /hybrid``: each tier is
    merged exactly FIRST and the RRF fusion runs on the two global
    lists (fusing per-replica hybrid answers would rank by shard-local
    positions — wrong), so the hybrid answer equals the single-machine
    ``hybrid_rrf_point`` over full indexes.

    Failure law: the merge is only exact over a COMPLETE replica cover,
    so any replica error fails the request (502; a replica's own 400
    envelope rejection is passed through) rather than silently serving
    a partial corpus.

    ``timeout`` is the PER-REPLICA socket bound (seconds), applied to
    every fan-out call and every health ping independently: a hung
    replica turns into a 502 after ``timeout``, never an indefinitely
    held router request, and ``GET /health`` pings all replicas in
    parallel so one hung replica costs one timeout for the sweep."""

    TIERS = ("lsh", "vector", "lexical")

    def __init__(
        self,
        tier: str,
        replicas: list[str],
        vector_replicas: list[str] | None = None,
        timeout: float = 10.0,
    ):
        if tier not in self.TIERS:
            raise ValueError(f"tier must be one of {self.TIERS}, got {tier!r}")
        if not replicas:
            raise ValueError("need at least one replica url")
        if vector_replicas is not None and tier != "lexical":
            raise ValueError("vector_replicas only compose with tier='lexical'")
        self.tier = tier
        self.replicas = [u.rstrip("/") for u in replicas]
        self.vector_replicas = [
            u.rstrip("/") for u in (vector_replicas or [])
        ]
        self.timeout = timeout

    # -- transport ---------------------------------------------------------
    @staticmethod
    def _parse_body(raw: bytes, status: int) -> dict:
        """Replica bodies are normalized to dicts here, so every later
        access (body.get, the candidates check) is total — an
        unparseable or non-object body from a replica (or a proxy in
        front of it) must become a routed error, never an exception
        that drops the client connection."""
        try:
            body = json.loads(raw)
        except (ValueError, json.JSONDecodeError):
            return {"error": f"replica returned an unparseable HTTP {status} body"}
        if not isinstance(body, dict):
            return {"error": f"replica returned a non-object HTTP {status} body"}
        return body

    def _post(self, url: str, payload: dict) -> tuple[int, dict]:
        import urllib.error
        import urllib.request

        req = urllib.request.Request(
            url,
            data=json.dumps(payload).encode("utf-8"),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return resp.status, self._parse_body(resp.read(), resp.status)
        except urllib.error.HTTPError as e:
            return e.code, self._parse_body(e.read(), e.code)
        except (urllib.error.URLError, OSError) as e:
            return 503, {"error": f"replica unreachable: {e}"}

    def _fan(self, urls: list[str], payload: dict):
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(16, len(urls))) as ex:
            return list(
                ex.map(lambda u: self._post(u + "/query", payload), urls)
            )

    @staticmethod
    def _check_cover(urls: list[str], results):
        """(error_response | None, per-replica candidate lists) from one
        query's fan-out results — one pass, replica order: envelope
        rejection, replica error, or a 200 without a candidate list (a
        replica failure too — 502 like any other incomplete cover,
        never a KeyError that drops the connection). Bodies are dicts
        by _parse_body. ONE implementation for the point and batch
        endpoints so the failure law cannot diverge between them."""
        for url, (status, body) in zip(urls, results):
            if status == 400:
                # envelope rejection — every replica validates alike;
                # surface the replica's own message to the caller
                return (400, body), None
            if status != 200 or not isinstance(
                body.get("candidates"), list
            ):
                return (
                    502,
                    {
                        "error": "replica failed; partial answers are not "
                        "served (merge is only exact over a complete cover)",
                        "replica": url,
                        "detail": (
                            body.get("error")
                            if status != 200
                            else "200 response without a candidates list"
                        ),
                    },
                ), None
        return None, [body["candidates"] for _s, body in results]

    def _gather(self, urls: list[str], payload: dict):
        """(error_response | None, per-replica candidate lists)."""
        return self._check_cover(urls, self._fan(urls, payload))

    # -- endpoints ----------------------------------------------------------
    def handle_query(self, payload) -> tuple[int, dict]:
        if not isinstance(payload, dict):
            return 400, {"error": "body must be a JSON object"}
        k = payload.get("k", DEFAULT_K)
        if not isinstance(k, int) or isinstance(k, bool):
            return 400, {"error": "k must be an integer"}
        k = max(1, k)
        err, cand_lists = self._gather(self.replicas, payload)
        if err is not None:
            return err
        return 200, {"candidates": self._merge_tier(cand_lists, k)}

    def _merge_tier(self, cand_lists, k: int) -> list[dict]:
        """Merge per-replica candidate lists under THIS tier's exact
        law, in the tier's own response shape — one implementation for
        the point and batch endpoints, so a batch entry's answer is
        identical to posting that query alone."""
        if self.tier == "lsh":
            from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.serving import (
                merge_topk,
            )

            previews = {
                int(c["id"]): c["vector_preview"]
                for cands in cand_lists
                for c in cands
            }
            merged = merge_topk(
                [
                    [(int(c["id"]), c["score"], i + 1) for i, c in enumerate(cands)]
                    for cands in cand_lists
                ],
                k=k,
            )
            return [
                {
                    "id": d,
                    "score": s,
                    "vector_preview": previews[d],
                }
                for (d, s, _r) in merged
            ]
        if self.tier == "vector":
            from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.serving_vector import (
                merge_topk_dist,
            )

            merged = merge_topk_dist(
                [
                    [(int(c["id"]), c["dist"], c["rank"]) for c in cands]
                    for cands in cand_lists
                ],
                k=k,
            )
            return [
                {"id": v, "dist": d, "rank": r} for (v, d, r) in merged
            ]
        from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.retrieval import (
            merge_topk_scores,
        )

        merged = merge_topk_scores(
            [
                [(int(c["id"]), c["score"], c["rank"]) for c in cands]
                for cands in cand_lists
            ],
            k=k,
        )
        return [
            {"id": d, "score": s, "rank": r} for (d, s, r) in merged
        ]

    def handle_query_batch(self, payload) -> tuple[int, dict]:
        """``POST /query_batch``: fan a query SET across the replica
        cover and merge PER QUERY with the tier's exact law —
        ``results[i]`` is identical to posting ``queries[i]`` to
        ``POST /query`` alone (e2e-asserted in ``test_router.py``).

        Envelope: ``{"queries": [<per-query envelope>, ...], "k"?:
        int}`` — a query without its own ``k`` inherits the batch
        ``k``. Answer: ``{"results": [{"candidates": [...]}, ...]}``
        in query order.

        Scale shape: ONE thread-pool sweep over all (query, replica)
        pairs — a Q-query batch against R replicas costs
        ceil(Q*R/pool) round-trip times, not Q sequential fan-outs;
        per-replica timeouts apply to every pair independently.

        Failure law: the batch is all-or-nothing, like the point
        endpoint's complete-cover rule — any replica failure on any
        query fails the request (502), and an envelope rejection
        surfaces the replica's own 400 with the offending query index
        (serving a batch with silently-missing entries would read as
        complete)."""
        if not isinstance(payload, dict):
            return 400, {"error": "body must be a JSON object"}
        queries = payload.get("queries")
        if not isinstance(queries, list) or not queries:
            return 400, {"error": "queries must be a non-empty list"}
        batch_k = payload.get("k", DEFAULT_K)
        if not isinstance(batch_k, int) or isinstance(batch_k, bool):
            return 400, {"error": "k must be an integer"}
        prepared = []
        for i, q in enumerate(queries):
            if not isinstance(q, dict):
                return 400, {"error": f"queries[{i}] must be a JSON object"}
            q = dict(q)
            q.setdefault("k", batch_k)
            if not isinstance(q["k"], int) or isinstance(q["k"], bool):
                return 400, {"error": f"queries[{i}].k must be an integer"}
            prepared.append(q)
        from concurrent.futures import ThreadPoolExecutor

        pairs = [
            (qi, url) for qi in range(len(prepared)) for url in self.replicas
        ]
        with ThreadPoolExecutor(max_workers=min(16, len(pairs))) as ex:
            flat = list(
                ex.map(
                    lambda p: self._post(p[1] + "/query", prepared[p[0]]),
                    pairs,
                )
            )
        n_rep = len(self.replicas)
        results = []
        for qi, q in enumerate(prepared):
            err, cand_lists = self._check_cover(
                self.replicas, flat[qi * n_rep : (qi + 1) * n_rep]
            )
            if err is not None:
                status, body = err
                return status, {**body, "query_index": qi}
            results.append(
                {"candidates": self._merge_tier(cand_lists, max(1, q["k"]))}
            )
        return 200, {"results": results}

    def handle_hybrid(self, payload) -> tuple[int, dict]:
        from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.retrieval import (
            merge_topk_scores,
            rrf_fuse_lists,
        )
        from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.serving_vector import (
            merge_topk_dist,
        )

        if not self.vector_replicas:
            return 404, {"error": "router has no vector replicas"}
        if not isinstance(payload, dict):
            return 400, {"error": "body must be a JSON object"}
        k = payload.get("k", DEFAULT_K)
        if not isinstance(k, int) or isinstance(k, bool):
            return 400, {"error": "k must be an integer"}
        k = max(1, k)
        c = payload.get("c", 60)
        if not isinstance(c, int) or isinstance(c, bool) or c < 1:
            return 400, {"error": "c must be a positive integer"}
        lex_payload = {"query": payload.get("query"), "k": k}
        vec_payload = {
            key: payload[key]
            for key in ("vector", "n_probe", "shortlist")
            if key in payload
        }
        vec_payload["k"] = k
        err, lex_lists = self._gather(self.replicas, lex_payload)
        if err is not None:
            return err
        err, vec_lists = self._gather(self.vector_replicas, vec_payload)
        if err is not None:
            return err
        lex_hits = merge_topk_scores(
            [
                [(int(x["id"]), x["score"], x["rank"]) for x in cands]
                for cands in lex_lists
            ],
            k=k,
        )
        vec_hits = merge_topk_dist(
            [
                [(int(x["id"]), x["dist"], x["rank"]) for x in cands]
                for cands in vec_lists
            ],
            k=k,
        )
        fused = rrf_fuse_lists(lex_hits, vec_hits, k=k, c=c)
        return 200, {
            "candidates": [
                {"id": d, "rrf": s, "rank": r} for (d, s, r) in fused
            ]
        }

    def handle_health(self) -> tuple[int, dict]:
        """Aggregate replica liveness AND staleness in one parallel
        sweep: ``replicas`` keeps its liveness-boolean shape; the
        sibling ``stale`` map folds each replica's per-index
        staleness report to one tri-state — True (any served index
        stale: a reload is pending), False (every tracked index
        fresh), null (unknown: replica down, pre-staleness replica, or
        no index trackable). Liveness alone decides the status code —
        a stale replica still serves a consistent (pre-delete)
        snapshot, so it is a reload prompt, not an outage."""
        import urllib.error
        import urllib.request
        from concurrent.futures import ThreadPoolExecutor

        def ping(url):
            try:
                with urllib.request.urlopen(
                    url + "/health", timeout=self.timeout
                ) as resp:
                    if resp.status != 200:
                        return False, None
                    try:
                        body = json.loads(resp.read())
                    except (ValueError, json.JSONDecodeError):
                        return True, None
            except (urllib.error.URLError, OSError):
                return False, None
            vals = list(
                (body.get("stale") or {}).values()
                if isinstance(body, dict)
                else []
            )
            if any(v is True for v in vals):
                return True, True
            if vals and all(v is False for v in vals):
                return True, False
            return True, None

        # pinged in PARALLEL: a hung replica costs one timeout for the
        # whole sweep, not one per replica behind it in the list
        urls = self.replicas + self.vector_replicas
        with ThreadPoolExecutor(max_workers=min(16, len(urls))) as ex:
            results = dict(zip(urls, ex.map(ping, urls)))
        ok = {url: alive for url, (alive, _s) in results.items()}
        status = 200 if all(ok.values()) else 503
        return status, {
            "status": "ok" if status == 200 else "degraded",
            "tier": self.tier,
            "replicas": ok,
            "stale": {url: s for url, (_a, s) in results.items()},
        }

    def handle_reload(self, payload) -> tuple[int, dict]:
        """Fan ``POST /reload`` to every replica (both tiers for a
        hybrid router) in parallel. All-or-nothing REPORTING, not
        all-or-nothing effect: each replica's reload is its own atomic
        swap, so a failed replica stays on its old snapshot and the
        502 tells the operator to re-issue — the merge law is
        unaffected either way (every replica always serves a complete
        answer for its shard, just possibly a pre-delete one)."""
        from concurrent.futures import ThreadPoolExecutor

        body = payload if isinstance(payload, dict) else {}
        urls = self.replicas + self.vector_replicas
        with ThreadPoolExecutor(max_workers=min(16, len(urls))) as ex:
            results = list(
                ex.map(lambda u: self._post(u + "/reload", body), urls)
            )
        report = {
            url: resp for url, (_status, resp) in zip(urls, results)
        }
        status = 200 if all(s == 200 for s, _b in results) else 502
        return status, {
            "status": "ok" if status == 200 else "partial",
            "replicas": report,
        }


def start_router_server(
    tier: str,
    replicas: list[str],
    vector_replicas: list[str] | None = None,
    host: str = "127.0.0.1",
    port: int = 0,
    timeout: float = 10.0,
) -> tuple[ThreadingHTTPServer, threading.Thread]:
    """Bind a scatter-gather router over replica servers: ``POST
    /query`` fans out and merges by tier law; ``POST /query_batch``
    fans a query SET in one sweep and merges per query with the same
    law; a lexical router with ``vector_replicas`` also serves ``POST
    /hybrid``; ``GET /health`` aggregates replica health; ``POST
    /reload`` fans the staleness-checked re-snapshot to every replica
    (after a compaction or retention delete). Same start/stop contract
    as :func:`start_server`."""
    service = RouterService(tier, replicas, vector_replicas, timeout)
    server, thread = _serve(
        _make_handler(
            {
                "/query": service.handle_query,
                "/query_batch": service.handle_query_batch,
                "/hybrid": service.handle_hybrid,
                "/reload": service.handle_reload,
            },
            service.handle_health,
        ),
        host,
        port,
    )
    return server, thread
