"""Exact brute-force similarity joins + per-query top-k (SURVEY §2.3
J2/J4, §2.6 T4).

The reference's oracle is a dense queries x data Euclidean distance
matrix with per-row argsort (``benchmarks/benchmark_runner.py:
109-117``). Spark-first shape: a (broadcast) nested-loop join of the
query set against the corpus with a distance expression, then a
per-query ranking window. With a small query side Catalyst picks
BroadcastNestedLoopJoin — the corpus is scanned once, partition-
parallel, never shuffled; only the tiny per-query top-k merge moves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.arrays import (
    cosine_similarity,
    est_jaccard,
    jaccard_arrays,
    l2_distance,
)


def _per_query_topk(
    scored: DataFrame,
    k: int,
    order: list[Column],
    query_id_col: str = "query_id",
) -> DataFrame:
    w = Window.partitionBy(query_id_col).orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def l2_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact L2 nearest neighbors per query (reference J2).

    Ties deterministic: (dist ASC, id ASC). Output:
    (query_id, vec_id, dist, rank).
    """
    joined = corpus.crossJoin(F.broadcast(queries))
    # round(6): float folds can differ by 1 ULP across engines (Spark vs
    # the DuckDB oracle); ranking + hashing use the rounded value.
    scored = joined.select(
        query_id_col,
        id_col,
        F.round(l2_distance(F.col(vec_col), F.col(query_vec_col)), 6).alias("dist"),
    )
    return _per_query_topk(
        scored, k, [F.col("dist").asc(), F.col(id_col).asc()], query_id_col
    ).select(query_id_col, id_col, "dist", "rank")


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k per query — the ANN baseline (north-star
    similarity-search op). Output: (query_id, vec_id, cos_sim, rank)."""
    joined = corpus.crossJoin(F.broadcast(queries))
    scored = joined.select(
        query_id_col,
        id_col,
        F.round(
            cosine_similarity(F.col(vec_col), F.col(query_vec_col)), 6
        ).alias("cos_sim"),
    )
    return _per_query_topk(
        scored, k, [F.col("cos_sim").desc(), F.col(id_col).asc()], query_id_col
    ).select(query_id_col, id_col, "cos_sim", "rank")


def filtered_cosine_topk(
    corpus: DataFrame,
    metadata: DataFrame,
    predicate: Column,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    meta_id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Attribute-filtered exact top-k: cosine nearest neighbors among
    ONLY the corpus vectors whose metadata row satisfies ``predicate``
    — the filtered-vector-search shape (every production vector store's
    staple: "nearest English documents", "nearest items in stock").

    Semantics are PRE-filter: the predicate restricts the candidate
    set BEFORE ranking, so exactly ``k`` qualifying neighbors come
    back (ties (score desc, id asc)). Post-filtering an unfiltered
    shortlist — the tempting ANN composition — silently returns
    fewer than k (or none) whenever the filter is selective, which is
    the classic filtered-ANN recall trap; this operator is the exact
    baseline those compositions must be measured against.

    ``metadata`` may be the corpus itself (attributes inline) or a
    separate table keyed ``meta_id_col`` == the vector's ``id_col``
    value (the documents/embeddings split of the fixtures).

    Scale shape: the predicate lands on the METADATA scan (pushed to
    parquet — check PushedFilters), the survivors' ids semi-join the
    corpus (AQE turns a selective filter into a broadcast semi-join:
    the 100 TB vector side is scanned once, filtered map-side, never
    shuffled), and ranking reuses the brute-force per-query top-k.

    Output: (query_id, vec_id, cos_sim, rank).
    """
    keep = metadata.filter(predicate).select(
        F.col(meta_id_col).alias(id_col)
    )
    return cosine_topk(
        corpus.join(keep, id_col, "left_semi"),
        queries,
        k,
        id_col,
        vec_col,
        query_id_col,
        query_vec_col,
    )


def cosine_topk_vectorized(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Arrow-vectorized exact cosine top-k: one numpy matmul per corpus
    partition against the broadcast query matrix, with per-partition
    local top-k (lossless: each corpus row lives in exactly one
    partition, so local winners are globally distinct and every global
    top-k row is in its partition's local top-k).

    The JVM fold path (:func:`cosine_topk`) evaluates a 64-term
    ``aggregate`` per (query, doc) pair — measured 1.4 s for 20 x 5k at
    sf0.1 where the matmul is microseconds. Keep the fold as the
    default: its sequential IEEE op order is what the DuckDB
    ``list_reduce`` oracle reproduces bit-for-bit; SIMD/pairwise
    summation here can differ in the last ULP (scores are rounded to
    6 dp like the fold, so rankings agree except on ties finer than
    1e-6). Requires non-zero-norm vectors (the fold path instead yields
    NULL scores via try_divide).
    """
    import numpy as np
    import pandas as pd

    qrows = queries.select(query_id_col, query_vec_col).collect()
    if not qrows:
        return corpus.sparkSession.createDataFrame(
            [], f"{query_id_col} long, {id_col} long, cos_sim double, rank int"
        )
    qids = np.array([r[query_id_col] for r in qrows], dtype=np.int64)
    qmat = np.array([r[query_vec_col] for r in qrows], dtype=np.float64)
    qnorm = np.linalg.norm(qmat, axis=1, keepdims=True)
    if len(qrows) and not qnorm.all():
        raise ValueError("zero-norm query vector; use cosine_topk (fold path)")
    bc = corpus.sparkSession.sparkContext.broadcast(
        (qids, qmat / np.where(qnorm == 0, 1.0, qnorm))
    )

    def score_iter(batches):
        qids_l, qn_l = bc.value
        nq = len(qids_l)
        if nq == 0:
            return
        parts = []
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cmat = np.vstack(pdf[vec_col].values).astype(np.float64)
            cnorm = np.linalg.norm(cmat, axis=1, keepdims=True)
            if not cnorm.all():
                raise ValueError(
                    "zero-norm corpus vector; use cosine_topk (fold path)"
                )
            scores = np.round((cmat / cnorm) @ qn_l.T, 6)  # (nd, nq)
            nd = len(pdf)
            parts.append(
                pd.DataFrame(
                    {
                        query_id_col: np.tile(qids_l, nd),
                        id_col: np.repeat(
                            pdf[id_col].values.astype(np.int64), nq
                        ),
                        "cos_sim": scores.ravel(),
                    }
                )
            )
        if not parts:
            return
        pdf = pd.concat(parts)
        pdf = pdf.sort_values(
            [query_id_col, "cos_sim", id_col], ascending=[True, False, True]
        )
        yield pdf.groupby(query_id_col, sort=False).head(k)

    scored = corpus.select(id_col, vec_col).mapInPandas(
        score_iter, schema=f"{query_id_col} long, {id_col} long, cos_sim double"
    )
    return _per_query_topk(
        scored, k, [F.col("cos_sim").desc(), F.col(id_col).asc()], query_id_col
    ).select(query_id_col, id_col, "cos_sim", "rank")


def est_jaccard_topk(
    sigs: DataFrame,
    query_sigs: DataFrame,
    num_perm: int,
    k: int = 10,
    vectorized: bool = True,
) -> DataFrame:
    """Exact top-k under the system's own similarity semantic
    (estimated Jaccard over full signatures — no LSH pruning).
    This is the correct recall oracle for the LSH path.
    Output: (query_id, doc_id, score, rank).

    Default path mirrors the reference's vectorized scan
    (``benchmarks/benchmark_runner.py:188-193``): broadcast the query
    signature matrix, stream corpus partitions through one numpy
    broadcast-compare per query block (match counts are integer sums —
    bit-identical to the fold at any summation order, oracle-safe).
    Each corpus signature crosses the stage once instead of once per
    query. vectorized=False keeps the pure-JVM cross-join fold (for
    query sets too large to collect on the driver).
    """
    if not vectorized:
        joined = sigs.crossJoin(
            F.broadcast(query_sigs.select("query_id", F.col("sig").alias("__qsig")))
        )
        scored = joined.select(
            "query_id",
            "doc_id",
            est_jaccard(F.col("sig"), F.col("__qsig"), num_perm).alias("score"),
        )
    else:
        import numpy as np
        import pandas as pd

        qrows = query_sigs.select("query_id", "sig").collect()
        qids = np.array([r["query_id"] for r in qrows], dtype=np.int64)
        qmat = np.array([r["sig"] for r in qrows], dtype=np.int64)
        bc = sigs.sparkSession.sparkContext.broadcast((qids, qmat))

        def score_iter(batches):
            qids_l, qmat_l = bc.value
            nq = len(qids_l)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                sig_mat = np.vstack(pdf["sig"].values).astype(np.int64)
                nd = len(pdf)
                # (nq, nd) match counts: one compare per query row.
                counts = np.empty((nq, nd), dtype=np.int64)
                for j in range(nq):
                    counts[j] = (sig_mat == qmat_l[j]).sum(axis=1)
                yield pd.DataFrame(
                    {
                        "query_id": np.repeat(qids_l, nd),
                        "doc_id": np.tile(pdf["doc_id"].values, nq),
                        "score": (counts / num_perm).ravel(),
                    }
                )

        scored = sigs.select("doc_id", "sig").mapInPandas(
            score_iter, schema="query_id long, doc_id long, score double"
        )
    return _per_query_topk(
        scored, k, [F.col("score").desc(), F.col("doc_id").asc()], "query_id"
    ).select("query_id", "doc_id", "score", "rank")


def true_jaccard_topk(
    shingled: DataFrame,
    query_shingled: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Exact set-Jaccard top-k over shingle sets (the quantity MinHash
    estimates). Output: (query_id, doc_id, jaccard, rank)."""
    joined = shingled.crossJoin(
        F.broadcast(
            query_shingled.select("query_id", F.col("shingles").alias("__qsh"))
        )
    )
    scored = joined.select(
        "query_id",
        "doc_id",
        jaccard_arrays(F.col("shingles"), F.col("__qsh")).alias("jaccard"),
    )
    return _per_query_topk(
        scored, k, [F.col("jaccard").desc(), F.col("doc_id").asc()], "query_id"
    ).select("query_id", "doc_id", "jaccard", "rank")


def knn_label_vote(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """kNN majority-vote classification — similarity search applied as
    a classifier, the standard end-to-end eval of an embedding index.

    Per query: the ``k`` exact-L2 nearest corpus rows EXCLUDING the
    query's own id vote with their labels; the prediction is the most
    common label, ties to the smaller label (fully deterministic:
    neighbor set ties break (dist asc, id asc) like :func:`l2_topk`,
    vote ties (n_votes desc, label asc)). One broadcast of the query
    set, one shuffle for the per-query window — the same plan shape as
    :func:`l2_topk`, so it scales the same way.

    Output: (query_id, pred_label, n_votes).
    """
    joined = corpus.crossJoin(F.broadcast(queries)).filter(
        F.col(id_col) != F.col(query_id_col)
    )
    scored = joined.select(
        query_id_col,
        id_col,
        label_col,
        F.round(l2_distance(F.col(vec_col), F.col(query_vec_col)), 6).alias(
            "dist"
        ),
    )
    nn = _per_query_topk(
        scored, k, [F.col("dist").asc(), F.col(id_col).asc()], query_id_col
    )
    votes = nn.groupBy(query_id_col, label_col).agg(
        F.count("*").alias("n_votes")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("n_votes").desc(), F.col(label_col).asc()
    )
    return (
        votes.withColumn("__vr", F.row_number().over(w))
        .filter(F.col("__vr") == 1)
        .select(
            query_id_col,
            F.col(label_col).alias("pred_label"),
            "n_votes",
        )
    )


def mrl_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    d_prime: int = 16,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Dimension-adaptive (matryoshka-style) two-stage retrieval:
    stage 1 ranks the corpus by cosine over the FIRST ``d_prime`` dims
    only — the prefix an MRL-trained embedding packs its coarse signal
    into — and keeps a ``shortlist``-deep per-query candidate set;
    stage 2 re-scores ONLY the shortlist with full-dim exact cosine.
    The dimension-truncation twin of :func:`..ann.pq_topk_rerank`'s
    code-shortlist + exact-rerank shape: the expensive full-width
    fold runs on shortlist * |queries| rows, never the corpus.

    Scale shape: stage 1 is the brute-force scan at d_prime/dim of the
    flop cost (and, under a column layout that stores the prefix
    separately, that fraction of the scan bytes too); the shortlist
    survives as rows already carrying both vectors, so the rerank adds
    no join. Per-query windows only — no global sort.

    Output: (query_id, vec_id, trunc_sim, cos_sim DOUBLE rounded-6,
    rank) — rank by full-dim score over the shortlist.
    """
    joined = corpus.crossJoin(F.broadcast(queries))
    scored = joined.select(
        query_id_col,
        id_col,
        F.col(vec_col),
        F.col(query_vec_col),
        F.round(
            cosine_similarity(
                F.slice(F.col(vec_col), 1, d_prime),
                F.slice(F.col(query_vec_col), 1, d_prime),
            ),
            6,
        ).alias("trunc_sim"),
    )
    short = _per_query_topk(
        scored,
        shortlist,
        [F.col("trunc_sim").desc(), F.col(id_col).asc()],
        query_id_col,
    ).drop("rank")
    reranked = short.select(
        query_id_col,
        id_col,
        "trunc_sim",
        F.round(
            cosine_similarity(F.col(vec_col), F.col(query_vec_col)), 6
        ).alias("cos_sim"),
    )
    return _per_query_topk(
        reranked, k, [F.col("cos_sim").desc(), F.col(id_col).asc()], query_id_col
    ).select(query_id_col, id_col, "trunc_sim", "cos_sim", "rank")
