"""Optimized Product Quantization (OPQ).

Ge et al., "Optimized Product Quantization for Approximate Nearest
Neighbor Search" (CVPR 2013 / TPAMI 2014): before splitting a vector
into PQ subspaces, apply a learned orthonormal rotation R chosen to
minimize the quantization error ||XR - Q(XR)||_F. Training alternates
(a) per-subspace k-means in the rotated space with (b) the orthogonal
Procrustes solve R = U V^T from SVD(X^T Y), where Y is the codebook
reconstruction. Because R is orthonormal, L2 distances are preserved,
so the asymmetric-distance (ADC) machinery of the plain PQ path
applies unchanged in the rotated space and the exact rerank still
happens in the ORIGINAL space. FAISS ships the same idea as
``OPQMatrix`` in front of ``IndexPQ``; this is the Spark analog of
the reference's FAISS scale path (SURVEY §2.3 J4, reference
``benchmarks/benchmark_runner.py`` method ladder).

Training is OFFLINE on the fixed sf0.001 embedding sample
(``contract.OPQ_TRAIN_PATH``) — the production pattern where a codec
is trained once on a held-out sample and shipped as an artifact
applied corpus-wide. That also makes every float in (R, codebooks) a
process-deterministic literal, so the DuckDB oracle can inline the
identical values at any SF and the hash gate stays bit-exact.

Scale notes: training touches only the driver-side sample (numpy);
encoding and search are row-local codegen'd expressions over the
codes table — shuffle-free, the same single-pass shape as
:mod:`.ann`'s PQ path, so the 100 TB story (codes scanned from RAM,
full vectors fetched only for the shortlist rerank) is unchanged.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark import contract as C
from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.arrays import (
    l2_distance,
)
from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.ann import (
    pq_topk,
)


def _kmeans(X: np.ndarray, k: int, iters: int, rs: np.random.RandomState) -> np.ndarray:
    """Deterministic Lloyd k-means: seeded distinct-row init, first-tie
    argmin, empty clusters keep their previous centroid."""
    cents = X[rs.permutation(X.shape[0])[:k]].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(k):
            mask = assign == j
            if mask.any():
                cents[j] = X[mask].mean(axis=0)
    return cents


def _encode_np(Xr: np.ndarray, books: list[np.ndarray]) -> np.ndarray:
    dsub = books[0].shape[1]
    return np.stack(
        [
            ((Xr[:, None, s * dsub:(s + 1) * dsub] - b[None]) ** 2)
            .sum(axis=2)
            .argmin(axis=1)
            for s, b in enumerate(books)
        ],
        axis=1,
    )


def _reconstruct_np(codes: np.ndarray, books: list[np.ndarray]) -> np.ndarray:
    return np.concatenate([b[codes[:, s]] for s, b in enumerate(books)], axis=1)


def opq_train(
    X: np.ndarray,
    m: int = C.PQ_M,
    n_codes: int = C.PQ_CODES,
    iters: int = C.OPQ_ITERS,
    kmeans_iters: int = C.OPQ_KMEANS_ITERS,
    seed: int = C.OPQ_SEED,
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """Non-parametric OPQ (Ge et al. Alg. 1). Returns ``(r_cols,
    codebooks)`` where ``r_cols[i]`` is COLUMN i of the rotation
    (``rotated[i] = dot(x, r_cols[i])``, i.e. X @ R) and the codebooks
    live in the rotated space. Fully deterministic given (X, seed):
    seeded QR init, seeded per-subspace k-means, LAPACK SVD."""
    n, dim = X.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    X = np.ascontiguousarray(X, dtype=np.float64)
    rs = np.random.RandomState(seed)
    R, _ = np.linalg.qr(rs.randn(dim, dim))
    books: list[np.ndarray] = []
    for it in range(iters):
        Xr = X @ R
        books = [
            _kmeans(
                Xr[:, s * dsub:(s + 1) * dsub],
                n_codes,
                kmeans_iters,
                np.random.RandomState(seed + 1000 * (it + 1) + s),
            )
            for s in range(m)
        ]
        if it < iters - 1:
            Y = _reconstruct_np(_encode_np(Xr, books), books)
            U, _, Vt = np.linalg.svd(X.T @ Y)
            R = U @ Vt
    return R.T.tolist(), [b.tolist() for b in books]


@lru_cache(maxsize=4)
def _opq_train_offline_frozen(
    path: str, m: int, n_codes: int, iters: int, kmeans_iters: int, seed: int
) -> tuple[tuple, tuple]:
    """Cached core of :func:`opq_train_offline`. Stores the artifact as
    nested TUPLES: the cache is shared by the engine query and the
    DuckDB oracle builder, so a caller mutating a returned list must
    not be able to corrupt it (it would silently break bit-parity)."""
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["vec_id", "embedding"])
    order = np.argsort(np.asarray(t["vec_id"]), kind="stable")
    X = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)[order]
    r_cols, books = opq_train(X, m=m, n_codes=n_codes, iters=iters,
                              kmeans_iters=kmeans_iters, seed=seed)
    return (
        tuple(tuple(col) for col in r_cols),
        tuple(tuple(tuple(c) for c in book) for book in books),
    )


def opq_train_offline(
    path: str = C.OPQ_TRAIN_PATH,
    m: int = C.PQ_M,
    n_codes: int = C.PQ_CODES,
    iters: int = C.OPQ_ITERS,
    kmeans_iters: int = C.OPQ_KMEANS_ITERS,
    seed: int = C.OPQ_SEED,
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """The shipped OPQ artifact: trained once per process on the fixed
    sample parquet (rows sorted by vec_id so file layout can't reorder
    the input), cached so the engine query and the DuckDB oracle
    builder consume the SAME float literals. Each call returns fresh
    lists rebuilt from an immutable cached form — mutating a returned
    value cannot corrupt the shared artifact."""
    r_cols, books = _opq_train_offline_frozen(
        path, m, n_codes, iters, kmeans_iters, seed
    )
    return (
        [list(col) for col in r_cols],
        [[list(c) for c in book] for book in books],
    )


def rotate_expr(vec: Column, r_cols: list[list[float]]) -> Column:
    """X @ R as a column expression: ONE transform lambda over the
    2-D rotation literal, each element the same 0.0-seeded
    zip_with-multiply left fold as :func:`ann._dot_lit` — bit-identical
    to dim unrolled folds (asserted equal over the corpus before the
    swap) but compiled once, so codegen and task-binary size stay flat
    as dim grows."""
    dim = len(r_cols[0])
    rlit = F.array(
        *[F.array(*[F.lit(float(x)) for x in col]) for col in r_cols]
    )
    rotated = F.transform(
        rlit,
        lambda col: F.aggregate(
            F.zip_with(vec, col, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    # zip_with null-pads a shorter side, so a dim mismatch would yield
    # silently-null rotated vectors (then null codes/distances); fail
    # the job instead, with the offending length in the message
    return F.when(F.size(vec) == dim, rotated).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"OPQ rotation dim mismatch: expected {dim}, got "),
                F.size(vec).cast("string"),
            )
        )
    )


def rotate_py(vec: list[float], r_cols: list[list[float]]) -> list[float]:
    """Driver-side twin of :func:`rotate_expr` for query vectors: the
    identical 0.0-seeded left fold, term by term, so the rotated query
    is bit-equal to what the oracle computes in SQL."""
    if len(vec) != len(r_cols[0]):
        raise ValueError(
            f"OPQ rotation dim mismatch: expected {len(r_cols[0])}, "
            f"got {len(vec)}"
        )
    out = []
    for col in r_cols:
        acc = 0.0
        for v, w in zip(vec, col):
            acc = acc + float(v) * w
        out.append(acc)
    return out


def opq_encode(
    embeddings: DataFrame,
    r_cols: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Rotate then PQ-encode: (vec_id, codes array<int>). One fused
    Arrow kernel (guide §4.2): the rotation and the per-subspace code
    argmins run in a single Python crossing over sequential-fold
    distances, bit-identical to the rotate_expr + pq_code_expr
    expression tree they replace (see ann._seqfold_sq_dists /
    ann._rotate_np) but vectorized instead of interpreted — measured
    ~6 s -> sub-second for 2000 vectors at sf0.1."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.ann import (
        pq_encode,
    )

    return pq_encode(embeddings, codebooks, id_col, vec_col, r_cols=r_cols)


def opq_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    r_cols: list[list[float]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
) -> DataFrame:
    """OPQ ADC search: rotate the query driver-side, then the plain PQ
    ADC scan over the (rotated-space) codes — same lookup-table fold,
    same TakeOrderedAndProject tail as :func:`ann.pq_topk`.

    Output: (vec_id, dist, rank) — dist approximates the TRUE L2
    (rotation is orthonormal), rounded to 6.
    """
    if r_cols is None or codebooks is None:
        r_cols, codebooks = opq_train_offline()
    rq = rotate_py(query, r_cols)
    if codes is None:
        codes = opq_encode(embeddings, r_cols, codebooks, id_col, vec_col)
    return pq_topk(None, rq, k=k, id_col=id_col, codebooks=codebooks, codes=codes)


def opq_topk_rerank(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    shortlist: int = C.PQ_SHORTLIST,
    r_cols: list[list[float]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
) -> DataFrame:
    """OPQ serving architecture: ADC shortlist in the rotated space,
    exact L2 rerank in the ORIGINAL space (rotation preserves L2, so
    reranking with the raw vectors is both exact and cheaper than
    rotating them back).

    Output: (vec_id, dist, rank) — dist is the EXACT L2, rounded to 6.
    """
    cand = opq_topk(
        embeddings, query, k=shortlist, r_cols=r_cols, codebooks=codebooks,
        id_col=id_col, vec_col=vec_col, codes=codes,
    ).select(id_col)
    qlit = F.array(*[F.lit(float(v)) for v in query])
    scored = embeddings.join(cand, id_col, "left_semi").select(
        id_col, F.round(l2_distance(F.col(vec_col), qlit), 6).alias("dist")
    )
    w = Window.partitionBy(F.pmod(F.col(id_col), F.lit(1))).orderBy(
        F.col("dist").asc(), F.col(id_col).asc()
    )
    return (
        scored.orderBy(F.col("dist").asc(), F.col(id_col).asc())
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
    )


def ivfopq_encode(
    embeddings: DataFrame,
    r_cols: list[list[float]],
    centroids,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-OPQ index artifact — the full FAISS ``OPQ,IVF,PQ`` factory
    string: rotate, assign the ROTATED vector to its coarse cell,
    PQ-encode the rotated-space residual — all inside
    :func:`ann.ivfpq_encode`'s single Arrow kernel (the rotation rides
    the broadcast and runs the same sequential fold bit-for-bit, one
    Python crossing instead of an interpreted rotation projection
    feeding a second kernel). Row-local and shuffle-free; at scale the
    output persists partitioned by cell."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.ann import (
        ivfpq_encode,
    )

    return ivfpq_encode(
        embeddings, centroids, codebooks, id_col, vec_col=vec_col,
        r_cols=r_cols,
    )


def ivfopq_topk(
    embeddings: DataFrame | None,
    query: list[float],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = C.PQ_M,
    n_codes: int = C.PQ_CODES,
    cell_seed: int = 43,
    code_seed: int = C.PQ_SEED,
    r_cols: list[list[float]] | None = None,
    centroids: list[list[float]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
) -> DataFrame:
    """IVF-OPQ ADC search: rotate the query driver-side (identical
    fold), then the plain IVF-PQ probe + residual-LUT scan runs
    entirely in the rotated space — cell probing, residual encoding,
    and ADC all see rotated coordinates, so :func:`ann.ivfpq_topk`'s
    machinery applies unchanged (L2 is preserved by the orthonormal
    R, so the probed cells cover the same metric balls).

    Output: (vec_id, dist, rank) — ADC approximation of TRUE L2."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.ann import (
        ivfpq_topk,
        random_centroids,
        random_codebooks,
    )

    if r_cols is None:
        r_cols, _ = opq_train_offline()
    if centroids is None:
        centroids = random_centroids(len(query), n_cells, cell_seed)
    if codebooks is None:
        codebooks = random_codebooks(len(query), m, n_codes, code_seed)
    rq = rotate_py(query, r_cols)
    if codes is None:
        if embeddings is None:
            raise ValueError("need embeddings to encode, or a prebuilt codes table")
        codes = ivfopq_encode(embeddings, r_cols, centroids, codebooks,
                              id_col, vec_col)
    return ivfpq_topk(
        None, rq, k=k, n_probe=n_probe, id_col=id_col,
        centroids=centroids, codebooks=codebooks, codes=codes,
    )


def ivfopq_topk_rerank(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    shortlist: int = C.PQ_SHORTLIST,
    n_probe: int = 4,
    r_cols: list[list[float]] | None = None,
    centroids: list[list[float]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
) -> DataFrame:
    """IVF-OPQ serving architecture: rotated-space probe + ADC
    shortlist, exact L2 rerank in the ORIGINAL space.

    Output: (vec_id, dist, rank) — dist is the EXACT L2, rounded 6."""
    cand = ivfopq_topk(
        embeddings, query, k=shortlist, n_probe=n_probe, r_cols=r_cols,
        centroids=centroids, codebooks=codebooks, id_col=id_col,
        vec_col=vec_col, codes=codes,
    ).select(id_col)
    qlit = F.array(*[F.lit(float(v)) for v in query])
    scored = embeddings.join(cand, id_col, "left_semi").select(
        id_col, F.round(l2_distance(F.col(vec_col), qlit), 6).alias("dist")
    )
    w = Window.partitionBy(F.pmod(F.col(id_col), F.lit(1))).orderBy(
        F.col("dist").asc(), F.col(id_col).asc()
    )
    return (
        scored.orderBy(F.col("dist").asc(), F.col(id_col).asc())
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
    )


def ivfopq_topk_batch(
    embeddings: DataFrame | None,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = C.PQ_M,
    n_codes: int = C.PQ_CODES,
    cell_seed: int = 43,
    code_seed: int = C.PQ_SEED,
    r_cols: list[list[float]] | None = None,
    centroids: list[list[float]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    codes: DataFrame | None = None,
) -> DataFrame:
    """Batch IVF-OPQ ADC: every query vector rotated driver-side with
    the :func:`rotate_py` fold (the batch kernel collects queries to
    the driver anyway, so rotation adds no extra job), then one
    :func:`ann.ivfpq_topk_batch` probe job over the rotated codes —
    answer-identical per query to :func:`ivfopq_topk`.

    Output: (query_id, vec_id, dist, rank<=k) per query."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.ann import (
        ivfpq_topk_batch,
        random_centroids,
        random_codebooks,
    )

    if r_cols is None:
        r_cols, _ = opq_train_offline()
    spark = queries.sparkSession
    qrows = queries.select(query_id_col, query_vec_col).collect()
    dim = len(qrows[0][query_vec_col]) if qrows else len(r_cols)
    if centroids is None:
        centroids = random_centroids(dim, n_cells, cell_seed)
    if codebooks is None:
        codebooks = random_codebooks(dim, m, n_codes, code_seed)
    rq = spark.createDataFrame(
        [
            (int(r[query_id_col]),
             rotate_py([float(v) for v in r[query_vec_col]], r_cols))
            for r in qrows
        ],
        f"{query_id_col} long, {query_vec_col} array<double>",
    )
    if codes is None:
        if embeddings is None:
            raise ValueError("need embeddings to encode, or a prebuilt codes table")
        codes = ivfopq_encode(embeddings, r_cols, centroids, codebooks,
                              id_col, vec_col)
    return ivfpq_topk_batch(
        None, rq, k=k, n_probe=n_probe, id_col=id_col,
        query_id_col=query_id_col, query_vec_col=query_vec_col,
        centroids=centroids, codebooks=codebooks, codes=codes,
    )


def ivfopq_topk_batch_rerank(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    shortlist: int = C.PQ_SHORTLIST,
    n_probe: int = 4,
    r_cols: list[list[float]] | None = None,
    centroids: list[list[float]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    codes: DataFrame | None = None,
) -> DataFrame:
    """Batch IVF-OPQ serving: per-query ADC shortlists from ONE
    rotated-space batch probe (:func:`ivfopq_topk_batch` rotates the
    queries driver-side), then one exact-L2 rerank of the fetched
    shortlist vectors in the ORIGINAL space with the ORIGINAL query
    vectors — the two passes need different query coordinates, which
    is why this is not a plain :func:`ann.ivfpq_topk_batch_rerank`
    call. Same two-shuffle shape and the same :func:`l2_distance`
    expression as that kernel, so rerank distances are bit-identical
    to the IVF-PQ serving path's.

    Output: (query_id, vec_id, dist, rank<=k), dist the EXACT L2."""
    short = ivfopq_topk_batch(
        embeddings, queries, k=shortlist, n_probe=n_probe,
        r_cols=r_cols, centroids=centroids, codebooks=codebooks,
        id_col=id_col, vec_col=vec_col,
        query_id_col=query_id_col, query_vec_col=query_vec_col,
        codes=codes,
    ).select(query_id_col, id_col)
    qv = queries.select(query_id_col, query_vec_col)
    scored = (
        embeddings.select(id_col, vec_col)
        .join(F.broadcast(short), id_col)
        .join(F.broadcast(qv), query_id_col)
        .select(
            query_id_col,
            id_col,
            F.round(
                l2_distance(F.col(vec_col), F.col(query_vec_col)), 6
            ).alias("dist"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("dist").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "dist", "rank")
    )


def opq_topk_store(
    spark,
    path: str,
    query: list[float],
    k: int = 10,
    shortlist: int | None = None,
    id_col: str = "vec_id",
    embeddings: DataFrame | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """OPQ search against a persisted :func:`..sources.tables.
    write_opq_index` store: codes, rotation, and codebooks all come
    from the sidecar, so the rotated query and LUT always match the
    codes. Plain ADC top-k by default; pass ``shortlist`` +
    ``embeddings`` for the shortlist-then-exact-rerank serving path
    (rerank in the ORIGINAL space — same contract as
    :func:`ann.pq_topk_store`)."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import (
        read_opq_index,
    )

    codes, r_cols, books = read_opq_index(spark, path)
    if shortlist is None:
        return opq_topk(None, query, k=k, r_cols=r_cols, codebooks=books,
                        id_col=id_col, codes=codes)
    if embeddings is None:
        raise ValueError("shortlist rerank needs the embeddings DataFrame")
    return opq_topk_rerank(
        embeddings, query, k=k, shortlist=shortlist, r_cols=r_cols,
        codebooks=books, id_col=id_col, vec_col=vec_col, codes=codes,
    )


def ivfopq_topk_store(
    spark,
    path: str,
    query: list[float],
    k: int = 10,
    n_probe: int = 4,
    shortlist: int | None = None,
    id_col: str = "vec_id",
    embeddings: DataFrame | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-OPQ search against a persisted :func:`..sources.tables.
    write_ivfopq_index` store: rotation, coarse cells, codebooks, and
    codes all come from the sidecar, so the rotated query and residual
    LUTs always match the codes, and the probe's ``cell IN (...)``
    filter prunes cell DIRECTORIES at the source exactly like
    :func:`ann.ivfpq_topk_store` — a point query reads ~n_probe/n_cells
    of the store. Plain rotated-space ADC top-k by default; pass
    ``shortlist`` + ``embeddings`` for the shortlist-then-exact-rerank
    serving path (rerank in the ORIGINAL space — the orthonormal R
    preserves L2, so no back-rotation)."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import (
        read_ivfopq_index,
    )

    codes, r_cols, cents, books = read_ivfopq_index(spark, path)
    if shortlist is None:
        return ivfopq_topk(
            None, query, k=k, n_probe=n_probe, id_col=id_col,
            r_cols=r_cols, centroids=cents, codebooks=books, codes=codes,
        )
    if embeddings is None:
        raise ValueError("shortlist rerank needs the embeddings DataFrame")
    return ivfopq_topk_rerank(
        embeddings, query, k=k, shortlist=shortlist, n_probe=n_probe,
        r_cols=r_cols, centroids=cents, codebooks=books,
        id_col=id_col, vec_col=vec_col, codes=codes,
    )


def quantization_mse(X: np.ndarray, r_cols: list[list[float]],
                     books: list[list[list[float]]]) -> float:
    """Mean squared reconstruction error ||XR - Q(XR)||^2 / n — the
    OPQ training objective, used by tests and the bench to compare
    codec families (R = identity gives plain PQ's objective)."""
    R = np.asarray(r_cols, dtype=np.float64).T
    Xr = np.ascontiguousarray(X, dtype=np.float64) @ R
    nb = [np.asarray(b, dtype=np.float64) for b in books]
    Y = _reconstruct_np(_encode_np(Xr, nb), nb)
    return float(((Xr - Y) ** 2).sum() / X.shape[0])
