"""Lexical retrieval: BM25 ranking over the documents table.

The keyword rung of a hybrid search stack — the same corpus the
MinHash/LSH and vector (IVF/PQ) tiers index, ranked by the
Robertson/Sparck-Jones BM25 function (the Lucene-default scoring
formula). A 100 TB corpus pass is two scans: one corpus-statistics
aggregation (df per query term + doc-length stats, map-side combined)
and one scoring pass over the rows that contain at least one query
term (an 8-byte token-keyed semi-join prunes everything else before
any per-doc state accumulates).

Float parity with the DuckDB oracle follows the repo discipline
(`prep.unigram_lm_scores`): every ln() argument is a ratio of exact
integers (+0.5 halves — exact in binary), the per-doc fold runs over
the matched-term struct list sorted by token (unique per doc), scores
are rounded to 6 for output and to 10 for the ordering comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.text import tokenize


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 top-k documents for a keyword query.

    score(d) = sum over distinct query terms t present in d of
        idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    with idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))  (the Lucene
    variant — always positive), tf the term count in d, dl the doc
    token length, and avgdl the corpus mean (one driver-side scalar
    from an exact integer sum, divided identically in both engines).

    Duplicate query terms are deduped (standard bag-of-words BM25 over
    distinct terms). Documents matching no term are not returned.
    Ordering: round(score, 10) desc, doc_id asc — fully deterministic.

    Output: (doc_id, score DOUBLE rounded-6, rank INT), rank 1..k.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    terms = sorted({t for t in query.split(" ") if t})
    if not terms:
        raise ValueError("query has no terms")
    spark = docs.sparkSession
    toks = tokenize(F.col(text_col))

    # corpus statistics: N and the exact integer token-length sum in
    # ONE aggregation job; avgdl divides driver-side (same IEEE divide
    # the oracle performs)
    stats = docs.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.size(toks)).alias("sum_dl")
    ).collect()[0]
    n_docs = stats["n"] or 0
    if n_docs == 0:
        raise ValueError("empty corpus")
    avgdl = (stats["sum_dl"] or 0) / n_docs

    term_df = spark.createDataFrame([(t,) for t in terms], "token string")
    # per-(doc, query-term) tf rows; the semi filter on the tiny term
    # set prunes non-matching tokens BEFORE the aggregation shuffles
    matched = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(toks).alias("dl"),
            F.explode(toks).alias("token"),
        )
        .join(F.broadcast(term_df), "token")
        .groupBy("doc_id", "dl", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # df per term from the matched rows (a doc counts once per term)
    dfreq = matched.groupBy("token").agg(
        F.count(F.lit(1)).alias("df")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    scored = (
        matched.join(dfreq, "token")
        .select(
            "doc_id",
            "dl",
            "token",
            (
                idf
                * (F.col("tf").cast("double") * F.lit(k1 + 1.0))
                / (
                    F.col("tf").cast("double")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl").cast("double") / F.lit(avgdl)
                    )
                )
            ).alias("term_score"),
        )
        .groupBy("doc_id")
        .agg(
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct("token", "term_score"))
                ),
                F.lit(0.0),
                lambda a, s: a + s["term_score"],
            ).alias("score")
        )
    )
    w = Window.orderBy(
        F.round(F.col("score"), 10).desc(), F.col("doc_id").asc()
    ).partitionBy(F.pmod(F.col("doc_id"), F.lit(1)))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id",
            F.round(F.col("score"), 6).alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    k: int = 10,
    c: int = 60,
    id_col: str = "doc_id",
    rank_a_col: str = "rank",
    rank_b_col: str = "rank",
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack/Clarke/Buettcher, SIGIR 2009) —
    the standard hybrid-search combiner: given two ranked lists,
    rrf(d) = sum over lists containing d of 1 / (c + rank_d). Ids
    missing from a list contribute nothing from it (the full-outer
    semantics every RRF implementation uses). Rank-only fusion needs
    no score calibration between the lists — which is exactly why it
    is the default way to fuse a lexical (BM25) list with a vector
    (cosine) list.

    Both inputs are top-k lists (bounded), so the fusion is a
    broadcast-sized full outer join however large the corpus the lists
    were drawn from. 1/(c + rank) divides exact small integers —
    engine-portable bit-for-bit.

    Output: (doc_id, rank_lex INT nullable, rank_vec INT nullable,
    rrf_score DOUBLE rounded-6, rank INT) — ties broken by doc_id.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if c < 1:
        raise ValueError(f"c must be >= 1, got {c}")
    a = ranked_a.select(
        F.col(id_col).alias("doc_id"),
        F.col(rank_a_col).cast("int").alias("rank_lex"),
    )
    bt = ranked_b.select(
        F.col(id_col).alias("doc_id"),
        F.col(rank_b_col).cast("int").alias("rank_vec"),
    )
    fused = a.join(bt, "doc_id", "full_outer").select(
        "doc_id",
        "rank_lex",
        "rank_vec",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(c) + F.col("rank_lex")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(c) + F.col("rank_vec")), F.lit(0.0)
            )
        ).alias("rrf_score"),
    )
    w = Window.orderBy(
        F.round(F.col("rrf_score"), 10).desc(), F.col("doc_id").asc()
    ).partitionBy(F.pmod(F.col("doc_id"), F.lit(1)))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id",
            "rank_lex",
            "rank_vec",
            F.round(F.col("rrf_score"), 6).alias("rrf_score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )
