"""MLlib parity backend (SURVEY §7.3 M5).

Alternate implementation of the reference's MinHash-LSH retrieval
(``app/src/minhash_lsh.py:25-116``) using Spark MLlib's built-in
``MinHashLSH`` over ``HashingTF`` shingle vectors, instead of the
DataFrame-native signature/bands pipeline in ``operators/minhash`` /
``operators/lsh``.

Purpose: (a) prove the engine's surface can be served by the stock
MLlib operators a Spark shop would reach for first, and (b) give the
bench harness a second backend to compare recall/latency against
(the reference does the same with FAISS,
``benchmarks/benchmark_runner.py:119-128``).

MLlib's hash family differs from both the reference's and our
portable family, so results are approximate-equivalent, not
bit-equal: correctness is checked by the metric harness (recall vs
the exact-Jaccard oracle), never by DuckDB hash-match.

Scale notes: ``approxSimilarityJoin`` is the same band-bucket
equi-join we build by hand (explodes hash tables, joins on bucket,
filters by exact key distance) — it shuffles on the hash values, and
AQE handles skewed buckets. ``HashingTF`` keeps shingle space bounded
(2^18 features) regardless of corpus size.
"""

from __future__ import annotations

from pyspark.ml.feature import HashingTF, MinHashLSH
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.config import MinHashParams
from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.text import (
    char_shingles,
    tokenize,
    word_shingles,
)

NUM_FEATURES = 1 << 18


def shingle_vectors(
    docs: DataFrame,
    params: MinHashParams,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, features): binary HashingTF vector of the doc's
    shingle set. Empty-shingle docs are dropped (MLlib MinHashLSH
    requires >= 1 non-zero entry; the native path keeps them with a
    sentinel signature instead)."""
    if params.by_word:
        sh = word_shingles(tokenize(F.col(text_col)), params.k_shingle)
    else:
        sh = char_shingles(F.col(text_col), params.k_shingle)
    shingled = docs.select(F.col(id_col), sh.alias("shingles")).filter(
        F.size("shingles") > 0
    )
    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=NUM_FEATURES, binary=True
    )
    return tf.transform(shingled).select(id_col, "features")


def fit_lsh(
    vectors: DataFrame, num_hash_tables: int = 32, seed: int = 42
):
    """Fit MLlib MinHashLSH on (doc_id, features). Returns the model
    (the 'index'; equivalent of our persisted bands table)."""
    lsh = MinHashLSH(
        inputCol="features",
        outputCol="hashes",
        numHashTables=num_hash_tables,
        seed=seed,
    )
    return lsh.fit(vectors)


def similar_pairs(
    model,
    vectors: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs with true Jaccard >= threshold (INCLUSIVE) via
    approxSimilarityJoin (distance = 1 - Jaccard). Output:
    (doc_a, doc_b, jaccard), doc_a < doc_b.

    approxSimilarityJoin filters strictly (dist < cutoff), which would
    silently drop pairs sitting exactly AT the threshold — real corpora
    hit exact rationals like 1/2 constantly. The cutoff is nudged up by
    1e-9: smaller than the 1/(2q) gap any OTHER Jaccard rational p/q
    (q = union size) keeps from the boundary, so `dist < cutoff`
    becomes exactly the inclusive `jaccard >= threshold`. No post-hoc
    re-derivation of jaccard for the filter — 1-(1-t) != t in floats
    for thresholds like 1/3, so re-filtering on it would re-introduce
    the boundary bug."""
    joined = model.approxSimilarityJoin(
        vectors, vectors, 1.0 - threshold + 1e-9, distCol="dist"
    )
    a, b = f"datasetA.{id_col}", f"datasetB.{id_col}"
    return (
        joined.filter(F.col(a) < F.col(b))
        .select(
            F.col(a).alias("doc_a"),
            F.col(b).alias("doc_b"),
            (F.lit(1.0) - F.col("dist")).alias("jaccard"),
        )
        .distinct()
    )


def topk(
    model,
    vectors: DataFrame,
    key_features,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """approxNearestNeighbors for one query vector. Output:
    (doc_id, jaccard, rank) ordered by (jaccard desc, doc_id)."""
    nn = model.approxNearestNeighbors(vectors, key_features, k, distCol="dist")
    # constant-valued partition key over the k surviving rows; pmod(id, 1)
    # is constant 0 but NOT foldable, so Catalyst keeps the partition spec
    # and WindowExec stops warning about a global window (see ann.py)
    w = Window.partitionBy(F.pmod(F.col(id_col), F.lit(1))).orderBy(
        F.desc("jaccard"), F.col(id_col)
    )
    return (
        nn.select(id_col, (F.lit(1.0) - F.col("dist")).alias("jaccard"))
        .orderBy(F.desc("jaccard"), F.col(id_col))
        .withColumn("rank", F.row_number().over(w))
    )
