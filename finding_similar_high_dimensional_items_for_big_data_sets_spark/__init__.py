"""PySpark-native similarity-search / analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of
``nguyenthinhthanh/Finding-similar-high-dimensional-Items-for-big-data-sets``
(a Dask + FastAPI MinHash-LSH service): shingling, MinHash signatures,
LSH banding, candidate joins, exact brute-force oracles, QED histogram
pruning, dedup families, ANN over embeddings, text analysis, and
streaming extensions — all as pure DataFrame-returning functions.

Design stance (SURVEY.md §7.1): tables in, tables out. The LSH "index"
is an immutable ``bands`` DataFrame; queries are broadcast equi-joins;
no mutable worker state, no custom execution, no RDDs.
"""

from finding_similar_high_dimensional_items_for_big_data_sets_spark.config import (
    MERSENNE31,
    MinHashParams,
    perm_coeffs,
)
from finding_similar_high_dimensional_items_for_big_data_sets_spark.session import get_spark

__all__ = ["MERSENNE31", "MinHashParams", "perm_coeffs", "get_spark"]

__version__ = "0.1.0"
