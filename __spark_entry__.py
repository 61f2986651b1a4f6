"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Engine: ``finding_similar_high_dimensional_items_for_big_data_sets_spark``
(see SURVEY.md §2 for the operator inventory each query exercises).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from finding_similar_high_dimensional_items_for_big_data_sets_spark import contract as C  # noqa: E402
from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import (  # noqa: E402
    lsh,
    minhash,
)
from finding_similar_high_dimensional_items_for_big_data_sets_spark.oracle import (  # noqa: E402
    duckdb_sql,
)
from finding_similar_high_dimensional_items_for_big_data_sets_spark.plans.queries import (  # noqa: E402
    REGISTRY,
)
from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import (  # noqa: E402
    load_table,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's
    ``POST /query`` semantics — shingle -> MinHash -> LSH bands ->
    broadcast candidate join -> estimated-Jaccard top-k."""
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.001"
    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash.signatures(docs, C.PARAMS)
    bands = lsh.bands_table(sigs, C.PARAMS)
    qs = sigs.filter(F.col("doc_id") == C.QUERY_DOC).select(
        F.col("doc_id").alias("query_id"), "sig"
    )
    return lsh.lsh_topk(sigs, bands, qs, C.PARAMS, k=C.K_DOC, n_queries=1)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator pipeline from SURVEY.md §2."""
    return dict(REGISTRY)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (same column names, and for
    deterministic queries bit-identical values). Queries absent here
    (``synthetic_docs``) use engine-specific randomness and get the
    driver's rows-only check."""
    return duckdb_sql.registry()
