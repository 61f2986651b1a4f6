"""Per-invocation DataFrame materialization with a deployment-chosen
fault-tolerance strategy.

Several operators materialize an intermediate once because two
downstream consumers would otherwise re-plan (and re-compute) the same
expensive subtree — Spark does not CSE across self-referencing joins
(optimization guide §3.3). The materialization is always
per-invocation: a fresh RDD per call, nothing persisted across calls,
so repeated invocations (bench reps, retries) each recompute from the
parquet inputs.

The STORAGE of that intermediate is a deployment decision, so it is a
session conf rather than hardcoded::

    spark.spark_graft.materialize = local | reliable | none

- ``local`` (default): ``localCheckpoint`` — blocks live on executor
  local storage with no lineage to recompute them. Cheapest, and the
  right call on local[*] or when the job is short next to executor
  MTBF. The tradeoff at cluster scale: one executor loss mid-query
  fails the job (the lost partitions are unrecoverable), and the
  blocks pin executor storage until the DataFrame is garbage
  collected.
- ``reliable``: ``checkpoint`` — blocks written to the reliable
  checkpoint directory (``SparkContext.setCheckpointDir``, typically
  HDFS/object storage). Survives executor loss; costs one write +
  read of the intermediate. The production setting for long dedup /
  decontamination passes at 100 TB where losing an executor mid-pass
  is routine. Requires a checkpoint dir; raises a clear error if
  unset.
- ``none``: pass through — no materialization; consumers re-plan the
  subtree (the pre-optimization behavior). An escape hatch for
  debugging plan shapes, or when upstream is itself a cheap scan.

``persist()`` is deliberately NOT offered: Spark's CacheManager keys
cached plans by analyzed-plan equality, so a second invocation with an
identical plan would silently serve the first invocation's blocks —
cross-invocation result reuse this library's measurement and oracle
discipline forbids (and the cache entries leak until unpersist).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

MATERIALIZE_CONF = "spark.spark_graft.materialize"


def materialize(df: DataFrame, eager: bool = False) -> DataFrame:
    """Materialize ``df`` once for this invocation (see module doc).

    ``eager``: compute now (iterative loops that must truncate lineage
    before the next round) vs on first downstream action (default —
    query paths stay lazy so plan capture/explain never runs a job).
    """
    mode = df.sparkSession.conf.get(MATERIALIZE_CONF, "local")
    if mode == "none":
        return df
    if mode == "reliable":
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            raise ValueError(
                f"{MATERIALIZE_CONF}=reliable requires a checkpoint "
                "directory: call spark.sparkContext.setCheckpointDir(...) "
                "(HDFS/object storage on a cluster)"
            )
        return df.checkpoint(eager=eager)
    if mode != "local":
        raise ValueError(
            f"unknown {MATERIALIZE_CONF}={mode!r}: expected "
            "local | reliable | none"
        )
    return df.localCheckpoint(eager=eager)
