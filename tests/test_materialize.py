"""The conf-gated materialization strategy (functions.materialize):
every mode must produce identical operator results — only the storage
of the once-materialized intermediate differs (executor-local blocks,
reliable checkpoint files, or plain recomputation)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.materialize import (
    MATERIALIZE_CONF,
    materialize,
)
from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import (
    dedup,
    retrieval,
)


def _fixture_docs(spark):
    shared = "q w e r t y u i"
    rows = [
        (1, shared + " alpha beta gamma"),
        (2, "gamma " + shared + " delta"),
        (3, "k l m n o p q r s t"),
        (4, shared + " epsilon zeta"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _run_operators(spark):
    docs = _fixture_docs(spark)
    spans = sorted(
        (r["doc_a"], r["doc_b"], r["shared_ngrams"])
        for r in dedup.shared_ngram_spans(docs, n=8, max_doc_freq=8).collect()
    )
    bm25 = sorted(
        tuple(r) for r in retrieval.bm25_topk(docs, "q w alpha", k=3).collect()
    )
    decon = sorted(
        (r["doc_id"], r["ref_id"], r["score"])
        for r in dedup.cross_corpus_duplicates(
            docs, docs.filter("doc_id = 1"), threshold=0.5
        ).collect()
    )
    return spans, bm25, decon


def test_materialize_modes_agree(spark, tmp_path):
    base = _run_operators(spark)  # default: local
    assert base[0], "fixture must produce span pairs"
    try:
        spark.conf.set(MATERIALIZE_CONF, "none")
        assert _run_operators(spark) == base
        spark.conf.set(MATERIALIZE_CONF, "reliable")
        spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
        assert _run_operators(spark) == base
    finally:
        spark.conf.unset(MATERIALIZE_CONF)


def test_materialize_reliable_requires_checkpoint_dir(spark, tmp_path):
    df = spark.range(3)
    try:
        spark.conf.set(MATERIALIZE_CONF, "reliable")
        if spark.sparkContext.getCheckpointDir() is None:
            with pytest.raises(ValueError, match="checkpoint"):
                materialize(df)
        spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt2"))
        assert materialize(df, eager=True).count() == 3
        spark.conf.set(MATERIALIZE_CONF, "bogus")
        with pytest.raises(ValueError, match="bogus"):
            materialize(df)
    finally:
        spark.conf.unset(MATERIALIZE_CONF)


def test_materialize_local_is_fresh_per_invocation(spark):
    # two calls must not share blocks/plans (no cross-invocation reuse)
    df = spark.range(10).withColumn("x", F.col("id") * 2)
    a = materialize(df)
    b = materialize(df)
    assert a.rdd.id() != b.rdd.id()
