"""S7 query-envelope source: JSON-lines -> validated query DataFrame,
batch and streaming, end-to-end into the LSH probe."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.config import MinHashParams
from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import lsh, minhash
from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources import query_source as QS
from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import load_table
from finding_similar_high_dimensional_items_for_big_data_sets_spark.streaming import queries as SQ

P = MinHashParams()


def _write_envelopes(path, envelopes):
    with open(path, "w") as f:
        for e in envelopes:
            f.write(json.dumps(e) + "\n")


@pytest.fixture()
def corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash.signatures(docs, P).cache()
    bands = lsh.bands_table(sigs, P).cache()
    return sigs, bands


def test_batch_envelopes_validated_and_probed(spark, tmp_path, corpus):
    sigs, bands = corpus
    real = sigs.filter(F.col("doc_id") == 3).first()
    good = {"query_id": 1, "vector": list(real["sig"]), "k": 5}
    bad_width = {"query_id": 2, "vector": [1, 2, 3], "k": 5}
    no_vec = {"query_id": 3, "k": 5}
    no_k = {"query_id": 4, "vector": list(real["sig"])}
    path = str(tmp_path / "queries.jsonl")
    _write_envelopes(path, [good, bad_width, no_vec, no_k])

    raw = spark.read.schema(QS.ENVELOPE_SCHEMA).json(path)
    qs = QS.validate_envelopes(raw, P)
    got = {r["query_id"]: r for r in qs.collect()}
    assert set(got) == {1, 4}
    assert got[1]["k"] == 5 and got[4]["k"] == QS.DEFAULT_K

    rejects = {r["query_id"]: r["reject_reason"] for r in QS.rejected_envelopes(raw, P).collect()}
    assert rejects == {2: "wrong_width", 3: "missing_vector"}

    # accepted envelope drives the probe; top hit is the source doc
    top = (
        lsh.lsh_topk(sigs, bands, qs.filter(F.col("query_id") == 1), P, k=5)
        .orderBy("rank")
        .first()
    )
    assert top["doc_id"] == 3 and abs(top["score"] - 1.0) < 1e-9


def test_streaming_envelopes_through_lsh_probe(spark, tmp_path, corpus):
    sigs, bands = corpus
    src = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    real = sigs.filter(F.col("doc_id") == 7).first()
    _write_envelopes(
        os.path.join(src, "q1.jsonl"),
        [{"query_id": 42, "vector": list(real["sig"]), "k": 5}],
    )
    qstream = QS.queries_from_json_stream(spark, src, P)
    assert qstream.isStreaming
    probe = SQ.streaming_lsh_probe(qstream, bands, sigs, P, threshold=0.99)
    q = (
        probe.writeStream.format("memory")
        .queryName("env_probe_t")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("select * from env_probe_t").collect()
        assert any(r["query_id"] == 42 and r["doc_id"] == 7 for r in rows)
    finally:
        q.stop()


def test_save_curl_for_query_roundtrips(spark, sf_dir, tmp_path):
    """S10 sink: the script must POST the exact vector + k as JSON
    (reference benchmarks/benchmark_runner.py:36-66 payload shape)."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources import sinks

    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash.signatures(docs, MinHashParams())
    out = sinks.save_curl_for_query(
        sigs, doc_id=13, k=5, out_path=str(tmp_path / "curl_query.sh")
    )
    text = open(out).read().strip()
    assert text.startswith('curl -X POST "http://localhost:8000/query"')
    payload = json.loads(text.split('-d "', 1)[1][:-1].replace('\\"', '"'))
    assert payload["k"] == 5
    expect = [float(v) for v in sigs.filter(F.col("doc_id") == 13).first()["sig"]]
    assert payload["vector"] == expect

    with pytest.raises(ValueError, match="not found"):
        sinks.save_curl_for_query(sigs, doc_id=-5, out_path=str(tmp_path / "x.sh"))
