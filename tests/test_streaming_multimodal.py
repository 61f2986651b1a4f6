"""Structured Streaming operators (real streams via file source +
availableNow trigger) and multimodal mapInPandas plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.config import MinHashParams
from finding_similar_high_dimensional_items_for_big_data_sets_spark.multimodal import media as MM
from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import lsh, minhash
from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import load_table
from finding_similar_high_dimensional_items_for_big_data_sets_spark.streaming import (
    queries as SQ,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").cache()


def test_hourly_stats_batch_equals_manual(events):
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in SQ.hourly_event_stats(events).collect()
    }
    manual = {
        (r["h"], r["event_type"]): (r["n"], r["tv"])
        for r in events.groupBy(
            F.date_trunc("hour", "ts").alias("h"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("tv"),
        )
        .collect()
    }
    assert got == manual


def test_streaming_hourly_availablenow(spark, events, tmp_path):
    src = str(tmp_path / "stream_src")
    out_table = "hourly_stream_result"
    events.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        SQ.hourly_event_stats(stream)
        .writeStream.format("memory")
        .queryName(out_table)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits windows the watermark has closed; the last
    # (open) window is withheld. Everything emitted must match batch.
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.sql(f"select * from {out_table}").collect()
    }
    batch = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in SQ.hourly_event_stats(events).collect()
    }
    assert got, "stream emitted nothing"
    assert all(batch[k] == v for k, v in got.items())


def test_sliding_windows_cover_each_event_4x(events):
    # 1h window sliding 15min: every event falls in exactly 4 windows
    total = SQ.sliding_event_rate(events).agg(F.sum("n_events")).collect()[0][0]
    assert total == events.count() * 4


def test_session_window_gap_merges(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 1.0),
        (1, "2024-01-01 00:10:00", 1.0),  # same session (gap 30m)
        (1, "2024-01-01 01:30:00", 1.0),  # new session
        (2, "2024-01-01 00:00:00", 1.0),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts_s string, value double").select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value"
    )
    out = SQ.user_session_stats(df).collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r["user_id"], []).append(r["n_events"])
    assert sorted(per_user[1]) == [1, 2]
    assert per_user[2] == [1]


def test_streaming_lsh_probe_stream_static(spark, sf_dir, tmp_path):
    params = MinHashParams()
    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash.signatures(docs, params).cache()
    bands = lsh.bands_table(sigs, params).cache()
    # query stream: two query docs streamed from parquet
    qsigs = sigs.filter(F.col("doc_id").isin([3, 13])).select(
        F.col("doc_id").alias("query_id"), "sig"
    )
    src = str(tmp_path / "qstream")
    qsigs.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(qsigs.schema).parquet(src)
    out = SQ.streaming_lsh_probe(stream, bands, sigs, params, threshold=0.9)
    q = (
        out.writeStream.format("memory")
        .queryName("lsh_stream_result")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("select * from lsh_stream_result").collect()
    # each query matches at least itself with score 1.0
    self_hits = {(r["query_id"], r["doc_id"]) for r in got if r["score"] == 1.0}
    assert (3, 3) in self_hits and (13, 13) in self_hits


def test_multimodal_features_plumbing(spark):
    media = MM.synthetic_media(spark, n=30)
    feats = MM.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r["features"]) == MM.FEATURE_DIM for r in rows)
    assert all(r["n_bytes"] == 128 for r in rows)  # 8 * 16-byte md5
    # deterministic across runs
    again = {r["media_id"]: r["features"] for r in MM.extract_features(media).collect()}
    assert all(again[r["media_id"]] == r["features"] for r in rows)


def test_multimodal_real_path_raises(spark):
    media = MM.synthetic_media(spark, n=3)
    with pytest.raises(Exception, match="NotImplementedError|real decoders"):
        MM.extract_features(media, real=True).collect()


def test_frame_sampling_only_video(spark):
    media = MM.synthetic_media(spark, n=30)
    frames = MM.sample_frames(media, every_ms=100)
    got = frames.select("media_id").distinct().count()
    n_video = media.filter(F.col("kind") == "video").count()
    assert got == n_video
    # frame_idx dense from 0
    first = frames.groupBy("media_id").agg(F.min("frame_idx").alias("m")).collect()
    assert all(r["m"] == 0 for r in first)


def test_resize_image_metadata(spark):
    media = MM.synthetic_media(spark, n=9)
    out = MM.resize_image(media, 224, 224)
    res = out.collect()
    for r in res:
        if r["kind"] == "image":
            assert (r["width"], r["height"]) == (224, 224)
        else:
            assert (r["width"], r["height"]) != (224, 224) or True
    assert [(f.name, f.dataType) for f in out.schema.fields] == [
        (f.name, f.dataType) for f in media.schema.fields
    ]


def test_topk_response_envelope(spark, sf_dir):
    from finding_similar_high_dimensional_items_for_big_data_sets_spark import contract as C
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import lsh, minhash
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources import sinks
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash.signatures(docs, C.PARAMS)
    bands = lsh.bands_table(sigs, C.PARAMS)
    qs = sigs.filter(F.col("doc_id") == C.QUERY_DOC).select(
        F.col("doc_id").alias("query_id"), "sig"
    )
    topk = lsh.with_preview(lsh.lsh_topk(sigs, bands, qs, C.PARAMS, k=5), sigs)
    resp = sinks.topk_response(topk)
    assert resp["candidates"], "non-empty top-k"
    first = resp["candidates"][0]
    assert set(first) == {"id", "score", "vector_preview"}
    assert first["id"] == C.QUERY_DOC and first["score"] == 1.0
    assert len(first["vector_preview"]) == 10
    scores = [c["score"] for c in resp["candidates"]]
    assert scores == sorted(scores, reverse=True)
    import json
    assert json.loads(sinks.topk_response_json(topk)) == resp


def test_write_sharded_and_metrics_csv(spark, sf_dir, tmp_path):
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources import sinks
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import (
        load_table,
        write_sharded,
    )
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "shards")
    write_sharded(docs, out, num_shards=4)
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert sorted(back.columns) == sorted(docs.columns)
    # range sharding: per-file doc_id ranges must not overlap
    files = back.select(
        F.input_file_name().alias("f"), "doc_id"
    ).groupBy("f").agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
    rows = sorted(files.collect(), key=lambda r: r["lo"])
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] < b["lo"]

    m = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    csv_out = str(tmp_path / "metrics")
    sinks.write_metrics_csv(m, csv_out)
    back_csv = spark.read.option("header", True).csv(csv_out)
    assert int(back_csv.collect()[0]["n_docs"]) == docs.count()


def test_stream_index_maintenance_matches_batch_build(spark, tmp_path):
    """A file stream of new documents must leave the persisted index
    probe-identical to a batch build over the full corpus."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.config import MinHashParams
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import lsh, minhash
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources import tables as T

    params = MinHashParams()
    docs = T.load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    sigs_p = str(tmp_path / "sigs_stream")
    try:
        # batch-build on half A
        sigs_a = minhash.signatures(half_a, params)
        sigs_a.write.mode("overwrite").parquet(sigs_p)
        T.write_bands_bucketed(
            lsh.bands_table(sigs_a, params), "t_stream_idx", num_buckets=4
        )
        # stream half B in (two source files -> micro-batches)
        src = str(tmp_path / "doc_stream")
        half_b.repartition(2).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(half_b.schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = SQ.stream_index_maintenance(
            stream, params, sigs_p, "t_stream_idx", str(tmp_path / "idx_ckpt")
        )
        q.awaitTermination(180)

        sigs_all = spark.read.parquet(sigs_p)
        assert sigs_all.count() == docs.count()
        qdf = sigs_all.filter(F.col("doc_id") == 13).select(
            F.col("doc_id").alias("query_id"), "sig"
        )
        got = lsh.lsh_topk(
            sigs_all, spark.table("t_stream_idx"), qdf, params, k=10, n_queries=1
        ).collect()
        # full batch build as the oracle
        sigs_full = minhash.signatures(docs, params).cache()
        bands_full = lsh.bands_table(sigs_full, params)
        expect = lsh.lsh_topk(
            sigs_full, bands_full, qdf, params, k=10, n_queries=1
        ).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, expect))
        assert len(got) == 10
    finally:
        spark.sql("DROP TABLE IF EXISTS t_stream_idx")


def test_stream_index_maintenance_checkpoint_resume_no_duplicates(spark, tmp_path):
    """Exactly-once across restarts: a second run over the same
    checkpoint must pick up only files added since the first run —
    doc_ids in the index stay unique."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.config import MinHashParams
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import minhash
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources import tables as T

    params = MinHashParams()
    docs = T.load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    part1 = docs.filter(F.col("doc_id") % 3 == 1)
    part2 = docs.filter(F.col("doc_id") % 3 == 2)
    base = docs.filter(F.col("doc_id") % 3 == 0)
    sigs_p = str(tmp_path / "sigs_ckpt")
    src = str(tmp_path / "src_ckpt")
    ckpt = str(tmp_path / "ckpt_resume")
    try:
        sigs_0 = minhash.signatures(base, params)
        sigs_0.write.mode("overwrite").parquet(sigs_p)
        T.write_bands_bucketed(
            lsh.bands_table(sigs_0, params), "t_ckpt_idx", num_buckets=4
        )
        part1.write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(docs.schema).parquet(src)
        SQ.stream_index_maintenance(
            stream, params, sigs_p, "t_ckpt_idx", ckpt
        ).awaitTermination(120)
        n_after_first = spark.read.parquet(sigs_p).count()
        assert n_after_first == base.count() + part1.count()

        # restart over the SAME checkpoint with new files added
        part2.write.mode("append").parquet(src)
        stream2 = spark.readStream.schema(docs.schema).parquet(src)
        SQ.stream_index_maintenance(
            stream2, params, sigs_p, "t_ckpt_idx", ckpt
        ).awaitTermination(120)
        sigs_all = spark.read.parquet(sigs_p)
        assert sigs_all.count() == docs.count()
        # exactly-once: no doc signed twice
        assert sigs_all.select("doc_id").distinct().count() == docs.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_ckpt_idx")
