"""Cross-store retention: `delete_docs_everywhere` removes a deletion
set from every persisted index family all-or-nothing, and a process
death anywhere in the fan-out recovers to a consistent state (round-9
verdict item #3)."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark import MinHashParams
from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import ann, lsh, minhash, retrieval
from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources import retention
from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import (
    load_table,
    read_postings_corpus_stats,
    validate_index,
    validate_ivfpq_store,
    validate_postings_store,
    validate_pq_store,
    write_bands_bucketed,
    write_ivfpq_index,
    write_postings_index,
    write_pq_index,
)

DIM, M, CODES, CELLS = 64, 8, 16, 8
DELETE_IDS = [3, 7, 11]


def _build_all_stores(spark, tmp_path, tag):
    """One store per family over the sf0.001 fixtures, all holding the
    same id space."""
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    p = MinHashParams()
    sigs = minhash.signatures(docs, p)
    bands = lsh.bands_table(sigs, p)

    table = f"retention_bands_{tag}"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    write_bands_bucketed(bands, table, num_buckets=4)
    sigs_path = str(tmp_path / f"sigs_{tag}")
    sigs.write.parquet(sigs_path)

    books = ann.random_codebooks(DIM, M, CODES, seed=44)
    cents = ann.random_centroids(DIM, CELLS, seed=45)
    ivfpq_path = str(tmp_path / f"ivfpq_{tag}")
    write_ivfpq_index(emb, ivfpq_path, cents, books)
    pq_path = str(tmp_path / f"pq_{tag}")
    write_pq_index(emb, pq_path, books)

    postings_path = str(tmp_path / f"postings_{tag}")
    write_postings_index(docs, postings_path, n_doc_shards=2, n_token_buckets=4)

    from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.hashing import portable_hash64
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.dedup import normalize_text
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import (
        write_content_hashes_bucketed,
    )

    hash_table = f"retention_hashes_{tag}"
    spark.sql(f"DROP TABLE IF EXISTS {hash_table}")
    write_content_hashes_bucketed(
        docs.select(
            "doc_id",
            portable_hash64(normalize_text(F.col("text"))).alias("content_hash"),
        ),
        hash_table,
        num_buckets=4,
    )

    return dict(
        table=table,
        sigs_path=sigs_path,
        ivfpq_path=ivfpq_path,
        pq_path=pq_path,
        postings_path=postings_path,
        hash_table=hash_table,
        emb=emb,
        docs=docs,
    )


def _assert_no_trace(spark, st):
    """Every store's contents AND probe paths are clean of the deleted
    ids, and every store still validates against its own sidecars."""
    ids = tuple(DELETE_IDS)
    assert spark.table(st["table"]).filter(F.col("doc_id").isin(*ids)).count() == 0
    assert (
        spark.read.parquet(st["sigs_path"])
        .filter(F.col("doc_id").isin(*ids))
        .count()
        == 0
    )
    for p in (st["ivfpq_path"], st["pq_path"]):
        assert (
            spark.read.parquet(p).filter(F.col("vec_id").isin(*ids)).count() == 0
        )
    assert (
        spark.table(st["hash_table"]).filter(F.col("doc_id").isin(*ids)).count()
        == 0
    )
    posts = spark.read.parquet(st["postings_path"])
    assert posts.filter(F.col("doc_id").isin(*ids)).count() == 0
    dls = spark.read.parquet(os.path.join(st["postings_path"], "_doc_lengths"))
    assert dls.filter(F.col("doc_id").isin(*ids)).count() == 0

    # probe paths: a deleted doc's own vector/text cannot reach any
    # result list (it was its own rank-1 hit before the delete)
    q_emb = st["emb"].filter(F.col("vec_id") == DELETE_IDS[0]).first()["embedding"]
    got = ann.ivfpq_topk_store(
        spark, st["ivfpq_path"], list(q_emb), k=5, n_probe=CELLS
    ).collect()
    assert got and all(r["vec_id"] not in ids for r in got)
    got = ann.pq_topk_store(spark, st["pq_path"], list(q_emb), k=5).collect()
    assert got and all(r["vec_id"] not in ids for r in got)
    q_text = st["docs"].filter(F.col("doc_id") == DELETE_IDS[0]).first()["text"]
    got = retrieval.bm25_topk_store(
        spark, st["postings_path"], " ".join(q_text.split()[:8]), k=5
    ).collect()
    assert all(r["doc_id"] not in ids for r in got)

    validate_index(spark, st["sigs_path"], st["table"])
    validate_ivfpq_store(spark, st["ivfpq_path"])
    validate_pq_store(spark, st["pq_path"])
    validate_postings_store(spark, st["postings_path"])


def test_delete_docs_everywhere_no_trace(spark, tmp_path):
    st = _build_all_stores(spark, tmp_path, "full")
    n_docs_before, _ = read_postings_corpus_stats(spark, st["postings_path"])
    try:
        retention.delete_docs_everywhere(
            spark,
            DELETE_IDS,
            str(tmp_path / "manifest_full"),
            lsh=(st["sigs_path"], st["table"]),
            vector_stores=[st["ivfpq_path"], st["pq_path"]],
            postings_stores=[st["postings_path"]],
            content_hash_tables=[st["hash_table"]],
        )
        _assert_no_trace(spark, st)
        # corpus stats shrink with the corpus: BM25 idf/avgdl reflect
        # the post-delete corpus, not the original
        n_docs_after, _ = read_postings_corpus_stats(spark, st["postings_path"])
        assert n_docs_after == n_docs_before - len(DELETE_IDS)
        # no manifest left behind; re-running the delete converges
        assert not os.path.exists(
            str(tmp_path / "manifest_full" / retention.MANIFEST_NAME)
        )
        retention.delete_docs_everywhere(
            spark,
            DELETE_IDS,
            str(tmp_path / "manifest_full"),
            lsh=(st["sigs_path"], st["table"]),
            vector_stores=[st["ivfpq_path"], st["pq_path"]],
            postings_stores=[st["postings_path"]],
            content_hash_tables=[st["hash_table"]],
        )
        _assert_no_trace(spark, st)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {st['table']}")
        spark.sql(f"DROP TABLE IF EXISTS {st['hash_table']}")


def test_sketch_stores_raise_rebuild_only(spark, tmp_path):
    with pytest.raises(ValueError, match="cannot unlearn"):
        retention.delete_docs_everywhere(
            spark,
            DELETE_IDS,
            str(tmp_path / "manifest_sketch"),
            sketch_stores=[str(tmp_path / "cms_store")],
        )


def test_recover_retention_rolls_forward_mid_fan(spark, tmp_path, monkeypatch):
    """Death AFTER the manifest landed and after SOME stores swapped:
    recovery completes every remaining swap — no store keeps serving
    the deleted ids."""
    st = _build_all_stores(spark, tmp_path, "crash")
    manifest_dir = str(tmp_path / "manifest_crash")

    calls = {"n": 0}
    real_commit = retention._commit_dir_swap

    def dying_commit(path, suffix="__compact"):
        # let the sigs dir (first dir store) swap, then die before the
        # vector/postings stores commit
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("simulated process death mid-fan")
        real_commit(path, suffix=suffix)

    monkeypatch.setattr(retention, "_commit_dir_swap", dying_commit)
    try:
        with pytest.raises(RuntimeError, match="mid-fan"):
            retention.delete_docs_everywhere(
                spark,
                DELETE_IDS,
                manifest_dir,
                lsh=(st["sigs_path"], st["table"]),
                vector_stores=[st["ivfpq_path"], st["pq_path"]],
                postings_stores=[st["postings_path"]],
                content_hash_tables=[st["hash_table"]],
            )
        monkeypatch.setattr(retention, "_commit_dir_swap", real_commit)
        # manifest survived the death: the transaction must roll forward
        assert os.path.exists(os.path.join(manifest_dir, retention.MANIFEST_NAME))
        assert retention.recover_retention(spark, manifest_dir) is True
        assert not os.path.exists(
            os.path.join(manifest_dir, retention.MANIFEST_NAME)
        )
        _assert_no_trace(spark, st)
        # idempotent: a second recovery pass is a no-op
        assert retention.recover_retention(spark, manifest_dir) is False
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {st['table']}")
        spark.sql(f"DROP TABLE IF EXISTS {st['hash_table']}")


def test_crash_before_manifest_rolls_back(spark, tmp_path, monkeypatch):
    """Death during PREPARE (before the manifest): no live store
    changed, recovery reports nothing to do, and the stores still
    serve the not-yet-deleted ids."""
    st = _build_all_stores(spark, tmp_path, "prep")
    manifest_dir = str(tmp_path / "manifest_prep")

    def dying_prepare(spark_, path, transform):
        raise RuntimeError("simulated death during prepare")

    monkeypatch.setattr(retention, "_prepare_postings_rewrite", dying_prepare)
    try:
        with pytest.raises(RuntimeError, match="during prepare"):
            retention.delete_docs_everywhere(
                spark,
                DELETE_IDS,
                manifest_dir,
                lsh=(st["sigs_path"], st["table"]),
                vector_stores=[st["ivfpq_path"], st["pq_path"]],
                postings_stores=[st["postings_path"]],
            )
        assert retention.recover_retention(spark, manifest_dir) is False
        # every live store is untouched — the ids are all still present
        assert (
            spark.table(st["table"])
            .filter(F.col("doc_id").isin(*DELETE_IDS))
            .count()
            > 0
        )
        assert (
            spark.read.parquet(st["ivfpq_path"])
            .filter(F.col("vec_id").isin(*DELETE_IDS))
            .count()
            > 0
        )
        assert (
            spark.read.parquet(st["postings_path"])
            .filter(F.col("doc_id").isin(*DELETE_IDS))
            .count()
            > 0
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {st['table']}")
        spark.sql(f"DROP TABLE IF EXISTS {st['table']}__compact_tmp")
        spark.sql(f"DROP TABLE IF EXISTS {st['hash_table']}")
        spark.sql(f"DROP TABLE IF EXISTS {st['hash_table']}__compact_tmp")


def test_recover_retention_tolerates_torn_manifest(spark, tmp_path):
    """A power loss can persist the manifest rename without its data
    (zero-length file): recovery must treat it as not-committed —
    clear the husk, return False — rather than crash on json.load."""
    manifest_dir = tmp_path / "manifest_torn"
    manifest_dir.mkdir()
    torn = manifest_dir / retention.MANIFEST_NAME
    torn.write_bytes(b"")
    assert retention.recover_retention(spark, str(manifest_dir)) is False
    assert not torn.exists()
