"""Persisted IVF-OPQ store (round-7 verdict item #2): the full FAISS
``OPQ,IVF,PQ`` artifact — rotation + coarse quantizer + codebooks
pinned in one sidecar, codes cell-partitioned — with probe-time
directory pruning, an append guard over all three quantizer halves,
serving-tier export, and the same crash-safe lifecycle as IVF-PQ."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import ann, opq
from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.serving_vector import (
    ServingVectorIndex,
)
from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import (
    append_ivfopq_index,
    compact_ivfpq_index,
    delete_from_ivfpq_index,
    load_table,
    read_ivfopq_index,
    read_ivfpq_index,
    validate_ivfpq_store,
    write_ivfopq_index,
)

DIM, M, CODES, N_CELLS = 64, 8, 16, 16


def _emb(spark):
    return load_table(spark, "/root/testdata/sf0.001", "embeddings")


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    emb = _emb(spark).cache()
    emb.count()
    r_cols, books = opq.opq_train_offline()
    cents = ann.random_centroids(DIM, N_CELLS, seed=43)
    p = str(tmp_path_factory.mktemp("ivfopq") / "store")
    write_ivfopq_index(emb, p, r_cols, cents, books)
    return emb, r_cols, cents, books, p


def test_store_roundtrip_and_answer_identity(spark, store):
    emb, r_cols, cents, books, p = store
    codes, r2, c2, b2 = read_ivfopq_index(spark, p)
    assert codes.count() == emb.count()
    assert r2 == [[float(x) for x in col] for col in r_cols]
    # store answers == in-memory ivfopq_topk under the same artifact
    q = [float(v) for v in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    want = [
        tuple(r)
        for r in opq.ivfopq_topk(
            emb, q, k=10, n_probe=4, r_cols=r_cols,
            centroids=cents, codebooks=books,
        ).collect()
    ]
    got = opq.ivfopq_topk_store(spark, p, q, k=10, n_probe=4)
    assert [tuple(r) for r in got.collect()] == want
    # the probe prunes cell DIRECTORIES at the source (the 100 TB
    # claim: a point query reads ~n_probe/n_cells of the store)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split(
        "PartitionFilters"
    )[1][:80]


def test_store_rerank_in_original_space(spark, store):
    emb, r_cols, cents, books, p = store
    q = [float(v) for v in emb.filter(F.col("vec_id") == 9).first()["embedding"]]
    want = [
        tuple(r)
        for r in opq.ivfopq_topk_rerank(
            emb, q, k=5, shortlist=50, n_probe=4, r_cols=r_cols,
            centroids=cents, codebooks=books,
        ).collect()
    ]
    got = opq.ivfopq_topk_store(
        spark, p, q, k=5, n_probe=4, shortlist=50, embeddings=emb
    )
    assert [tuple(r) for r in got.collect()] == want
    # top hit is the query itself at distance ~0 (exact rerank)
    assert got.collect()[0]["vec_id"] == 9
    with pytest.raises(ValueError, match="needs the embeddings"):
        opq.ivfopq_topk_store(spark, p, q, k=5, shortlist=50)


def test_serving_identity_vs_store_query(spark, store):
    """ServingVectorIndex loads the IVF-OPQ store, rotates the query
    in-process, and answers IDENTICALLY to ivfopq_topk_store — ADC and
    rerank paths both (the same contract the IVF-PQ serving tier
    carries)."""
    emb, r_cols, cents, books, p = store
    vidx = ServingVectorIndex.from_store(spark, p, embeddings=emb)
    assert vidx.rotation is not None
    for qid in (7, 23, 41):
        q = [
            float(v)
            for v in emb.filter(F.col("vec_id") == qid).first()["embedding"]
        ]
        want = [
            (r["vec_id"], r["dist"], r["rank"])
            for r in opq.ivfopq_topk_store(
                spark, p, q, k=5, n_probe=4
            ).collect()
        ]
        assert vidx.query(q, k=5, n_probe=4) == want
        want_rr = [
            (r["vec_id"], r["dist"], r["rank"])
            for r in opq.ivfopq_topk_store(
                spark, p, q, k=5, n_probe=4, shortlist=50, embeddings=emb
            ).collect()
        ]
        assert vidx.query(q, k=5, n_probe=4, shortlist=50) == want_rr


def test_append_guard_rejects_mismatched_quantizers(spark, store):
    emb, r_cols, cents, books, p = store
    new = emb.filter(F.col("vec_id") < 2).select(
        (F.col("vec_id") + 500000).alias("vec_id"), "embedding"
    )
    bad_rot = [[0.0] * DIM for _ in range(DIM)]
    with pytest.raises(ValueError, match="different quantizer config"):
        append_ivfopq_index(new, p, bad_rot, cents, books)
    bad_cents = ann.random_centroids(DIM, N_CELLS, seed=99)
    with pytest.raises(ValueError, match="different quantizer config"):
        append_ivfopq_index(new, p, r_cols, bad_cents, books)
    bad_books = ann.random_codebooks(DIM, M, CODES, seed=99)
    with pytest.raises(ValueError, match="different quantizer config"):
        append_ivfopq_index(new, p, r_cols, cents, bad_books)
    # the matching triple appends fine (cleaned up for module peers)
    append_ivfopq_index(new, p, r_cols, cents, books)
    validate_ivfpq_store(spark, p)
    delete_from_ivfpq_index(spark, [500000, 500001], p)


def test_reader_kind_guards(spark, store, tmp_path):
    """read_ivfpq_index refuses an IVF-OPQ store (scoring rotated
    codes with an unrotated LUT would be garbage) and vice versa."""
    emb, r_cols, cents, books, p = store
    with pytest.raises(ValueError, match="not an IVF-PQ store"):
        read_ivfpq_index(spark, p)
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import (
        write_ivfpq_index,
    )

    p2 = str(tmp_path / "plain_ivfpq")
    write_ivfpq_index(emb.limit(10), p2, cents, books)
    with pytest.raises(ValueError, match="not an IVF-OPQ store"):
        read_ivfopq_index(spark, p2)


def test_lifecycle_on_ivfopq_store(spark, store):
    """compact/delete/validate accept the IVF-OPQ kind: answers stable
    across append -> compact -> delete, layout preserved."""
    emb, r_cols, cents, books, p = store
    new = emb.filter(F.col("vec_id") < 4).select(
        (F.col("vec_id") + 700000).alias("vec_id"), "embedding"
    )
    append_ivfopq_index(new, p, r_cols, cents, books)
    q = [float(v) for v in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    want = [
        tuple(r)
        for r in opq.ivfopq_topk_store(spark, p, q, k=10, n_probe=4).collect()
    ]
    compact_ivfpq_index(spark, p)
    assert [
        tuple(r)
        for r in opq.ivfopq_topk_store(spark, p, q, k=10, n_probe=4).collect()
    ] == want
    # cell partitioning survives compaction
    assert any(n.startswith("cell=") for n in os.listdir(p))
    validate_ivfpq_store(spark, p)
    delete_from_ivfopq_rows = [700000, 700001, 700002, 700003]
    delete_from_ivfpq_index(spark, delete_from_ivfopq_rows, p)
    got = opq.ivfopq_topk_store(spark, p, q, k=10, n_probe=4).collect()
    assert all(r["vec_id"] < 700000 for r in got)
    validate_ivfpq_store(spark, p)


def test_replica_sharding_merges_to_full_index(spark, store):
    """Cell-subset replicas of an IVF-OPQ store merge to the full-index
    answer under merge_topk_dist — every replica derives the same
    rotated probe set from the shared sidecar and answers from the
    cells it owns (the same scatter-gather law the IVF-PQ tier and the
    HTTP vector router ride)."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.serving_vector import (
        merge_topk_dist,
    )

    emb, r_cols, cents, books, p = store
    full = ServingVectorIndex.from_store(spark, p)
    covers = ([0, 1, 2, 3, 4], [5, 6, 7, 8, 9, 10], [11, 12, 13, 14, 15])
    replicas = [
        ServingVectorIndex.from_store(spark, p, cells=list(c)) for c in covers
    ]
    for qid in (7, 23):
        q = [
            float(v)
            for v in emb.filter(F.col("vec_id") == qid).first()["embedding"]
        ]
        want = full.query(q, k=5, n_probe=6)
        got = merge_topk_dist(
            [r.query(q, k=5, n_probe=6) for r in replicas], k=5
        )
        assert got == want
