"""SemDeDup-style cluster-blocked semantic dedup (dedup.semantic_*)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import ann, dedup
from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


def _planted(spark):
    """Four well-separated directions plus planted dups: 10/11 are
    exact clones of 0's vector, 12 is a tiny perturbation of 1's,
    and 13 is far from everything."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(4, 16))
    rows = []
    for i in range(4):
        rows.append((i, [float(x) for x in base[i]]))
    rows.append((10, [float(x) for x in base[0]]))  # exact clone of 0
    rows.append((11, [float(x) for x in base[0]]))  # exact clone of 0
    near = base[1] + rng.normal(size=16) * 1e-3
    rows.append((12, [float(x) for x in near]))  # near-dup of 1
    rows.append((13, [float(x) for x in rng.normal(size=16) * 5]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_semantic_duplicates_finds_planted_clones(spark):
    df = _planted(spark)
    cents = ann.random_centroids(16, n_cells=4, seed=5)
    pairs = {
        (r["vec_a"], r["vec_b"])
        for r in dedup.semantic_duplicates(df, cents, threshold=0.99).collect()
    }
    # identical vectors always share a cell regardless of centroids
    assert {(0, 10), (0, 11), (10, 11)} <= pairs
    # the perturbed near-dup of 1 also lands in 1's cell (same argmin)
    assert (1, 12) in pairs
    # nothing pairs with the far-away outlier at this threshold
    assert not any(13 in p for p in pairs)


def test_semantic_dedup_keeps_min_id_representatives(spark):
    df = _planted(spark)
    cents = ann.random_centroids(16, n_cells=4, seed=5)
    rows = {r["vec_id"]: r for r in dedup.semantic_dedup(df, cents, threshold=0.99).collect()}
    assert len(rows) == 8  # every input vector appears
    assert rows[0]["keep"] and rows[0]["group_id"] == 0
    for dup in (10, 11):
        assert rows[dup]["group_id"] == 0 and not rows[dup]["keep"]
    assert rows[12]["group_id"] == 1 and not rows[12]["keep"]
    assert rows[1]["keep"]
    assert rows[13]["keep"] and rows[13]["group_id"] == 13


def test_semantic_duplicates_compression_parity(emb):
    """Clone compression must be invisible in the output (same rows),
    on real fixture embeddings with a permissive threshold."""
    cents = ann.random_centroids(64, n_cells=8, seed=43)
    a = dedup.semantic_duplicates(emb, cents, threshold=0.2, compress_identical=True)
    b = dedup.semantic_duplicates(emb, cents, threshold=0.2, compress_identical=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_semantic_duplicates_with_trained_centroids(spark, emb):
    """Lloyd-trained quantizer slots straight in; exact clones are
    found under ANY centroids (identical vectors, identical cells)."""
    clones = spark.createDataFrame(
        [(90001,), (90002,)], "vec_id bigint"
    ).crossJoin(emb.filter(F.col("vec_id") == 3).select("embedding"))
    df = emb.select("vec_id", "embedding").unionByName(
        clones.select("vec_id", "embedding")
    )
    trained = ann.ivf_train(emb, n_cells=8, n_iters=2, seed=43)
    pairs = {
        (r["vec_a"], r["vec_b"])
        for r in dedup.semantic_duplicates(df, trained, threshold=0.999).collect()
    }
    assert {(3, 90001), (3, 90002), (90001, 90002)} <= pairs


def test_semantic_blocking_differs_from_hyperplane_blocking(emb):
    """Sanity: the two blockings are genuinely different candidate
    generators — cell-blocked pairs at a low threshold are not simply
    the hyperplane-bucket pairs under another name."""
    cents = ann.random_centroids(64, n_cells=8, seed=43)
    sem = dedup.semantic_duplicates(emb, cents, threshold=0.2)
    hyp = dedup.embedding_cosine_duplicates(emb, dim=64, threshold=0.2, n_planes=8, seed=42)
    s = {(r["vec_a"], r["vec_b"]) for r in sem.collect()}
    h = {(r["vec_a"], r["vec_b"]) for r in hyp.collect()}
    assert s and h and s != h


def test_semantic_outliers_drops_most_prototypical(emb):
    cents = ann.random_centroids(64, n_cells=8, seed=43)
    rows = dedup.semantic_outliers(emb, cents, drop_frac=0.25).collect()
    assert len(rows) == emb.count()
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    for cell, members in by_cell.items():
        kept = [r for r in members if r["keep"]]
        dropped = [r for r in members if not r["keep"]]
        # every dropped score strictly above every kept score
        if dropped:
            assert min(r["proto_score"] for r in dropped) >= max(
                r["proto_score"] for r in kept
            )
        # roughly a quarter dropped (percentile cut; ties may shift it)
        assert len(dropped) <= len(members) * 0.5


def test_semantic_outliers_zero_vector_kept_and_validation(spark, emb):
    import pytest as _pytest

    cents = ann.random_centroids(64, n_cells=4, seed=43)
    zero = spark.createDataFrame(
        [(99001, [0.0] * 64)], "vec_id bigint, embedding array<double>"
    )
    df = emb.select("vec_id", "embedding").unionByName(zero)
    out = {r["vec_id"]: r for r in dedup.semantic_outliers(df, cents).collect()}
    assert out[99001]["proto_score"] is None and out[99001]["keep"]
    with _pytest.raises(ValueError):
        dedup.semantic_outliers(emb, cents, drop_frac=1.5)


def test_semantic_assign_arrow_matches_expr(emb):
    """The Arrow argmin kernel and the fold-expression kernel must
    produce the same pairs on the fixture (no exact cell-boundary
    ties), and auto switches to arrow above 64 cells without error."""
    cents = ann.random_centroids(64, n_cells=8, seed=43)
    e = dedup.semantic_duplicates(emb, cents, threshold=0.3, assign="expr")
    a = dedup.semantic_duplicates(emb, cents, threshold=0.3, assign="arrow")
    assert sorted(map(tuple, e.collect())) == sorted(map(tuple, a.collect()))

    many = ann.random_centroids(64, n_cells=80, seed=43)  # auto -> arrow
    out = dedup.semantic_duplicates(emb, many, threshold=0.3).collect()
    assert isinstance(out, list)  # runs without codegen blowup
    with pytest.raises(ValueError):
        dedup.semantic_duplicates(emb, cents, assign="bogus")


def test_ivf_assign_vectorized_matches_expression(emb):
    cents = ann.random_centroids(64, n_cells=16, seed=43)
    ex = {r["vec_id"]: r["cell"] for r in ann.ivf_assign(emb, cents).collect()}
    ar = {
        r["vec_id"]: r["cell"]
        for r in ann.ivf_assign_vectorized(emb, cents).collect()
    }
    assert ex == ar


def test_semantic_outliers_arrow_matches_expr(emb):
    """The fused Arrow proto kernel and the expression path agree on
    (cell, proto_score, keep) for the fixture, and auto engages above
    64 cells."""
    cents = ann.random_centroids(64, n_cells=8, seed=43)
    e = {r["vec_id"]: (r["cell"], r["proto_score"], r["keep"])
         for r in dedup.semantic_outliers(emb, cents, assign="expr").collect()}
    a = {r["vec_id"]: (r["cell"], r["proto_score"], r["keep"])
         for r in dedup.semantic_outliers(emb, cents, assign="arrow").collect()}
    assert e == a
    many = ann.random_centroids(64, n_cells=80, seed=43)
    out = dedup.semantic_outliers(emb, many).collect()  # auto -> arrow
    assert len(out) == emb.count()
    with pytest.raises(ValueError):
        dedup.semantic_outliers(emb, cents, assign="nope")


def test_semantic_curation_composes_both_stages(emb):
    """Curation == dedup keep-set filtered by the prototypicality rule
    computed over that keep-set (the D4 ordering)."""
    cents = ann.random_centroids(64, n_cells=8, seed=43)
    cur = dedup.semantic_curation(emb, cents, threshold=0.5, drop_frac=0.25)
    got = {r["vec_id"] for r in cur.collect()}

    kept = {
        r["vec_id"]
        for r in dedup.semantic_dedup(emb, cents, threshold=0.5).collect()
        if r["keep"]
    }
    survivors = emb.filter(F.col("vec_id").isin([int(i) for i in kept]))
    expected = {
        r["vec_id"]
        for r in dedup.semantic_outliers(survivors, cents, drop_frac=0.25).collect()
        if r["keep"]
    }
    assert got == expected and got and got < kept


def test_arrow_paths_reject_non_integral_ids(spark):
    """The Arrow scale kernels emit long id columns; a string id must
    fail fast with an actionable error (not corrupt deep in a pandas
    batch), while the expression path carries any id type."""
    rows = [
        ("doc-a", [1.0, 0.0, 0.0, 0.0]),
        ("doc-b", [1.0, 0.0, 0.0, 0.0]),
        ("doc-c", [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    cents = ann.random_centroids(4, n_cells=2, seed=5)
    with pytest.raises(ValueError, match="integral id"):
        dedup.semantic_duplicates(
            df, cents, threshold=0.99, assign="arrow"
        )
    with pytest.raises(ValueError, match="integral id"):
        dedup.semantic_outliers(
            df, cents, drop_frac=0.5, assign="arrow"
        ).collect()
    # the expression path works for string ids
    pairs = {
        (r["vec_a"], r["vec_b"])
        for r in dedup.semantic_duplicates(
            df, cents, threshold=0.99, assign="expr"
        ).collect()
    }
    assert ("doc-a", "doc-b") in pairs
    keeps = dedup.semantic_outliers(
        df, cents, drop_frac=0.5, assign="expr"
    ).collect()
    assert len(keeps) == 3


def test_hkm_quantizer_train_and_assign(spark):
    """HKM tree: leaves ≈ requested, dense ids, deterministic, and
    Spark-side descent (hkm_assign) matches the driver-side kernel."""
    rng = np.random.default_rng(11)
    base = rng.normal(size=(6, 16)) * 8
    X = np.vstack([b + rng.normal(size=(80, 16)) * 0.1 for b in base])
    q = ann.hkm_train(X, n_leaves=6, branch=4, seed=43)
    assert q.n_leaves == 6
    expect = ann.hkm_descend(X, q.payload())
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: r["cell"] for r in ann.hkm_assign(df, q).collect()
    }
    assert got == {i: int(expect[i]) for i in range(len(X))}
    assert set(got.values()) <= set(range(q.n_leaves))
    # train twice -> identical tree
    q2 = ann.hkm_train(X, n_leaves=6, branch=4, seed=43)
    assert all(
        (a["centers"] == b["centers"]).all()
        for a, b in zip(q.levels, q2.levels)
    )


def test_hkm_train_df_samples_and_trains(emb):
    q = ann.hkm_train_df(
        emb, n_leaves=12, branch=4, seed=7, sample_size=512
    )
    assert 1 <= q.n_leaves <= 12
    assigned = ann.hkm_assign(emb, q)
    occ = assigned.groupBy("cell").count().collect()
    assert sum(r["count"] for r in occ) == emb.count()
    assert all(0 <= r["cell"] < q.n_leaves for r in occ)


def test_hkm_train_df_sample_is_layout_invariant(emb):
    # the trained tree must be a function of the data CONTENT only:
    # re-laying-out the same rows (different partition count/order)
    # must select the same sample and train the identical tree
    q1 = ann.hkm_train_df(emb, n_leaves=8, branch=4, seed=7, sample_size=256)
    q2 = ann.hkm_train_df(
        emb.repartition(7).sortWithinPartitions("vec_id"),
        n_leaves=8,
        branch=4,
        seed=7,
        sample_size=256,
    )
    q3 = ann.hkm_train_df(
        emb.coalesce(1), n_leaves=8, branch=4, seed=7, sample_size=256
    )
    for other in (q2, q3):
        assert q1.n_leaves == other.n_leaves
        assert all(
            (a["centers"] == b["centers"]).all()
            for a, b in zip(q1.levels, other.levels)
        )


def test_semantic_duplicates_hkm_finds_planted_clones(spark):
    df = _planted(spark)
    X = np.array(
        [r["embedding"] for r in df.select("embedding").collect()]
    )
    q = ann.hkm_train(X, n_leaves=3, branch=2, seed=5)
    pairs = {
        (r["vec_a"], r["vec_b"])
        for r in dedup.semantic_duplicates(df, q, threshold=0.99).collect()
    }
    # exact clones share every descent decision, so clone pairs are
    # guaranteed; the near-dup pair holds on this data too
    assert (0, 10) in pairs and (0, 11) in pairs and (10, 11) in pairs
    assert (1, 12) in pairs


def test_semantic_curation_hkm_end_to_end(emb):
    q = ann.hkm_train_df(emb, n_leaves=8, branch=4, seed=7, sample_size=512)
    out = dedup.semantic_curation(
        emb, q, threshold=0.999, drop_frac=0.25
    )
    rows = out.collect()
    n = emb.count()
    assert 0 < len(rows) < n
    # survivors keep <= 75% + NULL-score rows of each cell, roughly
    assert {c for r in rows for c in [r["cell"]]} <= set(range(q.n_leaves))
