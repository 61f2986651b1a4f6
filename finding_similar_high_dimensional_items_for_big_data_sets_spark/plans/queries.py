"""Driver-contract query registry: every implemented operator from
SURVEY.md §2 as a (spark, sf_dir) -> DataFrame callable.

Column names/aliases here are the contract — the DuckDB oracle SQL in
``oracle/duckdb_sql.py`` must (and does) produce the same names, and
for every deterministic query, bit-identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.materialize import (
    materialize,
)
from finding_similar_high_dimensional_items_for_big_data_sets_spark import contract as C
from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions import textstats
from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.arrays import (
    cosine_similarity,
    l2_distance,
)
from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.hashing import (
    portable_hash64,
)
from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.text import tokenize
from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import (
    ann,
    bruteforce,
    dedup,
    lsh,
    metrics,
    minhash,
    opq,
    prep,
    qed,
)
from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources.tables import (
    load_table,
    synthetic_documents,
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


# Prebuilt-index cache: signatures and the bands table are the engine's
# persistent artifacts (the reference builds its LSH index once at
# startup, app/src/query_service.py:109-122). Registry queries share
# one cached copy per (session, sf_dir) instead of re-deriving them.
_INDEX_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def _cached(spark: SparkSession, sf_dir: str, kind: str, build) -> DataFrame:
    # Keyed on the Spark application id, not id(spark): a stopped
    # session's id() can be reused by a new object after GC, which would
    # hand out DataFrames bound to a dead context.
    key = (spark.sparkContext.applicationId, sf_dir, kind)
    df = _INDEX_CACHE.get(key)
    if df is None:
        df = build().cache()
        _INDEX_CACHE[key] = df
    return df


def _sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cached(
        spark, sf_dir, "sigs",
        lambda: minhash.signatures(_docs(spark, sf_dir), C.PARAMS),
    )


def _bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cached(
        spark, sf_dir, "bands",
        lambda: lsh.bands_table(_sigs(spark, sf_dir), C.PARAMS),
    )


# --- text / shingling / hashing -------------------------------------------


def q_shingle_stats(spark, sf_dir):
    """F1/F2/E3: token + distinct-shingle counts per doc."""
    docs = _docs(spark, sf_dir)
    toks = tokenize(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_shingles"),
    )


def q_char_shingle_stats(spark, sf_dir):
    """F3: distinct char 3-gram count per doc (the char-shingle path
    the word-based contract queries never exercise)."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.text import (
        char_shingles,
    )

    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(char_shingles(F.col("text"), 3)).alias("n_char_shingles"),
    )


def q_content_hashes(spark, sf_dir):
    """A2/F4: portable content hash of normalized text per doc."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        portable_hash64(dedup.normalize_text(F.col("text"))).alias("content_hash"),
    )


def q_minhash_signatures(spark, sf_dir):
    """A1/F5: full 128-permutation MinHash signatures, exploded."""
    return minhash.signatures_long(_docs(spark, sf_dir), C.PARAMS)


def q_lsh_bands(spark, sf_dir):
    """P1/P2: the LSH index table (doc_id, band_id, band_hash)."""
    return _bands(spark, sf_dir)


def q_lsh_bucket_cap(spark, sf_dir):
    """§4.4 deterministic bucket cap, exercised with cap=3."""
    return lsh.cap_buckets(_bands(spark, sf_dir), cap=3)


def q_lsh_candidate_cap(spark, sf_dir):
    """§4.4 delta 2: deterministic max_candidates — keep the 25
    smallest candidate doc_ids for the fixture query after the full
    band join."""
    bands = _bands(spark, sf_dir)
    sigs = _sigs(spark, sf_dir)
    qs = sigs.filter(F.col("doc_id") == C.QUERY_DOC).select(
        F.col("doc_id").alias("query_id"), "sig"
    )
    qb = lsh.query_bands(qs, C.PARAMS)
    return lsh.candidates(bands, qb, max_candidates=25)


# --- the online query path (J1/A3/A4/T1/T3) --------------------------------


def q_lsh_topk(spark, sf_dir):
    """Reference POST /query semantics for the fixture doc."""
    sigs = _sigs(spark, sf_dir)
    bands = _bands(spark, sf_dir)
    qs = sigs.filter(F.col("doc_id") == C.QUERY_DOC).select(
        F.col("doc_id").alias("query_id"), "sig"
    )
    return lsh.lsh_topk(sigs, bands, qs, C.PARAMS, k=C.K_DOC, n_queries=1)


def q_lsh_topk_batch(spark, sf_dir):
    """Batch POST /query: first BATCH_DOCS docs as queries through the
    full LSH path. Covers the Arrow-vectorized multi-query scorer
    (n > SMALL_QUERY_FOLD routes off the JVM fold) under the oracle."""
    sigs = _sigs(spark, sf_dir)
    bands = _bands(spark, sf_dir)
    qs = sigs.filter(F.col("doc_id") < C.BATCH_DOCS).select(
        F.col("doc_id").alias("query_id"), "sig"
    )
    return lsh.lsh_topk(
        sigs, bands, qs, C.PARAMS, k=C.K_BATCH, n_queries=C.BATCH_DOCS
    )


def q_lsh_topk_batch_shuffle(spark, sf_dir):
    """Same semantics as lsh_topk_batch through the NON-broadcast plan
    (broadcast_query=False: band join shuffles on (band_id, band_hash),
    pair-join fold scorer) — oracle coverage for the unbounded-query
    code path the broadcast contract queries never execute."""
    sigs = _sigs(spark, sf_dir)
    bands = _bands(spark, sf_dir)
    qs = sigs.filter(F.col("doc_id") < C.BATCH_DOCS).select(
        F.col("doc_id").alias("query_id"), "sig"
    )
    return lsh.lsh_topk(
        sigs, bands, qs, C.PARAMS, k=C.K_BATCH, broadcast_query=False
    )


def q_est_jaccard_topk_batch_fold(spark, sf_dir):
    """The pure-JVM cross-join fold twin of est_jaccard_topk_batch
    (vectorized=False) — covers the path used when query sets exceed
    the driver-collect regime."""
    sigs = _sigs(spark, sf_dir)
    qs = sigs.filter(F.col("doc_id") < C.BATCH_DOCS).select(
        F.col("doc_id").alias("query_id"), "sig"
    )
    return bruteforce.est_jaccard_topk(
        sigs, qs, C.PARAMS.num_perm, k=C.K_BATCH, vectorized=False
    )


def q_bucket_stats(spark, sf_dir):
    """Index health: bucket-size distribution of the bands table (the
    operational skew monitor behind the cap/AQE decisions)."""
    return lsh.bucket_stats(_bands(spark, sf_dir))


def q_lsh_pairs(spark, sf_dir):
    """J1 self-join: near-duplicate pairs above PAIR_THRESHOLD."""
    sigs = _sigs(spark, sf_dir)
    bands = _bands(spark, sf_dir)
    return lsh.self_join_pairs(bands, sigs, C.PARAMS, C.PAIR_THRESHOLD)


def q_est_jaccard_topk_batch(spark, sf_dir):
    """Exact est-Jaccard oracle (no LSH pruning), batch of first docs."""
    sigs = _sigs(spark, sf_dir)
    qs = sigs.filter(F.col("doc_id") < C.BATCH_DOCS).select(
        F.col("doc_id").alias("query_id"), "sig"
    )
    return bruteforce.est_jaccard_topk(sigs, qs, C.PARAMS.num_perm, k=C.K_BATCH)


def q_true_jaccard_topk(spark, sf_dir):
    """Exact set-Jaccard over shingle sets for the fixture doc."""
    shingled = minhash.with_shingles(_docs(spark, sf_dir), C.PARAMS).select(
        "doc_id", "shingles"
    )
    # query_id from the filtered column, NOT F.lit(C.QUERY_DOC): a literal
    # propagates through the plan and Catalyst folds the downstream
    # per-query partitionBy("query_id") to an empty spec — a global
    # WindowExec over the whole cross join.
    qsh = shingled.filter(F.col("doc_id") == C.QUERY_DOC).select(
        F.col("doc_id").cast("bigint").alias("query_id"), "shingles"
    )
    return bruteforce.true_jaccard_topk(shingled, qsh, k=C.K_DOC)


# --- embedding-space exact search (J2/T4/F6) -------------------------------


def _emb_query(spark, sf_dir):
    return (
        _emb(spark, sf_dir)
        .filter(F.col("vec_id") == C.QUERY_VEC)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    )


def q_l2_topk(spark, sf_dir):
    return bruteforce.l2_topk(_emb(spark, sf_dir), _emb_query(spark, sf_dir), k=C.K_VEC)


def q_cosine_topk(spark, sf_dir):
    return bruteforce.cosine_topk(
        _emb(spark, sf_dir), _emb_query(spark, sf_dir), k=C.K_VEC
    )


def q_knn_batch_l2(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    qs = emb.filter(F.col("vec_id") < C.BATCH_DOCS).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return bruteforce.l2_topk(emb, qs, k=C.K_BATCH)


# --- QED family (A5/F7/P5/P6) ----------------------------------------------


def q_qed_histogram(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    edges = qed.histogram_edges(emb, C.QED_BINS)
    return qed.histogram_counts(emb, edges, C.QED_BINS)


def _qed_fixture(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    edges_rows = [r.asDict() for r in qed.histogram_edges(emb, C.QED_BINS).collect()]
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == C.QUERY_VEC).first()["embedding"]
    ]
    return emb, edges_rows, qvec


def q_qed_prune(spark, sf_dir):
    emb, edges_rows, qvec = _qed_fixture(spark, sf_dir)
    wins = qed.query_windows(qvec, edges_rows, C.QED_BINS, C.QED_P_FRACTION)
    return qed.bin_window_filter(emb, edges_rows, wins, C.QED_BINS).select("vec_id")


def q_qed_topk(spark, sf_dir):
    emb, edges_rows, qvec = _qed_fixture(spark, sf_dir)
    return qed.qed_prune_score_topk(
        emb, qvec, edges_rows, k=C.K_BATCH, n_bins=C.QED_BINS, p_fraction=C.QED_P_FRACTION
    )


# --- dedup family -----------------------------------------------------------


def q_exact_dedup(spark, sf_dir):
    """Exact dedup over the corpus plus planted duplicates.

    The sf fixtures carry no natural exact duplicates, so a bare run
    compares 0 vs 0 rows and proves nothing. Every 20th doc gets a
    shifted-id copy differing only in case and trailing whitespace —
    exactly what ``normalize_text`` must collapse — so the oracle
    compares a non-empty, deterministic result.
    """
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") % C.DEDUP_PLANT_EVERY == 0).select(
        (F.col("doc_id") + F.lit(C.DEDUP_PLANT_OFFSET)).alias("doc_id"),
        F.concat(F.upper(F.col("text")), F.lit("  ")).alias("text"),
    )
    return dedup.exact_duplicates(docs.unionByName(planted))


def q_simhash(spark, sf_dir):
    """SimHash fingerprints (portable family), split into 32-bit halves
    so both engines stay inside signed-int64 arithmetic."""
    docs = _docs(spark, sf_dir)
    sh = dedup.simhash64(tokenize(F.col("text")), family="portable")
    return docs.select(
        "doc_id",
        sh.bitwiseAND(F.lit(0xFFFFFFFF)).alias("simhash_lo"),
        F.shiftright(sh, 32).bitwiseAND(F.lit(0xFFFFFFFF)).alias("simhash_hi"),
    )


def q_ngram_jaccard_pairs(spark, sf_dir):
    return dedup.ngram_jaccard_duplicates(_docs(spark, sf_dir), n=3, threshold=0.3)


def q_simhash_dup_pairs(spark, sf_dir):
    """SimHash near-dup pairs (portable family, hamming <= 3)."""
    return dedup.simhash_duplicates(
        _docs(spark, sf_dir), max_hamming=3, family="portable"
    )


def q_embedding_dup_pairs(spark, sf_dir):
    """Embedding-cosine near-dups (hyperplane-bucket blocked)."""
    return dedup.embedding_cosine_duplicates(
        _emb(spark, sf_dir),
        dim=C.EMB_DIM,
        threshold=0.3,
        n_planes=C.ANN_PLANES,
        seed=C.ANN_SEED,
    )


def q_semantic_dup_pairs(spark, sf_dir):
    """SemDeDup pairs: nearest-centroid (IVF cell) blocking over the
    seeded deterministic centroids, exact-cosine verify — the
    cluster-adapted sibling of ``embedding_dup_pairs``."""
    return dedup.semantic_duplicates(
        _emb(spark, sf_dir),
        centroids=ann.random_centroids(C.EMB_DIM, C.IVF_CELLS, C.IVF_SEED),
        threshold=C.SEM_THRESHOLD,
    )


def q_semantic_dedup(spark, sf_dir):
    """Full SemDeDup keep-set: cluster-blocked pairs -> connected
    components -> smallest-id representative per semantic group."""
    return dedup.semantic_dedup(
        _emb(spark, sf_dir),
        centroids=ann.random_centroids(C.EMB_DIM, C.IVF_CELLS, C.IVF_SEED),
        threshold=C.SEM_THRESHOLD,
    )


def q_semantic_outliers(spark, sf_dir):
    """D4-style prototypicality filter: cosine-to-own-centroid score,
    per-cell exact-percentile cutoff, drop the most prototypical
    quarter per cell."""
    return dedup.semantic_outliers(
        _emb(spark, sf_dir),
        centroids=ann.random_centroids(C.EMB_DIM, C.IVF_CELLS, C.IVF_SEED),
        drop_frac=C.PROTO_DROP_FRAC,
    )


def q_cell_stats(spark, sf_dir):
    """IVF quantizer health: cell-occupancy distribution over the
    seeded deterministic centroids (the cell twin of bucket_stats —
    the monitor that says when to retrain/split before within-cell
    quadratics blow up)."""
    assigned = ann.ivf_assign(
        _emb(spark, sf_dir),
        ann.random_centroids(C.EMB_DIM, C.IVF_CELLS, C.IVF_SEED),
    )
    return ann.cell_stats(assigned)


def q_semantic_curation(spark, sf_dir):
    """Full D4 curation: SemDeDup then prototypicality over the
    survivors, one shared quantizer — the embedding-side flagship
    composition (text-side twin: ``full_prep_pipeline``)."""
    return dedup.semantic_curation(
        _emb(spark, sf_dir),
        centroids=ann.random_centroids(C.EMB_DIM, C.IVF_CELLS, C.IVF_SEED),
        threshold=C.SEM_THRESHOLD,
        drop_frac=C.PROTO_DROP_FRAC,
    )


def q_dataset_split(spark, sf_dir):
    """Deterministic train/val split by salted stable-id hash —
    content-independent, reproducible, shuffle-free."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import prep

    return prep.hash_split(
        _docs(spark, sf_dir).select("doc_id"),
        val_permille=C.SPLIT_VAL_PERMILLE,
        seed=C.SPLIT_SEED,
    )


def q_pack_chunks(spark, sf_dir):
    """Sequence packing: docs in id order concatenated and cut every
    PACK_BUDGET tokens (chunk = the one holding the doc's first
    token), via the two-phase distributed prefix sum — no global
    single-partition window."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import prep

    counts = _docs(spark, sf_dir).select(
        "doc_id", textstats.token_count(F.col("text")).alias("n_tokens")
    )
    return prep.pack_chunks(counts, budget=C.PACK_BUDGET)


def q_decontaminate(spark, sf_dir):
    """Cross-corpus decontamination: every 17th doc plays a held-out
    benchmark set, the rest the training corpus; output = training
    docs near-duplicating any benchmark doc (the contamination a
    pretraining pipeline must remove before eval)."""
    docs = _docs(spark, sf_dir)
    train = docs.filter(F.col("doc_id") % 17 != 0)
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    return dedup.cross_corpus_duplicates(
        train, bench, C.PARAMS, threshold=C.PAIR_THRESHOLD
    )


def q_mllib_pairs(spark, sf_dir):
    """M5 MLlib parity backend: MinHashLSH.approxSimilarityJoin pairs
    at true-Jaccard >= PAIR_THRESHOLD. Rows-only check (MLlib's hash
    family decides candidate collisions; not DuckDB-expressible)."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import (
        mllib_backend,
    )

    vectors = mllib_backend.shingle_vectors(_docs(spark, sf_dir), C.PARAMS)
    model = mllib_backend.fit_lsh(vectors, num_hash_tables=C.PARAMS.bands, seed=42)
    return mllib_backend.similar_pairs(model, vectors, C.PAIR_THRESHOLD)


def q_mllib_pairs_verified(spark, sf_dir):
    """M5 verification: MLlib's approxSimilarityJoin pairs, re-scored
    with the EXACT token-set Jaccard (ignoring MLlib's feature-space
    distance) and filtered at the same threshold. The DuckDB oracle is
    the brute-force all-pairs exact Jaccard >= threshold — a hash-match
    proves MLlib's candidate generation has full recall at this
    threshold (P(all 32 tables miss) <= (1-J)^32 <= 2^-32 at J >= 0.5)
    and that its distance filter admits exactly the true pairs."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.arrays import (
        jaccard_arrays,
    )

    pairs = q_mllib_pairs(spark, sf_dir).select("doc_a", "doc_b")
    sh = _docs(spark, sf_dir).select(
        "doc_id", F.array_distinct(tokenize(F.col("text"))).alias("sh")
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            jaccard_arrays(F.col("sh_a"), F.col("sh_b")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= C.PAIR_THRESHOLD)
    )


def q_dedup_groups(spark, sf_dir):
    """M6: near-duplicate GROUPS — connected components over the LSH
    pair graph (min-label propagation, iterative joins)."""
    docs = _docs(spark, sf_dir)
    pairs = q_lsh_pairs(spark, sf_dir)
    return dedup.connected_components(pairs, docs)


# --- text analysis ----------------------------------------------------------


def q_text_stats(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    t = F.col("text")
    return docs.select(
        "doc_id",
        textstats.token_count(t).alias("n_tokens"),
        textstats.bpe_ish_token_count(t).alias("n_bpe_tokens"),
        textstats.char_count(t).alias("n_chars_text"),
        textstats.avg_word_length(t).alias("avg_word_len"),
        textstats.distinct_token_ratio(t).alias("distinct_ratio"),
        textstats.stopword_ratio(t).alias("stopword_ratio"),
        textstats.punct_ratio(t).alias("punct_ratio"),
        textstats.quality_score(t).alias("quality"),
    )


def corpus_clean_df(docs: DataFrame) -> DataFrame:
    """DataFrame-level corpus cleaner (see :func:`q_corpus_clean`);
    also driven directly by the scaling bench over synthetic corpora."""
    t = F.col("text")
    scored = docs.select(
        "doc_id",
        portable_hash64(dedup.normalize_text(t)).alias("content_hash"),
        textstats.token_count(t).alias("n_tokens"),
        textstats.bpe_ish_token_count(t).alias("n_bpe_tokens"),
        textstats.quality_score(t).alias("quality"),
    ).filter(F.col("quality") >= 0.5)
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "content_hash", "n_tokens", "n_bpe_tokens", "quality")
    )


def q_corpus_clean(spark, sf_dir):
    """Composite LLM training-data cleaning pipeline: quality-filter ->
    exact dedup (keep the smallest doc_id per normalized-content hash)
    -> per-doc token accounting. The quality filter runs BEFORE the
    content-hash shuffle, so rejected rows never cross the wire; the
    dedup is one hash shuffle on the 8-byte content_hash, not on text.
    """
    return corpus_clean_df(_docs(spark, sf_dir))


def q_corpus_dedup_pipeline(spark, sf_dir):
    """Full training-data prep pipeline, end to end: quality filter ->
    exact dedup (corpus_clean) -> MinHash-LSH near-dup pairs among the
    survivors -> connected components -> ONE representative per
    duplicate group (the component's min doc_id), with its group size
    and token accounting.

    This is the composition a 100 TB pretraining pipeline runs before
    tokenization. Every stage is an already-oracle-checked operator;
    the composed DuckDB twin (recursive-CTE components over the
    survivor-restricted pair graph) checks the wiring BETWEEN them.
    Scale shape: quality filter before any shuffle; exact dedup on the
    8-byte hash; banded (never all-pairs) near-dup join; CC label
    propagation on the (sparse) pair graph only. Reuses the PREBUILT
    sigs/bands artifacts (left_semi to survivors) like a real system
    with a maintained index; a from-scratch run would sign only the
    survivors instead.
    """
    return corpus_dedup_pipeline_df(
        q_corpus_clean(spark, sf_dir),
        _sigs(spark, sf_dir),
        _bands(spark, sf_dir),
    )


def survivor_components(
    clean: DataFrame, sigs: DataFrame, bands: DataFrame
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Shared prefix of the prep compositions: restrict the prebuilt
    sigs/bands artifacts to the clean survivors, find near-dup pairs,
    and label connected components. Returns
    (keep, survivor_sigs, survivor_bands, components)."""
    keep = clean.select("doc_id")
    sigs = sigs.join(keep, "doc_id", "left_semi")
    bands = bands.join(keep, "doc_id", "left_semi")
    pairs = lsh.self_join_pairs(bands, sigs, C.PARAMS, C.PAIR_THRESHOLD)
    comp = dedup.connected_components(pairs.select("doc_a", "doc_b"), keep)
    return keep, sigs, bands, comp


def corpus_dedup_pipeline_df(
    clean: DataFrame, sigs: DataFrame, bands: DataFrame
) -> DataFrame:
    """DataFrame-level pipeline tail (see :func:`q_corpus_dedup_pipeline`):
    survivors -> LSH pairs -> connected components -> representatives.
    Also driven directly by the scaling bench over synthetic corpora."""
    _keep, _sigs, _bands, comp = survivor_components(clean, sigs, bands)
    sizes = comp.groupBy("group_id").agg(F.count(F.lit(1)).alias("group_size"))
    reps = comp.filter(F.col("doc_id") == F.col("group_id"))
    return (
        reps.join(sizes, "group_id")
        .join(clean, "doc_id")
        .select("doc_id", "group_size", "n_tokens", "quality")
    )


def q_full_prep_pipeline(spark, sf_dir):
    """The COMPLETE training-data prep flow as one composition — what
    a 100 TB pretraining pipeline runs end to end:

      quality clean -> exact dedup -> near-dup groups (LSH + CC) ->
      one representative per group -> DECONTAMINATE vs the held-out
      benchmark corpus (%17 split) -> train/val hash split ->
      sequence packing of the train split.

    Output: one row per surviving TRAIN doc with its packed location:
    (doc_id, n_tokens, quality, chunk_id, chunk_offset). Every stage
    is an already-oracle-checked operator; the composed DuckDB twin
    checks the wiring between them. Scale shape: filter before any
    shuffle, banded (never all-pairs) joins throughout, CC on the
    sparse pair graph, benchmark side broadcast, packing via the
    two-phase prefix sum. Reuses the prebuilt sigs/bands artifacts
    like a real system with a maintained index.
    """
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import prep

    docs = _docs(spark, sf_dir)
    train_docs = docs.filter(F.col("doc_id") % 17 != 0)
    bench_keep = docs.filter(F.col("doc_id") % 17 == 0).select("doc_id")
    # localCheckpoint: the clean subtree (quality arithmetic + exact-
    # dedup window) feeds ~5 branches of this DAG; materialize it once
    # (the DuckDB twin marks the same CTE MATERIALIZED)
    clean = corpus_clean_df(train_docs).transform(materialize, eager=True)
    sigs_all = _sigs(spark, sf_dir)
    bands_all = _bands(spark, sf_dir)
    keep, sigs, bands, comp = survivor_components(clean, sigs_all, bands_all)
    reps = comp.filter(F.col("doc_id") == F.col("group_id")).select("doc_id")
    # decontamination against the benchmark corpus, reusing the shared
    # prebuilt index artifacts (benchmark side is tiny -> broadcast)
    rep_bands = bands.join(reps, "doc_id", "left_semi")
    bench_bands = bands_all.join(bench_keep, "doc_id", "left_semi").select(
        F.col("doc_id").alias("ref_id"), "band_id", "band_hash"
    )
    bench_sigs = sigs_all.join(bench_keep, "doc_id", "left_semi").select(
        F.col("doc_id").alias("ref_id"), "sig"
    )
    flagged = (
        dedup.cross_corpus_pairs_from_index(
            rep_bands, sigs, bench_bands, bench_sigs, C.PARAMS, C.PAIR_THRESHOLD
        )
        .select("doc_id")
        .distinct()
    )
    surviving = reps.join(flagged, "doc_id", "left_anti")
    split = prep.hash_split(
        surviving, val_permille=C.SPLIT_VAL_PERMILLE, seed=C.SPLIT_SEED
    )
    train_ids = split.filter(F.col("split") == "train").select("doc_id")
    counts = clean.join(train_ids, "doc_id", "left_semi").select(
        "doc_id", F.col("n_tokens").cast("long").alias("n_tokens"), "quality"
    )
    packed = prep.pack_chunks(
        counts.select("doc_id", "n_tokens"), budget=C.PACK_BUDGET
    )
    return packed.join(counts.select("doc_id", "quality"), "doc_id").select(
        "doc_id", "n_tokens", "quality", "chunk_id", "chunk_offset"
    )


def q_embedding_dup_pairs_multiprobe(spark, sf_dir):
    """Embedding near-dups with margin-gated multiprobe blocking — the
    recall-repaired twin of embedding_dup_pairs (superset of its rows
    at the same planes/seed/threshold)."""
    return dedup.embedding_cosine_duplicates_multiprobe(
        _emb(spark, sf_dir),
        dim=C.EMB_DIM,
        threshold=0.3,
        n_planes=C.ANN_PLANES,
        seed=C.ANN_SEED,
        probe_margin=C.ANN_PROBE_MARGIN,
    )


def q_token_frequencies(spark, sf_dir):
    """Vocabulary builder: corpus-wide token frequencies, top 200 by
    (count desc, token asc) — the counting pass a tokenizer/BPE
    training run starts from. One explode + one hash aggregation;
    map-side partial counts bound the shuffle by |vocab|, not corpus
    size."""
    toks = _docs(spark, sf_dir).select(
        F.explode(tokenize(F.col("text"))).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy(F.pmod(F.length("token"), F.lit(1))).orderBy(
        F.col("cnt").desc(), F.col("token").asc()
    )
    return (
        counts.orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(200)
        .withColumn("rank", F.row_number().over(w))
    )


def q_corpus_report(spark, sf_dir):
    """Per-language corpus report: doc counts, token totals, and mean
    quality by lang_id — the daily analytics rollup over the prep
    pipeline's own signals. One projection + one small aggregation."""
    t = F.col("text")
    scored = _docs(spark, sf_dir).select(
        textstats.lang_id(t).alias("lang_guess"),
        textstats.token_count(t).alias("n_tokens"),
        textstats.quality_score(t).alias("quality"),
    )
    # mean over doubles is summation-order-dependent across engines;
    # the exact decimal sum (the events queries' parity pattern) makes
    # it deterministic at any partitioning
    return scored.groupBy("lang_guess").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.round(
            F.sum(F.col("quality").cast("decimal(20,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_quality"),
    )


def q_lang_id(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id", textstats.lang_id(F.col("text")).alias("lang_guess")
    )


def q_doc_fingerprints(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id", textstats.doc_fingerprint(F.col("text")).alias("fp")
    )


# --- ANN --------------------------------------------------------------------


def q_ann_buckets(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    return emb.select(
        "vec_id",
        ann.hyperplane_bucket(
            F.col("embedding"), C.EMB_DIM, C.ANN_PLANES, C.ANN_SEED
        ).alias("bucket"),
    )


def q_ann_lsh_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == C.QUERY_VEC).first()["embedding"]
    ]
    return ann.ann_lsh_topk(emb, qvec, k=C.K_BATCH, n_planes=C.ANN_PLANES, seed=C.ANN_SEED)


def q_ann_multiprobe_topk(spark, sf_dir):
    """Multi-probe sign-LSH ANN: main bucket + the two lowest-margin
    bit-flip buckets (recall without extra shuffles)."""
    emb = _emb(spark, sf_dir)
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == C.QUERY_VEC).first()["embedding"]
    ]
    return ann.ann_lsh_topk(
        emb,
        qvec,
        k=C.K_BATCH,
        n_planes=C.ANN_PLANES,
        seed=C.ANN_SEED,
        n_probe=C.ANN_PROBE,
    )


def q_ivf_topk_batch(spark, sf_dir):
    """Batch IVF probe: one job for the first BATCH_DOCS query vectors,
    per-query probe cells broadcast — the IVF twin of the batch LSH
    probe, answer-identical per query to ivf_topk."""
    emb = _emb(spark, sf_dir)
    qs = emb.filter(F.col("vec_id") < C.BATCH_DOCS).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return ann.ivf_topk_batch(
        emb, qs, k=C.K_BATCH, n_cells=C.IVF_CELLS, n_probe=C.IVF_PROBE,
        seed=C.IVF_SEED,
    )


def q_ann_target_recall_topk(spark, sf_dir):
    """Recall-TARGETED multiprobe ANN: the probe count is chosen per
    query from its plane margins (probe_plan_for_recall's logistic
    flip model) so a neighbor at cos >= ANN_TARGET_COS is found with
    estimated probability >= ANN_TARGET_RECALL — the declarative twin
    of the fixed-n_probe ann_multiprobe_topk."""
    emb = _emb(spark, sf_dir)
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == C.QUERY_VEC).first()["embedding"]
    ]
    return ann.ann_lsh_topk_target_recall(
        emb,
        qvec,
        k=C.K_BATCH,
        n_planes=C.ANN_PLANES,
        seed=C.ANN_SEED,
        target_recall=C.ANN_TARGET_RECALL,
        target_cos=C.ANN_TARGET_COS,
    )


def q_ivf_topk(spark, sf_dir):
    """IVF coarse-quantizer ANN: probe the IVF_PROBE nearest of
    IVF_CELLS seeded-random centroid cells, exact L2 on survivors."""
    emb = _emb(spark, sf_dir)
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == C.QUERY_VEC).first()["embedding"]
    ]
    return ann.ivf_topk(
        emb,
        qvec,
        k=C.K_VEC,
        n_cells=C.IVF_CELLS,
        n_probe=C.IVF_PROBE,
        seed=C.IVF_SEED,
    )


def q_ivf_topk_alpha(spark, sf_dir):
    """Probe-budgeted IVF ANN: the probe set is chosen per query by
    the calibratable distance-ratio rule (every cell within
    (1+IVF_PROBE_ALPHA) of the nearest center) instead of a fixed
    n_probe — the declarative-recall twin of ivf_topk."""
    emb = _emb(spark, sf_dir)
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == C.QUERY_VEC).first()["embedding"]
    ]
    return ann.ivf_topk_alpha(
        emb,
        qvec,
        k=C.K_VEC,
        alpha=C.IVF_PROBE_ALPHA,
        n_cells=C.IVF_CELLS,
        seed=C.IVF_SEED,
    )


# --- result shaping + metrics (A6/A8, P3/J3, T6) ----------------------------


def _batch_lsh_and_truth(spark, sf_dir):
    sigs = _sigs(spark, sf_dir)
    bands = _bands(spark, sf_dir)
    qs = sigs.filter(F.col("doc_id") < C.BATCH_DOCS).select(
        F.col("doc_id").alias("query_id"), "sig"
    )
    pred = lsh.lsh_topk(sigs, bands, qs, C.PARAMS, k=C.K_BATCH, n_queries=C.BATCH_DOCS)
    truth = bruteforce.est_jaccard_topk(sigs, qs, C.PARAMS.num_perm, k=C.K_BATCH)
    return pred, truth


def q_quality_metrics(spark, sf_dir):
    """A6: recall@k / precision@k / MRR of the LSH path against the
    exact est-Jaccard oracle, computed by the engine itself
    (reference ``benchmarks/benchmark_runner.py:71-103``)."""
    pred, truth = _batch_lsh_and_truth(spark, sf_dir)
    m = metrics.quality_metrics(pred, truth, k=C.K_BATCH)
    # round(6): avg() partial-sum order differs between engines.
    return m.select(
        F.round("recall_at_k", 6).alias("recall_at_k"),
        F.round("precision_at_k", 6).alias("precision_at_k"),
        F.round("mrr", 6).alias("mrr"),
        "n_queries",
    )


def q_lsh_topk_preview(spark, sf_dir):
    """J3 + P3: top-k joined back to documents (stable-id join) with
    the reference's 10-element signature preview, serialized as CSV
    text for cross-engine hash stability."""
    sigs = _sigs(spark, sf_dir)
    bands = _bands(spark, sf_dir)
    qs = sigs.filter(F.col("doc_id") == C.QUERY_DOC).select(
        F.col("doc_id").alias("query_id"), "sig"
    )
    top = lsh.lsh_topk(sigs, bands, qs, C.PARAMS, k=C.K_DOC, n_queries=1)
    prev = lsh.with_preview(top, sigs, n=10).select(
        "query_id",
        "doc_id",
        "score",
        "rank",
        F.concat_ws(",", F.transform("vector_preview", lambda v: v.cast("string"))).alias(
            "preview"
        ),
    )
    docs = _docs(spark, sf_dir).select("doc_id", "n_chars")
    return prev.join(docs, "doc_id")


def q_padded_topk(spark, sf_dir):
    """T6: fixed-width result padding with sentinel -1 (reference
    ``app/src/minhash_lsh.py:128-133``), exploded to scalar rows."""
    sigs = _sigs(spark, sf_dir)
    bands = _bands(spark, sf_dir)
    qs = sigs.filter(F.col("doc_id") == C.QUERY_DOC).select(
        F.col("doc_id").alias("query_id"), "sig"
    )
    top = lsh.lsh_topk(sigs, bands, qs, C.PARAMS, k=C.K_DOC, n_queries=1)
    ids = top.groupBy("query_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("rank", "doc_id"))),
            lambda s: s["doc_id"],
        ).alias("ids")
    )
    padded = ids.select(
        "query_id",
        F.slice(
            F.concat("ids", F.array_repeat(F.lit(-1).cast("bigint"), C.K_DOC)),
            1,
            C.K_DOC,
        ).alias("padded"),
    )
    return padded.select(
        "query_id", F.posexplode("padded").alias("pos", "doc_id")
    ).withColumn("pos", F.col("pos") + 1)


def q_sig_stats(spark, sf_dir):
    """A8: per-signature summary stats (reference shard inspection,
    ``app/src/index_builder.py:41-49``)."""
    return _sigs(spark, sf_dir).select(
        "doc_id",
        F.array_min("sig").alias("sig_min"),
        F.array_max("sig").alias("sig_max"),
        F.element_at("sig", 1).alias("sig_first"),
        F.element_at("sig", C.PARAMS.num_perm).alias("sig_last"),
    )


# --- relational / events (engine generality) --------------------------------


def q_events_hourly(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )


def q_lineitem_pricing(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") < F.lit("2000-01-01").cast("timestamp")
    )
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount")))
        .cast("double")
        .alias("sum_disc_price"),
        F.count(F.lit(1)).alias("count_order"),
    )


def q_top_customers_per_nation(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    top = cust.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)
    return top.join(F.broadcast(nation), top.c_nationkey == nation.n_nationkey).select(
        "n_name", "c_custkey", "c_acctbal", "rn"
    )


def q_orders_by_region(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy("r_name").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias(
            "total_value"
        ),
    )


def q_tpch_q5(spark, sf_dir):
    """TPC-H Q5-shaped local-supplier-volume query: 6-table join with
    the customer-and-supplier-same-nation constraint. The two
    dimension tables broadcast; the orders date filter and region
    filter push to the scans, so the only shuffles are the three
    fact-side equi-joins and the final 25-group aggregate."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    joined = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy("n_name").agg(
        F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount")))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q_tpch_q3(spark, sf_dir):
    """TPC-H Q3-shaped shipping-priority query: 3-way join + grouped
    revenue + deterministic top-10. Exercises broadcast vs shuffle join
    selection and decimal-exact aggregation ordering."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
    )
    grouped = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))).alias(
            "__rev"
        )
    )
    return (
        grouped.orderBy(F.col("__rev").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select(
            "l_orderkey",
            F.col("__rev").cast("double").alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


def q_events_sessions(spark, sf_dir):
    """Session-window aggregation (SURVEY §2.9 / §7 M6): the streaming
    ``user_session_stats`` operator run on batch input — 30-minute-gap
    sessions per user. An event at exactly ``prev_ts + gap`` merges
    into the open session (Spark ``session_window`` semantics); the
    DuckDB oracle replicates that with a gaps-and-islands window."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.streaming import (
        queries as SQ,
    )

    return SQ.user_session_stats(load_table(spark, sf_dir, "events"))


def q_events_sliding(spark, sf_dir):
    """Sliding-window event rate (1 hour window, 15 minute slide): every
    event lands in exactly 4 windows; window starts are epoch-aligned
    15-minute boundaries (UTC session timezone)."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.streaming import (
        queries as SQ,
    )

    return SQ.sliding_event_rate(load_table(spark, sf_dir, "events"))


def q_events_window_scan(spark, sf_dir):
    """Pushdown-friendly scan: time-range + type predicates and a
    narrow projection, for Parquet filter/column pruning."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        (F.col("event_type") == "click")
        & (F.col("ts") >= F.lit("2024-01-02 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-03 00:00:00").cast("timestamp"))
    ).select("event_id", "ts", "user_id", "value")


# --- rows-only entries (no SQL-expressible oracle) --------------------------


def q_synthetic_docs(spark, sf_dir):
    """S11 seeded generator — engine-specific RNG, rows-only check."""
    return synthetic_documents(spark, n_docs=1000, seed=42)


def q_ref61_signatures(spark, sf_dir):
    """Bit-compat reference hash family (SURVEY §1.3 option 3): SHA1
    fingerprints + affine perms over p=2^61-1 with the reference's
    int64-wrap arithmetic, as an Arrow-batched pandas UDF. DuckDB has
    no sha1, so this is a rows-only entry; bit-exactness is asserted
    against an independent big-int recomputation in
    tests/test_refparity.py."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import (
        refparity,
    )

    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 500)
    return refparity.reference_signatures_long(docs, C.PARAMS)


def q_media_embedding_topk(spark, sf_dir):
    """Multimodal -> similarity-search bridge: feature vectors
    Arrow-extracted from binary media payloads flow straight into the
    engine's exact cosine top-k — the embed-then-search pattern a
    multimodal training pipeline runs. The embedding is the integer
    byte vector (cosine is scale-invariant, and integer components
    keep the fold bit-exact against the oracle); at corpus scale the
    same column feeds the hyperplane/IVF ANN path unchanged."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.multimodal import media as MM

    feats = MM.extract_features(MM.synthetic_media(spark, n=200))
    emb = feats.select(
        F.col("media_id").alias("vec_id"),
        F.transform(
            "features",
            lambda x: F.round(x.cast("double") * 255).cast("int").cast("double"),
        ).alias("embedding"),
    )
    qs = emb.filter(F.col("vec_id") == C.QUERY_VEC).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return bruteforce.cosine_topk(emb, qs, k=C.K_BATCH)


def q_media_features(spark, sf_dir):
    """Multimodal plumbing end-to-end: binary media columns -> Arrow-
    batched mapInPandas feature extraction. The float32 features are
    projected back to their exact byte values (k/255 * 255 -> k) so
    the md5-derived stub encoder is oracle-checkable bit-for-bit."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.multimodal import media as MM

    feats = MM.extract_features(MM.synthetic_media(spark, n=200))
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        # ARRAY<INT> breaks the driver's pandas canonicalizer (lists are
        # unhashable), so emit the byte vector as a CSV string — same
        # convention as the hex/preview columns.
        F.concat_ws(
            ",",
            F.transform(
                "features",
                lambda x: F.round(x.cast("double") * 255).cast("int").cast("string"),
            ),
        ).alias("features_u8"),
    )


def q_media_frames(spark, sf_dir):
    """Video frame sampling via mapInPandas: one row per sampled frame,
    payload slices hex-encoded for the cross-engine value contract."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.multimodal import media as MM

    frames = MM.sample_frames(MM.synthetic_media(spark, n=200), every_ms=1000)
    return frames.select(
        "media_id",
        "frame_idx",
        F.lower(F.hex("frame_payload")).alias("frame_hex"),
    )


def q_repetition_stats(spark, sf_dir):
    """Gopher-style repetition metrics per document: top-bigram token
    coverage, duplicate-trigram occurrence fraction, and the integer-
    exact keep decision (contract REP_* thresholds). All row-local
    higher-order-function work — shuffle-free, whole-stage codegen'd,
    no explode."""
    docs = _docs(spark, sf_dir)
    toks = tokenize(F.col("text"))
    bigrams = textstats.word_ngram_multiset(toks, 2)
    trigrams = textstats.word_ngram_multiset(toks, 3)
    base = docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        textstats.top_ngram_count(bigrams).alias("top_bigram_count"),
        F.size(trigrams).alias("n_trigrams"),
        textstats.dup_ngram_occurrences(trigrams).alias("dup_trigram_occ"),
    )
    return base.select(
        "doc_id",
        "n_tokens",
        "top_bigram_count",
        F.when(
            F.col("n_tokens") > 0,
            F.least(
                F.lit(1.0),
                (2.0 * F.col("top_bigram_count")) / F.col("n_tokens"),
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
        "dup_trigram_occ",
        F.when(
            F.col("n_trigrams") > 0,
            F.col("dup_trigram_occ") / F.col("n_trigrams"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_trigram_frac"),
        (
            (F.lit(C.REP_TOP_BIGRAM_X) * F.col("top_bigram_count") <= F.col("n_tokens"))
            & (
                F.lit(C.REP_DUP_TRIGRAM_X) * F.col("dup_trigram_occ")
                <= F.col("n_trigrams")
            )
        ).alias("keep"),
    )


def q_shared_ngram_spans(spark, sf_dir):
    """Substring-level contamination pairs: documents sharing exact
    word 8-grams (frequency-capped), with shared-span counts."""
    return dedup.shared_ngram_spans(
        _docs(spark, sf_dir),
        n=C.SPAN_NGRAM,
        max_doc_freq=C.SPAN_MAX_DOC_FREQ,
        min_shared=C.SPAN_MIN_SHARED,
    )


def q_incremental_dedup(spark, sf_dir):
    """Incremental ingest dedup: every 10th doc is the 'new batch',
    the rest are 'history'. The batch additionally carries planted
    normalized-equal copies of every 7th history doc (id-offset,
    upper-cased + padded) so the history anti-join provably removes
    rows, plus the plant pattern guarantees a within-batch collision
    when a history doc index is divisible by both 7 and 10's
    complement. Bloom prefilter ON — the filter is a cost lever, so
    the oracle-checked result must be identical with it enabled."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions import bloom

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    history = docs.filter(F.col("doc_id") % C.INC_BATCH_MOD != 0)
    batch_native = docs.filter(F.col("doc_id") % C.INC_BATCH_MOD == 0)
    planted = history.filter(F.col("doc_id") % C.INC_PLANT_MOD == 0).select(
        (F.col("doc_id") + F.lit(C.INC_PLANT_OFFSET)).alias("doc_id"),
        F.concat(F.upper(F.col("text")), F.lit("  ")).alias("text"),
    )
    batch = batch_native.unionByName(planted)
    # one normalize+hash pass over history: the bloom build AND the
    # anti join both consume these 8-byte hashes (Spark replans
    # self-referenced subtrees), and the sizing count rides the same
    # materialized rows instead of a third scan
    hist_hashes = materialize(
        history.select(
            portable_hash64(dedup.normalize_text(F.col("text"))).alias(
                "content_hash"
            )
        )
    )
    n_bits, n_hashes = bloom.optimal_params(
        max(1, hist_hashes.count()), C.INC_BLOOM_FP
    )
    bits = bloom.build_bloom(hist_hashes, "content_hash", n_bits, n_hashes)
    return dedup.incremental_exact_dedup(
        batch, hist_hashes, bloom_bits=bits, bloom_hashes=n_hashes
    )


def q_token_entropy(spark, sf_dir):
    """Per-doc Shannon entropy of the token distribution plus the
    normalized form entropy/ln(n) in [0,1] — low values flag
    boilerplate/keyword-stuffing docs whose repetition shape the
    distinct-token ratio misses. Row-local HOF work, shuffle-free."""
    toks = tokenize(F.col("text"))
    ent = textstats.token_entropy(toks)
    n = F.size(toks)
    return _docs(spark, sf_dir).select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(ent, 6).alias("entropy"),
        F.when(n > 1, F.round(ent / F.log(n.cast("double")), 6))
        .otherwise(F.lit(0.0))
        .alias("entropy_norm"),
    )


def q_lm_quality(spark, sf_dir):
    """CCNet-style LM quality scores: per-doc average negative
    log-likelihood under the corpus-trained unigram model."""
    return prep.unigram_lm_scores(_docs(spark, sf_dir))


def q_pq_codes(spark, sf_dir):
    """PQ encoding: every embedding compressed to PQ_M per-subspace
    argmin codes against the seeded codebooks — the 64x-smaller index
    artifact ADC search scans. Row-local, shuffle-free."""
    books = ann.random_codebooks(C.EMB_DIM, C.PQ_M, C.PQ_CODES, C.PQ_SEED)
    return ann.pq_encode(_emb(spark, sf_dir), books)


def q_pq_topk(spark, sf_dir):
    """PQ ADC search for the fixture query vector: m table lookups per
    corpus vector instead of a 64-dim distance."""
    emb = _emb(spark, sf_dir)
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == C.QUERY_VEC).first()["embedding"]
    ]
    return ann.pq_topk(
        emb, qvec, k=C.K_VEC, m=C.PQ_M, n_codes=C.PQ_CODES, seed=C.PQ_SEED
    )


def q_pq_topk_rerank(spark, sf_dir):
    """PQ serving architecture: ADC shortlist over the codes, exact L2
    rerank of the shortlist — recall set by shortlist size, not ADC
    distortion."""
    emb = _emb(spark, sf_dir)
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == C.QUERY_VEC).first()["embedding"]
    ]
    return ann.pq_topk_rerank(
        emb, qvec, k=C.K_VEC, shortlist=C.PQ_SHORTLIST,
        m=C.PQ_M, n_codes=C.PQ_CODES, seed=C.PQ_SEED,
    )


def q_opq_codes(spark, sf_dir):
    """OPQ encoding (Ge et al.): each embedding rotated by the
    offline-trained orthonormal R (one materialized projection — the
    code argmins reference it m x n_codes times), then PQ-encoded
    against the rotated-space codebooks. Row-local, shuffle-free, same
    single-pass shape as q_pq_codes."""
    r_cols, books = opq.opq_train_offline()
    return opq.opq_encode(_emb(spark, sf_dir), r_cols, books)


def q_opq_topk(spark, sf_dir):
    """OPQ ADC search for the fixture query vector: the query is
    rotated driver-side with the identical fold, then the plain m-
    lookup ADC scan runs in the rotated space."""
    emb = _emb(spark, sf_dir)
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == C.QUERY_VEC).first()["embedding"]
    ]
    return opq.opq_topk(emb, qvec, k=C.K_VEC)


def q_opq_topk_rerank(spark, sf_dir):
    """OPQ serving architecture: rotated-space ADC shortlist, exact L2
    rerank against the ORIGINAL vectors (orthonormal R preserves L2,
    so no back-rotation is needed)."""
    emb = _emb(spark, sf_dir)
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == C.QUERY_VEC).first()["embedding"]
    ]
    return opq.opq_topk_rerank(emb, qvec, k=C.K_VEC, shortlist=C.PQ_SHORTLIST)


def q_ivfopq_codes(spark, sf_dir):
    """IVF-OPQ index artifact — the full FAISS ``OPQ,IVF,PQ`` factory
    string: offline-trained rotation (materialized once per row), then
    the seeded coarse-cell assignment + residual PQ encode, all in the
    rotated space. Row-local, shuffle-free; persists partitioned by
    cell at scale."""
    r_cols, _ = opq.opq_train_offline()
    cents = ann.random_centroids(C.EMB_DIM, C.IVF_CELLS, C.IVF_SEED)
    books = ann.random_codebooks(C.EMB_DIM, C.PQ_M, C.PQ_CODES, C.PQ_SEED)
    return opq.ivfopq_encode(_emb(spark, sf_dir), r_cols, cents, books)


def q_ivfopq_topk(spark, sf_dir):
    """IVF-OPQ ADC search: the query rotated driver-side with the
    identical fold, then the plain probe + residual-LUT scan in the
    rotated space (orthonormal R preserves L2, so the probed cells
    cover the same metric balls)."""
    emb = _emb(spark, sf_dir)
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == C.QUERY_VEC).first()["embedding"]
    ]
    return opq.ivfopq_topk(
        emb, qvec, k=C.K_VEC,
        n_cells=C.IVF_CELLS, n_probe=C.IVF_PROBE,
        m=C.PQ_M, n_codes=C.PQ_CODES,
        cell_seed=C.IVF_SEED, code_seed=C.PQ_SEED,
    )


def q_ivfopq_topk_rerank(spark, sf_dir):
    """IVF-OPQ with exact rerank: rotated-space ADC shortlist from the
    probed cells, true L2 in the ORIGINAL space over the fetched
    shortlist vectors."""
    emb = _emb(spark, sf_dir)
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == C.QUERY_VEC).first()["embedding"]
    ]
    cents = ann.random_centroids(C.EMB_DIM, C.IVF_CELLS, C.IVF_SEED)
    books = ann.random_codebooks(C.EMB_DIM, C.PQ_M, C.PQ_CODES, C.PQ_SEED)
    return opq.ivfopq_topk_rerank(
        emb, qvec, k=C.K_VEC, shortlist=C.PQ_SHORTLIST, n_probe=C.IVF_PROBE,
        centroids=cents, codebooks=books,
    )


def q_ivfopq_topk_batch(spark, sf_dir):
    """Batch IVF-OPQ ADC: the first BATCH_DOCS query vectors rotated
    driver-side (the batch kernel collects them anyway), then ONE
    probe job over the rotated codes — answer-identical per query to
    ivfopq_topk."""
    emb = _emb(spark, sf_dir)
    qs = emb.filter(F.col("vec_id") < C.BATCH_DOCS).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return opq.ivfopq_topk_batch(
        emb, qs, k=C.K_BATCH, n_probe=C.IVF_PROBE,
        n_cells=C.IVF_CELLS, m=C.PQ_M, n_codes=C.PQ_CODES,
        cell_seed=C.IVF_SEED, code_seed=C.PQ_SEED,
    )


def q_opq_topk_store(spark, sf_dir):
    """OPQ ADC search answered from the PERSISTED codes store (codes +
    rotation + codebooks in the sidecar): answer-identical to opq_topk
    over the source table, so the oracle is the same SQL — the store
    twin proves the artifact round-trip inside the driver gate, the
    pattern bm25_topk_store set for the lexical index."""
    import os as _os

    from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources import tables as T

    store = _os.path.join(
        "/tmp",
        "fshdi_opq_store_" + _os.path.basename(sf_dir.rstrip("/")),
    )
    emb = _emb(spark, sf_dir)
    r_cols, books = opq.opq_train_offline()
    T.write_opq_index(emb, store, r_cols, books)
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == C.QUERY_VEC).first()["embedding"]
    ]
    return opq.opq_topk_store(spark, store, qvec, k=C.K_VEC)


def q_ivfopq_topk_store(spark, sf_dir):
    """IVF-OPQ ADC search answered from the PERSISTED cell-partitioned
    store (rotation + coarse centroids + codebooks all pinned in the
    sidecar; probe-time ``cell IN (...)`` prunes cell DIRECTORIES):
    answer-identical to ivfopq_topk over the source table, so the
    oracle is the same SQL — the full ``OPQ,IVF,PQ`` artifact
    round-trip proven inside the driver gate."""
    import os as _os

    from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources import tables as T

    store = _os.path.join(
        "/tmp",
        "fshdi_ivfopq_store_" + _os.path.basename(sf_dir.rstrip("/")),
    )
    emb = _emb(spark, sf_dir)
    r_cols, _ = opq.opq_train_offline()
    cents = ann.random_centroids(C.EMB_DIM, C.IVF_CELLS, C.IVF_SEED)
    books = ann.random_codebooks(C.EMB_DIM, C.PQ_M, C.PQ_CODES, C.PQ_SEED)
    T.write_ivfopq_index(emb, store, r_cols, cents, books)
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == C.QUERY_VEC).first()["embedding"]
    ]
    return opq.ivfopq_topk_store(
        spark, store, qvec, k=C.K_VEC, n_probe=C.IVF_PROBE
    )


def q_sq_codes(spark, sf_dir):
    """SQ8 encoding: per-dim [min,max] trained in one shuffle-free agg
    pass, then every embedding compressed to dim byte codes — the
    4x-smaller artifact ADC search scans. Unlike PQ the reconstruction
    error is per-dim rounding, so it stays accurate on unclustered
    corpora (FAISS IndexScalarQuantizer analog, SURVEY §2.3 J4)."""
    emb = _emb(spark, sf_dir)
    mins, maxs = ann.sq_train(emb, C.EMB_DIM)
    return ann.sq_encode(emb, mins, maxs, C.SQ_LEVELS)


def q_sq_topk(spark, sf_dir):
    """SQ8 ADC search for the fixture query vector: dim multiply-adds
    against the reconstruction, never touching the float vectors."""
    emb = _emb(spark, sf_dir)
    mins, maxs = ann.sq_train(emb, C.EMB_DIM)
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == C.QUERY_VEC).first()["embedding"]
    ]
    return ann.sq_topk(emb, qvec, mins, maxs, k=C.K_VEC, levels=C.SQ_LEVELS)


def q_sq_topk_rerank(spark, sf_dir):
    """SQ8 serving path: ADC shortlist over the byte codes, exact L2
    rerank of the fetched shortlist rows."""
    emb = _emb(spark, sf_dir)
    mins, maxs = ann.sq_train(emb, C.EMB_DIM)
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == C.QUERY_VEC).first()["embedding"]
    ]
    return ann.sq_topk_rerank(
        emb, qvec, mins, maxs,
        k=C.K_VEC, shortlist=C.SQ_SHORTLIST, levels=C.SQ_LEVELS,
    )


def q_events_asof(spark, sf_dir):
    """As-of join: every click enriched with the latest prior view by
    the same user within 30 minutes — one shuffle + sort on user_id
    (operators/temporal.py), never a range-join blowup. The DuckDB
    oracle runs its NATIVE ASOF LEFT JOIN: two independent
    implementations of the semantics cross-validated."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import temporal

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "ts", "user_id", "value"
    )
    j = temporal.asof_join(
        clicks, views, on="user_id", ts_col="ts",
        tolerance_us=C.ASOF_TOLERANCE_US, tiebreak_col="event_id",
    )
    m = F.col("_match")
    return j.select(
        "event_id",
        "user_id",
        F.col("value").alias("click_value"),
        F.coalesce(m["event_id"], F.lit(-1)).alias("view_event_id"),
        F.coalesce(m["value"], F.lit(0.0)).alias("view_value"),
        F.coalesce(
            F.unix_micros(F.col("ts")) - F.unix_micros(m["ts"]), F.lit(-1)
        ).alias("lag_us"),
    )


def q_hll_cardinality(spark, sf_dir):
    """Per-source distinct-bigram cardinality: exact count beside the
    HyperLogLog estimate (Flajolet et al. 2007). The sketch state is
    2^HLL_P max-rank registers per source regardless of corpus size —
    the distinct-count member of the sketch family (Bloom membership,
    CMS frequency). Integer-exact registers + harmonic sum, so the
    DuckDB oracle reproduces the estimate bit-for-bit; the exact
    column (affordable on the fixture) makes the ~1.04/sqrt(m) error
    visible and honest."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions import hll

    grams = _docs(spark, sf_dir).select(
        "source",
        F.explode(
            textstats.word_ngram_multiset(tokenize(F.col("text")), 2)
        ).alias("gram"),
    )
    regs = hll.hll_registers(grams, "gram", ["source"], p=C.HLL_P)
    est = hll.hll_estimate(regs, ["source"], p=C.HLL_P)
    exact = grams.groupBy("source").agg(
        F.countDistinct("gram").alias("n_exact")
    )
    return exact.join(est, "source").select(
        "source", "n_exact", "hll_est", "registers_used"
    )


def q_gopher_rules(spark, sf_dir):
    """Gopher quality-rule bundle (Rae et al. 2021 §A1.1) over a
    corpus with planted violations (the synthetic text breaks none of
    the symbol/bullet/ellipsis/alpha rules naturally): every 6th doc
    gets symbol words, every 9th a bullet prefix, every 11th an
    ellipsis ending, every 7th a run of numeric words. Word-count and
    stopword rules fire naturally at the fixture-tuned bounds."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    did = F.col("doc_id")
    t = F.col("text")
    t = F.when(did % C.GR_BULLET_EVERY == 0, F.concat(F.lit("- "), t)).otherwise(t)
    t = F.when(
        did % C.GR_SYMBOL_EVERY == 0,
        F.concat(t, F.lit(" " + C.GR_SYMBOL_PLANT)),
    ).otherwise(t)
    t = F.when(
        did % C.GR_NONALPHA_EVERY == 0,
        F.concat(t, F.lit(" " + C.GR_NONALPHA_PLANT)),
    ).otherwise(t)
    t = F.when(
        did % C.GR_ELLIPSIS_EVERY == 0,
        F.concat(t, F.lit(" " + C.GR_ELLIPSIS_PLANT)),
    ).otherwise(t)
    planted = docs.select("doc_id", t.alias("text"))
    return prep.gopher_rules(
        planted,
        min_words=C.GR_MIN_WORDS,
        max_words=C.GR_MAX_WORDS,
        mean_len_lo=C.GR_MEAN_LEN_LO,
        mean_len_hi=C.GR_MEAN_LEN_HI,
        symbol_x=C.GR_SYMBOL_X,
        bullet_num=C.GR_BULLET_NUM,
        bullet_den=C.GR_BULLET_DEN,
        ellipsis_num=C.GR_ELLIPSIS_NUM,
        ellipsis_den=C.GR_ELLIPSIS_DEN,
        alpha_num=C.GR_ALPHA_NUM,
        alpha_den=C.GR_ALPHA_DEN,
        min_stopwords=C.GR_MIN_STOPWORDS,
        stopwords=C.GOPHER_STOPWORDS,
    )


def q_cms_heavy_hitters(spark, sf_dir):
    """Heavy-hitter bigrams via a Count-Min sketch (Cormode &
    Muthukrishnan): build the d x w sketch over the bigram occurrence
    stream, estimate every distinct bigram from its min bucket, report
    those with est >= CMS_MIN_COUNT next to the exact count.

    The sketch state is d*w cells regardless of corpus size — the
    bounded-memory path for key spaces (n-grams, URLs) whose exact
    aggregation state is unbounded at 100 TB. The exact count column
    (affordable on the fixture) makes the one-sided error VISIBLE:
    est >= true_cnt always, strict for collision victims. Forced here
    by w=256 against ~900 distinct bigrams."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions import cms

    grams = _docs(spark, sf_dir).select(
        F.explode(
            textstats.word_ngram_multiset(tokenize(F.col("text")), 2)
        ).alias("gram")
    )
    sketch = cms.cms_build(grams, "gram", C.CMS_D, C.CMS_W)
    truth = grams.groupBy("gram").agg(F.count("*").alias("true_cnt"))
    est = cms.cms_estimate(
        truth.select("gram"), sketch, "gram", C.CMS_D, C.CMS_W
    )
    return (
        est.join(truth, "gram")
        .filter(F.col("est") >= C.CMS_MIN_COUNT)
        .select("gram", "est", "true_cnt")
    )


def q_ivfpq_codes(spark, sf_dir):
    """IVF-PQ index artifact (FAISS IndexIVFPQ layout): nearest coarse
    cell + PQ codes of the RESIDUAL, row-local and shuffle-free; at
    scale this persists partitioned by cell, 4 B + m bytes/vector."""
    cents = ann.random_centroids(C.EMB_DIM, C.IVF_CELLS, C.IVF_SEED)
    books = ann.random_codebooks(C.EMB_DIM, C.PQ_M, C.PQ_CODES, C.PQ_SEED)
    return ann.ivfpq_encode(_emb(spark, sf_dir), cents, books)


def q_ivfpq_topk(spark, sf_dir):
    """IVF-PQ ADC search: probe the IVF_PROBE nearest cells, score
    codes with that cell's residual lookup table — the billion-scale
    serving architecture (cells prune the scan, codes shrink memory,
    residual encoding keeps shared codebooks accurate)."""
    emb = _emb(spark, sf_dir)
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == C.QUERY_VEC).first()["embedding"]
    ]
    return ann.ivfpq_topk(
        emb, qvec, k=C.K_VEC,
        n_cells=C.IVF_CELLS, n_probe=C.IVF_PROBE,
        m=C.PQ_M, n_codes=C.PQ_CODES,
        cell_seed=C.IVF_SEED, code_seed=C.PQ_SEED,
    )


def q_ivfpq_topk_rerank(spark, sf_dir):
    """IVF-PQ with exact rerank: ADC shortlist from the probed cells,
    true L2 over the fetched shortlist vectors."""
    emb = _emb(spark, sf_dir)
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == C.QUERY_VEC).first()["embedding"]
    ]
    cents = ann.random_centroids(C.EMB_DIM, C.IVF_CELLS, C.IVF_SEED)
    books = ann.random_codebooks(C.EMB_DIM, C.PQ_M, C.PQ_CODES, C.PQ_SEED)
    return ann.ivfpq_topk_rerank(
        emb, qvec, k=C.K_VEC, shortlist=C.SQ_SHORTLIST, n_probe=C.IVF_PROBE,
        centroids=cents, codebooks=books,
    )


def q_ivfpq_topk_batch(spark, sf_dir):
    """Batch IVF-PQ ADC: one job for the first BATCH_DOCS query
    vectors — per-query probe cells + residual LUTs built driver-side,
    broadcast into the codes join, Arrow kernel scores each candidate
    with its (query, cell) LUT. Answer-identical per query to
    ivfpq_topk."""
    emb = _emb(spark, sf_dir)
    qs = emb.filter(F.col("vec_id") < C.BATCH_DOCS).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return ann.ivfpq_topk_batch(
        emb, qs, k=C.K_BATCH, n_probe=C.IVF_PROBE,
        n_cells=C.IVF_CELLS, m=C.PQ_M, n_codes=C.PQ_CODES,
        cell_seed=C.IVF_SEED, code_seed=C.PQ_SEED,
    )


def q_ivfpq_topk_batch_rerank(spark, sf_dir):
    """Batch IVF-PQ serving tier: per-query ADC shortlists from one
    probe job, one exact-L2 rerank join — the whole query set in two
    shuffles."""
    emb = _emb(spark, sf_dir)
    qs = emb.filter(F.col("vec_id") < C.BATCH_DOCS).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cents = ann.random_centroids(C.EMB_DIM, C.IVF_CELLS, C.IVF_SEED)
    books = ann.random_codebooks(C.EMB_DIM, C.PQ_M, C.PQ_CODES, C.PQ_SEED)
    return ann.ivfpq_topk_batch_rerank(
        emb, qs, k=C.K_BATCH, shortlist=C.SQ_SHORTLIST, n_probe=C.IVF_PROBE,
        centroids=cents, codebooks=books,
    )


def q_ivfpq_topk_alpha(spark, sf_dir):
    """Probe-BUDGETED IVF-PQ: probe every cell whose center distance is
    within (1 + IVF_PROBE_ALPHA) of the nearest center's — the
    calibrated declarative recall knob, on the compressed index."""
    emb = _emb(spark, sf_dir)
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == C.QUERY_VEC).first()["embedding"]
    ]
    return ann.ivfpq_topk(
        emb, qvec, k=C.K_VEC,
        n_cells=C.IVF_CELLS, m=C.PQ_M, n_codes=C.PQ_CODES,
        cell_seed=C.IVF_SEED, code_seed=C.PQ_SEED,
        alpha=C.IVF_PROBE_ALPHA,
    )


def q_curated_ivfpq_index(spark, sf_dir):
    """Curate-then-index flagship: D4 semantic curation (SemDeDup →
    prototypicality, shared quantizer) feeds the IVF-PQ serving encode
    — 'clean the corpus, build the billion-scale index' as ONE
    oracle-checked plan. The curation stage and the index share the
    seeded coarse cells, so cluster-once carries all the way into the
    persisted artifact."""
    emb = _emb(spark, sf_dir)
    cents = ann.random_centroids(C.EMB_DIM, C.IVF_CELLS, C.IVF_SEED)
    books = ann.random_codebooks(C.EMB_DIM, C.PQ_M, C.PQ_CODES, C.PQ_SEED)
    kept = dedup.semantic_curation(
        emb, centroids=cents,
        threshold=C.SEM_THRESHOLD, drop_frac=C.PROTO_DROP_FRAC,
    ).select("vec_id")
    curated = emb.join(kept, "vec_id", "left_semi")
    return ann.ivfpq_encode(curated, cents, books)


def q_ngram_decontaminate(spark, sf_dir):
    """GPT-3-style n-gram benchmark decontamination: train = the %17
    train split plus planted pages EMBEDDING every 3rd benchmark doc
    (prefix + text + suffix — the partial-containment case whole-doc
    MinHash dilutes); benchmark = the %17 holdout."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    planted = bench.filter(F.col("doc_id") % C.NGRAM_DECON_PLANT_EVERY == 0).select(
        (F.col("doc_id") + F.lit(C.NGRAM_DECON_OFFSET)).alias("doc_id"),
        F.concat(
            F.lit("page header text "), F.col("text"), F.lit(" page footer")
        ).alias("text"),
    )
    train = docs.filter(F.col("doc_id") % 17 != 0).unionByName(planted)
    return dedup.cross_corpus_ngram_hits(
        train, bench, n=C.NGRAM_DECON_N, min_hits=1
    )


def q_mine_triplets(spark, sf_dir):
    """Contrastive training triplets: shared-span pairs as positives,
    hash-bucket-sampled negatives (deterministic, one equi-join)."""
    docs = _docs(spark, sf_dir)
    positives = dedup.shared_ngram_spans(
        docs, n=C.SPAN_NGRAM, max_doc_freq=C.SPAN_MAX_DOC_FREQ,
        min_shared=C.SPAN_MIN_SHARED,
    )
    return prep.mine_triplets(
        positives, docs,
        n_negatives=C.TRIPLET_NEGATIVES, seed=C.TRIPLET_SEED,
    )


def q_mixture_weighted(spark, sf_dir):
    """Target-ratio mixture over languages: token masses steered to
    the MIX_WEIGHTS per-mille spec without upsampling any group."""
    return prep.weighted_mixture_sample(
        _docs(spark, sf_dir), weights=C.MIX_WEIGHTS, group_col="lang",
        seed=C.MIX_SEED, scale=C.MIX_SCALE,
    )


def q_snapshot_diff(spark, sf_dir):
    """Re-crawl audit: old = the corpus; new = the corpus with every
    13th doc dropped, every 9th rewritten (case/padding change the
    normalized hash ignores is NOT enough — a real edit is planted),
    and id-shifted copies of every 25th doc added."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    new = (
        docs.filter(F.col("doc_id") % C.DIFF_DROP != 0)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % C.DIFF_EDIT == 0,
                F.concat(F.lit("edited "), F.col("text")),
            ).otherwise(F.col("text")),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % C.DIFF_ADD_EVERY == 0).select(
                (F.col("doc_id") + F.lit(C.DIFF_ADD_OFFSET)).alias("doc_id"),
                "text",
            )
        )
    )
    return prep.snapshot_diff(docs, new)


def q_chunk_documents(spark, sf_dir):
    """Sliding-window chunking: 64-token windows every 48 tokens
    (16-token overlap) — row-local transform + posexplode,
    shuffle-free."""
    return prep.chunk_documents(
        _docs(spark, sf_dir), window=C.CHUNK_WINDOW, stride=C.CHUNK_STRIDE
    )


def q_quality_report(spark, sf_dir):
    """Per-doc quality dashboard: every scoring signal the pipeline
    computes, in one table, with the combined keep decision — the
    heuristic score (corpus_clean's >= 0.5 rule, bit-exact across
    engines) AND the integer-exact Gopher repetition thresholds. The
    heuristic/entropy/repetition columns are ONE shuffle-free scan
    (row-local HOFs); the LM score joins on doc_id."""
    docs = _docs(spark, sf_dir)
    t = F.col("text")
    toks = tokenize(t)
    trigrams = textstats.word_ngram_multiset(toks, 3)
    local = docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        textstats.quality_score(t).alias("quality"),
        F.round(textstats.token_entropy(toks), 6).alias("entropy"),
        textstats.top_ngram_count(textstats.word_ngram_multiset(toks, 2)).alias(
            "top_bigram_count"
        ),
        F.size(trigrams).alias("n_trigrams"),
        textstats.dup_ngram_occurrences(trigrams).alias("dup_trigram_occ"),
    )
    lm = prep.unigram_lm_scores(docs).select("doc_id", "lm_nll")
    return local.join(lm, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.round("quality", 6).alias("quality"),
        "entropy",
        "lm_nll",
        (
            (F.col("quality") >= 0.5)
            & (
                F.lit(C.REP_TOP_BIGRAM_X) * F.col("top_bigram_count")
                <= F.col("n_tokens")
            )
            & (
                F.lit(C.REP_DUP_TRIGRAM_X) * F.col("dup_trigram_occ")
                <= F.col("n_trigrams")
            )
        ).alias("keep"),
    )


def q_bpe_pair_counts(spark, sf_dir):
    """Top 200 BPE symbol-pair frequencies over the initial char
    vocabulary (the statistic the first merge maximizes) — one corpus
    pass to vocab-bounded word counts, then row-local pair expansion.
    Deterministic order: (cnt desc, left asc, right asc)."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import bpe

    wc = bpe.word_counts(_docs(spark, sf_dir))
    pc = bpe.pair_counts(wc)
    # orderBy+limit first so the global sort is a TakeOrderedAndProject
    # (per-partition top-200, never a full sort); the constant-partition
    # rank window then runs over exactly 200 rows by construction — the
    # window's re-sort is deliberate, not load-bearing at scale.
    w = Window.partitionBy(F.pmod(F.length("left"), F.lit(1))).orderBy(
        F.col("cnt").desc(), F.col("left").asc(), F.col("right").asc()
    )
    return (
        pc.orderBy(F.col("cnt").desc(), F.col("left").asc(), F.col("right").asc())
        .limit(200)
        .withColumn("rank", F.row_number().over(w))
    )


def q_lm_quality_bands(spark, sf_dir):
    """CCNet head/middle/tail banding over the unigram-LM scores —
    exact-percentile cutoffs, bit-identical across engines."""
    return prep.lm_quality_bands(_docs(spark, sf_dir))


def q_mixture_sample(spark, sf_dir):
    """Balanced data-mixing sample: every source deterministically
    downsampled toward the smallest source's token mass."""
    return prep.balanced_mixture_sample(
        _docs(spark, sf_dir),
        group_col="source",
        seed=C.MIX_SEED,
        scale=C.MIX_SCALE,
    )


def q_mixture_temperature(spark, sf_dir):
    """Temperature T=2 mixture rebalance: post-sample source token
    masses go as sqrt(T_g) (the mBERT/XLM-R multilingual recipe),
    with an exact cross-multiplied integer keep boundary."""
    return prep.temperature_mixture_sample(
        _docs(spark, sf_dir),
        group_col="source",
        seed=C.MIX_SEED,
        scale=C.MIX_SCALE,
    )


def q_pii_scrub(spark, sf_dir):
    """PII detection + redaction over a corpus with planted emails /
    phone numbers / IPv4s (the synthetic text has none): per-doc match
    counts on the original text plus the placeholder-redacted text.
    Entirely row-local regexp expressions — shuffle-free."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    did = F.col("doc_id")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                did % C.PII_EMAIL_EVERY == 0,
                F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.com")),
            ).otherwise(F.lit("")),
            F.when(did % C.PII_PHONE_EVERY == 0, F.lit(" call 555-123-4567")).otherwise(
                F.lit("")
            ),
            F.when(
                did % C.PII_IP_EVERY == 0,
                F.concat(F.lit(" from 192.168.1."), (did % 250).cast("string")),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return prep.pii_scrub(planted)


def q_boilerplate_removal(spark, sf_dir):
    """RefinedWeb-style line-level boilerplate removal: a corpus with a
    planted high-df header (every 3rd doc), footer (every 4th), and a
    RARE line family (every 25th doc, 5 variants — df under the
    threshold, must survive); lines with doc frequency >= BP_MIN_DF are
    stripped and documents reassembled in original line order."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    did = F.col("doc_id")
    planted = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.when(did % C.BP_HEADER_EVERY == 0, F.lit(C.BP_HEADER)),
            F.col("text"),
            F.when(did % C.BP_FOOTER_EVERY == 0, F.lit(C.BP_FOOTER)),
            F.when(
                did % C.BP_RARE_EVERY == 0,
                F.concat(F.lit("visit docs page "), (did % C.BP_RARE_MOD).cast("string")),
            ),
        ).alias("text"),
    )
    return prep.remove_boilerplate_lines(planted, min_doc_freq=C.BP_MIN_DF)


# --- round-6: corpus governance + classification eval -----------------------


def q_source_quota(spark, sf_dir):
    """Per-source quota sampling (crawl-pipeline domain caps): the
    SOURCE_QUOTA docs with the smallest salted stable-id hash per
    source, deterministic and content-free."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import prep

    return prep.per_group_quota(
        _docs(spark, sf_dir), "source", C.SOURCE_QUOTA
    )


def q_stratified_split(spark, sf_dir):
    """Per-language exact-proportion train/val split (round-10): each
    stratum contributes floor(0.2 * n) docs to val by salted stable-id
    hash order — a global hash split only hits the fraction in
    expectation and can wash a small language entirely into train,
    leaving zero eval coverage for it."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import prep

    return prep.stratified_split(
        _docs(spark, sf_dir), "lang", C.STRAT_VAL_FRAC
    )


def q_url_dedup(spark, sf_dir):
    """URL-level exact dedup, first-wins (round-10: the one common
    crawl-governance signal source_quota didn't cover). The corpus has
    no URL column, so each doc gets a deterministic synthetic URL —
    page ``doc_id % URL_PAGE_MOD`` under its source's domain — whose
    raw form varies in exactly the ways normalization must collapse:
    scheme (https+www vs bare http by id parity), a trailing slash
    (ids % 3 == 0), and per-fetch tracking params + fragment. Docs of
    one source hitting the same page number survive as ONE keep=true
    row (smallest doc_id). Ids % URL_NULL_MOD get a NULL url (lost
    headers in a real crawl) and must come back keep=true with
    norm_url null — round-11: exercises the null-URL branch the
    ADVICE review flagged (an equi-join alone drops those rows)."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import prep

    docs = _docs(spark, sf_dir)
    url = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("https://www.")).otherwise(
            F.lit("http://")
        ),
        F.col("source"),
        F.lit(".example.org/page/"),
        (F.col("doc_id") % C.URL_PAGE_MOD).cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?utm_source="),
        F.col("source"),
        F.lit("&fetch="),
        F.col("doc_id").cast("string"),
        F.lit("#top"),
    )
    url = F.when(F.col("doc_id") % C.URL_NULL_MOD != 0, url)
    return prep.url_dedup_first_wins(
        docs.select("doc_id", url.alias("url"))
    )


def q_paragraph_dedup(spark, sf_dir):
    """Paragraph-level near-dedup, first-wins (round-11: the Dolma/
    RefinedWeb granularity between exact-line boilerplate removal and
    doc-level dedup). The fixture docs are single-paragraph, so the
    query builds multi-paragraph pages first — page ``doc_id %
    PARA_PAGES`` concatenates its docs' texts in doc_id order with the
    blank-line separator — then drops near-duplicate paragraphs across
    pages and reassembles survivors in original order."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import dedup

    docs = _docs(spark, sf_dir)
    pages = docs.groupBy(
        (F.col("doc_id") % C.PARA_PAGES).alias("page_id")
    ).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
                lambda s: s["text"],
            ),
            "\n\n",
        ).alias("text")
    )
    return dedup.paragraph_dedup(
        pages,
        C.PARAMS,
        threshold=C.PARA_THRESHOLD,
        id_col="page_id",
        id_stride=C.PARA_STRIDE,
    )


def q_source_temperature_mix(spark, sf_dir):
    """Temperature-based source-mixing weights (round-11): per source
    the doc/token counts, raw token share, n^alpha multinomial
    sampling weight, and effective epochs — the data-mixing law of
    every large pretraining run, computed inside the engine."""
    return prep.source_temperature_mix(_docs(spark, sf_dir), C.MIX_ALPHA)


def q_filtered_cosine_topk(spark, sf_dir):
    """Attribute-filtered exact vector search (round-11): cosine top-k
    among ONLY the embeddings whose paired document is in FILTER_LANG
    — the pre-filter semantics every filtered-ANN composition must be
    measured against (a post-filtered shortlist under-fills k on a
    selective filter). Cross-table: the predicate lives on the
    documents metadata, the vectors on embeddings."""
    emb = _emb(spark, sf_dir)
    qs = emb.filter(F.col("vec_id") < C.BATCH_DOCS).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return bruteforce.filtered_cosine_topk(
        emb,
        _docs(spark, sf_dir),
        F.col("lang") == C.FILTER_LANG,
        qs,
        k=C.K_BATCH,
    )


def q_knn_label_vote(spark, sf_dir):
    """kNN majority-vote classification over the labeled embeddings:
    per query the prediction, the true label, and whether they agree —
    the end-to-end eval a similarity index exists to serve."""
    emb = _emb(spark, sf_dir)
    qs = emb.filter(F.col("vec_id") < C.BATCH_DOCS).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("true_label"),
    )
    pred = bruteforce.knn_label_vote(
        emb, qs.select("query_id", "query_vec"), k=C.KNN_VOTE_K
    )
    return pred.join(qs.select("query_id", "true_label"), "query_id").select(
        "query_id",
        "pred_label",
        "true_label",
        (F.col("pred_label") == F.col("true_label")).alias("correct"),
    )


def q_dedup_group_sizes(spark, sf_dir):
    """Near-dup cluster-size histogram over the connected components:
    (group_size, n_groups) — the shape report a dedup run is judged
    by (how much mass sits in big clone families)."""
    groups = q_dedup_groups(spark, sf_dir)
    sizes = groups.groupBy("group_id").agg(F.count("*").alias("group_size"))
    return sizes.groupBy("group_size").agg(F.count("*").alias("n_groups"))


def _source_rollup(docs, pairs):
    """Shared contamination-matrix shape: any blocked pair graph
    (doc_a, doc_b, ...) joined to each side's source and counted per
    (source_a, source_b). One verified rollup, three pair sources
    (MinHash LSH, winnowing, exact containment) — the candidate
    generator is a parameter, not a fork of the rollup."""
    sa = docs.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("source_a"))
    sb = docs.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("source_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_pairs"))
    )


def q_source_overlap(spark, sf_dir):
    """Cross-source near-duplicate overlap: LSH pairs joined to each
    side's source, counted per (source_a, source_b) — the contamination
    matrix between ingest feeds."""
    return _source_rollup(_docs(spark, sf_dir), q_lsh_pairs(spark, sf_dir))


def q_source_overlap_winnow(spark, sf_dir):
    """The contamination matrix over WINNOWING candidates: plagiarism-
    style shared-fingerprint pairs rolled up per source pair — catches
    copied substrings between feeds that whole-doc MinHash dilutes."""
    return _source_rollup(_docs(spark, sf_dir), q_winnow_pairs(spark, sf_dir))


def q_source_overlap_containment(spark, sf_dir):
    """The contamination matrix over EXACT-CONTAINMENT candidates:
    quotation/subset pairs (either direction >= threshold) rolled up
    per source pair — the asymmetric-overlap view of feed leakage."""
    pairs = dedup.containment_pairs_exact(
        _docs(spark, sf_dir),
        n=C.CONT_EXACT_N,
        max_doc_freq=C.CONT_EXACT_MAX_DF,
        threshold=C.CONT_EXACT_THRESHOLD,
    )
    return _source_rollup(_docs(spark, sf_dir), pairs)


def q_containment_pairs_exact(spark, sf_dir):
    """Exact directional containment over the df-capped inverted gram
    index, on the corpus PLUS the planted extreme-containment fixture
    (a tiny slice doc inside a concatenated huge doc, Jaccard ~0.01 —
    below MinHash banding recall, so the LSH-blocked containment_pairs
    provably misses it while this mode must report it with
    containment 1.0)."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    huge = (
        docs.filter(F.col("doc_id").isin(list(C.CONT_PLANT_COMPONENTS)))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
                    lambda s: s["text"],
                ),
                " ",
            ).alias("text")
        )
        .select(F.lit(C.CONT_PLANT_HUGE_ID).cast("long").alias("doc_id"), "text")
    )
    tiny = docs.filter(F.col("doc_id") == C.CONT_PLANT_TINY_SRC).select(
        F.lit(C.CONT_PLANT_TINY_ID).cast("long").alias("doc_id"),
        F.array_join(
            F.slice(
                tokenize(F.col("text")),
                C.CONT_PLANT_SLICE_START,
                C.CONT_PLANT_SLICE_LEN,
            ),
            " ",
        ).alias("text"),
    )
    planted = docs.unionByName(huge).unionByName(tiny)
    return dedup.containment_pairs_exact(
        planted,
        n=C.CONT_EXACT_N,
        max_doc_freq=C.CONT_EXACT_MAX_DF,
        threshold=C.CONT_EXACT_THRESHOLD,
    )


def q_lang_confusion(spark, sf_dir):
    """Language-ID confusion counts: labeled ``lang`` vs the n-gram
    heuristic's guess, per (lang, lang_guess) — the eval view of the
    lang_id operator."""
    docs = _docs(spark, sf_dir)
    guessed = docs.select(
        "doc_id", "lang", textstats.lang_id(F.col("text")).alias("lang_guess")
    )
    return guessed.groupBy("lang", "lang_guess").agg(
        F.count("*").alias("n_docs")
    )


def q_remove_duplicate_spans(spark, sf_dir):
    """Exact-substring dedup (the CUT half of Lee et al.): tokens
    covered by any word 8-gram shared across >= 2 documents are
    removed and the text reassembled — the cleaned corpus a
    substring-dedup pass ships, where shared_ngram_spans only flags."""
    return dedup.remove_duplicate_spans(
        _docs(spark, sf_dir),
        n=C.SPAN_NGRAM,
        min_doc_freq=C.SPAN_REMOVE_MIN_DF,
    )


def q_nb_classify(spark, sf_dir):
    """Multinomial Naive Bayes lang classifier trained on the id-mod
    train split, evaluated on the held-out docs — the fastText-style
    trainable filter (CCNet lang-ID / GPT-3 quality classifier shape)
    as one engine query."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import prep

    return prep.naive_bayes_classify(
        _docs(spark, sf_dir), label_col="lang", test_mod=C.NB_TEST_MOD
    )


def q_winnow_fingerprints(spark, sf_dir):
    """MOSS winnowing fingerprints per document: char 16-gram hashes,
    window-8 rightmost minima — the local fingerprint set with the
    guaranteed-substring-detection property MinHash lacks."""
    return dedup.winnow_fingerprints(
        _docs(spark, sf_dir), k=C.WINNOW_K, w=C.WINNOW_W
    )


def q_winnow_pairs(spark, sf_dir):
    """Plagiarism-detector pairing over the winnowed fingerprints:
    pairs sharing >= 2 distinct fingerprints, df-capped like
    shared_ngram_spans."""
    return dedup.winnow_pairs(
        _docs(spark, sf_dir),
        k=C.WINNOW_K,
        w=C.WINNOW_W,
        max_doc_freq=C.WINNOW_MAX_DOC_FREQ,
        min_shared=C.WINNOW_MIN_SHARED,
    )


def q_bm25_topk(spark, sf_dir):
    """BM25 keyword top-k over the documents table — the lexical rung
    of a hybrid search stack next to the MinHash/LSH and vector tiers,
    with the Lucene-variant idf and fully deterministic ranking."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import retrieval

    return retrieval.bm25_topk(
        _docs(spark, sf_dir),
        query=C.BM25_QUERY,
        k=C.BM25_K,
        k1=C.BM25_K1,
        b=C.BM25_B,
    )


def q_hybrid_rrf_topk(spark, sf_dir):
    """Hybrid search: the BM25 lexical top-k fused with the exact
    cosine vector top-k by Reciprocal Rank Fusion — the standard
    two-tier retrieval composition, over the aligned
    documents/embeddings id space."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import retrieval

    lex = q_bm25_topk(spark, sf_dir)
    vec = q_cosine_topk(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), "rank"
    )
    return retrieval.rrf_fuse(lex, vec, k=C.BM25_K, c=C.RRF_C)


def q_bm25_topk_batch(spark, sf_dir):
    """Batch BM25 over the fixed query set — the lexical twin of the
    vector *_topk_batch kernels, per-query results bit-identical to
    the point path."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import retrieval

    qdf = spark.createDataFrame(
        list(C.BM25_BATCH_QUERIES), "query_id long, query_text string"
    )
    return retrieval.bm25_topk_batch(
        _docs(spark, sf_dir), qdf, k=C.BM25_K, k1=C.BM25_K1, b=C.BM25_B
    )


def q_bm25_topk_store(spark, sf_dir):
    """BM25 answered from the PERSISTED postings index: build the
    token-bucketed, doc-sharded store (sidecars: doc lengths, global
    term df) and query it — the point query's scan prunes to the query
    terms' token_bucket directories (static partition pruning, the
    lexical twin of the IVF probe-cell pruning). Answer-identical to
    bm25_topk over the source table, so the oracle is the same SQL."""
    import os as _os

    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import retrieval
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources import tables as T

    store = _os.path.join(
        "/tmp",
        "fshdi_lex_store_" + _os.path.basename(sf_dir.rstrip("/")),
    )
    T.write_postings_index(
        _docs(spark, sf_dir),
        store,
        k1=C.BM25_K1,
        b=C.BM25_B,
        n_doc_shards=C.LEX_STORE_DOC_SHARDS,
        n_token_buckets=C.LEX_STORE_TOKEN_BUCKETS,
    )
    return retrieval.bm25_topk_store(
        spark, store, C.BM25_STORE_QUERY, k=C.BM25_K
    )


def q_bm25_topk_batch_store(spark, sf_dir):
    """Batch BM25 from the persisted postings index — one pruned scan
    (union of all query terms' token buckets) serves the whole fixture
    query set; answer-identical to bm25_topk_batch, so the oracle is
    the same SQL."""
    import os as _os

    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import retrieval
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.sources import tables as T

    store = _os.path.join(
        "/tmp",
        "fshdi_lex_store_" + _os.path.basename(sf_dir.rstrip("/")),
    )
    T.write_postings_index(
        _docs(spark, sf_dir),
        store,
        k1=C.BM25_K1,
        b=C.BM25_B,
        n_doc_shards=C.LEX_STORE_DOC_SHARDS,
        n_token_buckets=C.LEX_STORE_TOKEN_BUCKETS,
    )
    qdf = spark.createDataFrame(
        list(C.BM25_BATCH_QUERIES), "query_id long, query_text string"
    )
    return retrieval.bm25_topk_batch_store(spark, store, qdf, k=C.BM25_K)


def q_containment_pairs(spark, sf_dir):
    """Directional n-gram containment pairs (Broder coefficient) —
    the asymmetric near-dup view that catches quotation/subset
    relationships symmetric Jaccard misses."""
    return dedup.containment_pairs(_docs(spark, sf_dir), n=3, threshold=0.5)


def q_dsir_weights(spark, sf_dir):
    """DSIR log importance weights (Xie et al. 2023) for every
    raw-pool doc: hashed unigram+bigram likelihood ratio between the
    id-mod target sample and the raw pool — the trainable
    domain-relevance score of pretraining data selection."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import prep

    return prep.dsir_importance_weights(
        _docs(spark, sf_dir),
        target_mod=C.DSIR_TARGET_MOD,
        n_buckets=C.DSIR_BUCKETS,
    )


def q_dsir_select(spark, sf_dir):
    """DSIR resampling: the raw docs kept by deterministic
    Gumbel-top-k over the importance weights — sampling without
    replacement proportional to target-likeness, the paper's
    selection step as one engine query."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import prep

    return prep.dsir_select(
        _docs(spark, sf_dir),
        n_select=C.DSIR_SELECT_N,
        target_mod=C.DSIR_TARGET_MOD,
        n_buckets=C.DSIR_BUCKETS,
    )


def q_epoch_shuffle(spark, sf_dir):
    """Deterministic global epoch shuffle: each doc's reading position
    for epoch SHUFFLE_EPOCH — rank under (salted stable-id hash, id)
    computed with the two-phase distributed prefix count instead of a
    single-partition global window."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import prep

    return prep.epoch_shuffle(_docs(spark, sf_dir), epoch=C.SHUFFLE_EPOCH)


def q_hybrid_rrf_topk_batch(spark, sf_dir):
    """Batch hybrid search: the whole BM25 batch-query set fused with
    per-query exact cosine top-k (each query's vector is its own
    document's embedding — the aligned id space) via per-query RRF.
    Each query's fused list is identical to fusing its point lists."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import retrieval

    lex = q_bm25_topk_batch(spark, sf_dir)
    emb = _emb(spark, sf_dir)
    qids = [qid for qid, _ in C.BM25_BATCH_QUERIES]
    qs = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    vec = bruteforce.cosine_topk(emb, qs, k=C.BM25_K).select(
        "query_id", F.col("vec_id").alias("doc_id"), "rank"
    )
    return retrieval.rrf_fuse_batch(lex, vec, k=C.BM25_K, c=C.RRF_C)


def q_dsir_select_tokens(spark, sf_dir):
    """DSIR selection at a token budget: the most target-like docs in
    descending Gumbel-key order until DSIR_TOKEN_BUDGET tokens — the
    running total computed with the distributed prefix scan, never a
    global window."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import prep

    return prep.dsir_select_tokens(
        _docs(spark, sf_dir),
        token_budget=C.DSIR_TOKEN_BUDGET,
        target_mod=C.DSIR_TARGET_MOD,
        n_buckets=C.DSIR_BUCKETS,
    )


def q_dsir_divergence(spark, sf_dir):
    """DSIR divergence report: KL(target || raw) and KL(raw || target)
    over the smoothed hashed-feature distributions — the drift number
    a data-selection pipeline monitors, computed in one bounded
    aggregation."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import prep

    return prep.dsir_divergence(
        _docs(spark, sf_dir),
        target_mod=C.DSIR_TARGET_MOD,
        n_buckets=C.DSIR_BUCKETS,
    )


def q_mrl_rerank_topk(spark, sf_dir):
    """Matryoshka-style adaptive retrieval: first-16-dims cosine
    shortlist, full-dim exact rerank — the dimension-truncation twin
    of the PQ shortlist+rerank serving shape, over a query batch."""
    emb = _emb(spark, sf_dir)
    qs = emb.filter(F.col("vec_id") < C.BATCH_DOCS).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return bruteforce.mrl_rerank_topk(
        emb, qs, k=C.K_VEC, d_prime=C.MRL_DIM, shortlist=C.MRL_SHORTLIST
    )


def q_ngram_novelty(spark, sf_dir):
    """Per-doc n-gram novelty: fraction of the doc's distinct 8-grams
    first seen (min doc_id) in this doc — the internal-duplication
    signal a substring-dedup pass acts on."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import dedup

    return dedup.ngram_novelty(_docs(spark, sf_dir), n=C.SPAN_NGRAM)


def q_collocations_pmi(spark, sf_dir):
    """Top-200 collocations by PMI over adjacent token bigrams — the
    phrase-mining statistic tokenizer/vocab induction runs over a
    pretraining corpus. Fixed-order ln-of-exact-integer sum, so the
    score is bit-identical across engines."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators import prep

    return prep.collocations_pmi(_docs(spark, sf_dir))


REGISTRY = {
    "collocations_pmi": q_collocations_pmi,
    "ngram_novelty": q_ngram_novelty,
    "mrl_rerank_topk": q_mrl_rerank_topk,
    "remove_duplicate_spans": q_remove_duplicate_spans,
    "nb_classify": q_nb_classify,
    "dsir_weights": q_dsir_weights,
    "dsir_select": q_dsir_select,
    "dsir_select_tokens": q_dsir_select_tokens,
    "dsir_divergence": q_dsir_divergence,
    "epoch_shuffle": q_epoch_shuffle,
    "winnow_fingerprints": q_winnow_fingerprints,
    "winnow_pairs": q_winnow_pairs,
    "bm25_topk": q_bm25_topk,
    "bm25_topk_store": q_bm25_topk_store,
    "bm25_topk_batch": q_bm25_topk_batch,
    "bm25_topk_batch_store": q_bm25_topk_batch_store,
    "hybrid_rrf_topk": q_hybrid_rrf_topk,
    "hybrid_rrf_topk_batch": q_hybrid_rrf_topk_batch,
    "containment_pairs": q_containment_pairs,
    "containment_pairs_exact": q_containment_pairs_exact,
    "source_overlap_winnow": q_source_overlap_winnow,
    "source_overlap_containment": q_source_overlap_containment,
    "shingle_stats": q_shingle_stats,
    "content_hashes": q_content_hashes,
    "minhash_signatures": q_minhash_signatures,
    "lsh_bands": q_lsh_bands,
    "lsh_bucket_cap": q_lsh_bucket_cap,
    "lsh_candidate_cap": q_lsh_candidate_cap,
    "lsh_topk": q_lsh_topk,
    "lsh_topk_batch": q_lsh_topk_batch,
    "corpus_dedup_pipeline": q_corpus_dedup_pipeline,
    "embedding_dup_pairs_multiprobe": q_embedding_dup_pairs_multiprobe,
    "lsh_topk_batch_shuffle": q_lsh_topk_batch_shuffle,
    "est_jaccard_topk_batch_fold": q_est_jaccard_topk_batch_fold,
    "char_shingle_stats": q_char_shingle_stats,
    "bucket_stats": q_bucket_stats,
    "lsh_pairs": q_lsh_pairs,
    "decontaminate": q_decontaminate,
    "dataset_split": q_dataset_split,
    "pack_chunks": q_pack_chunks,
    "full_prep_pipeline": q_full_prep_pipeline,
    "est_jaccard_topk_batch": q_est_jaccard_topk_batch,
    "true_jaccard_topk": q_true_jaccard_topk,
    "l2_topk": q_l2_topk,
    "cosine_topk": q_cosine_topk,
    "knn_batch_l2": q_knn_batch_l2,
    "qed_histogram": q_qed_histogram,
    "qed_prune": q_qed_prune,
    "qed_topk": q_qed_topk,
    "exact_dedup": q_exact_dedup,
    "simhash": q_simhash,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "simhash_dup_pairs": q_simhash_dup_pairs,
    "embedding_dup_pairs": q_embedding_dup_pairs,
    "semantic_dup_pairs": q_semantic_dup_pairs,
    "cell_stats": q_cell_stats,
    "semantic_dedup": q_semantic_dedup,
    "semantic_outliers": q_semantic_outliers,
    "semantic_curation": q_semantic_curation,
    "dedup_groups": q_dedup_groups,
    "mllib_pairs": q_mllib_pairs,
    "mllib_pairs_verified": q_mllib_pairs_verified,
    "text_stats": q_text_stats,
    "repetition_stats": q_repetition_stats,
    "shared_ngram_spans": q_shared_ngram_spans,
    "mixture_sample": q_mixture_sample,
    "mixture_weighted": q_mixture_weighted,
    "mixture_temperature": q_mixture_temperature,
    "token_entropy": q_token_entropy,
    "lm_quality": q_lm_quality,
    "lm_quality_bands": q_lm_quality_bands,
    "bpe_pair_counts": q_bpe_pair_counts,
    "quality_report": q_quality_report,
    "chunk_documents": q_chunk_documents,
    "snapshot_diff": q_snapshot_diff,
    "mine_triplets": q_mine_triplets,
    "ngram_decontaminate": q_ngram_decontaminate,
    "pii_scrub": q_pii_scrub,
    "boilerplate_removal": q_boilerplate_removal,
    "pq_codes": q_pq_codes,
    "pq_topk": q_pq_topk,
    "pq_topk_rerank": q_pq_topk_rerank,
    "opq_codes": q_opq_codes,
    "opq_topk": q_opq_topk,
    "opq_topk_rerank": q_opq_topk_rerank,
    "opq_topk_store": q_opq_topk_store,
    "ivfopq_codes": q_ivfopq_codes,
    "ivfopq_topk": q_ivfopq_topk,
    "ivfopq_topk_store": q_ivfopq_topk_store,
    "ivfopq_topk_rerank": q_ivfopq_topk_rerank,
    "ivfopq_topk_batch": q_ivfopq_topk_batch,
    "cms_heavy_hitters": q_cms_heavy_hitters,
    "gopher_rules": q_gopher_rules,
    "events_asof": q_events_asof,
    "hll_cardinality": q_hll_cardinality,
    "ivfpq_codes": q_ivfpq_codes,
    "ivfpq_topk": q_ivfpq_topk,
    "ivfpq_topk_rerank": q_ivfpq_topk_rerank,
    "ivfpq_topk_batch": q_ivfpq_topk_batch,
    "ivfpq_topk_batch_rerank": q_ivfpq_topk_batch_rerank,
    "curated_ivfpq_index": q_curated_ivfpq_index,
    "ivfpq_topk_alpha": q_ivfpq_topk_alpha,
    "sq_codes": q_sq_codes,
    "sq_topk": q_sq_topk,
    "sq_topk_rerank": q_sq_topk_rerank,
    "incremental_dedup": q_incremental_dedup,
    "corpus_clean": q_corpus_clean,
    "lang_id": q_lang_id,
    "token_frequencies": q_token_frequencies,
    "corpus_report": q_corpus_report,
    "doc_fingerprints": q_doc_fingerprints,
    "ann_buckets": q_ann_buckets,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_multiprobe_topk": q_ann_multiprobe_topk,
    "ann_target_recall_topk": q_ann_target_recall_topk,
    "ivf_topk": q_ivf_topk,
    "ivf_topk_alpha": q_ivf_topk_alpha,
    "ivf_topk_batch": q_ivf_topk_batch,
    "quality_metrics": q_quality_metrics,
    "lsh_topk_preview": q_lsh_topk_preview,
    "padded_topk": q_padded_topk,
    "sig_stats": q_sig_stats,
    "tpch_q3": q_tpch_q3,
    "tpch_q5": q_tpch_q5,
    "events_window_scan": q_events_window_scan,
    "events_hourly": q_events_hourly,
    "events_sessions": q_events_sessions,
    "events_sliding": q_events_sliding,
    "lineitem_pricing": q_lineitem_pricing,
    "top_customers_per_nation": q_top_customers_per_nation,
    "orders_by_region": q_orders_by_region,
    "synthetic_docs": q_synthetic_docs,
    "ref61_signatures": q_ref61_signatures,
    "media_features": q_media_features,
    "media_embedding_topk": q_media_embedding_topk,
    "media_frames": q_media_frames,
    "source_quota": q_source_quota,
    "url_dedup": q_url_dedup,
    "paragraph_dedup": q_paragraph_dedup,
    "source_temperature_mix": q_source_temperature_mix,
    "filtered_cosine_topk": q_filtered_cosine_topk,
    "stratified_split": q_stratified_split,
    "knn_label_vote": q_knn_label_vote,
    "dedup_group_sizes": q_dedup_group_sizes,
    "source_overlap": q_source_overlap,
    "lang_confusion": q_lang_confusion,
}
