"""DuckDB oracle SQL renderings of the Spark query registry.

Every deterministic query in ``plans/queries.py`` has an ANSI-SQL
equivalent here, runnable by DuckDB over the same parquet tables
(pre-registered views). The two sides share literals (permutation
coefficients, hyperplane vectors, fixture ids) through
``contract.py`` / ``config.perm_coeffs`` / ``ann.random_planes``, and
every float expression mirrors the Spark fold order so doubles match
bit-for-bit (verified empirically: md5-hash parity, sequential-fold
IEEE parity).
"""

from __future__ import annotations

from finding_similar_high_dimensional_items_for_big_data_sets_spark import contract as C
from finding_similar_high_dimensional_items_for_big_data_sets_spark.config import (
    MERSENNE31 as P,
)
from finding_similar_high_dimensional_items_for_big_data_sets_spark.config import perm_coeffs
from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.hashing import (
    portable_hash64_sql as H,
)
from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.textstats import (
    ENGLISH_STOPWORDS,
    LANG_MARKERS,
)
from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.ann import (
    random_planes,
)

NP = C.PARAMS.num_perm
NB = C.PARAMS.bands
RPB = C.PARAMS.rows_per_band
_A, _B = perm_coeffs(NP, C.PARAMS.seed)
A = "[" + ",".join(map(str, _A)) + "]"
B = "[" + ",".join(map(str, _B)) + "]"


def HMOD(e: str) -> str:
    return f"({H(e)} % {P})"


# Shared CTE fragments ------------------------------------------------------

TOKS = "SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents"
HS = f"SELECT doc_id, list_transform(list_distinct(t), s -> {HMOD('s')}) AS h FROM ({TOKS})"
# Permutation coefficients ride a one-row cross join instead of inline
# list literals: DuckDB re-CONSTRUCTS a literal list on every lambda
# evaluation, which made each signature derivation O(num_perm^2 * |h|)
# element copies — measured 40.6s -> 0.07s for the sf0.01 corpus with
# the hoisted constants, bit-identical values.
CONSTS = f"(SELECT ({A}) AS ca, ({B}) AS cb) consts"
SIGS = (
    f"SELECT doc_id, list_transform(range({NP}), p -> coalesce("
    f"list_min(list_transform(h, x -> (ca[p+1]*x + cb[p+1]) % {P})), {P})) AS sigl "
    f"FROM ({HS}), {CONSTS}"
)
_BAND_STR = (
    f"array_to_string(list_transform("
    f"sigl[band_id*{RPB}+1 : band_id*{RPB}+{RPB}], v -> v::VARCHAR), ',')"
)
BANDS = (
    f"SELECT doc_id, CAST(band_id AS INT) AS band_id, {H(_BAND_STR)} AS band_hash "
    f"FROM ({SIGS}), (SELECT unnest(range({NB})) AS band_id) b"
)
# score between a corpus sig list s.sigl and a query sig list q.q
_EST_JACCARD = (
    f"list_sum(list_transform(range({NP}), "
    f"i -> CASE WHEN s.sigl[i+1] = q.q[i+1] THEN 1 ELSE 0 END)) / {NP}"
)

EMB_DIMS = (
    "SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim, "
    "unnest(embedding)::DOUBLE AS value FROM embeddings"
)
EDGES = (
    f"SELECT dim, min(value) AS lo, max(value) AS hi, "
    f"(max(value) - min(value)) / {C.QED_BINS} AS width "
    f"FROM ({EMB_DIMS}) GROUP BY dim"
)
# zero-width (constant-dim) guard mirrors operators/qed.bin_index
_BIN = lambda v, lo, w: (
    f"least(greatest(CAST(floor(({v} - {lo}) / "
    f"(CASE WHEN {w} = 0 THEN 1.0 ELSE {w} END)) AS INT), 0), {C.QED_BINS - 1})"
)

# L2 / cosine folds mirroring functions/arrays.py exactly:
# zip-multiply (or pow) then sequential left fold starting at 0.0.


def _l2(a: str, b: str, dim: int) -> str:
    return (
        f"sqrt(list_reduce(list_prepend(0.0, list_transform(range({dim}), "
        f"i -> pow({a}[i+1]::DOUBLE - {b}[i+1]::DOUBLE, 2))), (acc, x) -> acc + x))"
    )


def _dot(a: str, b: str, dim: int) -> str:
    return (
        f"list_reduce(list_prepend(0.0, list_transform(range({dim}), "
        f"i -> {a}[i+1]::DOUBLE * {b}[i+1]::DOUBLE)), (acc, x) -> acc + x)"
    )


def _norm(a: str, dim: int) -> str:
    return (
        f"sqrt(list_reduce(list_prepend(0.0, list_transform(range({dim}), "
        f"i -> {a}[i+1]::DOUBLE * {a}[i+1]::DOUBLE)), (acc, x) -> acc + x))"
    )


def _dot_lit(vec: str, plane: list[float]) -> str:
    lit = "[" + ",".join(repr(float(x)) for x in plane) + "]"
    return _dot(vec, f"({lit})", len(plane))


def _bucket_expr(vec: str) -> str:
    planes = random_planes(C.EMB_DIM, C.ANN_PLANES, C.ANN_SEED)
    terms = [
        f"(CASE WHEN {_dot_lit(vec, planes[j])} >= 0 THEN {1 << j} ELSE 0 END)"
        for j in range(C.ANN_PLANES)
    ]
    return "CAST((" + " + ".join(terms) + ") AS INT)"


# Query renderings ----------------------------------------------------------


def sql_shingle_stats() -> str:
    return (
        f"SELECT doc_id, CAST(len(t) AS INT) AS n_tokens, "
        f"CAST(len(list_distinct(t)) AS INT) AS n_shingles FROM ({TOKS})"
    )


def sql_content_hashes() -> str:
    norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    return f"SELECT doc_id, {H(norm)} AS content_hash FROM documents"


def sql_minhash_signatures() -> str:
    return (
        f"SELECT doc_id, CAST(p.perm_id AS INT) AS perm_id, "
        f"coalesce(list_min(list_transform(h, x -> (ca[perm_id+1]*x + cb[perm_id+1]) % {P})), {P}) AS sig_value "
        f"FROM ({HS}), (SELECT unnest(range({NP})) AS perm_id) p, {CONSTS}"
    )


def sql_lsh_bands() -> str:
    return BANDS


def sql_lsh_bucket_cap() -> str:
    return (
        f"SELECT doc_id, band_id, band_hash FROM ("
        f"SELECT *, row_number() OVER (PARTITION BY band_id, band_hash ORDER BY doc_id) AS rn "
        f"FROM ({BANDS})) WHERE rn <= 3"
    )


def sql_lsh_candidate_cap() -> str:
    return f"""
WITH bands AS MATERIALIZED ({BANDS}),
qb AS (SELECT band_id, band_hash FROM bands WHERE doc_id = {C.QUERY_DOC}),
cand AS (SELECT DISTINCT CAST({C.QUERY_DOC} AS BIGINT) AS query_id, bands.doc_id
         FROM bands JOIN qb USING (band_id, band_hash))
SELECT query_id, doc_id FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY doc_id) AS rn FROM cand)
WHERE rn <= 25
"""


def sql_lsh_topk() -> str:
    return f"""
WITH sigs AS MATERIALIZED ({SIGS}),
bands AS MATERIALIZED ({BANDS}),
qb AS (SELECT band_id, band_hash FROM bands WHERE doc_id = {C.QUERY_DOC}),
cand AS (SELECT DISTINCT bands.doc_id FROM bands JOIN qb USING (band_id, band_hash)),
qsig AS (SELECT sigl AS q FROM sigs WHERE doc_id = {C.QUERY_DOC}),
scored AS (
  SELECT CAST({C.QUERY_DOC} AS BIGINT) AS query_id, s.doc_id, {_EST_JACCARD} AS score
  FROM cand c JOIN sigs s ON s.doc_id = c.doc_id, qsig q)
SELECT query_id, doc_id, score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank
FROM scored ORDER BY score DESC, doc_id LIMIT {C.K_DOC}
"""


def sql_lsh_topk_batch() -> str:
    """Batch twin of sql_lsh_topk: query bands are the band rows of the
    query docs themselves; per-query distinct candidates, est-Jaccard,
    rank window."""
    return f"""
WITH sigs AS MATERIALIZED ({SIGS}),
bands AS MATERIALIZED ({BANDS}),
queries AS (SELECT doc_id AS query_id, sigl AS q FROM sigs WHERE doc_id < {C.BATCH_DOCS}),
qb AS (SELECT doc_id AS query_id, band_id, band_hash FROM bands WHERE doc_id < {C.BATCH_DOCS}),
cand AS (SELECT DISTINCT qb.query_id, bands.doc_id
         FROM bands JOIN qb USING (band_id, band_hash)),
scored AS (
  SELECT c.query_id, s.doc_id, {_EST_JACCARD} AS score
  FROM cand c JOIN sigs s ON s.doc_id = c.doc_id
  JOIN queries q ON q.query_id = c.query_id)
SELECT query_id, doc_id, score, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS INT) AS rank
  FROM scored) WHERE rank <= {C.K_BATCH}
"""


def sql_bucket_stats() -> str:
    return f"""
WITH bands AS MATERIALIZED ({BANDS}),
sizes AS (SELECT band_id, band_hash, count(*) AS sz FROM bands GROUP BY band_id, band_hash)
SELECT CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(sz) AS BIGINT) AS n_rows,
       CAST(max(sz) AS BIGINT) AS max_bucket,
       round(avg(sz), 6) AS avg_bucket,
       CAST(sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_singleton_buckets
FROM sizes
"""


def sql_lsh_pairs() -> str:
    # MATERIALIZED: DuckDB 1.0 inlines plain CTEs per reference, which
    # would re-derive the whole signature/band pipeline for each of the
    # self-join's two sides; the scored subquery evaluates the 128-term
    # fold once per pair instead of once in SELECT and again in WHERE.
    return f"""
WITH sigs AS MATERIALIZED ({SIGS}),
bands AS MATERIALIZED ({BANDS}),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b USING (band_id, band_hash)
  WHERE a.doc_id < b.doc_id)
SELECT doc_a, doc_b, score FROM (
  SELECT doc_a, doc_b,
    list_sum(list_transform(range({NP}), i -> CASE WHEN sa.sigl[i+1] = sb.sigl[i+1] THEN 1 ELSE 0 END)) / {NP} AS score
  FROM pairs p JOIN sigs sa ON sa.doc_id = p.doc_a JOIN sigs sb ON sb.doc_id = p.doc_b)
WHERE score >= {C.PAIR_THRESHOLD}
"""


def sql_dataset_split() -> str:
    """Mirrors prep.hash_split: salted portable hash of the stable id,
    mod 1000 (hash is positive 60-bit, so % == pmod)."""
    h = H(f"CAST(doc_id AS VARCHAR) || ':{C.SPLIT_SEED}'")
    return f"""
SELECT doc_id, CAST({h} % 1000 AS INT) AS split_bucket,
       CASE WHEN ({h} % 1000) < {C.SPLIT_VAL_PERMILLE} THEN 'val' ELSE 'train' END AS split
FROM documents
"""


def sql_pack_chunks() -> str:
    """Mirrors prep.pack_chunks: a doc's chunk is
    floor(running_total_before / budget) over doc_id order — the
    oracle uses the single-window form, the engine the two-phase
    distributed prefix sum (identical integers either way)."""
    toks = "CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)"
    return f"""
WITH c AS (SELECT doc_id, {toks} AS n_tokens FROM documents),
b AS (SELECT doc_id, n_tokens,
        coalesce(SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
      FROM c)
SELECT doc_id, n_tokens, CAST(before // {C.PACK_BUDGET} AS BIGINT) AS chunk_id,
       CAST(before % {C.PACK_BUDGET} AS BIGINT) AS chunk_offset
FROM b
"""


def sql_decontaminate() -> str:
    """Mirrors dedup.cross_corpus_duplicates over the %17 train/bench
    split: banding is per-doc independent, so the two sides' band
    tables are row filters of the shared BANDS CTE; candidates are the
    DISTINCT cross band matches, verified by est-Jaccard >= threshold."""
    return f"""
WITH sigs AS MATERIALIZED ({SIGS}),
bands AS MATERIALIZED ({BANDS}),
cand AS (
  SELECT DISTINCT t.doc_id AS doc_id, r.doc_id AS ref_id
  FROM bands t JOIN bands r USING (band_id, band_hash)
  WHERE t.doc_id % 17 != 0 AND r.doc_id % 17 = 0)
SELECT doc_id, ref_id, score FROM (
  SELECT c.doc_id, c.ref_id,
    list_sum(list_transform(range({NP}), i -> CASE WHEN sa.sigl[i+1] = sb.sigl[i+1] THEN 1 ELSE 0 END)) / {NP} AS score
  FROM cand c JOIN sigs sa ON sa.doc_id = c.doc_id JOIN sigs sb ON sb.doc_id = c.ref_id)
WHERE score >= {C.PAIR_THRESHOLD}
"""


def sql_est_jaccard_topk_batch() -> str:
    return f"""
WITH sigs AS MATERIALIZED ({SIGS}),
queries AS (SELECT doc_id AS query_id, sigl AS q FROM sigs WHERE doc_id < {C.BATCH_DOCS}),
scored AS (
  SELECT q.query_id, s.doc_id, {_EST_JACCARD} AS score FROM sigs s, queries q)
SELECT query_id, doc_id, score, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS INT) AS rank
  FROM scored) WHERE rank <= {C.K_BATCH}
"""


def sql_true_jaccard_topk() -> str:
    sh = f"SELECT doc_id, list_distinct(t) AS sh FROM ({TOKS})"
    return f"""
WITH shingled AS MATERIALIZED ({sh}),
q AS (SELECT sh AS qsh FROM shingled WHERE doc_id = {C.QUERY_DOC}),
scored AS (
  SELECT CAST({C.QUERY_DOC} AS BIGINT) AS query_id, s.doc_id,
    CASE WHEN len(list_distinct(list_concat(s.sh, q.qsh))) = 0 THEN 0.0
         ELSE CAST(len(list_intersect(s.sh, q.qsh)) AS DOUBLE) / CAST(len(list_distinct(list_concat(s.sh, q.qsh))) AS DOUBLE)
    END AS jaccard
  FROM shingled s, q)
SELECT query_id, doc_id, jaccard,
       CAST(row_number() OVER (ORDER BY jaccard DESC, doc_id) AS INT) AS rank
FROM scored ORDER BY jaccard DESC, doc_id LIMIT {C.K_DOC}
"""


def _topk_emb(metric_expr: str, metric_name: str, order: str, k: int, where: str) -> str:
    # round(6) mirrors operators/bruteforce.py: 1-ULP fold differences
    # between engines must not leak into ranking or value hashes.
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE {where}),
scored AS (
  SELECT q.query_id, e.vec_id, round({metric_expr}, 6) AS {metric_name}
  FROM embeddings e, q)
SELECT query_id, vec_id, {metric_name}, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY {metric_name} {order}, vec_id) AS INT) AS rank
  FROM scored) WHERE rank <= {k}
"""


def sql_l2_topk() -> str:
    return _topk_emb(
        _l2("e.embedding", "q.qv", C.EMB_DIM), "dist", "ASC", C.K_VEC,
        f"vec_id = {C.QUERY_VEC}",
    )


def sql_cosine_topk() -> str:
    expr = f"{_dot('e.embedding', 'q.qv', C.EMB_DIM)} / ({_norm('e.embedding', C.EMB_DIM)} * {_norm('q.qv', C.EMB_DIM)})"
    return _topk_emb(expr, "cos_sim", "DESC", C.K_VEC, f"vec_id = {C.QUERY_VEC}")


def sql_knn_batch_l2() -> str:
    return _topk_emb(
        _l2("e.embedding", "q.qv", C.EMB_DIM), "dist", "ASC", C.K_BATCH,
        f"vec_id < {C.BATCH_DOCS}",
    )


def sql_qed_histogram() -> str:
    return f"""
WITH dims AS ({EMB_DIMS}), edges AS ({EDGES})
SELECT d.dim, {_BIN('d.value', 'e.lo', 'e.width')} AS bin, count(*) AS cnt
FROM dims d JOIN edges e ON d.dim = e.dim
GROUP BY d.dim, bin
"""


def _qed_wins() -> str:
    r = max(1, int(C.QED_P_FRACTION * C.QED_BINS))
    qbin = _BIN("q.qv", "e.lo", "e.width")
    return (
        f"SELECT e.dim, greatest({qbin} - {r}, 0) AS lo_b, "
        f"least({qbin} + {r}, {C.QED_BINS - 1}) AS hi_b "
        f"FROM ({EDGES}) e JOIN (SELECT CAST(generate_subscripts(embedding,1)-1 AS INT) AS dim, "
        f"unnest(embedding)::DOUBLE AS qv FROM embeddings WHERE vec_id = {C.QUERY_VEC}) q "
        f"ON q.dim = e.dim"
    )


def sql_qed_prune() -> str:
    return f"""
WITH dims AS ({EMB_DIMS}), edges AS ({EDGES}), wins AS ({_qed_wins()}),
binned AS (
  SELECT d.vec_id, d.dim, {_BIN('d.value', 'e.lo', 'e.width')} AS bin
  FROM dims d JOIN edges e ON d.dim = e.dim)
SELECT vec_id FROM (
  SELECT b.vec_id, bool_and(b.bin BETWEEN w.lo_b AND w.hi_b) AS ok
  FROM binned b JOIN wins w ON b.dim = w.dim GROUP BY b.vec_id) WHERE ok
"""


def sql_qed_topk() -> str:
    neg_l2 = "-" + _l2("e.embedding", "q.qv", C.EMB_DIM)
    return f"""
WITH survivors AS ({sql_qed_prune().strip()}),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {C.QUERY_VEC}),
scored AS (
  SELECT e.vec_id, round({neg_l2}, 6) + 0.0 AS score
  FROM embeddings e JOIN survivors s ON e.vec_id = s.vec_id, q)
SELECT vec_id, score, CAST(row_number() OVER (ORDER BY score DESC, vec_id) AS INT) AS rank
FROM scored ORDER BY score DESC, vec_id LIMIT {C.K_BATCH}
"""


def sql_exact_dedup() -> str:
    norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {C.DEDUP_PLANT_OFFSET} AS doc_id, upper(text) || '  ' AS text
  FROM documents WHERE doc_id % {C.DEDUP_PLANT_EVERY} = 0),
hashed AS (SELECT doc_id, {H(norm)} AS content_hash FROM corpus),
grouped AS (
  SELECT doc_id, content_hash,
         min(doc_id) OVER (PARTITION BY content_hash) AS canonical_id,
         count(*) OVER (PARTITION BY content_hash) AS group_size
  FROM hashed)
SELECT doc_id, canonical_id, content_hash FROM grouped WHERE group_size >= 2
"""


def sql_simhash() -> str:
    votes = (
        f"list_transform(range(64), j -> list_sum(list_transform(h, "
        f"x -> CASE WHEN (x >> j) & 1 = 1 THEN 1 ELSE -1 END)))"
    )
    # portable family: hashes are the raw 60-bit md5 values (no mod)
    hs = f"SELECT doc_id, list_transform(list_distinct(t), s -> {H('s')}) AS h FROM ({TOKS})"
    lo = (
        "list_sum(list_transform(range(32), j -> "
        "CASE WHEN v[j+1] > 0 THEN (1::BIGINT << j) ELSE 0 END))"
    )
    hi = (
        "list_sum(list_transform(range(32), j -> "
        "CASE WHEN v[j+33] > 0 THEN (1::BIGINT << j) ELSE 0 END))"
    )
    return f"""
WITH hashed AS ({hs}),
voted AS (SELECT doc_id, {votes} AS v FROM hashed)
SELECT doc_id, CAST(coalesce({lo}, 0) AS BIGINT) AS simhash_lo,
       CAST(coalesce({hi}, 0) AS BIGINT) AS simhash_hi
FROM voted
"""


def sql_simhash_dup_pairs() -> str:
    """Mirrors dedup.simhash_duplicates(max_hamming=3, n_bands=4,
    family='portable'). Portable hashes are 60-bit, so bits 60-63 never
    vote positive and the full fingerprint fits a non-negative BIGINT
    (arithmetic >> then matches Spark's shiftright exactly)."""
    votes = (
        "list_transform(range(60), j -> list_sum(list_transform(h, "
        "x -> CASE WHEN (x >> j) & 1 = 1 THEN 1 ELSE -1 END)))"
    )
    hs = f"SELECT doc_id, list_transform(list_distinct(t), s -> {H('s')}) AS h FROM ({TOKS})"
    sh = (
        "CAST(coalesce(list_sum(list_transform(range(60), j -> "
        "CASE WHEN v[j+1] > 0 THEN (1::BIGINT << j) ELSE 0 END)), 0) AS BIGINT)"
    )
    return f"""
WITH hashed AS ({hs}),
voted AS (SELECT doc_id, {votes} AS v FROM hashed),
fp AS (SELECT doc_id, {sh} AS sh FROM voted),
chunks AS MATERIALIZED (
  SELECT doc_id, sh, CAST(c AS INT) AS chunk_id, (sh >> (CAST(c AS INT) * 16)) & 65535 AS chunk
  FROM fp, (SELECT unnest(range(4)) AS c)),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sh AS sh_a, b.sh AS sh_b
  FROM chunks a JOIN chunks b ON a.chunk_id = b.chunk_id AND a.chunk = b.chunk
  WHERE a.doc_id < b.doc_id)
SELECT doc_a, doc_b, CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
FROM pairs WHERE bit_count(xor(sh_a, sh_b)) <= 3
"""


def sql_embedding_dup_pairs() -> str:
    cos = (
        f"{_dot('a.embedding', 'b.embedding', C.EMB_DIM)} / "
        f"({_norm('a.embedding', C.EMB_DIM)} * {_norm('b.embedding', C.EMB_DIM)})"
    )
    return f"""
WITH bucketed AS MATERIALIZED (SELECT vec_id, embedding, {_bucket_expr('embedding')} AS bucket FROM embeddings),
scored AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b, round({cos}, 6) AS cos_sim
  FROM bucketed a JOIN bucketed b ON a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id)
SELECT vec_a, vec_b, cos_sim FROM scored WHERE cos_sim >= 0.3
"""


def _sem_assigned() -> str:
    """Shared CTE body for the SemDeDup twins: nearest-centroid cell
    per embedding, argmin (first tie) of the same sequential squared-L2
    fold ``ann.nearest_cell`` evaluates (seeded IVF centroids)."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.ann import (
        random_centroids,
    )

    cents = random_centroids(C.EMB_DIM, C.IVF_CELLS, C.IVF_SEED)
    dists = "[" + ", ".join(_sq_l2_lit("embedding", c) for c in cents) + "]"
    return (
        "SELECT vec_id, embedding, "
        "CAST(list_position(d.ds, list_min(d.ds)) - 1 AS INT) AS cell "
        f"FROM (SELECT vec_id, embedding, {dists} AS ds FROM embeddings) d"
    )


def _sem_pairs_body() -> str:
    cos = (
        f"{_dot('a.embedding', 'b.embedding', C.EMB_DIM)} / "
        f"({_norm('a.embedding', C.EMB_DIM)} * {_norm('b.embedding', C.EMB_DIM)})"
    )
    return (
        "SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b, "
        f"round({cos}, 6) AS cos_sim "
        "FROM assigned a JOIN assigned b ON a.cell = b.cell "
        "WHERE a.vec_id < b.vec_id"
    )


def sql_cell_stats() -> str:
    """Twin of ann.cell_stats over ivf_assign's seeded centroids:
    occupancy distribution per nearest-centroid cell. quantile_cont ==
    Spark percentile bit-identically over integer counts."""
    return f"""
WITH assigned AS MATERIALIZED ({_sem_assigned()}),
sizes AS (SELECT cell, count(*) AS sz FROM assigned GROUP BY cell)
SELECT CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(sz) AS BIGINT) AS n_rows,
       CAST(min(sz) AS BIGINT) AS min_cell,
       quantile_cont(sz, 0.5) AS p50_cell,
       quantile_cont(sz, 0.99) AS p99_cell,
       CAST(max(sz) AS BIGINT) AS max_cell,
       round(avg(sz), 6) AS avg_cell
FROM sizes
"""


def sql_semantic_dup_pairs() -> str:
    """Twin of dedup.semantic_duplicates: within-cell self-join,
    rounded-6 exact cosine at SEM_THRESHOLD."""
    return f"""
WITH assigned AS MATERIALIZED ({_sem_assigned()}),
scored AS ({_sem_pairs_body()})
SELECT vec_a, vec_b, cos_sim FROM scored WHERE cos_sim >= {C.SEM_THRESHOLD}
"""


def sql_semantic_dedup() -> str:
    """Twin of dedup.semantic_dedup: the pair graph's min-label
    connected components as a recursive CTE (same construction as
    sql_dedup_groups), keep = own-id representative."""
    return f"""
WITH RECURSIVE assigned AS MATERIALIZED ({_sem_assigned()}),
scored AS ({_sem_pairs_body()}),
pairs AS (SELECT vec_a, vec_b FROM scored WHERE cos_sim >= {C.SEM_THRESHOLD}),
edges AS MATERIALIZED (
  SELECT vec_a AS src, vec_b AS dst FROM pairs
  UNION SELECT vec_b, vec_a FROM pairs),
reach(node, label) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
  WHERE r.label < e.src)
SELECT node AS vec_id, min(label) AS group_id, node = min(label) AS keep
FROM reach GROUP BY node
"""


def sql_semantic_curation() -> str:
    """Twin of dedup.semantic_curation: SemDeDup keep-set (recursive
    min-label closure) -> prototypicality over the survivors with
    per-cell quantile_cont cutoffs computed on the DEDUPED corpus."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.ann import (
        random_centroids,
    )

    cents = random_centroids(C.EMB_DIM, C.IVF_CELLS, C.IVF_SEED)

    def norm_lit(c: list[float]) -> str:
        lit = "[" + ",".join(repr(float(x)) for x in c) + "]"
        return _norm(f"({lit})", len(c))

    cos_all = "[" + ", ".join(
        f"round({_dot_lit('embedding', c)} / ({_norm('embedding', C.EMB_DIM)} * {norm_lit(c)}), 6)"
        for c in cents
    ) + "]"
    q = 1.0 - C.PROTO_DROP_FRAC
    return f"""
WITH RECURSIVE assigned AS MATERIALIZED ({_sem_assigned()}),
scored AS ({_sem_pairs_body()}),
pairs AS (SELECT vec_a, vec_b FROM scored WHERE cos_sim >= {C.SEM_THRESHOLD}),
edges AS MATERIALIZED (
  SELECT vec_a AS src, vec_b AS dst FROM pairs
  UNION SELECT vec_b, vec_a FROM pairs),
reach(node, label) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
  WHERE r.label < e.src),
kept AS (SELECT node AS vec_id FROM reach GROUP BY node HAVING node = min(label)),
proto AS MATERIALIZED (
  SELECT a.vec_id, a.cell, ({cos_all})[a.cell + 1] AS proto_score
  FROM assigned a JOIN kept k ON a.vec_id = k.vec_id),
cuts AS (SELECT cell, quantile_cont(proto_score, {q!r}) AS cut FROM proto GROUP BY cell)
SELECT p.vec_id, p.cell, p.proto_score
FROM proto p JOIN cuts c USING (cell)
WHERE coalesce(p.proto_score <= c.cut, TRUE)
"""


def sql_semantic_outliers() -> str:
    """Twin of dedup.semantic_outliers: rounded-6 cosine to the
    assigned centroid, per-cell quantile_cont cutoff (bit-identical to
    Spark's exact percentile over the same rounded multiset), keep the
    non-prototypical tail; NULL scores (zero-norm vectors) kept."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.ann import (
        random_centroids,
    )

    cents = random_centroids(C.EMB_DIM, C.IVF_CELLS, C.IVF_SEED)
    dists = "[" + ", ".join(_sq_l2_lit("embedding", c) for c in cents) + "]"

    def norm_lit(c: list[float]) -> str:
        lit = "[" + ",".join(repr(float(x)) for x in c) + "]"
        return _norm(f"({lit})", len(c))

    cos_all = "[" + ", ".join(
        f"round({_dot_lit('embedding', c)} / ({_norm('embedding', C.EMB_DIM)} * {norm_lit(c)}), 6)"
        for c in cents
    ) + "]"
    q = 1.0 - C.PROTO_DROP_FRAC
    return f"""
WITH assigned AS (
  SELECT vec_id, embedding,
         CAST(list_position(d.ds, list_min(d.ds)) - 1 AS INT) AS cell
  FROM (SELECT vec_id, embedding, {dists} AS ds FROM embeddings) d),
proto AS MATERIALIZED (
  SELECT vec_id, cell, ({cos_all})[cell + 1] AS proto_score FROM assigned),
cuts AS (SELECT cell, quantile_cont(proto_score, {q!r}) AS cut FROM proto GROUP BY cell)
SELECT p.vec_id, p.cell, p.proto_score,
       coalesce(p.proto_score <= c.cut, TRUE) AS keep
FROM proto p JOIN cuts c USING (cell)
"""


def sql_embedding_dup_pairs_multiprobe() -> str:
    """Twin of dedup.embedding_cosine_duplicates_multiprobe: bucket +
    margin-gated single-bit flips per vector, pairs on any shared
    emitted bucket, exact-cosine verify. Dots and the margin gate are
    rounded to 10 dp on both engines so boundary emissions agree."""
    planes = random_planes(C.EMB_DIM, C.ANN_PLANES, C.ANN_SEED)
    dots = [
        f"round({_dot_lit('embedding', planes[j])}, 10)"
        for j in range(C.ANN_PLANES)
    ]
    bucket = (
        "CAST(("
        + " + ".join(
            f"(CASE WHEN d{j} >= 0 THEN {1 << j} ELSE 0 END)"
            for j in range(C.ANN_PLANES)
        )
        + ") AS INT)"
    )
    dot_cols = ", ".join(f"{d} AS d{j}" for j, d in enumerate(dots))
    flip_elems = ", ".join(
        f"CASE WHEN abs(d{j}) < gate THEN xor(bucket, {1 << j}) END"
        for j in range(C.ANN_PLANES)
    )
    cos = (
        f"{_dot('a.embedding', 'b.embedding', C.EMB_DIM)} / "
        f"({_norm('a.embedding', C.EMB_DIM)} * {_norm('b.embedding', C.EMB_DIM)})"
    )
    return f"""
WITH dotted AS MATERIALIZED (
  SELECT vec_id, embedding, {dot_cols},
         round({_norm('embedding', C.EMB_DIM)} * {C.ANN_PROBE_MARGIN}, 10) AS gate
  FROM embeddings),
with_bucket AS (SELECT *, {bucket} AS bucket FROM dotted),
probed AS MATERIALIZED (
  SELECT vec_id, embedding,
         unnest(list_concat([bucket], list_filter([{flip_elems}], x -> x IS NOT NULL))) AS pbucket
  FROM with_bucket),
scored AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b, round({cos}, 6) AS cos_sim
  FROM probed a JOIN probed b ON a.pbucket = b.pbucket
  WHERE a.vec_id < b.vec_id)
SELECT vec_a, vec_b, cos_sim FROM scored WHERE cos_sim >= 0.3
"""


def sql_text_stats() -> str:
    toks = "list_filter(string_split(text, ' '), x -> x <> '')"
    nospace = "regexp_replace(text, '\\s+', '', 'g')"
    nopunct = f"regexp_replace({nospace}, '[A-Za-z0-9]', '', 'g')"
    stop = "[" + ",".join(f"'{s}'" for s in ENGLISH_STOPWORDS) + "]"
    toks_lower = "list_filter(string_split(lower(text), ' '), x -> x <> '')"
    return f"""
WITH base AS (
  SELECT doc_id, text, {toks} AS t, {toks_lower} AS tl,
         length({nospace}) AS n_nospace, length({nopunct}) AS n_punct
  FROM documents),
stats AS (
  SELECT doc_id,
    CAST(len(t) AS INT) AS n_tokens,
    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS n_bpe_tokens,
    CAST(length(text) AS INT) AS n_chars_text,
    CASE WHEN len(t) > 0 THEN list_reduce(list_prepend(0, list_transform(t, x -> length(x)::INT)), (a, x) -> a + x) / len(t) ELSE 0.0 END AS avg_word_len,
    CASE WHEN len(t) > 0 THEN len(list_distinct(t)) / len(t) ELSE 0.0 END AS distinct_ratio,
    CASE WHEN len(tl) > 0 THEN len(list_filter(tl, x -> list_contains({stop}, x))) / len(tl) ELSE 0.0 END AS stopword_ratio,
    CASE WHEN n_nospace > 0 THEN n_punct / n_nospace ELSE 0.0 END AS punct_ratio,
    len(t) AS nt
  FROM base)
SELECT doc_id, n_tokens, n_bpe_tokens, n_chars_text, avg_word_len, distinct_ratio,
       stopword_ratio, punct_ratio,
       0.4 * least(1.0, nt / 50.0) + 0.4 * distinct_ratio + 0.2 * (1.0 - least(1.0, 4.0 * punct_ratio)) AS quality
FROM stats
"""


def sql_corpus_clean(src: str = "documents") -> str:
    """Composite pipeline: quality >= 0.5 filter -> exact dedup (min
    doc_id per normalized-content hash) -> token accounting. Quality
    arithmetic is written in the exact op order of
    ``textstats.quality_score`` (the text_stats oracle already
    hash-matches it bit-for-bit, so the >= 0.5 boundary selects
    identical rows). ``src``: source relation/subquery (the full-prep
    pipeline cleans only its training subset — the exact-dedup window
    must see the SAME rows the engine's window sees)."""
    norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    toks = "list_filter(string_split(text, ' '), x -> x <> '')"
    nospace = "regexp_replace(text, '\\s+', '', 'g')"
    nopunct = f"regexp_replace({nospace}, '[A-Za-z0-9]', '', 'g')"
    return f"""
WITH base AS (
  SELECT doc_id, text, {toks} AS t,
         length({nospace}) AS n_nospace, length({nopunct}) AS n_punct
  FROM {src}),
scored AS (
  SELECT doc_id,
    {H(norm)} AS content_hash,
    CAST(len(t) AS INT) AS n_tokens,
    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS n_bpe_tokens,
    0.4 * least(1.0, len(t) / 50.0)
      + 0.4 * (CASE WHEN len(t) > 0 THEN len(list_distinct(t)) / len(t) ELSE 0.0 END)
      + 0.2 * (1.0 - least(1.0, 4.0 * (CASE WHEN n_nospace > 0 THEN n_punct / n_nospace ELSE 0.0 END)))
      AS quality
  FROM base),
kept AS (
  SELECT *, row_number() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rn
  FROM scored WHERE quality >= 0.5)
SELECT doc_id, content_hash, n_tokens, n_bpe_tokens, quality
FROM kept WHERE rn = 1
"""


def sql_corpus_dedup_pipeline() -> str:
    """Composed twin of q_corpus_dedup_pipeline: corpus_clean survivors
    -> survivor-restricted LSH pair graph -> recursive-CTE connected
    components -> min-doc_id representative per component + group size.
    """
    clean = sql_corpus_clean().strip()
    return f"""
WITH RECURSIVE clean AS MATERIALIZED ({clean}),
sigs AS MATERIALIZED ({SIGS}),
bands AS MATERIALIZED ({BANDS}),
kb AS (SELECT b.* FROM bands b JOIN clean USING (doc_id)),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM kb a JOIN kb b USING (band_id, band_hash)
  WHERE a.doc_id < b.doc_id),
pairs AS (
  SELECT doc_a, doc_b
  FROM cand p JOIN sigs sa ON sa.doc_id = p.doc_a JOIN sigs sb ON sb.doc_id = p.doc_b
  WHERE list_sum(list_transform(range({NP}), i -> CASE WHEN sa.sigl[i+1] = sb.sigl[i+1] THEN 1 ELSE 0 END)) / {NP} >= {C.PAIR_THRESHOLD}),
edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs),
reach(node, label) AS (
  SELECT doc_id, doc_id FROM clean
  UNION
  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
  WHERE r.label < e.src),
comp AS (SELECT node AS doc_id, min(label) AS group_id FROM reach GROUP BY node),
sizes AS (SELECT group_id, CAST(count(*) AS BIGINT) AS group_size FROM comp GROUP BY group_id)
SELECT c.doc_id, s.group_size, cl.n_tokens, cl.quality
FROM comp c JOIN sizes s USING (group_id) JOIN clean cl ON cl.doc_id = c.doc_id
WHERE c.doc_id = c.group_id
"""


def sql_full_prep_pipeline() -> str:
    """Composed twin of q_full_prep_pipeline: train-subset clean ->
    survivor pair graph -> recursive-CTE components -> representatives
    -> decontamination vs the %17 benchmark side -> hash split ->
    train-side sequence packing. Every fragment reuses an
    independently hash-proven rendering."""
    clean = sql_corpus_clean(
        "(SELECT * FROM documents WHERE doc_id % 17 != 0)"
    ).strip()
    est = (
        f"list_sum(list_transform(range({NP}), i -> CASE WHEN sa.sigl[i+1] = sb.sigl[i+1] "
        f"THEN 1 ELSE 0 END)) / {NP}"
    )
    h = H(f"CAST(doc_id AS VARCHAR) || ':{C.SPLIT_SEED}'")
    return f"""
WITH RECURSIVE clean AS MATERIALIZED ({clean}),
sigs AS MATERIALIZED ({SIGS}),
bands AS MATERIALIZED ({BANDS}),
kb AS (SELECT b.* FROM bands b JOIN clean USING (doc_id)),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM kb a JOIN kb b USING (band_id, band_hash)
  WHERE a.doc_id < b.doc_id),
pairs AS (
  SELECT doc_a, doc_b
  FROM cand p JOIN sigs sa ON sa.doc_id = p.doc_a JOIN sigs sb ON sb.doc_id = p.doc_b
  WHERE {est} >= {C.PAIR_THRESHOLD}),
edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs),
reach(node, label) AS (
  SELECT doc_id, doc_id FROM clean
  UNION
  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
  WHERE r.label < e.src),
comp AS (SELECT node AS doc_id, min(label) AS group_id FROM reach GROUP BY node),
reps AS (SELECT doc_id FROM comp WHERE doc_id = group_id),
rb AS (SELECT b.* FROM bands b JOIN reps USING (doc_id)),
bench_bands AS (SELECT doc_id AS ref_id, band_id, band_hash FROM bands WHERE doc_id % 17 = 0),
dc_cand AS (
  SELECT DISTINCT t.doc_id, r.ref_id
  FROM rb t JOIN bench_bands r USING (band_id, band_hash)),
flagged AS (
  SELECT DISTINCT c.doc_id
  FROM dc_cand c JOIN sigs sa ON sa.doc_id = c.doc_id JOIN sigs sb ON sb.doc_id = c.ref_id
  WHERE {est} >= {C.PAIR_THRESHOLD}),
surviving AS (
  SELECT doc_id FROM reps
  WHERE doc_id NOT IN (SELECT doc_id FROM flagged)),
train AS (
  SELECT doc_id FROM surviving
  WHERE ({h} % 1000) >= {C.SPLIT_VAL_PERMILLE}),
counts AS (
  SELECT c.doc_id, CAST(c.n_tokens AS BIGINT) AS n_tokens, c.quality
  FROM clean c JOIN train USING (doc_id)),
b2 AS (
  SELECT doc_id, n_tokens, quality,
    coalesce(SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM counts)
SELECT doc_id, n_tokens, quality,
       CAST(before // {C.PACK_BUDGET} AS BIGINT) AS chunk_id,
       CAST(before % {C.PACK_BUDGET} AS BIGINT) AS chunk_offset
FROM b2
"""


def sql_char_shingle_stats() -> str:
    """Char 3-grams: strings shorter than k yield the whole string
    (mirrors functions.text.char_shingles)."""
    grams = (
        "CASE WHEN length(text) < 3 THEN [text] "
        "ELSE list_transform(range(length(text) - 2), i -> substr(text, CAST(i + 1 AS INT), 3)) END"
    )
    return (
        f"SELECT doc_id, CAST(len(list_distinct({grams})) AS INT) AS n_char_shingles "
        f"FROM documents"
    )


def sql_lang_id() -> str:
    toks_lower = "list_filter(string_split(lower(text), ' '), x -> x <> '')"
    langs = sorted(LANG_MARKERS)
    hit_cols = []
    for lang in langs:
        markers = "[" + ",".join(f"'{m}'" for m in LANG_MARKERS[lang]) + "]"
        hit_cols.append(
            f"len(list_filter(tl, x -> list_contains({markers}, x))) AS h_{lang}"
        )
    mx = "greatest(" + ", ".join(f"h_{l}" for l in langs) + ")"
    case = "CASE WHEN " + f"{mx} = 0 THEN 'und' "
    for lang in langs:  # alphabetical: first max wins (matches Spark)
        case += f"WHEN h_{lang} = {mx} THEN '{lang}' "
    case += "END"
    return f"""
WITH base AS (SELECT doc_id, {toks_lower} AS tl FROM documents),
hits AS (SELECT doc_id, {', '.join(hit_cols)} FROM base)
SELECT doc_id, {case} AS lang_guess FROM hits
"""


def sql_token_frequencies() -> str:
    """Mirrors q_token_frequencies: corpus-wide token counts, top 200
    by (count desc, token asc)."""
    return """
WITH t AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
  FROM documents),
c AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY token)
SELECT token, cnt, CAST(row_number() OVER (ORDER BY cnt DESC, token) AS INT) AS rank
FROM c ORDER BY cnt DESC, token LIMIT 200
"""


def sql_corpus_report() -> str:
    """Mirrors q_corpus_report: per-lang doc counts, token totals, and
    the decimal-summed (order-independent) mean quality."""
    toks = "list_filter(string_split(text, ' '), x -> x <> '')"
    toks_lower = "list_filter(string_split(lower(text), ' '), x -> x <> '')"
    nospace = "regexp_replace(text, '\\s+', '', 'g')"
    nopunct = f"regexp_replace({nospace}, '[A-Za-z0-9]', '', 'g')"
    langs = sorted(LANG_MARKERS)
    hit_cols = []
    for lang in langs:
        markers = "[" + ",".join(f"'{m}'" for m in LANG_MARKERS[lang]) + "]"
        hit_cols.append(
            f"len(list_filter(tl, x -> list_contains({markers}, x))) AS h_{lang}"
        )
    mx = "greatest(" + ", ".join(f"h_{l}" for l in langs) + ")"
    case = "CASE WHEN " + f"{mx} = 0 THEN 'und' "
    for lang in langs:
        case += f"WHEN h_{lang} = {mx} THEN '{lang}' "
    case += "END"
    quality = (
        "0.4 * least(1.0, len(t) / 50.0)"
        " + 0.4 * (CASE WHEN len(t) > 0 THEN len(list_distinct(t)) / len(t) ELSE 0.0 END)"
        " + 0.2 * (1.0 - least(1.0, 4.0 * (CASE WHEN n_nospace > 0 THEN n_punct / n_nospace ELSE 0.0 END)))"
    )
    return f"""
WITH base AS (
  SELECT doc_id, {toks} AS t, {toks_lower} AS tl,
         length({nospace}) AS n_nospace, length({nopunct}) AS n_punct
  FROM documents),
hits AS (SELECT doc_id, t, n_nospace, n_punct, {', '.join(hit_cols)} FROM base),
scored AS (
  SELECT {case} AS lang_guess,
         CAST(len(t) AS INT) AS n_tokens,
         {quality} AS quality
  FROM hits)
SELECT lang_guess, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       round(CAST(SUM(CAST(quality AS DECIMAL(20,12))) AS DOUBLE) / count(*), 6) AS avg_quality
FROM scored GROUP BY lang_guess
"""


def sql_doc_fingerprints() -> str:
    return f"""
SELECT doc_id,
  CAST(list_reduce(list_prepend(0::BIGINT, list_transform(t, s -> {HMOD('s')})),
       (acc, h) -> (acc * 31 + h) % {P}) AS BIGINT) AS fp
FROM ({TOKS})
"""


def sql_ann_buckets() -> str:
    return f"SELECT vec_id, {_bucket_expr('embedding')} AS bucket FROM embeddings"


def sql_ann_lsh_topk() -> str:
    cos = (
        f"{_dot('e.embedding', 'q.qv', C.EMB_DIM)} / "
        f"({_norm('e.embedding', C.EMB_DIM)} * {_norm('q.qv', C.EMB_DIM)})"
    )
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {C.QUERY_VEC}),
bucketed AS (SELECT vec_id, embedding, {_bucket_expr('embedding')} AS bucket FROM embeddings),
scored AS (
  SELECT e.vec_id, round({cos}, 6) AS cos_sim
  FROM bucketed e, q
  WHERE e.bucket = (SELECT bucket FROM bucketed WHERE vec_id = {C.QUERY_VEC}))
SELECT vec_id, cos_sim, CAST(row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS INT) AS rank
FROM scored ORDER BY cos_sim DESC, vec_id LIMIT {C.K_BATCH}
"""


def _sq_l2_lit(vec: str, centroid: list[float]) -> str:
    """Squared-L2 to a literal centroid, mirroring ann.ivf_assign's
    zip_with(pow(x-y,2)) + sequential fold exactly."""
    lit = "[" + ",".join(repr(float(x)) for x in centroid) + "]"
    return (
        f"list_reduce(list_prepend(0.0, list_transform(range({len(centroid)}), "
        f"i -> pow({vec}[i+1]::DOUBLE - ({lit})[i+1], 2))), (acc, x) -> acc + x)"
    )


def sql_ivf_topk() -> str:
    """Mirrors ann.ivf_topk: assign = argmin (first-tie) of squared-L2
    to IVF_CELLS seeded centroids; probe the IVF_PROBE cells nearest
    the query (distance fold identical to the Spark driver's
    sequential Python sum); exact L2 on survivors."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.ann import (
        random_centroids,
    )

    cents = random_centroids(C.EMB_DIM, C.IVF_CELLS, C.IVF_SEED)
    dists = "[" + ", ".join(_sq_l2_lit("embedding", c) for c in cents) + "]"
    qdists = "[" + ", ".join(_sq_l2_lit("q.qv", c) for c in cents) + "]"
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {C.QUERY_VEC}),
probe AS (
  SELECT CAST(u.c AS INT) AS cell
  FROM q, (SELECT unnest(range({C.IVF_CELLS})) AS c) u
  ORDER BY ({qdists})[u.c + 1], u.c LIMIT {C.IVF_PROBE}),
assigned AS (
  SELECT vec_id, embedding,
         CAST(list_position(d.ds, list_min(d.ds)) - 1 AS INT) AS cell
  FROM (SELECT vec_id, embedding, {dists} AS ds FROM embeddings) d),
scored AS (
  SELECT e.vec_id, round({_l2('e.embedding', 'q.qv', C.EMB_DIM)}, 6) AS dist
  FROM assigned e, q
  WHERE e.cell IN (SELECT cell FROM probe))
SELECT vec_id, dist, CAST(row_number() OVER (ORDER BY dist ASC, vec_id) AS INT) AS rank
FROM scored ORDER BY dist ASC, vec_id LIMIT {C.K_VEC}
"""


def sql_ivf_topk_alpha() -> str:
    """Mirrors ann.ivf_topk_alpha: probe every cell whose center
    distance is within (1 + IVF_PROBE_ALPHA) of the nearest center's —
    the rule re-derived independently in SQL (sqrt of the same
    sequential fold), not inlined from the Spark plan."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.ann import (
        random_centroids,
    )

    cents = random_centroids(C.EMB_DIM, C.IVF_CELLS, C.IVF_SEED)
    dists = "[" + ", ".join(_sq_l2_lit("embedding", c) for c in cents) + "]"
    qdists = "[" + ", ".join(_sq_l2_lit("q.qv", c) for c in cents) + "]"
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {C.QUERY_VEC}),
qcell AS (
  SELECT CAST(u.c AS INT) AS cell, sqrt(({qdists})[u.c + 1]) AS d
  FROM q, (SELECT unnest(range({C.IVF_CELLS})) AS c) u),
probe AS (
  SELECT cell FROM qcell
  WHERE d <= (1.0 + {C.IVF_PROBE_ALPHA!r}) * (SELECT min(d) FROM qcell)),
assigned AS (
  SELECT vec_id, embedding,
         CAST(list_position(d.ds, list_min(d.ds)) - 1 AS INT) AS cell
  FROM (SELECT vec_id, embedding, {dists} AS ds FROM embeddings) d),
scored AS (
  SELECT e.vec_id, round({_l2('e.embedding', 'q.qv', C.EMB_DIM)}, 6) AS dist
  FROM assigned e, q
  WHERE e.cell IN (SELECT cell FROM probe))
SELECT vec_id, dist, CAST(row_number() OVER (ORDER BY dist ASC, vec_id) AS INT) AS rank
FROM scored ORDER BY dist ASC, vec_id LIMIT {C.K_VEC}
"""


def sql_ivf_topk_batch() -> str:
    """Mirrors ann.ivf_topk_batch: per-query probe cells (same
    sequential-fold distances, ties by cell index) for the first
    BATCH_DOCS vectors, exact L2 on the probed cells' members."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.ann import (
        random_centroids,
    )

    cents = random_centroids(C.EMB_DIM, C.IVF_CELLS, C.IVF_SEED)
    dists = "[" + ", ".join(_sq_l2_lit("embedding", c) for c in cents) + "]"
    qdists = "[" + ", ".join(_sq_l2_lit("q.qv", c) for c in cents) + "]"
    return f"""
WITH qs AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {C.BATCH_DOCS}),
probe AS (
  SELECT query_id, cell FROM (
    SELECT q.query_id, CAST(u.c AS INT) AS cell,
           row_number() OVER (PARTITION BY q.query_id ORDER BY ({qdists})[u.c + 1], u.c) AS rn
    FROM qs q, (SELECT unnest(range({C.IVF_CELLS})) AS c) u)
  WHERE rn <= {C.IVF_PROBE}),
assigned AS (
  SELECT vec_id, embedding,
         CAST(list_position(d.ds, list_min(d.ds)) - 1 AS INT) AS cell
  FROM (SELECT vec_id, embedding, {dists} AS ds FROM embeddings) d),
scored AS (
  SELECT p.query_id, e.vec_id, round({_l2('e.embedding', 'q.qv', C.EMB_DIM)}, 6) AS dist
  FROM assigned e JOIN probe p USING (cell) JOIN qs q ON q.query_id = p.query_id)
SELECT query_id, vec_id, dist, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY dist ASC, vec_id) AS INT) AS rank
  FROM scored)
WHERE rank <= {C.K_BATCH}
"""


def sql_quality_metrics() -> str:
    """Mirrors operators/metrics.quality_metrics over the LSH batch
    result vs the exact est-Jaccard oracle at k=K_BATCH."""
    k = C.K_BATCH
    return f"""
WITH sigs AS ({SIGS}),
bands AS ({BANDS}),
queries AS (SELECT doc_id AS query_id, sigl AS q FROM sigs WHERE doc_id < {C.BATCH_DOCS}),
qb AS (SELECT b.doc_id AS query_id, b.band_id, b.band_hash FROM bands b WHERE b.doc_id < {C.BATCH_DOCS}),
cand AS (SELECT DISTINCT qb.query_id, bands.doc_id FROM bands JOIN qb USING (band_id, band_hash)),
lsh_scored AS (
  SELECT c.query_id, c.doc_id, {_EST_JACCARD} AS score
  FROM cand c JOIN sigs s ON s.doc_id = c.doc_id JOIN queries q ON q.query_id = c.query_id),
pred AS (
  SELECT query_id, list(doc_id ORDER BY rank) AS pred_ids FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
    FROM lsh_scored) WHERE rank <= {k} GROUP BY query_id),
exact_scored AS (
  SELECT q.query_id, s.doc_id, {_EST_JACCARD} AS score FROM sigs s, queries q),
truth AS (
  SELECT query_id, list(doc_id ORDER BY rank) AS truth_ids FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
    FROM exact_scored) WHERE rank <= {k} GROUP BY query_id),
per_query AS (
  SELECT p.query_id,
    CAST(len(list_intersect(p.pred_ids, t.truth_ids)) AS DOUBLE) / {k} AS recall,
    CAST(len(list_intersect(p.pred_ids, t.truth_ids)) AS DOUBLE) / len(list_distinct(p.pred_ids)) AS precision,
    coalesce(1.0 / nullif(CAST(list_position(list_transform(p.pred_ids, x -> list_contains(t.truth_ids, x)), true) AS DOUBLE), 0.0), 0.0) AS rr
  FROM pred p JOIN truth t ON p.query_id = t.query_id)
SELECT round(avg(recall), 6) AS recall_at_k, round(avg(precision), 6) AS precision_at_k,
       round(avg(rr), 6) AS mrr, count(*) AS n_queries
FROM per_query
"""


def sql_lsh_topk_preview() -> str:
    return f"""
WITH topk AS ({sql_lsh_topk().strip()})
SELECT t.query_id, t.doc_id, t.score, t.rank,
       array_to_string(list_transform(s.sigl[1:10], v -> v::VARCHAR), ',') AS preview,
       d.n_chars
FROM topk t JOIN ({SIGS}) s ON s.doc_id = t.doc_id
JOIN documents d ON d.doc_id = t.doc_id
"""


def sql_padded_topk() -> str:
    return f"""
WITH topk AS ({sql_lsh_topk().strip()}),
ids AS (SELECT query_id, list(doc_id ORDER BY rank) AS ids FROM topk GROUP BY query_id),
padded AS (
  SELECT query_id,
         (ids || list_transform(range({C.K_DOC}), x -> CAST(-1 AS BIGINT)))[1:{C.K_DOC}] AS p
  FROM ids)
SELECT query_id, CAST(pos AS INT) AS pos, p[pos] AS doc_id
FROM padded, (SELECT unnest(range(1, {C.K_DOC + 1})) AS pos)
"""


def sql_sig_stats() -> str:
    return (
        f"SELECT doc_id, list_min(sigl) AS sig_min, list_max(sigl) AS sig_max, "
        f"sigl[1] AS sig_first, sigl[{NP}] AS sig_last FROM ({SIGS})"
    )


def sql_tpch_q3() -> str:
    return """
SELECT l_orderkey,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_shipdate > TIMESTAMP '1997-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
             (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) DESC,
         l_orderkey
LIMIT 10
"""


def sql_events_window_scan() -> str:
    return """
SELECT event_id, ts, user_id, value FROM events
WHERE event_type = 'click'
  AND ts >= TIMESTAMP '2024-01-02 00:00:00'
  AND ts < TIMESTAMP '2024-01-03 00:00:00'
"""


def sql_ngram_jaccard_pairs() -> str:
    """Mirrors dedup.ngram_jaccard_duplicates(n=3, threshold=0.3) with
    its default recall-heavy blocking (b=64, r=2) — the oracle must
    reproduce the blocking exactly since blocking determines which
    pairs are even scored."""
    n, thr, nb = 3, 0.3, 64
    rpb = NP // nb
    grams = (
        f"SELECT doc_id, list_distinct(CASE WHEN len(t) < {n} "
        f"THEN [array_to_string(t, ' ')] "
        f"ELSE list_transform(range(len(t) - {n - 1}), i -> array_to_string(t[i+1:i+{n}], ' ')) END) AS sh "
        f"FROM ({TOKS})"
    )
    hs = f"SELECT doc_id, sh, list_transform(sh, s -> {HMOD('s')}) AS h FROM ({grams})"
    sigs = (
        f"SELECT doc_id, sh, list_transform(range({NP}), p -> coalesce("
        f"list_min(list_transform(h, x -> (ca[p+1]*x + cb[p+1]) % {P})), {P})) AS sigl "
        f"FROM ({hs}), {CONSTS}"
    )
    band_str = (
        f"array_to_string(list_transform("
        f"sigl[band_id*{rpb}+1 : band_id*{rpb}+{rpb}], v -> v::VARCHAR), ',')"
    )
    bands = (
        f"SELECT doc_id, CAST(band_id AS INT) AS band_id, {H(band_str)} AS band_hash "
        f"FROM ({sigs}), (SELECT unnest(range({nb})) AS band_id) b"
    )
    jac = (
        "CASE WHEN len(list_distinct(list_concat(ga.sh, gb.sh))) = 0 THEN 0.0 "
        "ELSE CAST(len(list_intersect(ga.sh, gb.sh)) AS DOUBLE) / "
        "CAST(len(list_distinct(list_concat(ga.sh, gb.sh))) AS DOUBLE) END"
    )
    return f"""
WITH grams AS MATERIALIZED ({grams}),
bands AS MATERIALIZED ({bands}),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b USING (band_id, band_hash)
  WHERE a.doc_id < b.doc_id)
SELECT doc_a, doc_b, jaccard FROM (
  SELECT doc_a, doc_b, {jac} AS jaccard
  FROM pairs p JOIN grams ga ON ga.doc_id = p.doc_a JOIN grams gb ON gb.doc_id = p.doc_b)
WHERE jaccard >= {thr}
"""


def sql_events_hourly() -> str:
    return """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
"""


def sql_tpch_q5() -> str:
    return """
SELECT n_name,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
  count(*) AS n_items
FROM orders, customer, lineitem, supplier, nation, region
WHERE o_custkey = c_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def sql_events_sessions() -> str:
    """Gaps-and-islands replica of Spark's ``session_window(ts, '30
    minutes')`` per user: an event at exactly ``prev_ts + gap`` still
    merges (verified against Spark), so a NEW session starts only when
    the gap is STRICTLY exceeded; ``session_end = max(ts) + gap``."""
    return """
WITH seq AS (
  SELECT user_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
  FROM events
), marked AS (
  SELECT user_id, ts, value,
         CASE WHEN prev_ts IS NULL
                OR ts > prev_ts + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM seq
), numbered AS (
  SELECT user_id, ts, value,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sess
  FROM marked
)
SELECT min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       user_id,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM numbered
GROUP BY user_id, sess
"""


def sql_events_sliding() -> str:
    """Spark ``window(ts, '1 hour', '15 minutes')``: each event belongs
    to the 4 epoch-aligned 15-minute window starts in (ts-1h, ts];
    expanded here with an explicit 0..3 offset cross join.
    ``time_bucket`` truncates sub-second precision like Spark's window
    does, and its origin (2000-01-03) sits on a 15-minute epoch
    boundary, so buckets coincide with Spark's."""
    return """
SELECT window_start,
       window_start + INTERVAL 60 MINUTE AS window_end,
       event_type,
       count(*) AS n_events
FROM (
  SELECT time_bucket(INTERVAL 15 MINUTE, ts) - k.k * INTERVAL 15 MINUTE
           AS window_start,
         event_type
  FROM events
  CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) AS k
)
GROUP BY 1, 2, 3
"""


def sql_lineitem_pricing() -> str:
    return """
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
  count(*) AS count_order
FROM lineitem WHERE l_shipdate < TIMESTAMP '2000-01-01'
GROUP BY l_returnflag, l_linestatus
"""


def sql_top_customers_per_nation() -> str:
    return """
SELECT n_name, c_custkey, c_acctbal, CAST(rn AS INT) AS rn FROM (
  SELECT c.*, n.n_name,
         row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey)
WHERE rn <= 3
"""


def sql_orders_by_region() -> str:
    return """
SELECT r_name, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r_name
"""


def sql_ann_multiprobe_topk() -> str:
    """Mirrors ann.ann_lsh_topk(n_probe=ANN_PROBE): per-plane margins
    on the query vector (same sequential fold), main sign bucket plus
    the ANN_PROBE-1 lowest-|margin| bit flips, exact cosine on the
    union of probed buckets."""
    planes = random_planes(C.EMB_DIM, C.ANN_PLANES, C.ANN_SEED)
    margin_rows = " UNION ALL ".join(
        f"SELECT {j} AS j, {_dot_lit('q.qv', planes[j])} AS d FROM q"
        for j in range(C.ANN_PLANES)
    )
    cos = (
        f"{_dot('e.embedding', 'q.qv', C.EMB_DIM)} / "
        f"({_norm('e.embedding', C.EMB_DIM)} * {_norm('q.qv', C.EMB_DIM)})"
    )
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {C.QUERY_VEC}),
margins AS ({margin_rows}),
b0 AS (SELECT CAST(SUM(CASE WHEN d >= 0 THEN 1 << j ELSE 0 END) AS INT) AS b FROM margins),
probes AS (
  SELECT b FROM b0
  UNION ALL
  SELECT CAST(xor(b0.b, 1 << m.j) AS INT)
  FROM b0, (SELECT j FROM margins ORDER BY abs(d), j LIMIT {C.ANN_PROBE - 1}) m),
bucketed AS (SELECT vec_id, embedding, {_bucket_expr('embedding')} AS bucket FROM embeddings),
scored AS (
  SELECT e.vec_id, round({cos}, 6) AS cos_sim
  FROM bucketed e, q
  WHERE e.bucket IN (SELECT b FROM probes))
SELECT vec_id, cos_sim, CAST(row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS INT) AS rank
FROM scored ORDER BY cos_sim DESC, vec_id LIMIT {C.K_BATCH}
"""


def sql_ann_target_recall_topk() -> str:
    """Mirrors ann.ann_lsh_topk_target_recall: the probe COUNT comes
    from probe_plan_for_recall's logistic flip model — per-plane
    normalized margins m_j = round(d_j/||q||, 10), flip odds
    exp(-a*|m_j|) with a = 1.702*cos/sin(theta) (a config constant,
    embedded as a literal), subset mass = base_mass * exp(-a * cost),
    masses accumulated in probe_buckets' own nondecreasing RAW-cost
    order until the estimate reaches ANN_TARGET_RECALL (so counting
    and selection walk the identical sequence; the prefix is exactly
    the masks with cum_before < target).
    The probed SET is then the base bucket plus that many cheapest
    bit-flip masks by RAW |margin| cost (probe_buckets' order), and
    scoring is the standard exact-cosine top-k over the union."""
    import math

    planes = random_planes(C.EMB_DIM, C.ANN_PLANES, C.ANN_SEED)
    a = 1.702 * C.ANN_TARGET_COS / math.sqrt(1.0 - C.ANN_TARGET_COS**2)
    n_masks = 1 << C.ANN_PLANES
    margin_rows = " UNION ALL ".join(
        f"SELECT {j} AS j, {_dot_lit('q.qv', planes[j])} AS d FROM q"
        for j in range(C.ANN_PLANES)
    )
    cos = (
        f"{_dot('e.embedding', 'q.qv', C.EMB_DIM)} / "
        f"({_norm('e.embedding', C.EMB_DIM)} * {_norm('q.qv', C.EMB_DIM)})"
    )
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {C.QUERY_VEC}),
margins AS ({margin_rows}),
nm AS (SELECT j, d, round(d / (SELECT {_norm('qv', C.EMB_DIM)} FROM q), 10) AS m FROM margins),
b0 AS (SELECT CAST(SUM(CASE WHEN d >= 0 THEN 1 << j ELSE 0 END) AS INT) AS b FROM margins),
base AS (
  SELECT list_reduce(list_prepend(1.0, list(1.0 / (1.0 + exp(-({a!r}) * abs(m))) ORDER BY j)),
                     (acc, x) -> acc * x) AS mass
  FROM nm),
mask_cost AS (
  SELECT CAST(u.msk AS INT) AS msk,
    (SELECT coalesce(SUM(abs(nm.m)), 0.0) FROM nm WHERE ((u.msk >> nm.j) & 1) = 1) AS cost_norm,
    (SELECT coalesce(SUM(abs(margins.d)), 0.0) FROM margins WHERE ((u.msk >> margins.j) & 1) = 1) AS cost_raw
  FROM (SELECT unnest(range(1, {n_masks})) AS msk) u),
counted AS (
  SELECT msk, cost_raw,
    coalesce(SUM((SELECT mass FROM base) * exp(-({a!r}) * cost_norm))
      OVER (ORDER BY cost_raw, msk ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS cum_prev
  FROM mask_cost),
nsel AS (
  SELECT COUNT(*) AS n_extra FROM counted
  WHERE (SELECT mass FROM base) + cum_prev < {C.ANN_TARGET_RECALL!r}),
probes AS (
  SELECT b FROM b0
  UNION ALL
  SELECT CAST(xor(b0.b, mc.msk) AS INT)
  FROM b0, (SELECT msk FROM mask_cost ORDER BY cost_raw, msk
            LIMIT (SELECT n_extra FROM nsel)) mc),
bucketed AS (SELECT vec_id, embedding, {_bucket_expr('embedding')} AS bucket FROM embeddings),
scored AS (
  SELECT e.vec_id, round({cos}, 6) AS cos_sim
  FROM bucketed e, q
  WHERE e.bucket IN (SELECT b FROM probes))
SELECT vec_id, cos_sim, CAST(row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS INT) AS rank
FROM scored ORDER BY cos_sim DESC, vec_id LIMIT {C.K_BATCH}
"""


def sql_media_embedding_topk() -> str:
    """Mirrors q_media_embedding_topk: the md5-derived feature bytes
    (same derivation sql_media_features hash-proves) as integer-valued
    double embeddings, exact cosine top-k for the QUERY_VEC media item
    — fold order identical to the engine's cosine_similarity."""
    vec = (
        "list_transform(generate_series(1, 16), j -> CAST(CAST('0x' || "
        "substr(md5(repeat(md5('42' || CAST(id AS VARCHAR)), 8) || '0'), "
        "2 * j - 1, 2) AS INT) AS DOUBLE))"
    )
    cos = f"{_dot('e.v', 'q.qv', 16)} / ({_norm('e.v', 16)} * {_norm('q.qv', 16)})"
    return f"""
WITH m AS (SELECT id AS media_id, {vec} AS v FROM range(200) t(id)),
q AS (SELECT v AS qv FROM m WHERE media_id = {C.QUERY_VEC}),
scored AS (SELECT e.media_id, round({cos}, 6) AS cos_sim FROM m e, q)
SELECT CAST({C.QUERY_VEC} AS BIGINT) AS query_id, media_id AS vec_id, cos_sim,
       CAST(row_number() OVER (ORDER BY cos_sim DESC, media_id) AS INT) AS rank
FROM scored ORDER BY cos_sim DESC, media_id LIMIT {C.K_BATCH}
"""


def sql_media_features() -> str:
    """Mirror of multimodal.media: payload = unhex(repeat(md5('42'||id),8));
    feature byte j = byte j of md5(hex(payload) || '0')."""
    return """
SELECT id AS media_id,
       CASE id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       128 AS n_bytes,
       array_to_string(list_transform(generate_series(1, 16), j ->
           CAST(CAST('0x' || substr(md5(repeat(md5('42' || CAST(id AS VARCHAR)), 8) || '0'),
                               2 * j - 1, 2) AS INT) AS VARCHAR)
       ), ',') AS features_u8
FROM range(200) t(id)
"""


def sql_media_frames() -> str:
    """Video rows only (id % 3 = 2); frame i slices 16 bytes at
    (i*16) % 128 of the 128-byte payload, hex-encoded."""
    return """
WITH media AS (
  SELECT id AS media_id,
         (id % 1000) * 33 AS duration_ms,
         repeat(md5('42' || CAST(id AS VARCHAR)), 8) AS ph
  FROM range(200) t(id)
  WHERE id % 3 = 2
)
SELECT media_id,
       CAST(f.frame_idx AS INT) AS frame_idx,
       substr(ph, ((f.frame_idx * 16) % 128) * 2 + 1, 32) AS frame_hex
FROM media,
     LATERAL (SELECT unnest(generate_series(0, greatest(1, duration_ms // 1000) - 1)) AS frame_idx) f
"""


def sql_mllib_pairs_verified() -> str:
    """Brute-force all-pairs exact token-set Jaccard >= threshold: the
    ground truth the MLlib approxSimilarityJoin path must reproduce
    once its pairs are re-scored with the exact Jaccard."""
    return f"""
WITH sh AS MATERIALIZED (
  SELECT doc_id, list_distinct(t) AS sh FROM ({TOKS}))
SELECT doc_a, doc_b, jaccard FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
           / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jaccard
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
WHERE jaccard >= {C.PAIR_THRESHOLD}
"""


def sql_dedup_groups() -> str:
    """Connected components over the LSH near-dup pair graph as a
    recursive CTE: reach(node, label) is the transitive closure along
    (undirected) edges; min(label) per node is exactly the min-label
    fixpoint that ``dedup.connected_components`` iterates to. Singleton
    docs keep their own id via the closure's base case."""
    return f"""
WITH RECURSIVE sigs AS MATERIALIZED ({SIGS}),
bands AS MATERIALIZED ({BANDS}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b USING (band_id, band_hash)
  WHERE a.doc_id < b.doc_id),
pairs AS (
  SELECT doc_a, doc_b
  FROM cand p JOIN sigs sa ON sa.doc_id = p.doc_a JOIN sigs sb ON sb.doc_id = p.doc_b
  WHERE list_sum(list_transform(range({NP}), i -> CASE WHEN sa.sigl[i+1] = sb.sigl[i+1] THEN 1 ELSE 0 END)) / {NP} >= {C.PAIR_THRESHOLD}),
edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs),
reach(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
  WHERE r.label < e.src)
SELECT node AS doc_id, min(label) AS group_id FROM reach GROUP BY node
"""


def _ngram_list(n: int) -> str:
    """DuckDB list of word n-grams over ``t`` (multiset, empty when the
    doc has < n tokens) — mirrors textstats.word_ngram_multiset."""
    grams = (
        f"list_transform(range(1, len(t)-{n}+2), "
        f"i -> array_to_string(t[i:i+{n}-1], ' '))"
    )
    return f"CASE WHEN len(t) >= {n} THEN {grams} ELSE CAST([] AS VARCHAR[]) END"


def sql_repetition_stats() -> str:
    """Mirrors q_repetition_stats. The oracle counts gram multiplicity
    by unnest+GROUP BY (relational form); the engine counts row-locally
    — identical integers, and the fractions are single IEEE divisions
    on both sides. The keep rule is integer cross-multiplied, so the
    boundary is exact."""
    return f"""
WITH toks AS ({TOKS}),
base AS (
  SELECT doc_id, len(t) AS n,
         {_ngram_list(2)} AS bg,
         {_ngram_list(3)} AS tg
  FROM toks),
bgc AS (
  SELECT doc_id, max(c) AS maxc
  FROM (SELECT doc_id, g, count(*) AS c
        FROM (SELECT doc_id, unnest(bg) AS g FROM base) GROUP BY 1, 2)
  GROUP BY 1),
tgc AS (
  SELECT doc_id, sum(c) AS tot, sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup
  FROM (SELECT doc_id, g, count(*) AS c
        FROM (SELECT doc_id, unnest(tg) AS g FROM base) GROUP BY 1, 2)
  GROUP BY 1)
SELECT b.doc_id,
  CAST(b.n AS INT) AS n_tokens,
  CAST(coalesce(bgc.maxc, 0) AS INT) AS top_bigram_count,
  CASE WHEN b.n > 0
       THEN least(1.0, (2.0 * CAST(coalesce(bgc.maxc, 0) AS INT)) / CAST(b.n AS INT))
       ELSE 0.0 END AS top_bigram_frac,
  CAST(coalesce(tgc.dup, 0) AS INT) AS dup_trigram_occ,
  CASE WHEN coalesce(tgc.tot, 0) > 0
       THEN CAST(coalesce(tgc.dup, 0) AS INT) / CAST(tgc.tot AS INT)
       ELSE 0.0 END AS dup_trigram_frac,
  ({C.REP_TOP_BIGRAM_X} * CAST(coalesce(bgc.maxc, 0) AS INT) <= CAST(b.n AS INT)
   AND {C.REP_DUP_TRIGRAM_X} * CAST(coalesce(tgc.dup, 0) AS INT) <= CAST(coalesce(tgc.tot, 0) AS INT)
  ) AS keep
FROM base b LEFT JOIN bgc ON b.doc_id = bgc.doc_id
            LEFT JOIN tgc ON b.doc_id = tgc.doc_id
"""


def sql_shared_ngram_spans() -> str:
    """Mirrors dedup.shared_ngram_spans: distinct per-doc 8-grams keyed
    by the SAME portable 60-bit hash the engine shuffles on (so a hash
    collision, however unlikely, cannot diverge the two sides),
    document-frequency capped, pair-counted."""
    n, cap, ms = C.SPAN_NGRAM, C.SPAN_MAX_DOC_FREQ, C.SPAN_MIN_SHARED
    return f"""
WITH toks AS ({TOKS}),
g AS (SELECT doc_id, unnest(list_distinct({_ngram_list(n)})) AS gram FROM toks),
gh AS (SELECT doc_id, {H('gram')} AS gram_hash FROM g),
df AS (SELECT gram_hash FROM gh GROUP BY 1 HAVING count(*) BETWEEN 2 AND {cap}),
k AS (SELECT doc_id, gh.gram_hash FROM gh JOIN df USING (gram_hash))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS INT) AS shared_ngrams
FROM k a JOIN k b USING (gram_hash)
WHERE a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= {ms}
"""


def sql_mixture_sample() -> str:
    """Mirrors prep.balanced_mixture_sample: per-source thresholds
    floor(scale * min_source_tokens / source_tokens) — DuckDB's
    integer division on BIGINT/HUGEINT floors exactly like the
    engine's driver-side Python big-int arithmetic."""
    h = H(f"CAST(doc_id AS VARCHAR) || ':{C.MIX_SEED}'")
    return f"""
WITH c AS (
  SELECT doc_id, source,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS INT) AS n_tokens
  FROM documents),
g AS (SELECT source, sum(n_tokens) AS t FROM c
      WHERE source IS NOT NULL GROUP BY 1 HAVING sum(n_tokens) > 0),
thr AS (SELECT source, ({C.MIX_SCALE} * (SELECT min(t) FROM g)) // t AS thr FROM g)
SELECT doc_id, c.source, n_tokens, CAST({h} % {C.MIX_SCALE} AS INT) AS sample_bucket
FROM c JOIN thr ON c.source = thr.source
WHERE ({h} % {C.MIX_SCALE}) < thr.thr
"""


def sql_containment_pairs() -> str:
    """Mirrors dedup.containment_pairs(n=3, threshold=0.5) with the
    same recall-heavy blocking as sql_ngram_jaccard_pairs (blocking
    determines which pairs are scored); both directional ratios and
    the Jaccard are exact-integer divisions rounded to 6, and the
    either-direction threshold compares the ROUNDED values on both
    engines."""
    n, thr, nb = 3, 0.5, 64
    rpb = NP // nb
    grams = (
        f"SELECT doc_id, list_distinct(CASE WHEN len(t) < {n} "
        f"THEN [array_to_string(t, ' ')] "
        f"ELSE list_transform(range(len(t) - {n - 1}), i -> array_to_string(t[i+1:i+{n}], ' ')) END) AS sh "
        f"FROM ({TOKS})"
    )
    hs = f"SELECT doc_id, sh, list_transform(sh, s -> {HMOD('s')}) AS h FROM ({grams})"
    sigs = (
        f"SELECT doc_id, sh, list_transform(range({NP}), p -> coalesce("
        f"list_min(list_transform(h, x -> (ca[p+1]*x + cb[p+1]) % {P})), {P})) AS sigl "
        f"FROM ({hs}), {CONSTS}"
    )
    band_str = (
        f"array_to_string(list_transform("
        f"sigl[band_id*{rpb}+1 : band_id*{rpb}+{rpb}], v -> v::VARCHAR), ',')"
    )
    bands = (
        f"SELECT doc_id, CAST(band_id AS INT) AS band_id, {H(band_str)} AS band_hash "
        f"FROM ({sigs}), (SELECT unnest(range({nb})) AS band_id) b"
    )
    inter = "CAST(len(list_intersect(ga.sh, gb.sh)) AS DOUBLE)"
    ratio = lambda den: (  # noqa: E731
        f"CASE WHEN len({den}) = 0 THEN 0.0 "
        f"ELSE {inter} / CAST(len({den}) AS DOUBLE) END"
    )
    jac = (
        "CASE WHEN len(list_distinct(list_concat(ga.sh, gb.sh))) = 0 THEN 0.0 "
        "ELSE CAST(len(list_intersect(ga.sh, gb.sh)) AS DOUBLE) / "
        "CAST(len(list_distinct(list_concat(ga.sh, gb.sh))) AS DOUBLE) END"
    )
    return f"""
WITH grams AS MATERIALIZED ({grams}),
bands AS MATERIALIZED ({bands}),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b USING (band_id, band_hash)
  WHERE a.doc_id < b.doc_id)
SELECT doc_a, doc_b, containment_ab, containment_ba, jaccard FROM (
  SELECT doc_a, doc_b,
         round({ratio("ga.sh")}, 6) AS containment_ab,
         round({ratio("gb.sh")}, 6) AS containment_ba,
         round({jac}, 6) AS jaccard
  FROM pairs JOIN grams ga ON pairs.doc_a = ga.doc_id
             JOIN grams gb ON pairs.doc_b = gb.doc_id)
WHERE containment_ab >= {thr} OR containment_ba >= {thr}
"""


def _sql_containment_exact(docs_rel: str) -> str:
    """Exact directional containment over the df-capped inverted gram
    index (mirrors dedup.containment_pairs_exact) as one SELECT over an
    arbitrary docs relation: same distinct word shingles (short-doc
    whole-text fallback), SAME portable 60-bit gram hash (a collision
    cannot diverge the engines), boilerplate grams (df > cap) excluded
    from both the intersection and the per-doc sizes, exact integer
    ratios rounded to 6, either-direction threshold on the ROUNDED
    values."""
    n, cap, thr = C.CONT_EXACT_N, C.CONT_EXACT_MAX_DF, C.CONT_EXACT_THRESHOLD
    return f"""
WITH ctoks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM {docs_rel}),
cgrams AS (
  SELECT doc_id, list_distinct(CASE WHEN len(t) < {n}
    THEN [array_to_string(t, ' ')]
    ELSE list_transform(range(len(t) - {n - 1}),
                        i -> array_to_string(t[i+1:i+{n}], ' ')) END) AS sh
  FROM ctoks),
cgh AS (
  SELECT DISTINCT doc_id, {H('g')} AS gram_hash
  FROM (SELECT doc_id, unnest(sh) AS g FROM cgrams)),
cdf AS (SELECT gram_hash, count(*) AS df FROM cgh GROUP BY 1),
ckept AS (
  SELECT doc_id, cgh.gram_hash
  FROM cgh JOIN cdf USING (gram_hash) WHERE df <= {cap}),
csizes AS (SELECT doc_id, count(*) AS sz FROM ckept GROUP BY 1),
cshared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM ckept a JOIN ckept b USING (gram_hash)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, containment_ab, containment_ba, jaccard FROM (
  SELECT doc_a, doc_b,
    round(CAST(shared AS DOUBLE) / CAST(sa.sz AS DOUBLE), 6) AS containment_ab,
    round(CAST(shared AS DOUBLE) / CAST(sb.sz AS DOUBLE), 6) AS containment_ba,
    round(CAST(shared AS DOUBLE) / CAST(sa.sz + sb.sz - shared AS DOUBLE), 6)
      AS jaccard
  FROM cshared JOIN csizes sa ON cshared.doc_a = sa.doc_id
               JOIN csizes sb ON cshared.doc_b = sb.doc_id)
WHERE containment_ab >= {thr} OR containment_ba >= {thr}
"""


def sql_containment_pairs_exact() -> str:
    """Mirrors q_containment_pairs_exact: the exact-containment core
    over the corpus PLUS the planted fixture (huge = component texts
    concatenated in doc_id order, tiny = a 10-token interior slice of
    the first component — both slicing rules identical across engines:
    DuckDB t[a:b] is 1-based inclusive, Spark slice(t, a, len))."""
    comps = ", ".join(str(i) for i in C.CONT_PLANT_COMPONENTS)
    lo = C.CONT_PLANT_SLICE_START
    hi = lo + C.CONT_PLANT_SLICE_LEN - 1
    planted = f"""(
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT CAST({C.CONT_PLANT_HUGE_ID} AS BIGINT) AS doc_id,
         string_agg(text, ' ' ORDER BY doc_id) AS text
  FROM documents WHERE doc_id IN ({comps})
  UNION ALL
  SELECT CAST({C.CONT_PLANT_TINY_ID} AS BIGINT) AS doc_id,
         array_to_string(
           (list_filter(string_split(text, ' '), x -> x <> ''))[{lo}:{hi}],
           ' ') AS text
  FROM documents WHERE doc_id = {C.CONT_PLANT_TINY_SRC})"""
    return _sql_containment_exact(planted)


def sql_source_overlap_winnow() -> str:
    """Mirrors q_source_overlap_winnow: the winnow_pairs statement as
    the pair source under the same source-rollup as sql_source_overlap."""
    return f"""
WITH p AS MATERIALIZED ({sql_winnow_pairs()})
SELECT da.source AS source_a, db.source AS source_b,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM p JOIN documents da ON p.doc_a = da.doc_id
       JOIN documents db ON p.doc_b = db.doc_id
GROUP BY 1, 2
"""


def sql_source_overlap_containment() -> str:
    """Mirrors q_source_overlap_containment: the exact-containment core
    (UNplanted — governance runs on the real corpus) as the pair source
    under the same source-rollup."""
    return f"""
WITH p AS MATERIALIZED ({_sql_containment_exact("documents")})
SELECT da.source AS source_a, db.source AS source_b,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM p JOIN documents da ON p.doc_a = da.doc_id
       JOIN documents db ON p.doc_b = db.doc_id
GROUP BY 1, 2
"""


def sql_mixture_temperature() -> str:
    """Mirrors prep.temperature_mixture_sample: keep iff
    h^2 * T_g < scale^2 * T_min, evaluated directly in HUGEINT — the
    cross-multiplied twin of the engine's driver-side
    isqrt((scale^2*T_min - 1)//T_g) + 1 threshold (provably the same
    integer rule: h <= isqrt(K) <=> h^2 <= K for h >= 0)."""
    h = H(f"CAST(doc_id AS VARCHAR) || ':{C.MIX_SEED}'")
    s = C.MIX_SCALE
    return f"""
WITH c AS (
  SELECT doc_id, source,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS INT) AS n_tokens
  FROM documents),
g AS (SELECT source, sum(n_tokens) AS t FROM c
      WHERE source IS NOT NULL GROUP BY 1 HAVING sum(n_tokens) > 0),
b AS (SELECT doc_id, CAST({h} % {s} AS INT) AS sample_bucket FROM c)
SELECT c.doc_id, c.source, n_tokens, b.sample_bucket
FROM c JOIN g ON c.source = g.source
       JOIN b ON c.doc_id = b.doc_id
WHERE CAST(b.sample_bucket AS HUGEINT) * b.sample_bucket * g.t
      < CAST({s} AS HUGEINT) * {s} * (SELECT min(t) FROM g)
"""


def _pq_codes_expr(vec: str) -> str:
    """DuckDB list of the PQ_M per-subspace argmin codes for ``vec``,
    mirroring ann.pq_encode (first-tie argmin, same fold)."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.ann import (
        random_codebooks,
    )

    books = random_codebooks(C.EMB_DIM, C.PQ_M, C.PQ_CODES, C.PQ_SEED)
    return _pq_codes_expr_books(vec, books)


def _pq_codes_expr_books(vec: str, books: list[list[list[float]]]) -> str:
    """The codes expression against EXPLICIT codebooks — shared by the
    seeded-PQ oracles and the OPQ oracles (rotated-space books)."""
    dsub = len(books[0][0])
    parts = []
    for s, book in enumerate(books):
        sub = f"({vec}[{s * dsub + 1}:{(s + 1) * dsub}])"
        ds = "[" + ", ".join(_sq_l2_lit(sub, code) for code in book) + "]"
        parts.append(
            f"CAST(list_position({ds}, list_min({ds})) - 1 AS INT)"
        )
    return "[" + ", ".join(parts) + "]"


def sql_pq_codes() -> str:
    """Mirrors ann.pq_encode against the seeded codebooks."""
    return f"SELECT vec_id, {_pq_codes_expr('embedding')} AS codes FROM embeddings"


def _pq_adc_expr() -> str:
    """The ADC score over q.qv / c.codes: per-subspace lookup tables
    (same sequential-fold squared-L2 the Spark driver computes in
    Python — (a-b)^2 vs pow(b-a, 2) are IEEE-identical), summed
    left-associatively in subspace order. Shared by sql_pq_topk and
    sql_pq_topk_rerank so the two oracles cannot diverge."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.ann import (
        random_codebooks,
    )

    books = random_codebooks(C.EMB_DIM, C.PQ_M, C.PQ_CODES, C.PQ_SEED)
    return _pq_adc_expr_books(books, "q.qv")


def _pq_adc_expr_books(books: list[list[list[float]]], qvec: str) -> str:
    """The ADC expression against EXPLICIT codebooks and query column —
    shared with the OPQ oracles, which pass the rotated query."""
    dsub = len(books[0][0])
    terms = []
    for s, book in enumerate(books):
        sub = f"({qvec}[{s * dsub + 1}:{(s + 1) * dsub}])"
        lut = "[" + ", ".join(_sq_l2_lit(sub, code) for code in book) + "]"
        terms.append(f"({lut})[c.codes[{s + 1}] + 1]")
    return " + ".join(terms)


def _rot_dot_lit(vec: str, col: list[float]) -> str:
    """Dot product of ``vec`` with a literal rotation column, mirroring
    ann._dot_lit bit-for-bit: a 0.0-seeded left-associative chain
    (((0.0 + v1*w1) + v2*w2) + ...) — flat vectorized arithmetic, no
    lambda folds (a list_reduce version measured ~40x slower)."""
    terms = " + ".join(
        f"{vec}[{i + 1}]::DOUBLE * {w!r}" for i, w in enumerate(col)
    )
    return f"(0.0 + {terms})"


def _opq_rvec_expr(vec: str) -> str:
    """``vec`` @ R as a DuckDB list — one _rot_dot_lit per output
    dimension, literals from the SAME cached offline training call the
    engine consumes (operators.opq.opq_train_offline)."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.opq import (
        opq_train_offline,
    )

    r_cols, _ = opq_train_offline()
    return "[" + ", ".join(_rot_dot_lit(vec, col) for col in r_cols) + "]"


def sql_opq_codes() -> str:
    """Mirrors opq.opq_encode: rotate once per row (materialized CTE,
    like the engine's once-materialized _rvec projection), then the
    shared per-subspace argmin codes expression over the rotated-space
    codebooks."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.opq import (
        opq_train_offline,
    )

    _, books = opq_train_offline()
    return f"""
WITH r AS MATERIALIZED (
  SELECT vec_id, {_opq_rvec_expr('embedding')} AS rvec FROM embeddings)
SELECT vec_id, {_pq_codes_expr_books('rvec', books)} AS codes FROM r
"""


def sql_opq_topk() -> str:
    """Mirrors opq.opq_topk: the query row is rotated with the same
    fold the engine runs driver-side (rotate_py), the corpus rows with
    the same fold the engine runs JVM-side (rotate_expr), then the
    shared ADC scan in the rotated space."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.opq import (
        opq_train_offline,
    )

    _, books = opq_train_offline()
    adc = _pq_adc_expr_books(books, "q.rqv")
    return f"""
WITH q AS MATERIALIZED (
  SELECT {_opq_rvec_expr('embedding')} AS rqv FROM embeddings WHERE vec_id = {C.QUERY_VEC}),
r AS MATERIALIZED (
  SELECT vec_id, {_opq_rvec_expr('embedding')} AS rvec FROM embeddings),
c AS (SELECT vec_id, {_pq_codes_expr_books('rvec', books)} AS codes FROM r),
scored AS (
  SELECT c.vec_id, round(sqrt({adc}), 6) AS dist FROM c, q)
SELECT vec_id, dist, CAST(row_number() OVER (ORDER BY dist ASC, vec_id) AS INT) AS rank
FROM scored ORDER BY dist ASC, vec_id LIMIT {C.K_VEC}
"""


def sql_opq_topk_rerank() -> str:
    """Mirrors opq.opq_topk_rerank: the ADC shortlist picked in the
    ROTATED space (same expression as sql_opq_topk, LIMIT
    PQ_SHORTLIST), exact L2 rerank in the ORIGINAL space — rotation is
    orthonormal so the true distances need no rotated vectors."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.opq import (
        opq_train_offline,
    )

    _, books = opq_train_offline()
    adc = _pq_adc_expr_books(books, "q.rqv")
    return f"""
WITH q0 AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {C.QUERY_VEC}),
q AS MATERIALIZED (
  SELECT {_opq_rvec_expr('embedding')} AS rqv FROM embeddings WHERE vec_id = {C.QUERY_VEC}),
r AS MATERIALIZED (
  SELECT vec_id, {_opq_rvec_expr('embedding')} AS rvec FROM embeddings),
c AS (SELECT vec_id, {_pq_codes_expr_books('rvec', books)} AS codes FROM r),
short AS (
  SELECT c.vec_id FROM c, q
  ORDER BY round(sqrt({adc}), 6) ASC, c.vec_id LIMIT {C.PQ_SHORTLIST}),
scored AS (
  SELECT e.vec_id, round({_l2('e.embedding', 'q0.qv', C.EMB_DIM)}, 6) AS dist
  FROM embeddings e, q0 WHERE e.vec_id IN (SELECT vec_id FROM short))
SELECT vec_id, dist, CAST(row_number() OVER (ORDER BY dist ASC, vec_id) AS INT) AS rank
FROM scored ORDER BY dist ASC, vec_id LIMIT {C.K_VEC}
"""


def sql_pq_topk() -> str:
    """Mirrors ann.pq_topk (see _pq_adc_expr for the parity notes)."""
    adc = _pq_adc_expr()
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {C.QUERY_VEC}),
c AS (SELECT vec_id, {_pq_codes_expr('embedding')} AS codes FROM embeddings),
scored AS (
  SELECT c.vec_id, round(sqrt({adc}), 6) AS dist FROM c, q)
SELECT vec_id, dist, CAST(row_number() OVER (ORDER BY dist ASC, vec_id) AS INT) AS rank
FROM scored ORDER BY dist ASC, vec_id LIMIT {C.K_VEC}
"""


def sql_events_asof() -> str:
    """Mirrors q_events_asof with DuckDB's NATIVE ASOF LEFT JOIN — an
    independent implementation of the as-of semantics (not a twin of
    the Spark window plan), then the same tolerance null-out and
    no-match defaults. Values are copied doubles (no arithmetic), the
    lag is exact integer microseconds. The right side is pre-deduped to
    the max event_id per (user_id, ts) BEFORE the ASOF join: DuckDB's
    choice among right rows sharing the maximal ts is unspecified,
    while the Spark side documents the largest-event_id tie rule —
    dedup makes both engines share that rule independent of whether
    the fixture ever produces duplicate (user_id, ts) view rows."""
    return f"""
WITH l AS (SELECT * FROM events WHERE event_type = 'click'),
r AS (SELECT user_id, ts, max(event_id) AS event_id, arg_max(value, event_id) AS value
      FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
j AS (
  SELECT l.event_id, l.user_id, l.value AS click_value,
         r.event_id AS v_id, r.value AS v_val,
         epoch_us(l.ts) - epoch_us(r.ts) AS lag
  FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts)
SELECT event_id, user_id, click_value,
  coalesce(CASE WHEN lag <= {C.ASOF_TOLERANCE_US} THEN v_id END, -1) AS view_event_id,
  coalesce(CASE WHEN lag <= {C.ASOF_TOLERANCE_US} THEN v_val END, 0.0) AS view_value,
  coalesce(CASE WHEN lag <= {C.ASOF_TOLERANCE_US} THEN lag END, -1) AS lag_us
FROM j
"""


def sql_hll_cardinality() -> str:
    """Mirrors q_hll_cardinality: same register split (low HLL_P hash
    bits), the same power-of-two comparison-ladder rank (no float
    log), exact int64 harmonic sum, ONE shared-literal division."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.hll import (
        HLL_W,
        hll_alpha,
    )

    p = C.HLL_P
    m = 1 << p
    rank = " ".join(
        [f"CASE WHEN rest >= {1 << (HLL_W - r)} THEN {r}" for r in range(1, 2)]
        + [f"WHEN rest >= {1 << (HLL_W - r)} THEN {r}" for r in range(2, HLL_W + 1)]
        + [f"ELSE {HLL_W + 1} END"]
    )
    num = hll_alpha(m) * m * m * float(1 << HLL_W)
    return f"""
WITH d AS (SELECT source, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
g AS (SELECT source, unnest({_ngram_list(2)}) AS gram FROM d),
h AS (SELECT source, {H('gram')} AS hv FROM g),
r AS (
  SELECT source, CAST(hv % {m} AS INT) AS register, {rank} AS rank
  FROM (SELECT source, hv, (hv >> {p}) AS rest FROM h)),
reg AS (SELECT source, register, max(rank) AS m_j FROM r GROUP BY 1, 2),
s AS (
  SELECT source, CAST(sum(1::BIGINT << ({HLL_W} - m_j)) AS BIGINT) AS sp,
         count(*) AS v
  FROM reg GROUP BY 1),
e AS (SELECT source, count(DISTINCT gram) AS n_exact FROM g GROUP BY 1)
SELECT e.source, n_exact,
  round({num!r} / (sp + ({m} - v) * (1::BIGINT << {HLL_W}))::DOUBLE, 6) AS hll_est,
  CAST(v AS INT) AS registers_used
FROM e JOIN s USING (source)
"""


def sql_gopher_rules() -> str:
    """Mirrors q_gopher_rules: same plant composition order, same
    integer cross-multiplied rule boundaries; the one float column
    (mean_word_len) is a single division of identical ints, round(6)."""
    stop = "[" + ", ".join(f"'{s}'" for s in C.GOPHER_STOPWORDS) + "]"
    return f"""
WITH p1 AS (
  SELECT doc_id,
    CASE WHEN doc_id % {C.GR_BULLET_EVERY} = 0 THEN '- ' || text ELSE text END AS text
  FROM documents),
p2 AS (
  SELECT doc_id,
    CASE WHEN doc_id % {C.GR_SYMBOL_EVERY} = 0
         THEN text || ' {C.GR_SYMBOL_PLANT}' ELSE text END AS text
  FROM p1),
p3 AS (
  SELECT doc_id,
    CASE WHEN doc_id % {C.GR_NONALPHA_EVERY} = 0
         THEN text || ' {C.GR_NONALPHA_PLANT}' ELSE text END AS text
  FROM p2),
p4 AS (
  SELECT doc_id,
    CASE WHEN doc_id % {C.GR_ELLIPSIS_EVERY} = 0
         THEN text || ' {C.GR_ELLIPSIS_PLANT}' ELSE text END AS text
  FROM p3),
base AS (
  SELECT doc_id,
    list_filter(string_split(text, ' '), x -> x <> '') AS t,
    string_split(text, chr(10)) AS lns
  FROM p4),
m AS (
  SELECT doc_id,
    len(t) AS n,
    list_reduce(list_prepend(0, list_transform(t, x -> length(x)::INT)), (a, x) -> a + x) AS sl,
    len(list_filter(t, x -> x = '#' OR x = '...')) AS symw,
    len(lns) AS nl,
    len(list_filter(lns, l -> starts_with(l, '- ') OR starts_with(l, '* '))) AS bl,
    len(list_filter(lns, l -> ends_with(l, '...'))) AS el,
    len(list_filter(t, x -> regexp_matches(x, '[a-zA-Z]'))) AS aw,
    len(list_intersect(list_distinct(list_transform(t, x -> lower(x))), {stop})) AS sh
  FROM base)
SELECT doc_id,
  CAST(n AS INT) AS n_words,
  CASE WHEN n > 0 THEN round(sl::DOUBLE / n, 6) ELSE 0.0 END AS mean_word_len,
  CAST(symw AS INT) AS symbol_words,
  CAST(bl AS INT) AS bullet_lines,
  CAST(el AS INT) AS ellipsis_lines,
  CAST(nl AS INT) AS n_lines,
  CAST(aw AS INT) AS alpha_words,
  CAST(sh AS INT) AS stop_hits,
  (n >= {C.GR_MIN_WORDS} AND n <= {C.GR_MAX_WORDS}) AS r_word_count,
  (sl >= {C.GR_MEAN_LEN_LO} * n AND sl <= {C.GR_MEAN_LEN_HI} * n) AS r_mean_len,
  (symw * {C.GR_SYMBOL_X} <= n) AS r_symbol,
  (bl * {C.GR_BULLET_DEN} < {C.GR_BULLET_NUM} * nl) AS r_bullet,
  (el * {C.GR_ELLIPSIS_DEN} < {C.GR_ELLIPSIS_NUM} * nl) AS r_ellipsis,
  (aw * {C.GR_ALPHA_DEN} >= {C.GR_ALPHA_NUM} * n) AS r_alpha,
  (sh >= {C.GR_MIN_STOPWORDS}) AS r_stopwords,
  (n >= {C.GR_MIN_WORDS} AND n <= {C.GR_MAX_WORDS}
   AND sl >= {C.GR_MEAN_LEN_LO} * n AND sl <= {C.GR_MEAN_LEN_HI} * n
   AND symw * {C.GR_SYMBOL_X} <= n
   AND bl * {C.GR_BULLET_DEN} < {C.GR_BULLET_NUM} * nl
   AND el * {C.GR_ELLIPSIS_DEN} < {C.GR_ELLIPSIS_NUM} * nl
   AND aw * {C.GR_ALPHA_DEN} >= {C.GR_ALPHA_NUM} * n
   AND sh >= {C.GR_MIN_STOPWORDS}) AS keep
FROM m
"""


def sql_cms_heavy_hitters() -> str:
    """Mirrors q_cms_heavy_hitters: the same deterministic d x w
    Count-Min sketch (portable md5 hash of '{row}:{gram}' mod w),
    min-bucket estimates, exact counts beside them. Counts are
    integers, so no float-order hazard anywhere."""
    return f"""
WITH toks AS ({TOKS}),
g AS (SELECT unnest({_ngram_list(2)}) AS gram FROM toks),
occ AS (
  SELECT gram, CAST(d AS INT) AS d,
         CAST({H("d::VARCHAR || ':' || gram")} % {C.CMS_W} AS INT) AS bucket
  FROM g, range(0, {C.CMS_D}) r(d)),
sk AS (SELECT d, bucket, count(*) AS cnt FROM occ GROUP BY 1, 2),
truth AS (SELECT gram, count(*) AS true_cnt FROM g GROUP BY 1),
kb AS (SELECT DISTINCT gram, d, bucket FROM occ),
est AS (
  SELECT kb.gram, min(coalesce(sk.cnt, 0)) AS est
  FROM kb LEFT JOIN sk USING (d, bucket) GROUP BY 1)
SELECT est.gram, est, true_cnt
FROM est JOIN truth USING (gram)
WHERE est >= {C.CMS_MIN_COUNT}
"""


# Mirrors ann.sq_train: per-dim exact min/max over DOUBLE-cast values —
# selections, not folds, so both engines train the identical quantizer.
_SQ_MM = (
    f"(SELECT list(mn ORDER BY d) AS mins, list(mx ORDER BY d) AS maxs "
    f"FROM (SELECT i AS d, min(embedding[i]::DOUBLE) AS mn, "
    f"max(embedding[i]::DOUBLE) AS mx "
    f"FROM embeddings, range(1, {C.EMB_DIM} + 1) t(i) GROUP BY i))"
)


def _sq8_scale(j: str) -> str:
    """Encode scale for dim ``j`` (1-based SQL index): levels/(max-min),
    0 for constant dims — same expression ann._sq_scales computes in
    Python (identical IEEE division of identical doubles)."""
    return (
        f"(CASE WHEN mm.maxs[{j}] > mm.mins[{j}] "
        f"THEN {float(C.SQ_LEVELS)!r} / (mm.maxs[{j}] - mm.mins[{j}]) "
        f"ELSE 0.0 END)"
    )


def _sq8_step(j: str) -> str:
    """Decode step for dim ``j``: (max-min)/levels, mirroring
    ann._sq_steps (computed independently of the scale, NOT 1/scale)."""
    return (
        f"(CASE WHEN mm.maxs[{j}] > mm.mins[{j}] "
        f"THEN (mm.maxs[{j}] - mm.mins[{j}]) / {float(C.SQ_LEVELS)!r} "
        f"ELSE 0.0 END)"
    )


def _sq8_code_expr(vec: str) -> str:
    """Mirrors ann.sq_encode: floor((x-min)*scale + 0.5) clamped to
    [0, levels] — identical composition order, so the floor boundary
    can never disagree between engines."""
    return (
        f"list_transform(range({C.EMB_DIM}), j -> CAST(least({C.SQ_LEVELS}, "
        f"greatest(0, floor((({vec}[j+1]::DOUBLE) - mm.mins[j+1]) "
        f"* {_sq8_scale('j+1')} + 0.5))) AS INT))"
    )


def _sq8_adc_expr() -> str:
    """ADC squared-L2 over q.qv / c.codes: per-dim
    ((q - min) - code*step)^2, sequential left fold — the same
    parenthesization ann.sq_topk builds (a-literal minus code*step),
    shared by sql_sq_topk and sql_sq_topk_rerank."""
    return (
        f"list_reduce(list_prepend(0.0, list_transform(range({C.EMB_DIM}), "
        f"j -> pow((q.qv[j+1]::DOUBLE - mm.mins[j+1]) "
        f"- c.codes[j+1]::DOUBLE * {_sq8_step('j+1')}, 2))), "
        f"(acc, x) -> acc + x)"
    )


def sql_sq_codes() -> str:
    """Mirrors ann.sq_encode against the data-trained quantizer."""
    return (
        f"SELECT vec_id, {_sq8_code_expr('embedding')} AS codes "
        f"FROM embeddings, {_SQ_MM} mm"
    )


def sql_sq_topk() -> str:
    """Mirrors ann.sq_topk (see _sq8_adc_expr for the parity notes)."""
    return f"""
WITH mm AS MATERIALIZED (SELECT * FROM {_SQ_MM}),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {C.QUERY_VEC}),
c AS (SELECT vec_id, {_sq8_code_expr('embedding')} AS codes FROM embeddings, mm),
scored AS (
  SELECT c.vec_id, round(sqrt({_sq8_adc_expr()}), 6) AS dist FROM c, q, mm)
SELECT vec_id, dist, CAST(row_number() OVER (ORDER BY dist ASC, vec_id) AS INT) AS rank
FROM scored ORDER BY dist ASC, vec_id LIMIT {C.K_VEC}
"""


def sql_sq_topk_rerank() -> str:
    """Mirrors ann.sq_topk_rerank: the ADC shortlist (same shared
    expression as sql_sq_topk, LIMIT SQ_SHORTLIST) semi-joins the full
    vectors for an exact-L2 rerank."""
    return f"""
WITH mm AS MATERIALIZED (SELECT * FROM {_SQ_MM}),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {C.QUERY_VEC}),
c AS (SELECT vec_id, {_sq8_code_expr('embedding')} AS codes FROM embeddings, mm),
short AS (
  SELECT c.vec_id FROM c, q, mm
  ORDER BY round(sqrt({_sq8_adc_expr()}), 6) ASC, c.vec_id LIMIT {C.SQ_SHORTLIST}),
scored AS (
  SELECT e.vec_id, round({_l2('e.embedding', 'q.qv', C.EMB_DIM)}, 6) AS dist
  FROM embeddings e, q WHERE e.vec_id IN (SELECT vec_id FROM short))
SELECT vec_id, dist, CAST(row_number() OVER (ORDER BY dist ASC, vec_id) AS INT) AS rank
FROM scored ORDER BY dist ASC, vec_id LIMIT {C.K_VEC}
"""


# --- IVF-PQ (coarse cells + PQ over residuals) -----------------------------


def _ivfpq_quantizers():
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.ann import (
        random_centroids,
        random_codebooks,
    )

    cents = random_centroids(C.EMB_DIM, C.IVF_CELLS, C.IVF_SEED)
    books = random_codebooks(C.EMB_DIM, C.PQ_M, C.PQ_CODES, C.PQ_SEED)
    return cents, books


def _ivfpq_res_codes_ctes(source: str = "embeddings") -> str:
    """CTEs assigning every vector of ``source`` to its coarse cell and
    PQ-encoding the residual — mirrors ann.ivfpq_encode (same
    assignment argmin, residual = elementwise subtract of the cell's
    center, same per-subspace first-tie argmin over the residual)."""
    cents, books = _ivfpq_quantizers()
    dists = "[" + ", ".join(_sq_l2_lit("embedding", c) for c in cents) + "]"
    cents_lit = (
        "[" + ", ".join(
            "[" + ",".join(repr(float(v)) for v in c) + "]" for c in cents
        ) + "]"
    )
    dsub = C.EMB_DIM // C.PQ_M
    parts = []
    for s, book in enumerate(books):
        sub = f"(res[{s * dsub + 1}:{(s + 1) * dsub}])"
        ds = "[" + ", ".join(_sq_l2_lit(sub, code) for code in book) + "]"
        parts.append(f"CAST(list_position({ds}, list_min({ds})) - 1 AS INT)")
    codes = "[" + ", ".join(parts) + "]"
    return f"""
assigned AS (
  SELECT vec_id,
         CAST(list_position(d.ds, list_min(d.ds)) - 1 AS INT) AS cell,
         embedding
  FROM (SELECT vec_id, embedding, {dists} AS ds FROM {source}) d),
resid AS (
  SELECT vec_id, cell,
         list_transform(range({C.EMB_DIM}),
                        i -> embedding[i+1]::DOUBLE - ({cents_lit})[cell+1][i+1]) AS res
  FROM assigned),
c AS (SELECT vec_id, cell, {codes} AS codes FROM resid)"""


def _ivfpq_adc_expr() -> str:
    """Cell-dispatched ADC over c.cell / c.codes: for EVERY cell a
    16-entry residual LUT whose entries are folds over
    ((q.qv - center) - code)^2 — composition order matching the Spark
    driver's resq-then-subtract, sign flip IEEE-exact; the CASE covers
    all cells (rows are pre-filtered to probed cells, so extra
    branches are inert and the probed ones match Spark's when-chain)."""
    cents, books = _ivfpq_quantizers()
    dsub = C.EMB_DIM // C.PQ_M
    terms = []
    for s, book in enumerate(books):
        branches = []
        for ci, cent in enumerate(cents):
            entries = []
            for code in book:
                fold = (
                    f"list_reduce(list_prepend(0.0, list_transform(range({dsub}), "
                    f"i -> pow((q.qv[{s * dsub} + i + 1]::DOUBLE - "
                    f"([{','.join(repr(float(v)) for v in cent[s * dsub:(s + 1) * dsub])}])[i+1]) - "
                    f"([{','.join(repr(float(v)) for v in code)}])[i+1], 2))), (acc, x) -> acc + x)"
                )
                entries.append(fold)
            lut = "[" + ", ".join(entries) + "]"
            branches.append(f"WHEN {ci} THEN ({lut})[c.codes[{s + 1}] + 1]")
        terms.append("CASE c.cell " + " ".join(branches) + " END")
    return " + ".join(f"({t})" for t in terms)


def sql_ivfpq_codes() -> str:
    """Mirrors ann.ivfpq_encode against the seeded quantizers."""
    return f"WITH {_ivfpq_res_codes_ctes()} SELECT vec_id, cell, codes FROM c"


def sql_ivfpq_topk() -> str:
    """Mirrors ann.ivfpq_topk: probe cells by the same sequential-fold
    distance + cell-index tie rule, ADC via the per-cell residual LUT."""
    cents, _ = _ivfpq_quantizers()
    qdists = "[" + ", ".join(_sq_l2_lit("q.qv", c) for c in cents) + "]"
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {C.QUERY_VEC}),
{_ivfpq_res_codes_ctes().lstrip()},
probe AS (
  SELECT CAST(u.c AS INT) AS cell
  FROM q, (SELECT unnest(range({C.IVF_CELLS})) AS c) u
  ORDER BY ({qdists})[u.c + 1], u.c LIMIT {C.IVF_PROBE}),
scored AS (
  SELECT c.vec_id, round(sqrt({_ivfpq_adc_expr()}), 6) AS dist
  FROM c, q WHERE c.cell IN (SELECT cell FROM probe))
SELECT vec_id, dist, CAST(row_number() OVER (ORDER BY dist ASC, vec_id) AS INT) AS rank
FROM scored ORDER BY dist ASC, vec_id LIMIT {C.K_VEC}
"""


def _ivfopq_prefix() -> str:
    """The two rotated CTEs the IVF-OPQ oracles prepend: the corpus
    rotated once per row (named ``remb`` with the vector still called
    ``embedding`` so _ivfpq_res_codes_ctes('remb') applies unchanged)
    and the rotated query row (named ``q.qv`` so the probe-distance
    and residual-LUT expressions apply unchanged)."""
    return f"""remb AS MATERIALIZED (
  SELECT vec_id, {_opq_rvec_expr('embedding')} AS embedding FROM embeddings),
q AS MATERIALIZED (
  SELECT {_opq_rvec_expr('embedding')} AS qv FROM embeddings WHERE vec_id = {C.QUERY_VEC})"""


def sql_ivfopq_codes() -> str:
    """Mirrors opq.ivfopq_encode: the seeded IVF-PQ residual encode,
    run on the ROTATED corpus."""
    return (
        f"WITH {_ivfopq_prefix()},\n{_ivfpq_res_codes_ctes('remb').lstrip()}\n"
        "SELECT vec_id, cell, codes FROM c"
    )


def sql_ivfopq_topk() -> str:
    """Mirrors opq.ivfopq_topk: identical probe + residual-ADC
    expressions as sql_ivfpq_topk, with both the corpus and the query
    rotated first (the same folds the engine runs JVM-side and
    driver-side)."""
    cents, _ = _ivfpq_quantizers()
    qdists = "[" + ", ".join(_sq_l2_lit("q.qv", c) for c in cents) + "]"
    return f"""
WITH {_ivfopq_prefix()},
{_ivfpq_res_codes_ctes('remb').lstrip()},
probe AS (
  SELECT CAST(u.c AS INT) AS cell
  FROM q, (SELECT unnest(range({C.IVF_CELLS})) AS c) u
  ORDER BY ({qdists})[u.c + 1], u.c LIMIT {C.IVF_PROBE}),
scored AS (
  SELECT c.vec_id, round(sqrt({_ivfpq_adc_expr()}), 6) AS dist
  FROM c, q WHERE c.cell IN (SELECT cell FROM probe))
SELECT vec_id, dist, CAST(row_number() OVER (ORDER BY dist ASC, vec_id) AS INT) AS rank
FROM scored ORDER BY dist ASC, vec_id LIMIT {C.K_VEC}
"""


def sql_ivfopq_topk_rerank() -> str:
    """Mirrors opq.ivfopq_topk_rerank: rotated-space ADC shortlist
    (same expressions as sql_ivfopq_topk, LIMIT PQ_SHORTLIST), exact
    L2 rerank in the ORIGINAL space."""
    cents, _ = _ivfpq_quantizers()
    qdists = "[" + ", ".join(_sq_l2_lit("q.qv", c) for c in cents) + "]"
    return f"""
WITH q0 AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {C.QUERY_VEC}),
{_ivfopq_prefix()},
{_ivfpq_res_codes_ctes('remb').lstrip()},
probe AS (
  SELECT CAST(u.c AS INT) AS cell
  FROM q, (SELECT unnest(range({C.IVF_CELLS})) AS c) u
  ORDER BY ({qdists})[u.c + 1], u.c LIMIT {C.IVF_PROBE}),
short AS (
  SELECT c.vec_id FROM c, q WHERE c.cell IN (SELECT cell FROM probe)
  ORDER BY round(sqrt({_ivfpq_adc_expr()}), 6) ASC, c.vec_id LIMIT {C.PQ_SHORTLIST}),
scored AS (
  SELECT e.vec_id, round({_l2('e.embedding', 'q0.qv', C.EMB_DIM)}, 6) AS dist
  FROM embeddings e, q0 WHERE e.vec_id IN (SELECT vec_id FROM short))
SELECT vec_id, dist, CAST(row_number() OVER (ORDER BY dist ASC, vec_id) AS INT) AS rank
FROM scored ORDER BY dist ASC, vec_id LIMIT {C.K_VEC}
"""


def sql_ivfopq_topk_batch() -> str:
    """Mirrors opq.ivfopq_topk_batch: sql_ivfpq_topk_batch's probe +
    residual-ADC expressions verbatim, with the corpus AND every batch
    query rotated first (same folds as the engine's JVM/driver
    rotations)."""
    cents, _ = _ivfpq_quantizers()
    qdists = "[" + ", ".join(_sq_l2_lit("q.qv", c) for c in cents) + "]"
    return f"""
WITH remb AS MATERIALIZED (
  SELECT vec_id, {_opq_rvec_expr('embedding')} AS embedding FROM embeddings),
q AS MATERIALIZED (
  SELECT vec_id AS query_id, {_opq_rvec_expr('embedding')} AS qv
  FROM embeddings WHERE vec_id < {C.BATCH_DOCS}),
{_ivfpq_res_codes_ctes('remb').lstrip()},
probe AS (
  SELECT query_id, cell FROM (
    SELECT q.query_id, CAST(u.c AS INT) AS cell,
           row_number() OVER (PARTITION BY q.query_id ORDER BY ({qdists})[u.c + 1], u.c) AS rn
    FROM q, (SELECT unnest(range({C.IVF_CELLS})) AS c) u)
  WHERE rn <= {C.IVF_PROBE}),
scored AS (
  SELECT q.query_id, c.vec_id, round(sqrt({_ivfpq_adc_expr()}), 6) AS dist
  FROM c JOIN probe p ON p.cell = c.cell JOIN q ON q.query_id = p.query_id)
SELECT query_id, vec_id, dist, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY dist ASC, vec_id) AS INT) AS rank
  FROM scored)
WHERE rank <= {C.K_BATCH}
"""


def sql_ivfpq_topk_rerank() -> str:
    """Mirrors ann.ivfpq_topk_rerank: the ADC shortlist (same shared
    expressions, LIMIT SQ_SHORTLIST) semi-joins the full vectors for
    an exact-L2 rerank."""
    cents, _ = _ivfpq_quantizers()
    qdists = "[" + ", ".join(_sq_l2_lit("q.qv", c) for c in cents) + "]"
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {C.QUERY_VEC}),
{_ivfpq_res_codes_ctes().lstrip()},
probe AS (
  SELECT CAST(u.c AS INT) AS cell
  FROM q, (SELECT unnest(range({C.IVF_CELLS})) AS c) u
  ORDER BY ({qdists})[u.c + 1], u.c LIMIT {C.IVF_PROBE}),
short AS (
  SELECT c.vec_id FROM c, q WHERE c.cell IN (SELECT cell FROM probe)
  ORDER BY round(sqrt({_ivfpq_adc_expr()}), 6) ASC, c.vec_id LIMIT {C.SQ_SHORTLIST}),
scored AS (
  SELECT e.vec_id, round({_l2('e.embedding', 'q.qv', C.EMB_DIM)}, 6) AS dist
  FROM embeddings e, q WHERE e.vec_id IN (SELECT vec_id FROM short))
SELECT vec_id, dist, CAST(row_number() OVER (ORDER BY dist ASC, vec_id) AS INT) AS rank
FROM scored ORDER BY dist ASC, vec_id LIMIT {C.K_VEC}
"""


def sql_ivfpq_topk_batch() -> str:
    """Mirrors ann.ivfpq_topk_batch: per-query probe cells (same fold
    distances + cell-index tie rule), per-(query, cell) residual ADC
    via the same all-cells CASE expression — q now carries BATCH_DOCS
    rows, so every scored row pairs a candidate with ITS query's
    residual LUT."""
    cents, _ = _ivfpq_quantizers()
    qdists = "[" + ", ".join(_sq_l2_lit("q.qv", c) for c in cents) + "]"
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {C.BATCH_DOCS}),
{_ivfpq_res_codes_ctes().lstrip()},
probe AS (
  SELECT query_id, cell FROM (
    SELECT q.query_id, CAST(u.c AS INT) AS cell,
           row_number() OVER (PARTITION BY q.query_id ORDER BY ({qdists})[u.c + 1], u.c) AS rn
    FROM q, (SELECT unnest(range({C.IVF_CELLS})) AS c) u)
  WHERE rn <= {C.IVF_PROBE}),
scored AS (
  SELECT q.query_id, c.vec_id, round(sqrt({_ivfpq_adc_expr()}), 6) AS dist
  FROM c JOIN probe p ON p.cell = c.cell JOIN q ON q.query_id = p.query_id)
SELECT query_id, vec_id, dist, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY dist ASC, vec_id) AS INT) AS rank
  FROM scored)
WHERE rank <= {C.K_BATCH}
"""


def sql_ivfpq_topk_batch_rerank() -> str:
    """Mirrors ann.ivfpq_topk_batch_rerank: per-query ADC shortlists
    (same probe + LUT expressions, rn <= SQ_SHORTLIST with the batch
    path's (dist, vec_id) tie rule), exact-L2 rerank per query."""
    cents, _ = _ivfpq_quantizers()
    qdists = "[" + ", ".join(_sq_l2_lit("q.qv", c) for c in cents) + "]"
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {C.BATCH_DOCS}),
{_ivfpq_res_codes_ctes().lstrip()},
probe AS (
  SELECT query_id, cell FROM (
    SELECT q.query_id, CAST(u.c AS INT) AS cell,
           row_number() OVER (PARTITION BY q.query_id ORDER BY ({qdists})[u.c + 1], u.c) AS rn
    FROM q, (SELECT unnest(range({C.IVF_CELLS})) AS c) u)
  WHERE rn <= {C.IVF_PROBE}),
adc AS (
  SELECT q.query_id, c.vec_id, round(sqrt({_ivfpq_adc_expr()}), 6) AS adist
  FROM c JOIN probe p ON p.cell = c.cell JOIN q ON q.query_id = p.query_id),
short AS (
  SELECT query_id, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adist ASC, vec_id) AS rn FROM adc)
  WHERE rn <= {C.SQ_SHORTLIST}),
scored AS (
  SELECT s.query_id, e.vec_id, round({_l2('e.embedding', 'q.qv', C.EMB_DIM)}, 6) AS dist
  FROM short s JOIN embeddings e ON e.vec_id = s.vec_id JOIN q ON q.query_id = s.query_id)
SELECT query_id, vec_id, dist, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY dist ASC, vec_id) AS INT) AS rank
  FROM scored)
WHERE rank <= {C.K_BATCH}
"""


def sql_ivfpq_topk_alpha() -> str:
    """Mirrors ann.ivfpq_topk with alpha: the distance-ratio probe rule
    re-derived in SQL (sqrt of the same sequential fold, min over the
    cell table), ADC via the shared all-cells CASE."""
    cents, _ = _ivfpq_quantizers()
    qdists = "[" + ", ".join(_sq_l2_lit("q.qv", c) for c in cents) + "]"
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {C.QUERY_VEC}),
{_ivfpq_res_codes_ctes().lstrip()},
qcell AS (
  SELECT CAST(u.c AS INT) AS cell, sqrt(({qdists})[u.c + 1]) AS d
  FROM q, (SELECT unnest(range({C.IVF_CELLS})) AS c) u),
probe AS (
  SELECT cell FROM qcell
  WHERE d <= (1.0 + {C.IVF_PROBE_ALPHA!r}) * (SELECT min(d) FROM qcell)),
scored AS (
  SELECT c.vec_id, round(sqrt({_ivfpq_adc_expr()}), 6) AS dist
  FROM c, q WHERE c.cell IN (SELECT cell FROM probe))
SELECT vec_id, dist, CAST(row_number() OVER (ORDER BY dist ASC, vec_id) AS INT) AS rank
FROM scored ORDER BY dist ASC, vec_id LIMIT {C.K_VEC}
"""


def sql_curated_ivfpq_index() -> str:
    """Twin of q_curated_ivfpq_index: the full semantic-curation
    statement as a CTE picks the survivor ids, and the shared IVF-PQ
    codes CTEs run over exactly those embeddings."""
    return f"""
WITH cur AS ({sql_semantic_curation()}),
src AS (
  SELECT e.vec_id, e.embedding FROM embeddings e
  WHERE e.vec_id IN (SELECT vec_id FROM cur)),
{_ivfpq_res_codes_ctes("src").lstrip()}
SELECT vec_id, cell, codes FROM c
"""


def sql_pq_topk_rerank() -> str:
    """Mirrors ann.pq_topk_rerank: the ADC shortlist (the SAME shared
    expression as sql_pq_topk, LIMIT PQ_SHORTLIST) semi-joins the full
    vectors for an exact-L2 rerank."""
    adc = _pq_adc_expr()
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {C.QUERY_VEC}),
c AS (SELECT vec_id, {_pq_codes_expr('embedding')} AS codes FROM embeddings),
short AS (
  SELECT c.vec_id FROM c, q
  ORDER BY round(sqrt({adc}), 6) ASC, c.vec_id LIMIT {C.PQ_SHORTLIST}),
scored AS (
  SELECT e.vec_id, round({_l2('e.embedding', 'q.qv', C.EMB_DIM)}, 6) AS dist
  FROM embeddings e, q WHERE e.vec_id IN (SELECT vec_id FROM short))
SELECT vec_id, dist, CAST(row_number() OVER (ORDER BY dist ASC, vec_id) AS INT) AS rank
FROM scored ORDER BY dist ASC, vec_id LIMIT {C.K_VEC}
"""


def sql_ngram_decontaminate() -> str:
    """Mirrors q_ngram_decontaminate: distinct per-doc n-gram hashes of
    both sides, join on the shared 60-bit key, per-train-doc count."""
    n, pe, off = C.NGRAM_DECON_N, C.NGRAM_DECON_PLANT_EVERY, C.NGRAM_DECON_OFFSET
    return f"""
WITH bench_src AS (SELECT doc_id, text FROM documents WHERE doc_id % 17 = 0),
train_src AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 17 <> 0
  UNION ALL
  SELECT doc_id + {off} AS doc_id,
         'page header text ' || text || ' page footer' AS text
  FROM bench_src WHERE doc_id % {pe} = 0),
tg AS (
  SELECT doc_id, {H('gram')} AS gram_hash
  FROM (SELECT doc_id, unnest(list_distinct({_ngram_list(n)})) AS gram
        FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
              FROM train_src))),
bg AS (
  SELECT DISTINCT {H('gram')} AS gram_hash
  FROM (SELECT unnest(list_distinct({_ngram_list(n)})) AS gram
        FROM (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t
              FROM bench_src)))
SELECT doc_id, CAST(count(*) AS INT) AS n_contaminated_ngrams
FROM tg JOIN bg USING (gram_hash)
GROUP BY 1 HAVING count(*) >= 1
"""


def sql_mine_triplets() -> str:
    """Mirrors q_mine_triplets: the shared-span pairs (the verified
    sql_shared_ngram_spans, materialized) crossed with the slot range,
    hash-bucket negative sampling as one equi-join. n_docs is the
    static fixture count — the engine derives it with a count() job,
    the oracle inlines the subquery (identical integer)."""
    nn, seed = C.TRIPLET_NEGATIVES, C.TRIPLET_SEED
    return f"""
WITH pos AS MATERIALIZED ({sql_shared_ngram_spans()}),
n AS (SELECT count(*) AS n_docs FROM documents),
buckets AS (
  SELECT ({H('CAST(doc_id AS VARCHAR)')} % (SELECT n_docs FROM n)) AS bucket,
         min(doc_id) AS negative_id
  FROM documents GROUP BY 1),
slots AS (
  SELECT doc_a AS anchor_id, doc_b AS positive_id, s.slot,
         ({H(f"CAST(doc_a AS VARCHAR) || ':' || CAST(s.slot AS VARCHAR) || ':{seed}'")}
          % (SELECT n_docs FROM n)) AS bucket
  FROM pos, (SELECT unnest(range({nn})) AS slot) s)
SELECT anchor_id, positive_id, negative_id, CAST(slot AS INT) AS slot
FROM slots JOIN buckets USING (bucket)
WHERE negative_id <> anchor_id AND negative_id <> positive_id
"""


def sql_mixture_weighted() -> str:
    """Mirrors prep.weighted_mixture_sample: HUGEINT arithmetic with
    the SAME floor-division order as the engine's Python big ints —
    B = (t*W) // w, thr = (scale*B*w) // (W*t)."""
    h = H(f"CAST(doc_id AS VARCHAR) || ':{C.MIX_SEED}'")
    wvals = ", ".join(f"('{g}', {w})" for g, w in C.MIX_WEIGHTS.items())
    return f"""
WITH c AS (
  SELECT doc_id, lang,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS INT) AS n_tokens
  FROM documents),
w(lang, wt) AS (VALUES {wvals}),
gw AS (
  SELECT c.lang, CAST(sum(n_tokens) AS HUGEINT) AS t, CAST(any_value(wt) AS HUGEINT) AS wt
  FROM c JOIN w ON c.lang = w.lang
  WHERE c.lang IS NOT NULL GROUP BY 1 HAVING sum(n_tokens) > 0),
tot AS (SELECT CAST(sum(wt) AS HUGEINT) AS W FROM gw),
b AS (SELECT min((t * (SELECT W FROM tot)) // wt) AS B FROM gw),
thr AS (
  SELECT lang,
         (CAST({C.MIX_SCALE} AS HUGEINT) * (SELECT B FROM b) * wt)
           // ((SELECT W FROM tot) * t) AS thr
  FROM gw)
SELECT doc_id, c.lang, n_tokens, CAST({h} % {C.MIX_SCALE} AS INT) AS sample_bucket
FROM c JOIN thr ON c.lang = thr.lang
WHERE ({h} % {C.MIX_SCALE}) < thr.thr
"""


def sql_snapshot_diff() -> str:
    """Mirrors q_snapshot_diff: full outer join of the two snapshots'
    normalized content hashes on the stable id."""
    norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    d, e, off, a = C.DIFF_DROP, C.DIFF_EDIT, C.DIFF_ADD_OFFSET, C.DIFF_ADD_EVERY
    return f"""
WITH old AS (SELECT doc_id, {H(norm)} AS old_hash FROM documents),
newdocs AS (
  SELECT doc_id,
         CASE WHEN doc_id % {e} = 0 THEN 'edited ' || text ELSE text END AS text
  FROM documents WHERE doc_id % {d} <> 0
  UNION ALL
  SELECT doc_id + {off} AS doc_id, text FROM documents WHERE doc_id % {a} = 0),
new AS (SELECT doc_id, {H(norm)} AS new_hash FROM newdocs),
j AS (
  SELECT coalesce(old.doc_id, new.doc_id) AS doc_id, old_hash, new_hash,
         old.doc_id IS NOT NULL AS in_old, new.doc_id IS NOT NULL AS in_new
  FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id)
SELECT doc_id,
  CASE WHEN NOT in_old THEN 'added'
       WHEN NOT in_new THEN 'removed'
       ELSE 'modified' END AS change,
  old_hash, new_hash
FROM j
WHERE NOT in_old OR NOT in_new OR old_hash IS DISTINCT FROM new_hash
"""


def sql_chunk_documents() -> str:
    """Mirrors prep.chunk_documents: DuckDB's inclusive 1-based list
    slice t[s : s+W-1] == Spark's slice(toks, s, W)."""
    w, st = C.CHUNK_WINDOW, C.CHUNK_STRIDE
    return f"""
WITH toks AS ({TOKS}),
idx AS (
  SELECT doc_id, t,
         unnest(range(0, CAST(CASE WHEN len(t) > 0
                THEN floor((len(t) - 1) / {st}) + 1 ELSE 0 END AS BIGINT))) AS ci
  FROM toks)
SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
       array_to_string(t[ci*{st}+1 : ci*{st}+{w}], ' ') AS chunk_text,
       CAST(len(t[ci*{st}+1 : ci*{st}+{w}]) AS INT) AS n_chunk_tokens
FROM idx
"""


def sql_quality_report() -> str:
    """Mirrors q_quality_report by composing the already-verified
    fragment queries (MATERIALIZED — plain CTEs inline per use); the
    keep rule is the corpus_clean quality boundary AND the repetition
    oracle's own integer-exact keep column."""
    return f"""
WITH ts AS MATERIALIZED ({sql_text_stats()}),
ent AS MATERIALIZED ({sql_token_entropy()}),
rep AS MATERIALIZED ({sql_repetition_stats()}),
lm AS MATERIALIZED ({sql_lm_quality()})
SELECT ts.doc_id, ts.n_tokens, round(ts.quality, 6) AS quality,
       ent.entropy, lm.lm_nll,
       (ts.quality >= 0.5 AND rep.keep) AS keep
FROM ts JOIN ent ON ts.doc_id = ent.doc_id
        JOIN rep ON ts.doc_id = rep.doc_id
        LEFT JOIN lm ON ts.doc_id = lm.doc_id
"""


def sql_bpe_pair_counts() -> str:
    """Mirrors q_bpe_pair_counts: word counts, char split with the
    </w> sentinel appended, adjacent-pair expansion weighted by word
    count, top 200 by (cnt desc, left, right)."""
    return """
WITH wc AS (
  SELECT g AS word, count(*) AS cnt
  FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS g
        FROM documents) GROUP BY 1),
chars AS (
  SELECT cnt, list_append(string_split(word, ''), '</w>') AS c FROM wc),
pairs AS (
  SELECT cnt, unnest(list_transform(range(1, len(c)), i ->
           struct_pack(l := c[i], r := c[i+1]))) AS p
  FROM chars),
agg AS (
  -- CAST: DuckDB sum(BIGINT) yields HUGEINT, which surfaces over Arrow as
  -- decimal128(38,0) and hash-mismatches Spark's BIGINT even when every
  -- value is equal. BIGINT keeps both engines' dtypes aligned.
  SELECT p.l AS "left", p.r AS "right", CAST(sum(cnt) AS BIGINT) AS cnt
  FROM pairs GROUP BY 1, 2)
SELECT "left", "right", cnt,
       CAST(row_number() OVER (ORDER BY cnt DESC, "left" ASC, "right" ASC) AS INT) AS rank
FROM agg
ORDER BY cnt DESC, "left" ASC, "right" ASC
LIMIT 200
"""


def sql_lm_quality_bands() -> str:
    """Mirrors prep.lm_quality_bands: DuckDB quantile_cont returns the
    SAME bit-identical interpolated doubles as Spark's exact percentile
    over the identical rounded-6 score multiset (verified), so the
    band comparisons agree exactly. The lm CTE is MATERIALIZED — plain
    CTEs inline per reference and the scores feed both the quantile
    and the projection."""
    return f"""
WITH lm AS MATERIALIZED ({sql_lm_quality()}),
q AS (SELECT quantile_cont(lm_nll, [1.0/3, 2.0/3]) AS qs FROM lm)
SELECT doc_id, n_tokens, lm_nll,
  CASE WHEN lm_nll <= qs[1] THEN 'head'
       WHEN lm_nll <= qs[2] THEN 'middle'
       ELSE 'tail' END AS band
FROM lm, q
"""


def sql_incremental_dedup() -> str:
    """Mirrors q_incremental_dedup (Bloom prefilter is cost-only, so
    the relational form ignores it): batch = native every-10th docs
    plus planted copies of every 7th history doc; keep min-id per hash
    within the batch, anti-join the history hashes."""
    norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    m, p, off = C.INC_BATCH_MOD, C.INC_PLANT_MOD, C.INC_PLANT_OFFSET
    return f"""
WITH history AS (SELECT doc_id, text FROM documents WHERE doc_id % {m} <> 0),
batch AS (
  SELECT doc_id, text FROM documents WHERE doc_id % {m} = 0
  UNION ALL
  SELECT doc_id + {off} AS doc_id, upper(text) || '  ' AS text
  FROM history WHERE doc_id % {p} = 0),
bh AS (SELECT doc_id, {H(norm)} AS content_hash FROM batch),
hh AS (SELECT DISTINCT {H(norm)} AS content_hash FROM history),
firsts AS (SELECT content_hash, min(doc_id) AS doc_id FROM bh GROUP BY 1)
SELECT f.doc_id, f.content_hash
FROM firsts f ANTI JOIN hh ON f.content_hash = hh.content_hash
"""


def sql_token_entropy() -> str:
    """Mirrors q_token_entropy: the fold runs over list_sort(
    list_distinct(t)) — identical summation order to the engine's
    sorted-distinct F.aggregate, so the doubles agree bit-for-bit up
    to libm ln() ulps, absorbed by round(6) on both sides."""
    c = "len(list_filter(t, x -> x = g))"
    s = (
        f"list_reduce(list_prepend(0.0, list_transform("
        f"list_sort(list_distinct(t)), g -> {c} * ln({c}))), (a, x) -> a + x)"
    )
    ent = f"CASE WHEN len(t) > 0 THEN ln(len(t)) - {s} / len(t) ELSE 0.0 END"
    return f"""
WITH toks AS ({TOKS})
SELECT doc_id, CAST(len(t) AS INT) AS n_tokens,
  round({ent}, 6) AS entropy,
  CASE WHEN len(t) > 1 THEN round(({ent}) / ln(len(t)), 6) ELSE 0.0 END AS entropy_norm
FROM toks
"""


def sql_lm_quality() -> str:
    """Mirrors prep.unigram_lm_scores. The per-doc fold is ordered by
    token (list(... ORDER BY token) == the engine's array_sort on the
    (token, c, cf) struct list, where token is unique per doc), and
    every ln() argument is an exact integer count — round(6) absorbs
    ulp differences."""
    return f"""
WITH toks AS ({TOKS}),
freq AS (
  SELECT g AS token, count(*) AS cf
  FROM (SELECT unnest(t) AS g FROM toks) GROUP BY 1),
total AS (SELECT CAST(sum(cf) AS DOUBLE) AS tot FROM freq),
per AS (
  SELECT doc_id, g AS token, count(*) AS c
  FROM (SELECT doc_id, unnest(t) AS g FROM toks) GROUP BY 1, 2),
s AS (
  SELECT doc_id,
    list_reduce(
      list_prepend(0.0, list(CAST(c AS DOUBLE) * ln(CAST(cf AS DOUBLE)) ORDER BY token)),
      (a, x) -> a + x) AS s
  FROM per JOIN freq USING (token) GROUP BY doc_id)
SELECT t.doc_id, CAST(len(t.t) AS INT) AS n_tokens,
  CASE WHEN len(t.t) > 0 AND s.s IS NOT NULL
       THEN round(ln((SELECT tot FROM total)) - s.s / len(t.t), 6)
       ELSE 0.0 END AS lm_nll
FROM toks t LEFT JOIN s ON t.doc_id = s.doc_id
"""


def sql_pii_scrub() -> str:
    """Mirrors q_pii_scrub: same planted PII, same regex patterns
    (dialect-portable subset — RE2 here, java.util.regex in Spark agree
    on every construct used), counts via regexp_extract_all on the
    original text, redaction via chained global regexp_replace in
    PII_PATTERNS declaration order."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.textstats import (
        PII_PATTERNS,
    )

    redact = "text"
    for pat, token in PII_PATTERNS.values():
        redact = f"regexp_replace({redact}, '{pat}', '{token}', 'g')"
    counts = {
        kind: f"CAST(len(regexp_extract_all(text, '{pat}')) AS INT)"
        for kind, (pat, _) in PII_PATTERNS.items()
    }
    e, p, i = C.PII_EMAIL_EVERY, C.PII_PHONE_EVERY, C.PII_IP_EVERY
    return f"""
WITH src AS (
  SELECT doc_id,
    text
    || CASE WHEN doc_id % {e} = 0
            THEN ' contact user' || doc_id || '@example.com' ELSE '' END
    || CASE WHEN doc_id % {p} = 0 THEN ' call 555-123-4567' ELSE '' END
    || CASE WHEN doc_id % {i} = 0
            THEN ' from 192.168.1.' || (doc_id % 250) ELSE '' END AS text
  FROM documents)
SELECT doc_id, {redact} AS clean_text,
  {counts['email']} AS n_emails,
  {counts['phone']} AS n_phones,
  {counts['ipv4']} AS n_ips
FROM src
"""


def sql_boilerplate_removal() -> str:
    """Mirrors q_boilerplate_removal: same planted header/footer/rare
    lines, doc-frequency dictionary keyed on the SAME portable line
    hash the engine shuffles on (a hash collision cannot diverge the
    result), surviving lines reassembled in position order; docs with
    zero kept lines drop on both sides."""
    he, fe, re_, rm, k = (
        C.BP_HEADER_EVERY,
        C.BP_FOOTER_EVERY,
        C.BP_RARE_EVERY,
        C.BP_RARE_MOD,
        C.BP_MIN_DF,
    )
    return f"""
WITH src AS (
  SELECT doc_id, concat_ws(chr(10),
    CASE WHEN doc_id % {he} = 0 THEN '{C.BP_HEADER}' END,
    text,
    CASE WHEN doc_id % {fe} = 0 THEN '{C.BP_FOOTER}' END,
    CASE WHEN doc_id % {re_} = 0
         THEN 'visit docs page ' || (doc_id % {rm}) END) AS text
  FROM documents),
la AS (SELECT doc_id, list_filter(string_split(text, chr(10)), x -> x <> '') AS l
       FROM src),
lines AS (SELECT doc_id, unnest(l) AS line, generate_subscripts(l, 1) AS pos
          FROM la),
dict AS (
  SELECT {H('line')} AS lh
  FROM (SELECT DISTINCT doc_id, line FROM lines)
  GROUP BY 1 HAVING count(*) >= {k}),
kept AS (SELECT doc_id, line, pos FROM lines
         WHERE {H('line')} NOT IN (SELECT lh FROM dict)),
tot AS (SELECT doc_id, count(*) AS n FROM lines GROUP BY 1)
SELECT k.doc_id, string_agg(k.line, chr(10) ORDER BY k.pos) AS clean_text,
       CAST(t.n - count(*) AS INT) AS n_removed
FROM kept k JOIN tot t USING (doc_id)
GROUP BY k.doc_id, t.n
"""


# --- round-6: corpus governance + classification eval -----------------------


def sql_source_quota() -> str:
    """Mirrors prep.per_group_quota on (documents, source): per-source
    row_number over the salted portable stable-id hash, quota cap."""
    h = H("CAST(doc_id AS VARCHAR) || ':quota'")
    return f"""
SELECT source, doc_id, pick_rank FROM (
  SELECT source, doc_id,
         CAST(row_number() OVER (
           PARTITION BY source ORDER BY {h} ASC, doc_id ASC) AS INT) AS pick_rank
  FROM documents)
WHERE pick_rank <= {C.SOURCE_QUOTA}
"""


def sql_stratified_split() -> str:
    """Mirrors prep.stratified_split on (documents, lang): per-group
    row_number over the salted portable stable-id hash vs
    floor(val_frac * group size). val_frac is CAST to DOUBLE — a bare
    DuckDB decimal literal would multiply exactly while Spark
    multiplies doubles, and floor() at an integral boundary would then
    disagree."""
    h = H("CAST(doc_id AS VARCHAR) || ':strat'")
    return f"""
SELECT lang, doc_id,
       (CASE WHEN rn <= floor(n * CAST({C.STRAT_VAL_FRAC} AS DOUBLE))
             THEN 'val' ELSE 'train' END) AS split
FROM (
  SELECT lang, doc_id,
         CAST(row_number() OVER (
           PARTITION BY lang ORDER BY {h} ASC, doc_id ASC) AS BIGINT) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents)
"""


def sql_url_dedup() -> str:
    """Mirrors q_url_dedup: the same deterministic synthetic URL per
    doc (NULL for ids % URL_NULL_MOD — lost headers), the same
    normalization chain (lowercase, strip scheme / leading www. /
    query+fragment / trailing slashes), first-wins keep on the min
    doc_id per normalized URL; null-URL rows keep=true unconditionally
    (not dedup-able by URL, and NOT one group)."""
    return f"""
WITH urls AS (
  SELECT doc_id,
         CASE WHEN doc_id % {C.URL_NULL_MOD} = 0 THEN NULL ELSE
         (CASE WHEN doc_id % 2 = 0 THEN 'https://www.' ELSE 'http://' END)
         || source || '.example.org/page/'
         || CAST(doc_id % {C.URL_PAGE_MOD} AS VARCHAR)
         || (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END)
         || '?utm_source=' || source
         || '&fetch=' || CAST(doc_id AS VARCHAR) || '#top' END AS url
  FROM documents),
norm AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           lower(trim(url)),
           '^[a-z][a-z0-9+.-]*://', ''),
           '^www\\.', ''),
           '[?#].*$', ''),
           '/+$', '') AS norm_url
  FROM urls)
SELECT n.doc_id, n.norm_url, (n.doc_id = m.keep_id) AS keep
FROM norm n
JOIN (SELECT norm_url, min(doc_id) AS keep_id FROM norm
      WHERE norm_url IS NOT NULL GROUP BY 1) m
  USING (norm_url)
UNION ALL
SELECT doc_id, norm_url, TRUE AS keep FROM norm WHERE norm_url IS NULL
"""


def sql_paragraph_dedup() -> str:
    """Mirrors q_paragraph_dedup: the same synthetic pages (doc texts
    blank-line-joined in doc_id order per doc_id % PARA_PAGES group),
    split back on the shared blank-line regex, the same MinHash/band
    chain per PARAGRAPH keyed pid = page_id*stride + para_idx, losers
    = the larger side of any pair with est-Jaccard >= PARA_THRESHOLD
    (the engine's min-matching-bands gate is a lossless pigeonhole
    bound, so the plain band join + score filter is equivalent),
    survivors reassembled in para_idx order."""
    para_toks = "list_filter(string_split(para, ' '), x -> x <> '')"
    band_str = (
        f"array_to_string(list_transform("
        f"sigl[band_id*{RPB}+1 : band_id*{RPB}+{RPB}], v -> v::VARCHAR), ',')"
    )
    return f"""
WITH pages AS MATERIALIZED (
  SELECT doc_id % {C.PARA_PAGES} AS page_id,
         string_agg(text, e'\n\n' ORDER BY doc_id) AS text
  FROM documents GROUP BY 1),
paras AS MATERIALIZED (
  SELECT page_id, para_idx, para,
         page_id * {C.PARA_STRIDE} + para_idx AS pid
  FROM (
    SELECT page_id,
           CAST(generate_subscripts(arr, 1) - 1 AS INT) AS para_idx,
           trim(unnest(arr)) AS para
    FROM (SELECT page_id,
                 regexp_split_to_array(text, '\\n\\s*\\n') AS arr
          FROM pages))
  WHERE para <> ''),
hs AS (
  SELECT pid, list_transform(list_distinct({para_toks}), s -> {HMOD('s')}) AS h
  FROM paras),
sigs AS MATERIALIZED (
  SELECT pid, list_transform(range({NP}), p -> coalesce(
    list_min(list_transform(h, x -> (ca[p+1]*x + cb[p+1]) % {P})), {P})) AS sigl
  FROM hs, {CONSTS}),
bands AS MATERIALIZED (
  SELECT pid, CAST(band_id AS INT) AS band_id, {H(band_str)} AS band_hash
  FROM sigs, (SELECT unnest(range({NB})) AS band_id) b),
pairs AS (
  SELECT DISTINCT a.pid AS pa, b.pid AS pb
  FROM bands a JOIN bands b USING (band_id, band_hash)
  WHERE a.pid < b.pid),
losers AS (
  SELECT DISTINCT pb AS pid FROM (
    SELECT pa, pb,
      list_sum(list_transform(range({NP}),
        i -> CASE WHEN sa.sigl[i+1] = sb.sigl[i+1] THEN 1 ELSE 0 END)) / {NP} AS score
    FROM pairs p JOIN sigs sa ON sa.pid = p.pa JOIN sigs sb ON sb.pid = p.pb)
  WHERE score >= {C.PARA_THRESHOLD}),
kept AS (SELECT * FROM paras WHERE pid NOT IN (SELECT pid FROM losers)),
totals AS (
  SELECT page_id, CAST(count(*) AS BIGINT) AS n_paras FROM paras GROUP BY 1),
agg AS (
  SELECT page_id, string_agg(para, e'\n\n' ORDER BY para_idx) AS text,
         CAST(count(*) AS BIGINT) AS n_kept
  FROM kept GROUP BY 1)
SELECT t.page_id, coalesce(a.text, '') AS text, t.n_paras,
       CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept
FROM totals t LEFT JOIN agg a USING (page_id)
"""


def sql_source_temperature_mix() -> str:
    """Mirrors prep.source_temperature_mix: per-source doc/token
    counts, raw token share, n^alpha multinomial weight, effective
    epochs. pow(bigint, alpha) is bit-identical across engines
    (verified empirically); the pow-sum is a FIXED ascending-source
    left fold on both sides; the token total is an exact integer sum
    (order-free). Outputs round(6); the ratio expressions evaluate in
    the same left-to-right order as the Spark column expressions."""
    toks_len = (
        "CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) "
        "AS BIGINT)"
    )
    a = f"CAST({C.MIX_ALPHA} AS DOUBLE)"
    p = f"pow(CAST(n_tokens AS DOUBLE), {a})"
    return f"""
WITH c AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum({toks_len}) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1),
tot AS (
  SELECT list_reduce(list_prepend(0.0, list_transform(l,
           x -> pow(CAST(x AS DOUBLE), {a}))), (acc, v) -> acc + v) AS pow_total,
         CAST(list_sum(l) AS BIGINT) AS tok_total
  FROM (SELECT list(n_tokens ORDER BY source) AS l FROM c))
SELECT source, n_docs, n_tokens,
       round(n_tokens / tok_total, 6) AS p_raw,
       round({p} / pow_total, 6) AS p_temp,
       round({p} / pow_total * tok_total / n_tokens, 6) AS effective_epochs
FROM c, tot
"""


def sql_filtered_cosine_topk() -> str:
    """Mirrors q_filtered_cosine_topk: pre-filter semantics — the
    documents-side language predicate restricts the candidate set
    BEFORE the cosine ranking, so each query gets exactly k qualifying
    neighbors; same rounded fold and (score desc, id asc) ties as the
    unfiltered cosine oracle."""
    expr = (
        f"{_dot('e.embedding', 'q.qv', C.EMB_DIM)} / "
        f"({_norm('e.embedding', C.EMB_DIM)} * {_norm('q.qv', C.EMB_DIM)})"
    )
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv
           FROM embeddings WHERE vec_id < {C.BATCH_DOCS}),
keep AS (SELECT doc_id FROM documents WHERE lang = '{C.FILTER_LANG}'),
scored AS (
  SELECT q.query_id, e.vec_id, round({expr}, 6) AS cos_sim
  FROM embeddings e JOIN keep k ON e.vec_id = k.doc_id, q)
SELECT query_id, vec_id, cos_sim, rank FROM (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS INT) AS rank
  FROM scored) WHERE rank <= {C.K_BATCH}
"""


def sql_knn_label_vote() -> str:
    """Mirrors q_knn_label_vote: exact-L2 kNN excluding self (rounded
    fold, ties (dist, id)), majority label vote with ties to the
    smaller label, compared against the query's own label."""
    l2 = _l2("e.embedding", "q.qv", C.EMB_DIM)
    return f"""
WITH qs AS (
  SELECT vec_id AS query_id, embedding AS qv, label AS true_label
  FROM embeddings WHERE vec_id < {C.BATCH_DOCS}),
nn AS (
  SELECT q.query_id, e.vec_id, e.label,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY round({l2}, 6) ASC, e.vec_id ASC) AS rn
  FROM embeddings e, qs q WHERE e.vec_id <> q.query_id),
votes AS (
  SELECT query_id, label, CAST(count(*) AS BIGINT) AS n_votes
  FROM nn WHERE rn <= {C.KNN_VOTE_K} GROUP BY 1, 2),
pred AS (
  SELECT query_id, label AS pred_label,
         row_number() OVER (
           PARTITION BY query_id ORDER BY n_votes DESC, label ASC) AS vr
  FROM votes)
SELECT p.query_id, p.pred_label, q.true_label,
       (p.pred_label = q.true_label) AS correct
FROM pred p JOIN qs q USING (query_id) WHERE p.vr = 1
"""


def sql_dedup_group_sizes() -> str:
    """Mirrors q_dedup_group_sizes: cluster-size histogram over the
    connected-components result (the dedup_groups statement as a CTE)."""
    return f"""
WITH g AS MATERIALIZED ({sql_dedup_groups()}),
sizes AS (SELECT group_id, CAST(count(*) AS BIGINT) AS group_size FROM g GROUP BY 1)
SELECT group_size, CAST(count(*) AS BIGINT) AS n_groups FROM sizes GROUP BY 1
"""


def sql_source_overlap() -> str:
    """Mirrors q_source_overlap: the lsh_pairs statement as a CTE,
    joined to each side's source, counted per source pair."""
    return f"""
WITH p AS MATERIALIZED ({sql_lsh_pairs()})
SELECT da.source AS source_a, db.source AS source_b,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM p JOIN documents da ON p.doc_a = da.doc_id
       JOIN documents db ON p.doc_b = db.doc_id
GROUP BY 1, 2
"""


def sql_lang_confusion() -> str:
    """Mirrors q_lang_confusion: the lang_id statement as a CTE joined
    to the labeled lang column, confusion counts."""
    return f"""
WITH li AS MATERIALIZED ({sql_lang_id()})
SELECT d.lang, li.lang_guess, CAST(count(*) AS BIGINT) AS n_docs
FROM li JOIN documents d USING (doc_id)
GROUP BY 1, 2
"""


def sql_remove_duplicate_spans() -> str:
    """Mirrors dedup.remove_duplicate_spans: n-gram occurrences with
    start offsets keyed by the SAME portable 60-bit hash the engine
    joins on, document frequency over distinct (doc, gram), tokens
    covered by any duplicated-gram window dropped, text reassembled in
    position order (coalesced to '' for fully-removed/empty docs)."""
    n, mdf = C.SPAN_NGRAM, C.SPAN_REMOVE_MIN_DF
    gram = f"array_to_string(t[i:i+{n}-1], ' ')"
    return f"""
WITH toks AS ({TOKS}),
occ0 AS (
  SELECT doc_id, t,
         unnest(range(1, CASE WHEN len(t) >= {n} THEN len(t)-{n}+2 ELSE 1 END)) AS i
  FROM toks),
occ AS (SELECT doc_id, CAST(i - 1 AS INT) AS start, {H(gram)} AS gram_hash FROM occ0),
df AS (
  SELECT gram_hash FROM (SELECT DISTINCT doc_id, gram_hash FROM occ)
  GROUP BY 1 HAVING count(*) >= {mdf}),
st AS (SELECT doc_id, start FROM occ JOIN df USING (gram_hash)),
pos AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS p, t[i] AS tok
  FROM (SELECT doc_id, t, unnest(range(1, len(t)+1)) AS i FROM toks)),
kept AS (
  SELECT pos.doc_id, p, tok FROM pos
  WHERE NOT EXISTS (
    SELECT 1 FROM st
    WHERE st.doc_id = pos.doc_id AND st.start <= pos.p AND pos.p < st.start + {n}))
SELECT t.doc_id,
  coalesce(string_agg(k.tok, ' ' ORDER BY k.p), '') AS clean_text,
  CAST(len(t.t) AS INT) AS n_tokens,
  CAST(len(t.t) - count(k.tok) AS INT) AS n_removed
FROM toks t LEFT JOIN kept k ON t.doc_id = k.doc_id
GROUP BY t.doc_id, len(t.t)
"""


def sql_nb_classify() -> str:
    """Mirrors prep.naive_bayes_classify: multinomial NB with add-one
    smoothing, id-mod train/test split, per-(doc, class) fold ordered
    by token (unique per doc), argmax on round(score, 10) with ties to
    the smaller label. Every ln() argument is an exact integer; the
    engine computes priors/denominators driver-side with Python
    math.log and this twin uses DuckDB ln() — both libm doubles, and
    the n_tokens-scaled ulp gap stays far inside the round(6)."""
    m = C.NB_TEST_MOD
    return f"""
WITH d AS (
  SELECT doc_id, lang,
         list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents),
train AS (SELECT * FROM d WHERE doc_id % {m} != 0),
test AS (SELECT * FROM d WHERE doc_id % {m} = 0),
tok_tr AS (SELECT lang AS label, unnest(t) AS token FROM train),
ct AS MATERIALIZED (SELECT label, token, count(*) AS cnt FROM tok_tr GROUP BY 1, 2),
tl AS (SELECT label, count(*) AS tn FROM tok_tr GROUP BY 1),
vc AS (SELECT count(DISTINCT token) AS v FROM tok_tr),
dl AS (SELECT lang AS label, count(*) AS dn FROM train GROUP BY 1),
cls AS MATERIALIZED (
  SELECT dl.label,
         ln(CAST(dn AS DOUBLE)) - ln(CAST((SELECT count(*) FROM train) AS DOUBLE)) AS prior,
         ln(CAST(tn + (SELECT v FROM vc) AS DOUBLE)) AS ln_denom
  FROM dl JOIN tl USING (label)),
meta AS (SELECT doc_id, lang AS true_label, len(t) AS n_tokens FROM test),
per AS (
  SELECT doc_id, g AS token, count(*) AS c
  FROM (SELECT doc_id, unnest(t) AS g FROM test) GROUP BY 1, 2),
folds AS (
  SELECT per.doc_id, c2.label,
    list_reduce(
      list_prepend(0.0,
        list(CAST(c AS DOUBLE) * ln(CAST(coalesce(ct.cnt, 0) + 1 AS DOUBLE))
             ORDER BY per.token)),
      (a, x) -> a + x) AS fold
  FROM per CROSS JOIN (SELECT label FROM cls) c2
  LEFT JOIN ct ON ct.label = c2.label AND ct.token = per.token
  GROUP BY 1, 2),
sc AS (
  SELECT m.doc_id, m.true_label, c.label,
         c.prior - CAST(m.n_tokens AS DOUBLE) * c.ln_denom
           + coalesce(f.fold, 0.0) AS score
  FROM meta m CROSS JOIN cls c
  LEFT JOIN folds f ON f.doc_id = m.doc_id AND f.label = c.label),
rk AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY round(score, 10) DESC, label ASC) AS rn
  FROM sc)
SELECT doc_id, true_label, label AS pred_label,
       round(score, 6) AS score, label = true_label AS correct
FROM rk WHERE rn = 1
"""


def _winnow_fps_cte() -> str:
    """Shared winnowing CTE body: per-doc selected (pos, fp) rows.
    Mirrors dedup.winnow_fingerprints exactly — same char k-gram
    Mersenne-31 hashes, same rightmost-window-minimum rule (list_reduce
    inits with the FIRST window element, matching the engine's
    aggregate init = element i), same short-doc/short-list handling."""
    k, w = C.WINNOW_K, C.WINNOW_W
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.hashing import (
        shingle_hash_sql,
    )

    sh = shingle_hash_sql(f"substr(text, CAST(i AS INT), {k})")
    m = 1 << 31
    return f"""
hs0 AS (
  SELECT doc_id,
    CASE WHEN length(text) >= {k}
         THEN list_transform(range(1, length(text)-{k}+2), i -> {sh})
         ELSE CAST([] AS BIGINT[]) END AS hs
  FROM documents),
cs0 AS (
  SELECT doc_id,
    list_transform(range(1, len(hs)+1),
                   i -> (hs[CAST(i AS INT)] << 31) + ({m} - i)) AS cs,
    least({w}, len(hs)) AS wlen
  FROM hs0 WHERE len(hs) > 0),
sel AS (
  SELECT doc_id,
    list_distinct(list_transform(range(1, len(cs) - wlen + 2), i ->
      list_min(cs[CAST(i AS INT):CAST(i + wlen - 1 AS INT)]))) AS sels
  FROM cs0),
wfp AS (
  SELECT doc_id,
         CAST({m} - (c & {m - 1}) - 1 AS INT) AS pos,
         c >> 31 AS fp
  FROM (SELECT doc_id, unnest(sels) AS c FROM sel))"""


def sql_winnow_fingerprints() -> str:
    """Mirrors dedup.winnow_fingerprints (see _winnow_fps_cte)."""
    return f"""
WITH {_winnow_fps_cte()}
SELECT doc_id, pos, fp FROM wfp
"""


def sql_winnow_pairs() -> str:
    """Mirrors dedup.winnow_pairs: distinct per-doc fingerprints,
    df-capped, bucket pairs counted — the shared_ngram_spans shape
    over the winnowed selection."""
    cap, ms = C.WINNOW_MAX_DOC_FREQ, C.WINNOW_MIN_SHARED
    return f"""
WITH {_winnow_fps_cte()},
fps AS (SELECT DISTINCT doc_id, fp FROM wfp),
df AS (SELECT fp FROM fps GROUP BY 1 HAVING count(*) BETWEEN 2 AND {cap}),
kk AS (SELECT doc_id, fps.fp FROM fps JOIN df USING (fp))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS INT) AS shared_fps
FROM kk a JOIN kk b USING (fp)
WHERE a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= {ms}
"""



def _dsir_cnt_cte() -> str:
    """Shared DSIR feature-count prefix (d/feats/occ/cnt): hashed
    unigram+bigram occurrence buckets (portable md5 family, NULL text
    folded to the empty list) and the per-bucket target/raw counts.
    ONE copy consumed by every DSIR twin — the weight family via
    :func:`_dsir_raw_cte` and the divergence report — so the feature
    definition cannot drift between them."""
    b, m = C.DSIR_BUCKETS, C.DSIR_TARGET_MOD
    h = H("g")
    return f"""
d AS (
  SELECT doc_id,
         list_filter(string_split(coalesce(text, ''), ' '), x -> x <> '') AS t
  FROM documents),
feats AS (
  SELECT doc_id,
    list_transform(
      list_concat(t,
        CASE WHEN len(t) >= 2
             THEN list_transform(range(1, len(t)),
                    i -> t[CAST(i AS INT)] || ' ' || t[CAST(i + 1 AS INT)])
             ELSE CAST([] AS VARCHAR[]) END),
      g -> {h} % {b}) AS f
  FROM d),
occ AS MATERIALIZED (SELECT doc_id, unnest(f) AS f FROM feats),
cnt AS (
  SELECT f,
         sum(CASE WHEN doc_id % {m} = 0 THEN 1 ELSE 0 END) AS ctt,
         sum(CASE WHEN doc_id % {m} != 0 THEN 1 ELSE 0 END) AS crr
  FROM occ GROUP BY 1)"""


def _dsir_raw_cte() -> str:
    """Shared DSIR CTE body: per-raw-doc log importance weight.
    Mirrors prep.dsir_importance_weights exactly — same hashed
    unigram+bigram occurrence buckets (portable md5 family), same
    add-one-smoothed per-bucket log ratios over exact integer counts,
    same ascending-bucket float summation order (ties between equal
    buckets carry equal lambda, so the fold sequence is identical).
    The engine computes the ratios driver-side with Python math.log
    and this twin uses DuckDB ln() — both libm doubles, inside the
    round(6) like the NB priors."""
    b, m = C.DSIR_BUCKETS, C.DSIR_TARGET_MOD
    return f"""{_dsir_cnt_cte()},
lam AS MATERIALIZED (
  SELECT f,
         ln(CAST(ctt + 1 AS DOUBLE))
           - ln(CAST((SELECT sum(ctt) FROM cnt) + {b} AS DOUBLE))
           - ln(CAST(crr + 1 AS DOUBLE))
           + ln(CAST((SELECT sum(crr) FROM cnt) + {b} AS DOUBLE)) AS lam
  FROM cnt),
folds AS (
  SELECT o.doc_id,
    list_reduce(list_prepend(0.0, list(l.lam ORDER BY o.f)),
                (a, x) -> a + x) AS log_w
  FROM occ o JOIN lam l USING (f)
  WHERE o.doc_id % {m} != 0
  GROUP BY 1),
raw AS (
  SELECT d.doc_id, coalesce(f.log_w, 0.0) AS log_w
  FROM d LEFT JOIN folds f USING (doc_id)
  WHERE d.doc_id % {m} != 0)"""


def _dsir_keyed_cte() -> str:
    """Shared Gumbel-key CTE over the raw pool: one copy of the
    u = (salted-hash mod 2^20 + 0.5) / 2^20 draw for both the
    count-budget and token-budget selectors."""
    scale = 1 << 20
    h = H("CAST(doc_id AS VARCHAR) || ':dsir'")
    return f"""
keyed AS (
  SELECT doc_id, log_w,
         log_w + (-ln(-ln((({h} % {scale}) + 0.5) / {scale}.0))) AS sel_key
  FROM raw)"""


def sql_dsir_weights() -> str:
    """Mirrors prep.dsir_importance_weights (see _dsir_raw_cte)."""
    return f"""
WITH {_dsir_raw_cte()}
SELECT doc_id, round(log_w, 6) AS log_weight FROM raw
"""


def sql_dsir_select() -> str:
    """Mirrors prep.dsir_select: deterministic Gumbel-top-k over the
    DSIR weights. u = (salted-hash mod 2^20 + 0.5) / 2^20 is exact in
    binary64 both engines; the rank orders by round(key, 10) desc with
    id tiebreak, the NB argmax discipline."""
    n = C.DSIR_SELECT_N
    return f"""
WITH {_dsir_raw_cte()},{_dsir_keyed_cte()},
rk AS (
  SELECT doc_id, log_w, sel_key,
         CAST(row_number() OVER (
           ORDER BY round(sel_key, 10) DESC, doc_id ASC) AS INT) AS sel_rank
  FROM keyed)
SELECT doc_id, round(log_w, 6) AS log_weight,
       round(sel_key, 6) AS sel_key, sel_rank
FROM rk WHERE sel_rank <= {n}
"""



def sql_epoch_shuffle() -> str:
    """Mirrors prep.epoch_shuffle: global 0-based rank under the
    salted portable-hash key with id tiebreak. The oracle states the
    law directly as one window; the engine computes the identical
    permutation with the distributed prefix count."""
    h = H(f"CAST(doc_id AS VARCHAR) || ':shuffle:{C.SHUFFLE_EPOCH}'")
    return f"""
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY {h}, doc_id) - 1 AS BIGINT)
         AS shuffle_pos
FROM documents
"""


def sql_bm25_topk(query: str | None = None) -> str:
    """Mirrors retrieval.bm25_topk: same Lucene-variant idf over exact
    integer df/N (+0.5 halves are exact in binary), same operation
    order in every float expression (the k1/b literals are emitted
    from the SAME Python floats the engine uses), per-doc fold ordered
    by token, ranking on round(score, 10) desc / doc_id asc. avgdl is
    sum_dl / n — DuckDB float division of exact ints matches Python's
    correctly-rounded int true-division below 2^53.

    Also the oracle for bm25_topk_store (with the store fixture query):
    the persisted index's sidecar df/N/sum_dl equal the corpus values
    by construction, so the store query's oracle IS the table query."""
    terms = sorted({t for t in (query or C.BM25_QUERY).split(" ") if t})
    term_list = ", ".join(f"'{t}'" for t in terms)
    k1, b, k = C.BM25_K1, C.BM25_B, C.BM25_K
    return f"""
WITH toks AS ({TOKS}),
st AS (SELECT count(*) AS n, sum(len(t)) AS sum_dl FROM toks),
terms AS (SELECT unnest([{term_list}]) AS token),
matched AS (
  SELECT doc_id, dl, token, count(*) AS tf
  FROM (SELECT doc_id, len(t) AS dl, unnest(t) AS tok FROM toks) x
  JOIN terms ON x.tok = terms.token
  GROUP BY 1, 2, 3),
dfq AS (SELECT token, count(*) AS df FROM matched GROUP BY 1),
ts AS (
  SELECT m.doc_id, m.token,
    ln(1.0 + (CAST((SELECT n FROM st) AS DOUBLE) - df + 0.5) / (df + 0.5))
      * (CAST(tf AS DOUBLE) * {k1 + 1.0!r})
      / (CAST(tf AS DOUBLE)
         + {k1!r} * ({1.0 - b!r}
                     + {b!r} * CAST(dl AS DOUBLE)
                       / ((SELECT sum_dl FROM st) / (SELECT n FROM st))))
      AS term_score
  FROM matched m JOIN dfq USING (token)),
agg AS (
  SELECT doc_id,
    list_reduce(list_prepend(0.0, list(term_score ORDER BY token)),
                (a, x) -> a + x) AS score
  FROM ts GROUP BY doc_id),
rk AS (
  SELECT doc_id, score,
    CAST(row_number() OVER (ORDER BY round(score, 10) DESC, doc_id ASC) AS INT) AS rank
  FROM agg)
SELECT doc_id, round(score, 6) AS score, rank FROM rk WHERE rank <= {k}
"""


def sql_bm25_topk_batch() -> str:
    """Mirrors retrieval.bm25_topk_batch over the BM25_BATCH_QUERIES
    fixture: df computed once over the union of all query terms, same
    float expression order and literals as sql_bm25_topk, per-(query,
    doc) token-sorted fold, per-query ranking on round(score, 10)
    desc / doc_id asc. Also the oracle for bm25_topk_batch_store (the
    persisted-index batch path is answer-identical by construction)."""
    qterms = sorted(
        {
            (qid, t)
            for qid, q in C.BM25_BATCH_QUERIES
            for t in q.split(" ")
            if t
        }
    )
    values = ", ".join(f"({qid}, '{t}')" for qid, t in qterms)
    k1, b, k = C.BM25_K1, C.BM25_B, C.BM25_K
    return f"""
WITH toks AS ({TOKS}),
st AS (SELECT count(*) AS n, sum(len(t)) AS sum_dl FROM toks),
qterms AS (SELECT * FROM (VALUES {values}) AS v(query_id, token)),
terms AS (SELECT DISTINCT token FROM qterms),
matched AS (
  SELECT doc_id, dl, token, count(*) AS tf
  FROM (SELECT doc_id, len(t) AS dl, unnest(t) AS tok FROM toks) x
  JOIN terms ON x.tok = terms.token
  GROUP BY 1, 2, 3),
dfq AS (SELECT token, count(*) AS df FROM matched GROUP BY 1),
ts AS (
  SELECT q.query_id, m.doc_id, m.token,
    ln(1.0 + (CAST((SELECT n FROM st) AS DOUBLE) - df + 0.5) / (df + 0.5))
      * (CAST(tf AS DOUBLE) * {k1 + 1.0!r})
      / (CAST(tf AS DOUBLE)
         + {k1!r} * ({1.0 - b!r}
                     + {b!r} * CAST(dl AS DOUBLE)
                       / ((SELECT sum_dl FROM st) / (SELECT n FROM st))))
      AS term_score
  FROM matched m JOIN dfq USING (token) JOIN qterms q ON q.token = m.token),
agg AS (
  SELECT query_id, doc_id,
    list_reduce(list_prepend(0.0, list(term_score ORDER BY token)),
                (a, x) -> a + x) AS score
  FROM ts GROUP BY 1, 2),
rk AS (
  SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score,
    CAST(row_number() OVER (PARTITION BY query_id
      ORDER BY round(score, 10) DESC, doc_id ASC) AS INT) AS rank
  FROM agg)
SELECT query_id, doc_id, round(score, 6) AS score, rank
FROM rk WHERE rank <= {k}
"""


def sql_hybrid_rrf_topk() -> str:
    """Mirrors q_hybrid_rrf_topk: the bm25 and cosine top-k statements
    as MATERIALIZED CTEs, full-outer rank fusion 1/(c+rank) summed in
    the engine's coalesce order (lex term first), ranking on
    round(rrf, 10) desc / doc_id asc."""
    c, k = C.RRF_C, C.BM25_K
    return f"""
WITH lex AS MATERIALIZED ({sql_bm25_topk()}),
vec AS MATERIALIZED ({sql_cosine_topk()}),
fused AS (
  SELECT coalesce(l.doc_id, v.vec_id) AS doc_id,
         CAST(l.rank AS INT) AS rank_lex,
         CAST(v.rank AS INT) AS rank_vec,
         coalesce(1.0 / ({c} + l.rank), 0.0)
           + coalesce(1.0 / ({c} + v.rank), 0.0) AS rrf_score
  FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.vec_id),
rk AS (
  SELECT doc_id, rank_lex, rank_vec, rrf_score,
    CAST(row_number() OVER (
      ORDER BY round(rrf_score, 10) DESC, doc_id ASC) AS INT) AS rank
  FROM fused)
SELECT doc_id, rank_lex, rank_vec, round(rrf_score, 6) AS rrf_score, rank
FROM rk WHERE rank <= {k}
"""


def sql_hybrid_rrf_topk_batch() -> str:
    """Mirrors q_hybrid_rrf_topk_batch: the batch BM25 and per-query
    cosine top-k statements as MATERIALIZED CTEs (each query's vector
    is its own document's embedding), full-outer fusion per (query_id,
    doc_id), per-query ranking on round(rrf, 10) desc / doc_id asc."""
    c, k = C.RRF_C, C.BM25_K
    qids = ", ".join(str(qid) for qid, _ in C.BM25_BATCH_QUERIES)
    cos = _topk_emb(
        f"{_dot('e.embedding', 'q.qv', C.EMB_DIM)} / ({_norm('e.embedding', C.EMB_DIM)} * {_norm('q.qv', C.EMB_DIM)})",
        "cos_sim", "DESC", k, f"vec_id IN ({qids})",
    )
    return f"""
WITH lexb AS MATERIALIZED ({sql_bm25_topk_batch()}),
vecb AS MATERIALIZED ({cos}),
fused AS (
  SELECT coalesce(l.query_id, v.query_id) AS query_id,
         coalesce(l.doc_id, v.vec_id) AS doc_id,
         CAST(l.rank AS INT) AS rank_lex,
         CAST(v.rank AS INT) AS rank_vec,
         coalesce(1.0 / ({c} + l.rank), 0.0)
           + coalesce(1.0 / ({c} + v.rank), 0.0) AS rrf_score
  FROM lexb l FULL OUTER JOIN vecb v
    ON l.query_id = v.query_id AND l.doc_id = v.vec_id),
rk AS (
  SELECT query_id, doc_id, rank_lex, rank_vec, rrf_score,
    CAST(row_number() OVER (PARTITION BY query_id
      ORDER BY round(rrf_score, 10) DESC, doc_id ASC) AS INT) AS rank
  FROM fused)
SELECT query_id, doc_id, rank_lex, rank_vec,
       round(rrf_score, 6) AS rrf_score, rank
FROM rk WHERE rank <= {k}
"""


def sql_dsir_select_tokens() -> str:
    """Mirrors prep.dsir_select_tokens: greedy prefix of the raw pool
    in (round(sel_key, 10) desc, doc_id asc) order while the running
    token total (including the doc) stays within the budget. The
    oracle states the law as one running-sum window; the engine
    computes the identical prefix with the distributed scan."""
    budget = C.DSIR_TOKEN_BUDGET
    return f"""
WITH {_dsir_raw_cte()},{_dsir_keyed_cte()},
ordered AS (
  SELECT k.doc_id, k.log_w, k.sel_key,
         CAST(len(d.t) AS INT) AS n_tokens,
         sum(len(d.t)) OVER (
           ORDER BY round(k.sel_key, 10) DESC, k.doc_id ASC
           ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM keyed k JOIN d USING (doc_id))
SELECT doc_id, round(log_w, 6) AS log_weight,
       round(sel_key, 6) AS sel_key, n_tokens,
       CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM ordered WHERE cum_tokens <= {budget}
"""


def sql_dsir_divergence() -> str:
    """Mirrors prep.dsir_divergence: KL(target||raw) and KL(raw||
    target) over the add-one-smoothed hashed-feature distributions —
    per-active-bucket terms folded in ascending-bucket order plus the
    closed-form unseen-bucket contribution, every expression shape
    identical to the engine's (same division operands, same ln
    sequence, same left-associative products)."""
    b = C.DSIR_BUCKETS
    return f"""
WITH {_dsir_cnt_cte()},
tot AS MATERIALIZED (
  SELECT sum(ctt) AS tt, sum(crr) AS rt, count(*) AS nf FROM cnt),
terms AS (
  SELECT f,
    (CAST(ctt + 1 AS DOUBLE) / CAST((SELECT tt FROM tot) + {b} AS DOUBLE))
      * (ln(CAST(ctt + 1 AS DOUBLE))
         - ln(CAST((SELECT tt FROM tot) + {b} AS DOUBLE))
         - ln(CAST(crr + 1 AS DOUBLE))
         + ln(CAST((SELECT rt FROM tot) + {b} AS DOUBLE))) AS t_term,
    (CAST(crr + 1 AS DOUBLE) / CAST((SELECT rt FROM tot) + {b} AS DOUBLE))
      * (-(ln(CAST(ctt + 1 AS DOUBLE))
           - ln(CAST((SELECT tt FROM tot) + {b} AS DOUBLE))
           - ln(CAST(crr + 1 AS DOUBLE))
           + ln(CAST((SELECT rt FROM tot) + {b} AS DOUBLE)))) AS r_term
  FROM cnt),
folded AS (
  SELECT
    list_reduce(list_prepend(0.0, list(t_term ORDER BY f)),
                (a, x) -> a + x) AS fold_t,
    list_reduce(list_prepend(0.0, list(r_term ORDER BY f)),
                (a, x) -> a + x) AS fold_r
  FROM terms)
SELECT CAST((SELECT nf FROM tot) AS INT) AS active_buckets,
  round(fold_t
    + CAST({b} - (SELECT nf FROM tot) AS DOUBLE)
      * (1.0 / CAST((SELECT tt FROM tot) + {b} AS DOUBLE))
      * (-ln(CAST((SELECT tt FROM tot) + {b} AS DOUBLE))
         + ln(CAST((SELECT rt FROM tot) + {b} AS DOUBLE))), 6)
    AS kl_target_raw,
  round(fold_r
    + CAST({b} - (SELECT nf FROM tot) AS DOUBLE)
      * (1.0 / CAST((SELECT rt FROM tot) + {b} AS DOUBLE))
      * (ln(CAST((SELECT tt FROM tot) + {b} AS DOUBLE))
         - ln(CAST((SELECT rt FROM tot) + {b} AS DOUBLE))), 6)
    AS kl_raw_target
FROM folded
"""


def registry() -> dict[str, str]:
    """name -> DuckDB SQL, for every oracle-checkable query."""
    return {
        "bm25_topk": sql_bm25_topk(),
        "bm25_topk_store": sql_bm25_topk(C.BM25_STORE_QUERY),
        "bm25_topk_batch": sql_bm25_topk_batch(),
        "bm25_topk_batch_store": sql_bm25_topk_batch(),
        "hybrid_rrf_topk": sql_hybrid_rrf_topk(),
        "hybrid_rrf_topk_batch": sql_hybrid_rrf_topk_batch(),
        "containment_pairs": sql_containment_pairs(),
        "containment_pairs_exact": sql_containment_pairs_exact(),
        "source_overlap_winnow": sql_source_overlap_winnow(),
        "source_overlap_containment": sql_source_overlap_containment(),
        "winnow_fingerprints": sql_winnow_fingerprints(),
        "winnow_pairs": sql_winnow_pairs(),
        "remove_duplicate_spans": sql_remove_duplicate_spans(),
        "nb_classify": sql_nb_classify(),
        "dsir_weights": sql_dsir_weights(),
        "dsir_select": sql_dsir_select(),
        "dsir_select_tokens": sql_dsir_select_tokens(),
        "dsir_divergence": sql_dsir_divergence(),
        "epoch_shuffle": sql_epoch_shuffle(),
        "source_quota": sql_source_quota(),
        "url_dedup": sql_url_dedup(),
        "paragraph_dedup": sql_paragraph_dedup(),
        "source_temperature_mix": sql_source_temperature_mix(),
        "filtered_cosine_topk": sql_filtered_cosine_topk(),
        "stratified_split": sql_stratified_split(),
        "knn_label_vote": sql_knn_label_vote(),
        "dedup_group_sizes": sql_dedup_group_sizes(),
        "source_overlap": sql_source_overlap(),
        "lang_confusion": sql_lang_confusion(),
        "ann_lsh_topk": sql_ann_lsh_topk(),
        "ann_multiprobe_topk": sql_ann_multiprobe_topk(),
        "ann_target_recall_topk": sql_ann_target_recall_topk(),
        "ngram_jaccard_pairs": sql_ngram_jaccard_pairs(),
        "shingle_stats": sql_shingle_stats(),
        "content_hashes": sql_content_hashes(),
        "minhash_signatures": sql_minhash_signatures(),
        "lsh_bands": sql_lsh_bands(),
        "lsh_bucket_cap": sql_lsh_bucket_cap(),
        "lsh_candidate_cap": sql_lsh_candidate_cap(),
        "lsh_topk": sql_lsh_topk(),
        "lsh_topk_batch": sql_lsh_topk_batch(),
        "corpus_dedup_pipeline": sql_corpus_dedup_pipeline(),
        "embedding_dup_pairs_multiprobe": sql_embedding_dup_pairs_multiprobe(),
        "lsh_topk_batch_shuffle": sql_lsh_topk_batch(),
        "est_jaccard_topk_batch_fold": sql_est_jaccard_topk_batch(),
        "char_shingle_stats": sql_char_shingle_stats(),
        "bucket_stats": sql_bucket_stats(),
        "lsh_pairs": sql_lsh_pairs(),
        "decontaminate": sql_decontaminate(),
        "dataset_split": sql_dataset_split(),
        "pack_chunks": sql_pack_chunks(),
        "full_prep_pipeline": sql_full_prep_pipeline(),
        "est_jaccard_topk_batch": sql_est_jaccard_topk_batch(),
        "true_jaccard_topk": sql_true_jaccard_topk(),
        "l2_topk": sql_l2_topk(),
        "cosine_topk": sql_cosine_topk(),
        "knn_batch_l2": sql_knn_batch_l2(),
        "qed_histogram": sql_qed_histogram(),
        "qed_prune": sql_qed_prune(),
        "qed_topk": sql_qed_topk(),
        "exact_dedup": sql_exact_dedup(),
        "dedup_groups": sql_dedup_groups(),
        "mllib_pairs_verified": sql_mllib_pairs_verified(),
        "simhash": sql_simhash(),
        "simhash_dup_pairs": sql_simhash_dup_pairs(),
        "embedding_dup_pairs": sql_embedding_dup_pairs(),
        "semantic_dup_pairs": sql_semantic_dup_pairs(),
        "cell_stats": sql_cell_stats(),
        "semantic_dedup": sql_semantic_dedup(),
        "semantic_outliers": sql_semantic_outliers(),
        "semantic_curation": sql_semantic_curation(),
        "text_stats": sql_text_stats(),
        "repetition_stats": sql_repetition_stats(),
        "shared_ngram_spans": sql_shared_ngram_spans(),
        "mixture_sample": sql_mixture_sample(),
        "mixture_weighted": sql_mixture_weighted(),
        "mixture_temperature": sql_mixture_temperature(),
        "token_entropy": sql_token_entropy(),
        "lm_quality": sql_lm_quality(),
        "lm_quality_bands": sql_lm_quality_bands(),
        "bpe_pair_counts": sql_bpe_pair_counts(),
        "collocations_pmi": sql_collocations_pmi(),
        "ngram_novelty": sql_ngram_novelty(),
        "mrl_rerank_topk": sql_mrl_rerank_topk(),
        "quality_report": sql_quality_report(),
        "chunk_documents": sql_chunk_documents(),
        "snapshot_diff": sql_snapshot_diff(),
        "mine_triplets": sql_mine_triplets(),
        "ngram_decontaminate": sql_ngram_decontaminate(),
        "pii_scrub": sql_pii_scrub(),
        "boilerplate_removal": sql_boilerplate_removal(),
        "pq_codes": sql_pq_codes(),
        "pq_topk": sql_pq_topk(),
        "pq_topk_rerank": sql_pq_topk_rerank(),
        "opq_codes": sql_opq_codes(),
        "opq_topk": sql_opq_topk(),
        "opq_topk_rerank": sql_opq_topk_rerank(),
        # the store twin is answer-identical to opq_topk by
        # construction (same artifact, prebuilt codes), so it shares
        # the oracle — the bm25_topk_store pattern
        "opq_topk_store": sql_opq_topk(),
        "ivfopq_codes": sql_ivfopq_codes(),
        "ivfopq_topk": sql_ivfopq_topk(),
        # the store twin is answer-identical to ivfopq_topk by
        # construction (rotation + coarse quantizer + codebooks all
        # pinned in the sidecar), so it shares the oracle
        "ivfopq_topk_store": sql_ivfopq_topk(),
        "ivfopq_topk_rerank": sql_ivfopq_topk_rerank(),
        "ivfopq_topk_batch": sql_ivfopq_topk_batch(),
        "cms_heavy_hitters": sql_cms_heavy_hitters(),
        "gopher_rules": sql_gopher_rules(),
        "events_asof": sql_events_asof(),
        "hll_cardinality": sql_hll_cardinality(),
        "ivfpq_codes": sql_ivfpq_codes(),
        "ivfpq_topk": sql_ivfpq_topk(),
        "ivfpq_topk_rerank": sql_ivfpq_topk_rerank(),
        "ivfpq_topk_batch": sql_ivfpq_topk_batch(),
        "ivfpq_topk_batch_rerank": sql_ivfpq_topk_batch_rerank(),
        "curated_ivfpq_index": sql_curated_ivfpq_index(),
        "ivfpq_topk_alpha": sql_ivfpq_topk_alpha(),
        "sq_codes": sql_sq_codes(),
        "sq_topk": sql_sq_topk(),
        "sq_topk_rerank": sql_sq_topk_rerank(),
        "incremental_dedup": sql_incremental_dedup(),
        "lang_id": sql_lang_id(),
        "token_frequencies": sql_token_frequencies(),
        "corpus_report": sql_corpus_report(),
        "doc_fingerprints": sql_doc_fingerprints(),
        "ann_buckets": sql_ann_buckets(),
        "ivf_topk": sql_ivf_topk(),
        "ivf_topk_alpha": sql_ivf_topk_alpha(),
        "ivf_topk_batch": sql_ivf_topk_batch(),
        "quality_metrics": sql_quality_metrics(),
        "lsh_topk_preview": sql_lsh_topk_preview(),
        "padded_topk": sql_padded_topk(),
        "sig_stats": sql_sig_stats(),
        "tpch_q3": sql_tpch_q3(),
        "events_window_scan": sql_events_window_scan(),
        "events_hourly": sql_events_hourly(),
        "corpus_clean": sql_corpus_clean(),
        "tpch_q5": sql_tpch_q5(),
        "events_sessions": sql_events_sessions(),
        "events_sliding": sql_events_sliding(),
        "lineitem_pricing": sql_lineitem_pricing(),
        "top_customers_per_nation": sql_top_customers_per_nation(),
        "orders_by_region": sql_orders_by_region(),
        "media_features": sql_media_features(),
        "media_embedding_topk": sql_media_embedding_topk(),
        "media_frames": sql_media_frames(),
    }


def sql_collocations_pmi() -> str:
    """Mirrors prep.collocations_pmi: adjacent-bigram PMI with the
    SAME fixed left-to-right ln-of-exact-integer sum (each count is
    exact in binary64, so both engines add identical doubles in
    identical order), min pair count 5, top 200 by (round-10 pmi desc,
    left, right)."""
    return """
WITH toks AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents),
uni AS (
  SELECT w, CAST(count(*) AS BIGINT) AS wc
  FROM (SELECT unnest(t) AS w FROM toks) GROUP BY 1),
pairs AS (
  SELECT p.l AS "left", p.r AS "right" FROM (
    SELECT unnest(list_transform(range(1, len(t)), i ->
             struct_pack(l := t[i], r := t[i + 1]))) AS p
    FROM toks)),
big AS (
  SELECT "left", "right", CAST(count(*) AS BIGINT) AS pair_count
  FROM pairs GROUP BY 1, 2),
tot AS (
  SELECT (SELECT CAST(sum(wc) AS BIGINT) FROM uni) AS n_tok,
         (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_big),
scored AS (
  SELECT b."left", b."right", b.pair_count,
         ln(CAST(b.pair_count AS DOUBLE)) + ln(CAST(t.n_tok AS DOUBLE))
         + ln(CAST(t.n_tok AS DOUBLE)) - ln(CAST(t.n_big AS DOUBLE))
         - ln(CAST(ul.wc AS DOUBLE)) - ln(CAST(ur.wc AS DOUBLE)) AS pmi_raw
  FROM big b
  JOIN uni ul ON ul.w = b."left"
  JOIN uni ur ON ur.w = b."right"
  CROSS JOIN tot t
  WHERE b.pair_count >= 5)
SELECT "left", "right", pair_count, round(pmi_raw, 6) AS pmi,
       CAST(row_number() OVER (
         ORDER BY round(pmi_raw, 10) DESC, "left" ASC, "right" ASC
       ) AS INT) AS rank
FROM scored
ORDER BY round(pmi_raw, 10) DESC, "left" ASC, "right" ASC
LIMIT 200
"""


def sql_ngram_novelty() -> str:
    """Mirrors dedup.ngram_novelty: distinct per-doc 8-grams on the
    SAME portable hash, corpus-first occurrence by min doc_id, per-doc
    novel fraction as a double division of two exact ints (round-6)."""
    n = C.SPAN_NGRAM
    return f"""
WITH toks AS ({TOKS}),
g AS (SELECT doc_id, unnest(list_distinct({_ngram_list(n)})) AS gram FROM toks),
gh AS (SELECT doc_id, {H('gram')} AS gram_hash FROM g),
fst AS (SELECT gram_hash, min(doc_id) AS first_doc FROM gh GROUP BY 1)
SELECT gh.doc_id,
       CAST(count(*) AS INT) AS n_grams,
       CAST(sum(CASE WHEN fst.first_doc = gh.doc_id THEN 1 ELSE 0 END) AS INT)
         AS novel_grams,
       round(CAST(sum(CASE WHEN fst.first_doc = gh.doc_id THEN 1 ELSE 0 END)
                  AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS novel_frac
FROM gh JOIN fst USING (gram_hash)
GROUP BY 1
"""


def sql_mrl_rerank_topk() -> str:
    """Mirrors bruteforce.mrl_rerank_topk: truncated-prefix cosine
    shortlist (the _dot/_norm folds over the first MRL_DIM positions —
    same sequential IEEE order as the engine's sliced aggregate),
    full-dim exact rerank over the shortlist, both scores round-6."""
    d, sl, k = C.MRL_DIM, C.MRL_SHORTLIST, C.K_VEC
    t_expr = (
        f"{_dot('e.embedding', 'q.qv', d)} / "
        f"({_norm('e.embedding', d)} * {_norm('q.qv', d)})"
    )
    f_expr = (
        f"{_dot('embedding', 'qv', C.EMB_DIM)} / "
        f"({_norm('embedding', C.EMB_DIM)} * {_norm('qv', C.EMB_DIM)})"
    )
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id < {C.BATCH_DOCS}),
s1 AS (
  SELECT q.query_id, e.vec_id, e.embedding, q.qv,
         round({t_expr}, 6) AS trunc_sim
  FROM embeddings e, q),
short AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY trunc_sim DESC, vec_id) AS r
    FROM s1) WHERE r <= {sl}),
re AS (
  SELECT query_id, vec_id, trunc_sim, round({f_expr}, 6) AS cos_sim
  FROM short)
SELECT query_id, vec_id, trunc_sim, cos_sim, rank FROM (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS INT) AS rank
  FROM re) WHERE rank <= {k}
"""
