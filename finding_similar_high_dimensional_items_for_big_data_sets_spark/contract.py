"""Shared constants for the driver contract: the fixed query fixtures
used by both the Spark queries() implementations and the DuckDB
oracle_sql() renderings. Single source of truth so both sides always
agree (FIXTURES.md §5: point query = one doc, batch = first N docs).
"""

from __future__ import annotations

from finding_similar_high_dimensional_items_for_big_data_sets_spark.config import (
    MinHashParams,
)

# Portable hash family so every pipeline stage is DuckDB-checkable.
PARAMS = MinHashParams()

# Point query on documents (reference analog: dataset row 1025,
# benchmarks/benchmark_runner.py:218) and k (default 10,
# app/src/query_service.py:46).
QUERY_DOC = 13
K_DOC = 10

# Batch query fixture (reference MERTRIC_TEST mode uses first rows).
BATCH_DOCS = 10
K_BATCH = 5

# Embedding-space point query + k.
QUERY_VEC = 7
K_VEC = 10

# QED configuration for the oracle suite (small n_bins keeps the SQL
# compact; the operator itself defaults to 256 like the reference).
QED_BINS = 16
QED_P_FRACTION = 0.1

# LSH self-join duplicate threshold for the pairs query.
PAIR_THRESHOLD = 0.5

# exact_dedup oracle fixture: every 20th doc gets a planted duplicate
# (case/whitespace mutation) with doc_id shifted by this offset, so the
# correctness compare is non-vacuous on fixtures without natural dupes.
DEDUP_PLANT_OFFSET = 10_000_000
DEDUP_PLANT_EVERY = 20

# Random-hyperplane ANN config.
ANN_PLANES = 8
ANN_SEED = 42
ANN_PROBE = 3
EMB_DIM = 64

# IVF coarse-quantizer config (seeded random centroids, SURVEY §2.3 J4
# analog: the scale path the reference approximates with FAISS).
IVF_CELLS = 16
IVF_PROBE = 4
IVF_SEED = 43
# Calibratable per-query probe rule: scan every cell whose center is
# within (1 + alpha) of the nearest center's distance (the declarative
# recall knob; see ann.ivf_alpha_for_recall).
IVF_PROBE_ALPHA = 0.1

# Multiprobe embedding-dedup blocking: emit bit flips for planes with
# |dot| < margin * ||v||; same threshold as the single-bucket query so
# the two are directly comparable (multiprobe rows are a superset).
ANN_PROBE_MARGIN = 0.2

# Recall-targeted ANN probing: probe count auto-chosen per query from
# its plane margins so a neighbor at ANN_TARGET_COS is found with
# estimated probability >= ANN_TARGET_RECALL.
ANN_TARGET_RECALL = 0.8
ANN_TARGET_COS = 0.9

# Training-data prep: sequence-packing token budget and the hash-split
# validation share (per-mille) + salt.
PACK_BUDGET = 512
SPLIT_VAL_PERMILLE = 100
SPLIT_SEED = 42

# Repetition-based quality filter (Gopher-style): a doc is kept iff
# 16 * top_bigram_count <= n_tokens (top-bigram token coverage <= 1/8)
# AND 2 * dup_trigram_occurrences <= n_trigrams (duplicate-trigram
# fraction <= 1/2). Integer cross-multiplied form so the keep boundary
# is exact in both engines.
REP_TOP_BIGRAM_X = 16
REP_DUP_TRIGRAM_X = 2

# Substring-level contamination: word n-gram length, the document-
# frequency cap past which a gram is boilerplate, and the minimum
# shared-span count for a reported pair.
SPAN_NGRAM = 8
SPAN_MAX_DOC_FREQ = 16
SPAN_MIN_SHARED = 1

# Exact-substring REMOVAL (the cut half of Lee et al.): a token is cut
# when covered by an n-gram appearing in >= this many distinct docs.
SPAN_REMOVE_MIN_DF = 2

# Naive Bayes classifier eval: docs with id % NB_TEST_MOD == 0 are the
# held-out test split, the rest train the model.
NB_TEST_MOD = 5

# DSIR importance resampling (Xie et al., NeurIPS 2023): docs with
# id % DSIR_TARGET_MOD == 0 stand in for the target-domain sample, the
# rest form the raw pool; hashed unigram+bigram features land in
# DSIR_BUCKETS buckets; DSIR_SELECT_N raw docs are kept by
# deterministic Gumbel-top-k over the importance weights.
DSIR_TARGET_MOD = 10
DSIR_BUCKETS = 1024
DSIR_SELECT_N = 50
DSIR_TOKEN_BUDGET = 2000

# Deterministic epoch shuffle: the contract query's epoch number.
SHUFFLE_EPOCH = 1

# Winnowing fingerprints (MOSS): char k-gram length, window size (any
# shared substring >= WINNOW_K + WINNOW_W - 1 chars is guaranteed a
# common fingerprint), plus the shared_ngram_spans-style df cap and
# the minimum shared-fingerprint count for a reported pair.
WINNOW_K = 16
WINNOW_W = 8
WINNOW_MAX_DOC_FREQ = 16
WINNOW_MIN_SHARED = 2

# BM25 lexical retrieval fixture: the keyword query (tokens present at
# every SF), result size, and the standard Robertson parameters.
BM25_QUERY = "column window scan merge"
BM25_K = 10
BM25_K1 = 1.2
BM25_B = 0.75

# Reciprocal Rank Fusion constant (Cormack et al.'s canonical 60).
RRF_C = 60

# Persisted postings-store fixture: a different keyword query (tokens
# present at every SF) so the store path exercises its own buckets,
# plus the store's partition layout (doc shards x token buckets).
BM25_STORE_QUERY = "filter hash join sort"
LEX_STORE_DOC_SHARDS = 4
LEX_STORE_TOKEN_BUCKETS = 16

# Batch BM25 fixture: query_id -> keyword query (vocab present at
# every SF; one query shares no terms with the others).
BM25_BATCH_QUERIES = (
    (0, "column window scan merge"),
    (1, "join hash row batch"),
    (2, "customer order part value"),
    (3, "sort filter"),
)

# Exact directional containment: gram size, boilerplate df cap,
# report threshold, and the planted extreme-containment fixture — a
# huge doc (the concatenation of the component docs, doc_id order) and
# a tiny doc (a 10-token interior slice of the first component). The
# tiny-in-huge pair has Jaccard ~0.01: provably below MinHash banding
# recall (containment_pairs misses it at both gate SFs — tested), while
# the inverted-index mode finds it deterministically.
CONT_EXACT_N = 3
CONT_EXACT_MAX_DF = 64
CONT_EXACT_THRESHOLD = 0.9
CONT_PLANT_COMPONENTS = (11, 12, 13, 14, 15, 16, 17, 18)
CONT_PLANT_TINY_SRC = 11
CONT_PLANT_SLICE_START = 21  # 1-based token offset
CONT_PLANT_SLICE_LEN = 10
CONT_PLANT_TINY_ID = 30_000_000
CONT_PLANT_HUGE_ID = 30_000_001

# Balanced mixture sampling: hash-bucket scale and salt.
MIX_SCALE = 1_000_000
MIX_SEED = 7

# Incremental ingest dedup: batch membership modulus, and the plant
# pattern that copies every INC_PLANT_MOD-th HISTORY doc into the
# batch (id-offset, text normalized-equal) so the history anti-join
# provably removes rows.
INC_BATCH_MOD = 10
INC_PLANT_MOD = 7
INC_PLANT_OFFSET = 20_000_000
INC_BLOOM_FP = 0.01

# Sliding-window chunking: token window and stride (overlap = 16).
CHUNK_WINDOW = 64
CHUNK_STRIDE = 48

# Product quantization: subspaces, codes per subspace, codebook seed.
PQ_M = 8
PQ_CODES = 16
PQ_SEED = 44
PQ_SHORTLIST = 50

# Optimized PQ (Ge et al.): rotation + codebooks trained OFFLINE on the
# fixed sf0.001 embedding sample (production pattern: a codec is a
# shipped artifact applied corpus-wide), so the engine and the DuckDB
# oracle inline the identical literals at any SF.
OPQ_SEED = 45
OPQ_ITERS = 8
OPQ_KMEANS_ITERS = 12
OPQ_TRAIN_PATH = "/root/testdata/sf0.001/embeddings.parquet"

# Gopher-style quality rules (Rae et al. 2021 §A1.1), fixture-tuned
# word-count bounds; every comparison is integer cross-multiplied so
# the keep boundary is exact in both engines. Plant pattern: every
# GR_*_EVERY-th doc gets a violation of one rule family (the synthetic
# text violates none of the symbol/bullet/ellipsis/alpha rules
# naturally).
GR_MIN_WORDS = 30
GR_MAX_WORDS = 90
GR_MEAN_LEN_LO = 3  # mean word length in [LO, HI]
GR_MEAN_LEN_HI = 10
GR_SYMBOL_X = 10  # keep iff GR_SYMBOL_X * symbol_words <= n_words
GR_BULLET_NUM, GR_BULLET_DEN = 9, 10  # fail iff bullet_lines/lines >= 0.9
GR_ELLIPSIS_NUM, GR_ELLIPSIS_DEN = 3, 10  # fail iff ell_lines/lines >= 0.3
GR_ALPHA_NUM, GR_ALPHA_DEN = 4, 5  # keep iff alpha_words/n_words >= 0.8
GR_MIN_STOPWORDS = 2
# Gopher's list is (the, be, to, of, and, that, have, with); the
# synthetic fixture vocabulary contains only "the" of those, which
# would fail EVERY doc — fixture-tuned list (function-word analogs in
# the synthetic vocab) so the rule splits the corpus non-trivially.
GOPHER_STOPWORDS = ("the", "a", "value", "key", "row", "data", "big", "with")
GR_SYMBOL_EVERY = 6
GR_BULLET_EVERY = 9
GR_ELLIPSIS_EVERY = 11
GR_NONALPHA_EVERY = 7
GR_SYMBOL_PLANT = " ".join(["#"] * 15)
GR_NONALPHA_PLANT = " ".join(["12345"] * 30)
GR_ELLIPSIS_PLANT = "trailing..."

# HyperLogLog register bits: m = 2^HLL_P registers (error ~1.04/sqrt(m)).
HLL_P = 6

# As-of join fixture: clicks matched to the latest prior view per
# user, within this tolerance (microseconds; 30 minutes).
ASOF_TOLERANCE_US = 1_800_000_000

# Count-Min sketch: rows x width, and the heavy-hitter report cutoff.
# Width 256 against the fixture's ~900-key bigram space forces real
# collisions, so the overestimate guarantee is exercised non-vacuously.
CMS_D = 4
CMS_W = 256
CMS_MIN_COUNT = 40

# Scalar quantization (SQ8): per-dim levels (codes in [0, SQ_LEVELS])
# and the ADC-shortlist size for the exact-rerank serving tier.
SQ_LEVELS = 255
SQ_SHORTLIST = 50

# Snapshot diff plant pattern: the "new" snapshot drops every DIFF_DROP-th
# doc, rewrites every DIFF_EDIT-th, and adds DIFF_ADD_OFFSET-shifted rows.
DIFF_DROP = 13
DIFF_EDIT = 9
DIFF_ADD_OFFSET = 30_000_000
DIFF_ADD_EVERY = 25

# Triplet mining: negatives per positive pair and sampling salt.
TRIPLET_NEGATIVES = 2
TRIPLET_SEED = 11

# Weighted mixture: per-mille target token-mass ratios by language.
MIX_WEIGHTS = {"en": 400, "de": 150, "es": 150, "fr": 150, "zh": 150}

# N-gram benchmark decontamination: gram length and the plant pattern
# embedding every 3rd benchmark doc inside a longer "train" page.
NGRAM_DECON_N = 8
NGRAM_DECON_PLANT_EVERY = 3
NGRAM_DECON_OFFSET = 40_000_000

# SemDeDup: cosine threshold for the cluster-blocked semantic dedup
# queries (cells/seed reuse the IVF constants above).
SEM_THRESHOLD = 0.3

# Prototypicality filter: fraction of most-prototypical vectors
# dropped per cluster cell.
PROTO_DROP_FRAC = 0.25

# PII scrub plant pattern: every PII_EMAIL_EVERY-th doc gets an email,
# every PII_PHONE_EVERY-th a phone number, every PII_IP_EVERY-th an IP.
PII_EMAIL_EVERY = 5
PII_PHONE_EVERY = 7
PII_IP_EVERY = 11

# Boilerplate line removal: planted header/footer lines (high doc
# frequency -> removed) and a rare line family (df under the threshold
# -> kept), with the removal threshold.
BP_HEADER = "SUBSCRIBE TO OUR NEWSLETTER"
BP_FOOTER = "copyright 2026 example corp all rights reserved"
BP_HEADER_EVERY = 3
BP_FOOTER_EVERY = 4
BP_RARE_EVERY = 25
BP_RARE_MOD = 5
BP_MIN_DF = 30

# Per-source quota sampling fixture: each synthetic source holds 25
# docs at every SF, so a quota of 10 binds in every group.
SOURCE_QUOTA = 10

# Stratified split fixture: per-language exact-proportion val split.
# The fixture languages are UNEVEN (en holds ~44% of docs, fr ~13%),
# which is exactly the case a global hash split mishandles.
STRAT_VAL_FRAC = 0.2

# URL-dedup fixture: the corpus carries no URL column, so the query
# synthesizes one deterministic URL per doc — page number doc_id %
# URL_PAGE_MOD under its source's domain, with scheme/www/trailing-
# slash variants and tracking params keyed off the doc_id — giving
# every (source, page) group ~n_docs/(n_sources*URL_PAGE_MOD) raw-
# distinct URLs that normalize to ONE canonical page.
URL_PAGE_MOD = 10
# Ids divisible by URL_NULL_MOD get a NULL url instead (lost headers /
# non-HTTP ingests) — they must survive url_dedup keep=true, norm_url
# null (round-11; exercises the null branch an equi-join would drop).
URL_NULL_MOD = 17

# Paragraph-dedup fixture (round-11): the corpus has no multi-paragraph
# docs, so the query synthesizes pages — page doc_id % PARA_PAGES is
# the blank-line-joined concat of its docs' texts in doc_id order —
# then near-dedups at paragraph granularity. Near-dup DOCS land on
# different pages (i vs j with i % PARA_PAGES != j % PARA_PAGES), so
# cross-page paragraph drops exercise the real Dolma/RefinedWeb case.
PARA_PAGES = 50
PARA_THRESHOLD = 0.8
PARA_STRIDE = 1_000_000

# Temperature-based source mixing (round-11): sampling weight
# n_i^MIX_ALPHA — the GPT-3/Pile multinomial flattening exponent.
MIX_ALPHA = 0.7

# Attribute-filtered vector search (round-11): nearest neighbors among
# embeddings whose paired document is in FILTER_LANG — 'fr' is the
# smallest fixture language (~13% of docs), so the filter is genuinely
# selective and a post-filtered shortlist would visibly under-fill k.
FILTER_LANG = "fr"

# kNN label-vote classification fixture: first BATCH_DOCS embeddings
# as queries, K_BATCH neighbors vote (self excluded).
KNN_VOTE_K = 5

# Cross-source near-dup overlap uses the lsh_pairs threshold
# (PAIR_THRESHOLD) — no extra knob.

# Matryoshka-style dimension-adaptive retrieval: stage 1 ranks on the
# first MRL_DIM dims only, stage 2 reranks an MRL_SHORTLIST-deep
# per-query shortlist with full-dim exact cosine.
MRL_DIM = 16
MRL_SHORTLIST = 50
