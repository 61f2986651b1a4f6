"""Training-data prep primitives beyond cleaning/dedup: deterministic
dataset splitting and sequence packing.

Both are the last mile of a pretraining pipeline (after
``corpus_clean`` / dedup / decontamination): split the corpus into
train/validation by a stable content-independent hash, then pack
documents into fixed-token-budget chunks for the tokenizer. Neither
exists in the reference (it has no training-data story); both are
pure DataFrame operators designed for 100 TB inputs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.materialize import (
    materialize,
)
from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.hashing import (
    portable_hash64,
)


def hash_split(
    docs: DataFrame,
    val_permille: int = 100,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/validation split by a salted hash of the
    STABLE id: ``bucket = hash(id:seed) mod 1000``; rows with
    ``bucket < val_permille`` are validation. Content-independent (a
    re-crawled doc keeps its split), reproducible across runs and
    engines (the portable md5 family is DuckDB-expressible), and
    shuffle-free — one projection, no sampling state.

    Output: original columns + (split_bucket INT, split STRING).
    """
    if not 0 <= val_permille <= 1000:
        raise ValueError(f"val_permille must be in [0, 1000], got {val_permille}")
    bucket = F.pmod(
        portable_hash64(
            F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))
        ),
        F.lit(1000),
    ).cast("int")
    return docs.withColumn("split_bucket", bucket).withColumn(
        "split",
        F.when(F.col("split_bucket") < val_permille, F.lit("val")).otherwise(
            F.lit("train")
        ),
    )


def pack_chunks(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    count_col: str = "n_tokens",
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic sequence packing: documents in stable ``id_col``
    order are concatenated and cut every ``budget`` tokens; a doc's
    ``chunk_id`` is the chunk containing its FIRST token
    (``floor(running_total_before / budget)``) and ``chunk_offset`` its
    position inside that chunk — the "concatenate then slice" layout
    GPT-style pretraining uses, as a table instead of a token stream.

    The running total is a GLOBAL prefix sum, which a window over
    ``orderBy(id)`` would compute on ONE partition (the classic global
    window bottleneck). Here it is the textbook two-phase distributed
    scan instead: range-partition by id (so partition p holds a
    contiguous id range), aggregate per-partition totals (one tiny
    job, <= #partitions rows to the driver), broadcast the exclusive
    prefix offsets, then cumulative-sum WITHIN each sorted partition
    plus its offset — every stage parallel, no row ever leaves its
    range partition.

    Output: (id_col, count_col, chunk_id LONG, chunk_offset LONG).
    """
    import pandas as pd

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    spark = docs.sparkSession
    n_parts = partitions or spark.sparkContext.defaultParallelism
    # localCheckpoint MATERIALIZES the range partitioning once: the
    # totals job and the scan job must see IDENTICAL partition
    # assignment, and re-executing repartitionByRange re-samples range
    # bounds over whatever row order the upstream shuffle produced that
    # time — a doc landing in a different partition between the two
    # jobs would get the wrong broadcast offset. The checkpoint holds
    # only (id, count) pairs, not documents.
    ranged = (
        docs.select(id_col, count_col)
        .repartitionByRange(n_parts, F.col(id_col))
        .transform(materialize, eager=True)
    )
    totals = {
        r["pid"]: r["tot"]
        for r in ranged.groupBy(
            F.spark_partition_id().alias("pid")
        )
        .agg(F.sum(count_col).alias("tot"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in range(n_parts):
        offsets[pid] = acc
        acc += int(totals.get(pid, 0) or 0)
    bc = spark.sparkContext.broadcast(offsets)

    def scan(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        running = int(bc.value.get(pid, 0))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            counts = pdf[count_col].astype("int64")
            ends = running + counts.cumsum()
            before = ends - counts
            running = int(ends.iloc[-1])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    count_col: counts,
                    "chunk_id": before // budget,
                    "chunk_offset": before % budget,
                }
            )

    return ranged.sortWithinPartitions(id_col).mapInPandas(
        scan,
        schema=f"{id_col} long, {count_col} long, chunk_id long, chunk_offset long",
    )


def _mixture_counts(docs, group_col, count_col, id_col):
    """Shared (id, group, n_tokens) projection for the mixture
    samplers."""
    if count_col is None:
        from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.textstats import (
            token_count,
        )

        return docs.select(
            id_col, group_col, token_count(F.col("text")).alias("n_tokens")
        )
    return docs.select(id_col, group_col, F.col(count_col).alias("n_tokens"))


def _mixture_totals(counted, group_col):
    """Per-group token totals, with null-keyed and zero-mass groups
    excluded: a null key would crash create_map and a zero total has
    no tokens to contribute — both groups' rows drop via the
    coalesce(0) threshold, matching the oracles' inner joins."""
    totals = {
        r["g"]: r["t"]
        for r in counted.groupBy(F.col(group_col).alias("g"))
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    }
    return {g: t for g, t in totals.items() if g is not None and t and t > 0}


def _threshold_sample(counted, thresholds, scale, seed, group_col, id_col):
    """Apply per-group keep thresholds as one shuffle-free literal-map
    filter over the salted id-hash buckets."""
    if not thresholds:
        return counted.withColumn("sample_bucket", F.lit(0)).limit(0)
    thr = F.coalesce(
        F.create_map(
            *[F.lit(x) for gt in thresholds.items() for x in gt]
        )[F.col(group_col)],
        F.lit(0),
    )
    bucket = F.pmod(
        portable_hash64(
            F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))
        ),
        F.lit(scale),
    ).cast("int")
    return (
        counted.withColumn("sample_bucket", bucket)
        .filter(F.col("sample_bucket") < thr)
    )


def balanced_mixture_sample(
    docs: DataFrame,
    group_col: str = "source",
    count_col: str | None = None,
    seed: int = 7,
    scale: int = 1_000_000,
    id_col: str = "doc_id",
) -> DataFrame:
    """Data-mixing downsampler: deterministically subsample every group
    (source/domain/language) toward the SMALLEST group's token mass, so
    no single source dominates the training mixture — the all-equal-
    weights special case of :func:`weighted_mixture_sample` (tested
    identical), kept as the convenience entry point.

    Per group g with token total T_g, the acceptance threshold is
    ``floor(scale * min_g(T_g) / T_g)`` and a row is kept iff
    ``portable_hash(id:seed) mod scale < threshold(g)``. Content-
    independent and reproducible: re-runs and re-crawls keep the same
    rows, and the expected post-sample token mass is equal across
    groups (exact balance is impossible row-wise; the hash gives an
    unbiased binomial draw).

    Two passes, both scale-safe: a map-side-combined groupBy over the
    group column (output rows == number of groups — collected to the
    driver, where exact Python big-int arithmetic computes thresholds
    a 64-bit engine could overflow on), then a shuffle-free filter
    with the thresholds folded in as a literal CASE. At 100 TB this
    is one cheap agg plus one scan.

    Output: kept rows as (doc_id, <group_col>, n_tokens, sample_bucket).
    """
    counted = _mixture_counts(docs, group_col, count_col, id_col)
    totals = _mixture_totals(counted, group_col)
    thresholds = {}
    if totals:
        floor_mass = min(totals.values())
        thresholds = {g: (scale * floor_mass) // t for g, t in totals.items()}
    return _threshold_sample(counted, thresholds, scale, seed, group_col, id_col)



def unigram_lm_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab: DataFrame | None = None,
) -> DataFrame:
    """LM-based quality scoring with a corpus-trained unigram model
    (the CCNet-style filter, one model order down): score every
    document by its average negative log-likelihood under the corpus's
    own token distribution. Low NLL = the doc looks like the corpus
    (common tokens); high NLL = rare-token-heavy (OCR noise, code in a
    prose corpus, other-language leakage). Downstream filters keep a
    band of the distribution, like CCNet's head/middle/tail split.

    nll = ln(T) - (1/n) * sum_t c_t * ln(C_t)  (nats/token), with per-
    doc counts c_t, corpus counts C_t, corpus total T. Empty docs get
    nll = 0.0 and are retained (explode_outer keeps their row through
    the pipeline).

    Scan economy at 100 TB: the per-doc pass carries n_tokens on the
    exploded rows (one corpus scan covers both), the vocabulary is one
    map-side-combined token aggregation (second scan), and the corpus
    total T is one driver-side scalar job — NOT a duplicated frequency
    subtree riding a cross join, which Spark would re-scan (exchange
    reuse does not fire across a broadcast/shuffle consumer split;
    measured 4 scans vs this plan's 3). In production pass ``vocab``
    (the persisted ``token_frequencies``-style artifact with columns
    token/cf, the same prebuilt-artifact pattern as the sigs/bands
    index): the scoring pass then reads the corpus exactly ONCE and T
    comes from a vocab-sized aggregation.

    Float parity: the per-doc fold runs over the struct list sorted by
    token (unique per doc), every ln() argument is an exact integer
    count, and the result is rounded to 6 — identical at any
    partitioning and across engines up to libm ulps the rounding
    absorbs.

    Tokens absent from a caller-provided ``vocab`` count as frequency
    1 (ln 1 = 0): an unseen token contributes its maximum surprisal
    under the convention that T stays the vocab total.

    Output: (doc_id, n_tokens INT, lm_nll DOUBLE rounded to 6).
    """
    import math

    from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.text import tokenize

    toks = tokenize(F.col(text_col))
    tok_counts = F.transform(
        F.array_sort(F.array_distinct(toks)),
        lambda g: F.struct(
            g.alias("token"),
            F.size(F.filter(toks, lambda x: x == g)).alias("c"),
        ),
    )
    per_doc = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        F.explode_outer(tok_counts).alias("tc"),
    ).select(
        "doc_id",
        "n_tokens",
        F.col("tc.token").alias("token"),
        F.col("tc.c").alias("c"),
    )
    if vocab is None:
        vocab = (
            docs.select(F.explode(toks).alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("cf"))
        )
        total = docs.agg(F.sum(F.size(toks))).collect()[0][0] or 0
    else:
        total = vocab.agg(F.sum("cf")).collect()[0][0] or 0
    ln_total = math.log(total) if total > 0 else 0.0
    folded = (
        per_doc.join(vocab, "token", "left")
        .groupBy("doc_id", "n_tokens")
        .agg(
            F.aggregate(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("token").isNotNull(),
                            F.struct("token", "c", "cf"),
                        )
                    )
                ),
                F.lit(0.0),
                lambda a, s: a
                + s["c"].cast("double")
                * F.log(F.coalesce(s["cf"], F.lit(1)).cast("double")),
            ).alias("s")
        )
    )
    return folded.select(
        "doc_id",
        "n_tokens",
        F.when(
            F.col("n_tokens") > 0,
            F.round(F.lit(ln_total) - F.col("s") / F.col("n_tokens"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("lm_nll"),
    )


def lm_quality_bands(
    docs: DataFrame,
    cuts: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab: DataFrame | None = None,
) -> DataFrame:
    """CCNet's head/middle/tail split over the unigram-LM scores: docs
    at or below the ``cuts[0]`` NLL quantile are "head" (most
    corpus-like), below ``cuts[1]`` "middle", the rest "tail" —
    downstream mixtures sample the bands at different rates.

    The cutoffs are EXACT percentiles (linear interpolation) computed
    in one driver-side scalar job and folded back as literals; Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` return bit-identical
    doubles over the identical rounded-to-6 score multisets (verified),
    so band assignment is engine-exact. Scale note: exact percentile
    aggregates a value->count map whose size is the number of DISTINCT
    rounded-6 scores — bounded and far below row count; swap in
    approx_percentile only if that ever dominates, at the price of the
    oracle check. The scoring pipeline runs twice (once for cutoffs,
    once for the result); in production persist
    :func:`unigram_lm_scores` once and band the stored table.

    Output: (doc_id, n_tokens, lm_nll, band STRING).
    """
    lo, hi = float(cuts[0]), float(cuts[1])
    if not 0.0 < lo < hi < 1.0:
        raise ValueError(f"cuts must satisfy 0 < lo < hi < 1, got {cuts}")
    scores = unigram_lm_scores(docs, id_col=id_col, text_col=text_col, vocab=vocab)
    q = scores.agg(
        F.expr(f"percentile(lm_nll, array({lo!r}D, {hi!r}D))").alias("q")
    ).collect()[0]["q"]
    if q is None:
        q = [float("inf"), float("inf")]
    return scores.select(
        "doc_id",
        "n_tokens",
        "lm_nll",
        F.when(F.col("lm_nll") <= F.lit(float(q[0])), F.lit("head"))
        .when(F.col("lm_nll") <= F.lit(float(q[1])), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("band"),
    )


def chunk_documents(
    docs: DataFrame,
    window: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window chunking: split each document into token windows
    of ``window`` tokens starting every ``stride`` tokens (overlap =
    window - stride), the standard long-document prep for context-
    bounded training. Chunk starts at 0, stride, 2*stride, ... while
    the start is inside the document, so the last chunk may be short;
    empty documents produce no chunks.

    Row-local: one transform + posexplode, shuffle-free — at 100 TB
    this is pure map work that fuses into the scan.

    Output: (doc_id, chunk_idx INT, chunk_text STRING, n_chunk_tokens INT).
    """
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.text import tokenize

    if window <= 0 or stride <= 0:
        raise ValueError(f"window and stride must be positive, got {window}/{stride}")
    if stride > window:
        # a gap mode would silently drop the tokens between windows
        # from the training corpus — refuse rather than lose data
        raise ValueError(
            f"stride {stride} > window {window} would skip tokens between chunks"
        )
    toks = tokenize(F.col(text_col))
    n = F.size(toks)
    # start indices: 0, stride, ... < n. NOTE sequence(0, -1) DESCENDS
    # ([0, -1]) rather than being empty — empty docs need the explicit
    # empty-array branch.
    chunks = F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), F.floor((n - F.lit(1)) / stride)),
            lambda i: F.slice(toks, i * stride + F.lit(1), window),
        ),
    ).otherwise(F.array().cast("array<array<string>>"))
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(chunks).alias("chunk_idx", "ct"),
    )
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("int"),
        F.array_join("ct", " ").alias("chunk_text"),
        F.size("ct").alias("n_chunk_tokens"),
    )


def snapshot_diff(
    old_docs: DataFrame,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus snapshot diff — what a re-crawl changed: rows only in the
    new snapshot are ``added``, rows only in the old are ``removed``,
    rows present in both with different normalized content hashes are
    ``modified`` (unchanged rows are omitted). The audit step before an
    incremental re-processing run: everything downstream (dedup,
    quality, index maintenance) only needs to touch added+modified.

    One full outer join on the stable id; both sides reduce to
    (id, 8-byte hash) projections before the shuffle.

    Output: (doc_id, change STRING, old_hash LONG?, new_hash LONG?).
    """
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.operators.dedup import (
        normalize_text,
    )

    def hashed(df, alias, marker):
        return df.select(
            F.col(id_col).alias("doc_id"),
            portable_hash64(normalize_text(F.col(text_col))).alias(alias),
            F.lit(True).alias(marker),
        )

    # presence comes from explicit markers, NOT hash nullability: a
    # doc with NULL text hashes to NULL, and inferring "absent" from
    # that would misreport live documents as added/removed
    joined = hashed(old_docs, "old_hash", "in_old").join(
        hashed(new_docs, "new_hash", "in_new"), "doc_id", "full_outer"
    )
    return joined.select(
        "doc_id",
        F.when(F.col("in_old").isNull(), F.lit("added"))
        .when(F.col("in_new").isNull(), F.lit("removed"))
        .when(
            ~F.col("old_hash").eqNullSafe(F.col("new_hash")), F.lit("modified")
        )
        .otherwise(F.lit("unchanged"))
        .alias("change"),
        "old_hash",
        "new_hash",
    ).filter(F.col("change") != "unchanged")


def mine_triplets(
    positives: DataFrame,
    docs: DataFrame,
    n_negatives: int = 2,
    seed: int = 11,
    n_docs: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Contrastive training triplets for embedding models: every
    positive pair (``doc_a``, ``doc_b`` — e.g. near-duplicate or
    shared-span pairs) paired with ``n_negatives`` deterministically
    hash-sampled corpus documents.

    Negative sampling at 100 TB cannot enumerate the id domain; this
    uses hash-BUCKET sampling as one equi-join: every corpus doc gets
    ``bucket = hash(id) mod S`` (S = corpus size, so buckets hold ~1
    doc), every (anchor, slot) gets ``target = hash(anchor:slot:seed)
    mod S``, and the join on bucket == target resolves each slot to
    the smallest doc id in its bucket. Misses (empty buckets) drop the
    slot — the expected yield per anchor is
    ``n_negatives * (1 - 1/e)``; accidental hits on the anchor or
    positive are filtered. Fully deterministic: re-runs and both
    engines produce identical triplets.

    Output: (anchor_id, positive_id, negative_id, slot INT).
    """
    if n_negatives <= 0:
        raise ValueError(f"n_negatives must be positive, got {n_negatives}")
    if n_docs is None:
        n_docs = docs.count()
    if n_docs <= 0:
        return positives.sparkSession.createDataFrame(
            [], "anchor_id long, positive_id long, negative_id long, slot int"
        )
    buckets = docs.select(
        F.col(id_col).alias("negative_id"),
        F.pmod(portable_hash64(F.col(id_col).cast("string")), F.lit(n_docs)).alias(
            "bucket"
        ),
    ).groupBy("bucket").agg(F.min("negative_id").alias("negative_id"))
    slots = positives.select(
        F.col("doc_a").alias("anchor_id"),
        F.col("doc_b").alias("positive_id"),
        F.explode(
            F.array(*[F.lit(i) for i in range(n_negatives)])
        ).alias("slot"),
    ).withColumn(
        "bucket",
        F.pmod(
            portable_hash64(
                F.concat(
                    F.col("anchor_id").cast("string"),
                    F.lit(":"),
                    F.col("slot").cast("string"),
                    F.lit(f":{seed}"),
                )
            ),
            F.lit(n_docs),
        ),
    )
    return (
        slots.join(buckets, "bucket")
        .filter(
            (F.col("negative_id") != F.col("anchor_id"))
            & (F.col("negative_id") != F.col("positive_id"))
        )
        .select("anchor_id", "positive_id", "negative_id", "slot")
    )


def weighted_mixture_sample(
    docs: DataFrame,
    weights: dict[str, int],
    group_col: str = "source",
    count_col: str | None = None,
    seed: int = 7,
    scale: int = 1_000_000,
    id_col: str = "doc_id",
) -> DataFrame:
    """Target-ratio data mixing: downsample groups so the post-sample
    token masses follow ``weights`` (integer parts, e.g. per-mille) —
    the general form of :func:`balanced_mixture_sample`. No group is
    upsampled: the total budget is the largest B with
    ``B * w_g / W <= T_g`` for every weighted group, i.e.
    ``B = min_g floor(T_g * W / w_g)``, then
    ``thr_g = floor(scale * B * w_g / (W * T_g))`` and a row is kept
    iff ``hash(id:seed) mod scale < thr_g``. All arithmetic is exact
    integer (Python big ints driver-side; the oracle uses HUGEINT with
    the same floor-division order), so both engines keep identical
    rows. Groups without a weight — and null/zero-mass groups — drop.

    Same two-pass scale shape as the balanced variant (shared
    machinery: one tiny group-by, then a shuffle-free literal-map
    filter).

    Output: kept rows as (doc_id, <group_col>, n_tokens, sample_bucket).
    """
    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be a non-empty dict of positive integers")
    counted = _mixture_counts(docs, group_col, count_col, id_col)
    totals = {
        g: t for g, t in _mixture_totals(counted, group_col).items() if g in weights
    }
    thresholds = {}
    if totals:
        W = sum(weights[g] for g in totals)
        budget = min((t * W) // weights[g] for g, t in totals.items())
        thresholds = {
            g: (scale * budget * weights[g]) // (W * t) for g, t in totals.items()
        }
    return _threshold_sample(counted, thresholds, scale, seed, group_col, id_col)


def pii_scrub(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """PII detection + redaction (the BigScience/CCNet-style scrub
    pass): per-document counts of email / phone / IPv4 matches over
    the original text, plus the text with every match replaced by its
    placeholder token (``functions.textstats.PII_PATTERNS``). Counts
    are independent detectors (overlapping matches count under every
    kind that fires); redaction applies the patterns in declaration
    order so nested matches resolve deterministically.

    Scale: entirely row-local ``regexp_count`` / ``regexp_replace``
    expressions — shuffle-free, fuses into the scan's whole-stage
    codegen, trivially linear at 100 TB.

    Output: (doc_id, clean_text, n_emails, n_phones, n_ips).
    """
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.textstats import (
        pii_counts,
        pii_redact,
    )

    text = F.col(text_col)
    counts = pii_counts(text)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        pii_redact(text).alias("clean_text"),
        counts["email"].alias("n_emails"),
        counts["phone"].alias("n_phones"),
        counts["ipv4"].alias("n_ips"),
    )


# Broadcast-path gate for remove_boilerplate_lines: above this many
# boilerplate lines the dictionary stops being driver/executor-cheap
# and the operator switches to the explode/anti-join/regroup plan.
BOILERPLATE_BCAST_MAX = 100_000


def remove_boilerplate_lines(
    docs: DataFrame,
    min_doc_freq: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    max_dict_size: int = BOILERPLATE_BCAST_MAX,
) -> DataFrame:
    """Line-level boilerplate removal (the RefinedWeb/MassiveText
    pass doc-level dedup cannot express): drop every line whose
    document frequency is >= ``min_doc_freq`` — navigation headers,
    cookie banners, copyright footers — and reassemble each document
    from its surviving lines in original order. Documents whose every
    line is boilerplate disappear; empty lines are dropped as
    normalization on both sides of the comparison.

    Plan, pass 1 (dictionary): split -> per-doc-distinct lines ->
    one aggregation keyed on the 8-byte portable line hash -> lines
    with df >= min_doc_freq. The dictionary is corpus-bounded by
    construction: at most total_lines / min_doc_freq entries.

    Plan, pass 2, broadcast path (dictionary fits ``max_dict_size``):
    the hash set rides a closure into one Arrow ``mapInPandas``-style
    pandas UDF that re-derives the same md5-based hash per line
    (``hashlib`` == Spark ``conv(substring(md5..`` bit-for-bit) and
    filters row-locally — the corpus text never shuffles. The single
    dictionary collect doubles as the size probe (no separate count
    job). Join path (dictionary too big): posexplode -> broadcast
    anti join on line_hash -> regroup by doc_id (the one unavoidable
    text shuffle when the dictionary cannot be carried to the rows).
    Both paths produce identical rows (tested).

    Output: (doc_id, clean_text, n_removed INT), docs with >= 1 kept
    line only.
    """
    if min_doc_freq < 2:
        raise ValueError(f"min_doc_freq must be >= 2, got {min_doc_freq}")
    # coalesce keeps null texts out of the Arrow batch (they become an
    # empty lines array and the doc drops on the no-kept-lines rule,
    # same as the join path's empty posexplode)
    import re

    lines_arr = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), F.lit(re.escape(sep))),
        lambda x: x != "",
    )
    base = docs.select(F.col(id_col).alias("doc_id"), lines_arr.alias("lines"))
    dictionary = (
        base.select(F.explode(F.array_distinct("lines")).alias("line"))
        .select(portable_hash64(F.col("line")).alias("line_hash"))
        .groupBy("line_hash")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= F.lit(min_doc_freq))
        .select("line_hash")
    )
    head = dictionary.limit(max_dict_size + 1).collect()
    if len(head) <= max_dict_size:
        return _strip_lines_broadcast(base, {r["line_hash"] for r in head}, sep)
    return _strip_lines_join(base, dictionary, sep)


def _strip_lines_broadcast(base, hash_set, sep):
    """Row-local line filter against the broadcast hash set. Python
    md5 here is bit-identical to ``functions.hashing.portable_hash64``
    (same 15-hex-digit truncation); set membership is O(1) per line."""
    import hashlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def keep_lines(lines: pd.Series) -> pd.Series:
        return lines.map(
            lambda ls: [
                l
                for l in ls
                if int(hashlib.md5(l.encode("utf-8")).hexdigest()[:15], 16)
                not in hash_set
            ]
        )

    out = base.select(
        "doc_id", F.size("lines").alias("n"), keep_lines(F.col("lines")).alias("kept")
    )
    return out.filter(F.size("kept") > 0).select(
        "doc_id",
        F.array_join("kept", sep).alias("clean_text"),
        (F.col("n") - F.size("kept")).cast("int").alias("n_removed"),
    )


def _strip_lines_join(base, dictionary, sep):
    """Explode/anti-join/regroup fallback for dictionaries too large to
    broadcast as a closure: one shuffle on doc_id to reassemble."""
    exploded = base.select(
        "doc_id",
        F.size("lines").alias("n_lines"),
        F.posexplode("lines").alias("pos", "line"),
    ).withColumn("line_hash", portable_hash64(F.col("line")))
    kept = exploded.join(F.broadcast(dictionary), "line_hash", "left_anti")
    return (
        kept.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
                sep,
            ).alias("clean_text"),
            (F.first("n_lines") - F.count("*")).cast("int").alias("n_removed"),
        )
        .select("doc_id", "clean_text", "n_removed")
    )


def gopher_rules(
    docs: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    mean_len_lo: int = 3,
    mean_len_hi: int = 10,
    symbol_x: int = 10,
    bullet_num: int = 9,
    bullet_den: int = 10,
    ellipsis_num: int = 3,
    ellipsis_den: int = 10,
    alpha_num: int = 4,
    alpha_den: int = 5,
    min_stopwords: int = 2,
    stopwords: tuple[str, ...] = (
        "the", "be", "to", "of", "and", "that", "have", "with",
    ),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021,
    arXiv:2112.11446 §A1.1): per-document boolean verdict for each
    heuristic plus the aggregate keep decision — the standard
    pretraining filter bundle next to the CCNet LM scoring
    (``unigram_lm_scores``) and the repetition rules
    (``repetition_quality``).

    Rules: word count in [min_words, max_words]; mean word length in
    [mean_len_lo, mean_len_hi]; symbol-token ratio ('#'/'...') <=
    1/symbol_x; < bullet_num/bullet_den of lines bullet-started;
    < ellipsis_num/ellipsis_den of lines ellipsis-ended; >=
    alpha_num/alpha_den of words containing an alphabetic char; >=
    min_stopwords distinct list stopwords present.

    Every verdict is an integer cross-multiplied comparison (no float
    boundary can disagree between engines); the reported ratios are
    single IEEE divisions for the dashboard only. Entirely row-local
    higher-order expressions — shuffle-free, fuses into the scan.

    Output: (doc_id, n_words, mean_word_len, symbol_words,
    bullet_lines, ellipsis_lines, n_lines, alpha_words, stop_hits,
    r_word_count, r_mean_len, r_symbol, r_bullet, r_ellipsis,
    r_alpha, r_stopwords, keep).
    """
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.text import (
        tokenize,
    )

    toks = tokenize(F.col(text_col))
    lines = F.split(F.col(text_col), "\n", -1)
    stop_lit = F.array(*[F.lit(s) for s in stopwords])
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_words"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t)),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("sum_len"),
        F.size(
            F.filter(toks, lambda t: (t == "#") | (t == "..."))
        ).alias("symbol_words"),
        F.size(lines).alias("n_lines"),
        F.size(
            F.filter(
                lines,
                lambda l: l.startswith("- ") | l.startswith("* "),
            )
        ).alias("bullet_lines"),
        F.size(F.filter(lines, lambda l: l.endswith("..."))).alias(
            "ellipsis_lines"
        ),
        F.size(
            F.filter(toks, lambda t: t.rlike("[a-zA-Z]"))
        ).alias("alpha_words"),
        F.size(
            F.array_intersect(
                F.array_distinct(F.transform(toks, F.lower)), stop_lit
            )
        ).alias("stop_hits"),
    )
    n, sl = F.col("n_words"), F.col("sum_len")
    return base.select(
        "doc_id",
        "n_words",
        F.when(n > 0, F.round(sl.cast("double") / n, 6))
        .otherwise(F.lit(0.0))
        .alias("mean_word_len"),
        "symbol_words",
        "bullet_lines",
        "ellipsis_lines",
        "n_lines",
        "alpha_words",
        "stop_hits",
        ((n >= min_words) & (n <= max_words)).alias("r_word_count"),
        ((sl >= mean_len_lo * n) & (sl <= mean_len_hi * n)).alias("r_mean_len"),
        (F.col("symbol_words") * symbol_x <= n).alias("r_symbol"),
        (
            F.col("bullet_lines") * bullet_den < bullet_num * F.col("n_lines")
        ).alias("r_bullet"),
        (
            F.col("ellipsis_lines") * ellipsis_den
            < ellipsis_num * F.col("n_lines")
        ).alias("r_ellipsis"),
        (F.col("alpha_words") * alpha_den >= alpha_num * n).alias("r_alpha"),
        (F.col("stop_hits") >= min_stopwords).alias("r_stopwords"),
        (
            (n >= min_words) & (n <= max_words)
            & (sl >= mean_len_lo * n) & (sl <= mean_len_hi * n)
            & (F.col("symbol_words") * symbol_x <= n)
            & (F.col("bullet_lines") * bullet_den < bullet_num * F.col("n_lines"))
            & (
                F.col("ellipsis_lines") * ellipsis_den
                < ellipsis_num * F.col("n_lines")
            )
            & (F.col("alpha_words") * alpha_den >= alpha_num * n)
            & (F.col("stop_hits") >= min_stopwords)
        ).alias("keep"),
    )


def per_group_quota(
    df: DataFrame,
    group_col: str,
    quota: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain/source quota sampling — the crawl-pipeline cap that
    stops one huge domain from dominating the training mix (the
    per-domain limits of CCNet/RefinedWeb-style pipelines). Keeps the
    ``quota`` rows with the smallest salted portable hash of the STABLE
    id within each group (ties by id): deterministic, content-free (a
    re-crawled doc keeps its fate), engine-portable (the md5 family is
    DuckDB-expressible), and one shuffle on the group key — the same
    shape as any per-group window at 100 TB (salting applies if one
    group dominates the key space, but the quota output itself is
    bounded by quota * n_groups).

    Output: (group_col, id_col, pick_rank INT), pick_rank in [1, quota].
    """
    if quota < 1:
        raise ValueError(f"quota must be >= 1, got {quota}")
    h = portable_hash64(F.concat(F.col(id_col).cast("string"), F.lit(":quota")))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.select(group_col, id_col)
        .withColumn("pick_rank", F.row_number().over(w))
        .filter(F.col("pick_rank") <= quota)
    )


def stratified_split(
    df: DataFrame,
    group_col: str,
    val_frac: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum train/val split — exact proportions WITHIN each
    group (language, source, domain), where a global hash split only
    hits ``val_frac`` in expectation and can wash a small stratum
    entirely into one side (a 300-doc language ending up 100% train
    means zero eval coverage for it). Each group's rows are ordered by
    the salted portable hash of the STABLE id (ties by id — the same
    content-free determinism as :func:`per_group_quota`: a re-crawled
    doc keeps its fate) and the first ``floor(val_frac * n_group)``
    go to val.

    Scale shape: one shuffle on the group key; the two window
    functions (rank + group size) share the single partitioning.
    Exact stratification requires group-level coordination by
    definition — a skewed giant group is one sorted partition, so for
    domain-grade cardinality prefer the group-free
    :func:`dataset_split` hash rule; strata like language/source are
    few and bounded.

    Output: (group_col, id_col, split STRING in {'train','val'}).
    """
    if not (0.0 <= val_frac <= 1.0):
        raise ValueError(f"val_frac must be in [0, 1], got {val_frac}")
    h = portable_hash64(F.concat(F.col(id_col).cast("string"), F.lit(":strat")))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    # group size over the SAME partitioning AND ordering (unbounded
    # frame) so both functions land in one WindowExec behind one
    # exchange — a partition-only count window would re-shuffle
    wn = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        df.select(group_col, id_col)
        .withColumn("_r", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wn))
        .select(
            group_col,
            id_col,
            F.when(
                F.col("_r")
                <= F.floor(F.col("_n") * F.lit(float(val_frac))),
                F.lit("val"),
            )
            .otherwise(F.lit("train"))
            .alias("split"),
        )
    )


def normalize_url(url: Column) -> Column:
    """Canonical URL for crawl-level exact dedup (the CCNet/RefinedWeb
    url-dedup normalization): lowercase, strip the scheme, a leading
    ``www.``, the query string and fragment (tracking params make the
    same page look unique), and trailing slashes. Pure built-in
    expressions — whole-stage codegen, no UDF."""
    u = F.lower(F.trim(url))
    u = F.regexp_replace(u, r"^[a-z][a-z0-9+.-]*://", "")
    u = F.regexp_replace(u, r"^www\.", "")
    u = F.regexp_replace(u, r"[?#].*$", "")
    return F.regexp_replace(u, r"/+$", "")


def url_dedup_first_wins(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """URL-level exact dedup, first-wins: every row keeps its
    normalized URL and a ``keep`` flag that is true only for the
    SMALLEST id in its normalized-URL group — the deterministic
    re-crawl rule (the earliest fetch of a page survives; later
    fetches of the same page, however their raw URLs differ in
    scheme/www/params, are dropped).

    NULL URLs (real crawl corpora carry them — lost headers, non-HTTP
    ingests) are NOT dedup-able by URL and are NOT one group: every
    null-URL row comes back ``keep=true`` with ``norm_url`` null. An
    equi-join would silently drop them (NULL keys match nothing) and
    a null-safe join would wrongly first-wins them against each other.

    Scale shape: one map-side-combined groupBy(norm_url).min(id) for
    the winners, then an equi-join back on the SAME key — both sides
    hash-partition on norm_url, so AQE reuses the exchange, and the
    partial aggregation absorbs hot URLs (a million re-crawls of one
    page combine map-side instead of skewing a window partition; a
    row_number window per URL would sort every group end-to-end). The
    null branch is a shuffle-free filter + literal unioned on top.

    Output: (id_col, norm_url, keep BOOLEAN).
    """
    norm = df.select(
        F.col(id_col), normalize_url(F.col(url_col)).alias("norm_url")
    )
    with_url = norm.where(F.col("norm_url").isNotNull())
    null_url = norm.where(F.col("norm_url").isNull()).select(
        id_col, "norm_url", F.lit(True).alias("keep")
    )
    winners = with_url.groupBy("norm_url").agg(F.min(id_col).alias("keep_id"))
    return (
        with_url.join(winners, "norm_url")
        .select(
            id_col,
            "norm_url",
            (F.col(id_col) == F.col("keep_id")).alias("keep"),
        )
        .unionByName(null_url)
    )


def source_temperature_mix(
    docs: DataFrame,
    alpha: float = 0.7,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-based source-mixing weights — the multinomial
    sampling law every large pretraining run uses (GPT-3 / Pile /
    mT5-style: sample source i with probability proportional to
    ``n_i^alpha``, ``alpha < 1`` flattening the raw distribution so
    small high-quality sources are not drowned by bulk crawl data).

    Per source: document and token counts, the raw token share
    ``p_raw``, the temperature-adjusted sampling weight
    ``p_temp = n_i^alpha / sum_j n_j^alpha``, and
    ``effective_epochs = p_temp * total_tokens / n_i`` — how many
    passes over the source one epoch of the MIXED corpus implies
    (> 1 = the source is oversampled and will repeat; the number an
    operator checks against memorization budgets).

    Float parity: ``pow(bigint, alpha)`` is bit-identical across
    engines (verified empirically, like the ln() family);
    ``sum_j n_j^alpha`` is a FIXED ascending-source-key left fold so
    both engines add identical doubles in identical order; outputs
    round(6).

    Scale shape: ONE map-side-combined aggregation over the corpus;
    the totals fold runs over the <= n_sources rows collected into a
    single array row and broadcasts back — the corpus is read once
    and never reshuffled.

    Output: (source, n_docs BIGINT, n_tokens BIGINT, p_raw, p_temp,
    effective_epochs — DOUBLEs rounded-6), one row per source.
    """
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.text import tokenize

    counts = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokenize(F.col(text_col)))).alias("n_tokens"),
    )
    a = F.lit(float(alpha))
    totals = counts.select(
        F.sort_array(
            F.collect_list(F.struct(source_col, "n_tokens"))
        ).alias("xs")
    ).select(
        F.aggregate(
            "xs",
            F.lit(0.0),
            lambda acc, x: acc + F.pow(x["n_tokens"].cast("double"), a),
        ).alias("pow_total"),
        F.aggregate(
            "xs",
            F.lit(0).cast("long"),
            lambda acc, x: acc + x["n_tokens"],
        ).alias("tok_total"),
    )
    p = F.pow(F.col("n_tokens").cast("double"), a)
    return counts.crossJoin(F.broadcast(totals)).select(
        source_col,
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / F.col("tok_total"), 6).alias("p_raw"),
        F.round(p / F.col("pow_total"), 6).alias("p_temp"),
        F.round(
            p / F.col("pow_total") * F.col("tok_total") / F.col("n_tokens"),
            6,
        ).alias("effective_epochs"),
    )


def naive_bayes_classify(
    docs: DataFrame,
    label_col: str = "lang",
    test_mod: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Multinomial Naive Bayes over unigram counts — the fastText-style
    trainable filter of real pretraining pipelines (CCNet's lang-ID and
    the GPT-3/PaLM quality classifiers are this shape: linear over
    token counts), trained and evaluated inside the engine. Train on
    docs with ``id % test_mod != 0``, predict the held-out rest.

    Model (add-one smoothing, natural logs):
      score(d, l) = ln(D_l / D) + sum_t c_t * ln((cnt_{l,t} + 1) /
                    (T_l + V))
    with per-doc token counts c_t, per-class token counts cnt, class
    token totals T_l, train vocab size V, class doc counts D_l / D.
    Rearranged so every distributed term is engine-portable:
    ``prior_l - n_tokens * ln(T_l + V) + fold(c_t * ln(cnt + 1))`` —
    the per-(doc, class) fold runs over the struct list sorted by
    token (unique per doc), every ln() argument is an exact integer,
    and the argmax compares scores rounded to 10 (ties by label asc),
    the same float-parity discipline as :func:`unigram_lm_scores`.

    Scale shape: training is ONE map-side-combined (label, token)
    aggregation; class priors/totals are a <=n_classes-row collect;
    scoring joins test-token occurrences to the class-conditional
    table on the token key (vocab-sized, shuffle join — NOT broadcast;
    vocabularies outgrow broadcast at corpus scale) and folds per
    (doc, class). Per-doc cost is n_tokens * n_classes.

    Output: (doc_id, true_label, pred_label, score DOUBLE rounded-6,
    correct BOOLEAN).
    """
    import math

    from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.text import tokenize

    if test_mod < 2:
        raise ValueError(f"test_mod must be >= 2, got {test_mod}")
    toks = tokenize(F.col(text_col))
    is_test = F.pmod(F.col(id_col), F.lit(test_mod)) == 0
    train = docs.filter(~is_test)
    test = docs.filter(is_test)

    tok_tr = train.select(
        F.col(label_col).alias("label"), F.explode(toks).alias("token")
    )
    class_tok = tok_tr.groupBy("label", "token").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # bounded driver-side scalars: class doc counts, class token
    # totals (n_classes rows), train vocab size (one count job)
    d_rows = {
        r["label"]: r["n"]
        for r in train.groupBy(F.col(label_col).alias("label"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    t_rows = {
        r["label"]: r["n"]
        for r in tok_tr.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    v = class_tok.select("token").distinct().count()
    d_total = sum(d_rows.values())
    if not d_rows:
        raise ValueError("empty training split")
    classes = docs.sparkSession.createDataFrame(
        [
            (
                lbl,
                math.log(d_rows[lbl]) - math.log(d_total),
                math.log(t_rows.get(lbl, 0) + v),
            )
            for lbl in sorted(d_rows)
        ],
        "label string, prior double, ln_denom double",
    )

    per_doc = test.select(
        F.col(id_col).alias("doc_id"),
        F.col(label_col).alias("true_label"),
        F.size(toks).alias("n_tokens"),
        F.explode_outer(
            F.transform(
                F.array_sort(F.array_distinct(toks)),
                lambda g: F.struct(
                    g.alias("token"),
                    F.size(F.filter(toks, lambda x: x == g)).alias("c"),
                ),
            )
        ).alias("tc"),
    ).select(
        "doc_id",
        "true_label",
        "n_tokens",
        F.col("tc.token").alias("token"),
        F.col("tc.c").alias("c"),
    )
    scored = (
        per_doc.join(F.broadcast(classes), how="cross")
        .join(class_tok, ["label", "token"], "left")
        .groupBy("doc_id", "true_label", "n_tokens", "label", "prior", "ln_denom")
        .agg(
            F.aggregate(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("token").isNotNull(),
                            F.struct("token", "c", "cnt"),
                        )
                    )
                ),
                F.lit(0.0),
                lambda a, s: a
                + s["c"].cast("double")
                * F.log(F.coalesce(s["cnt"], F.lit(0)).cast("double") + F.lit(1.0)),
            ).alias("fold")
        )
        .select(
            "doc_id",
            "true_label",
            "label",
            (
                F.col("prior")
                - F.col("n_tokens").cast("double") * F.col("ln_denom")
                + F.col("fold")
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.round(F.col("score"), 10).desc(), F.col("label").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "doc_id",
            "true_label",
            F.col("label").alias("pred_label"),
            F.round(F.col("score"), 6).alias("score"),
            (F.col("label") == F.col("true_label")).alias("correct"),
        )
    )


def temperature_mixture_sample(
    docs: DataFrame,
    group_col: str = "source",
    count_col: str | None = None,
    seed: int = 7,
    scale: int = 1_000_000,
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature T=2 mixture rebalance (sampling exponent
    alpha = 1/2 — the mBERT/XLM-R multilingual recipe): downsample each
    group so post-sample token masses go as sqrt(T_g) instead of T_g,
    flattening the mixture HALFWAY between natural (T=1, keep all) and
    uniform (:func:`balanced_mixture_sample`). Keep fraction per group
    is sqrt(T_min / T_g), with the smallest group kept whole.

    The keep boundary is EXACT despite the square root: a row with
    hash bucket h is kept iff ``h^2 * T_g < scale^2 * T_min`` — the
    cross-multiplied form of ``h < scale * sqrt(T_min/T_g)`` in pure
    integers. The engine folds it to the equivalent per-group
    threshold ``isqrt((scale^2 * T_min - 1) // T_g) + 1`` with Python
    big-int arithmetic (h < thr <=> h^2 * T_g < scale^2 * T_min,
    since h <= isqrt(K) <=> h^2 <= K for non-negative integers), and
    the DuckDB oracle evaluates the cross-multiplied form directly in
    HUGEINT — two derivations of one integer rule, no float boundary
    anywhere. Same two-pass scale shape as the other mixture
    samplers: one group agg, one shuffle-free literal-map filter.

    Output: kept rows as (doc_id, <group_col>, n_tokens, sample_bucket).
    """
    import math

    counted = _mixture_counts(docs, group_col, count_col, id_col)
    totals = _mixture_totals(counted, group_col)
    thresholds = {}
    if totals:
        t_min = min(totals.values())
        thresholds = {
            g: math.isqrt((scale * scale * t_min - 1) // t) + 1
            for g, t in totals.items()
        }
    return _threshold_sample(counted, thresholds, scale, seed, group_col, id_col)


def _dsir_feature_buckets(text_col, n_buckets: int):
    """Hashed unigram + bigram occurrence buckets for one document —
    NON-distinct: DSIR weights are bag-of-ngrams likelihood ratios, so
    every occurrence counts. Pure row-local higher-order expressions
    (tokenize, one slice/join pass for bigrams, the portable md5 hash
    mod n_buckets), no UDFs, engine-portable bit-for-bit."""
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.text import tokenize

    # NULL text folds to the empty feature list (weight 0.0), matching
    # the oracle's zero-occurrence-rows + coalesce(0.0) semantics —
    # without this, tokenize(NULL) nulls the whole fold
    toks = tokenize(F.coalesce(text_col, F.lit("")))
    # guard: F.sequence steps DOWN when start > stop, so the bigram
    # index list must only be built for >= 2 tokens
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(1)),
            lambda i: F.array_join(F.slice(toks, i, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.transform(
        F.concat(toks, bigrams),
        lambda g: F.pmod(portable_hash64(g), F.lit(n_buckets)),
    )


def _dsir_features_py(text: str | None, n_buckets: int) -> list:
    """Python twin of :func:`_dsir_feature_buckets` for the Arrow
    kernels: whitespace tokenize (split on single spaces, drop empty
    tokens — identical to the ``F.split + filter`` expression), the
    unigram+bigram gram list in the same order, and the portable md5
    bucket hash (``hashlib`` == Spark ``conv(substring(md5..``
    bit-for-bit, the identity already relied on at
    :func:`remove_boilerplate_lines`)."""
    import hashlib

    toks = [t for t in (text or "").split(" ") if t]
    grams = toks + [f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)]
    return [
        int(hashlib.md5(g.encode("utf-8")).hexdigest()[:15], 16) % n_buckets
        for g in grams
    ]


def _dsir_bucket_counts(
    docs: DataFrame,
    target_mod: int,
    n_buckets: int,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Per-bucket (f, ct, cr) feature counts over the corpus as ONE
    Arrow kernel emitting per-batch partial histograms (np.bincount),
    reduced by a tiny <= n_buckets-row aggregation. Replaces the
    explode + groupBy over every gram occurrence: the higher-order
    feature expression was interpreted per element (guide §4.2) and
    the explode shipped one row per gram into the aggregation; here
    only <= n_buckets * n_batches histogram rows exist, and the
    hashing runs in the same Python pass (measured 2.5 s -> ~0.4 s
    for the training aggregation at sf0.1)."""
    import numpy as np
    import pandas as pd

    def counts(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ct = np.zeros(n_buckets, dtype=np.int64)
            cr = np.zeros(n_buckets, dtype=np.int64)
            for i, text in zip(pdf["__id"].values, pdf["__text"].values):
                feats = _dsir_features_py(text, n_buckets)
                if not feats:
                    continue
                h = np.bincount(
                    np.asarray(feats, dtype=np.int64), minlength=n_buckets
                )
                if int(i) % target_mod == 0:
                    ct += h
                else:
                    cr += h
            active = np.flatnonzero(ct | cr)
            yield pd.DataFrame(
                {
                    "f": active.astype(np.int32),
                    "ct": ct[active],
                    "cr": cr[active],
                }
            )

    return (
        docs.select(
            F.col(id_col).alias("__id"), F.col(text_col).alias("__text")
        )
        .mapInPandas(counts, "f int, ct long, cr long")
        .groupBy("f")
        .agg(F.sum("ct").alias("ct"), F.sum("cr").alias("cr"))
    )


def dsir_feature_log_ratios(
    docs: DataFrame,
    target_mod: int = 10,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> list[float]:
    """Train the DSIR importance model: per-bucket log likelihood
    ratios ``ln p_target(f) - ln p_raw(f)`` over hashed n-gram
    features, add-one smoothed (Xie et al., NeurIPS 2023, "Data
    Selection for Language Models via Importance Resampling"). Docs
    with ``id % target_mod == 0`` are the target-domain sample (the
    paper's Wikipedia/books side), the rest the raw pool.

    Scale shape: ONE map-side-combined aggregation from the corpus to
    <= n_buckets rows (the whole point of feature hashing — the model
    is bounded however big the corpus), collected driver-side like the
    other bounded artifacts (IVF centroids, OPQ rotation). Every ln()
    argument is an exact integer, so the returned floats are
    reproducible from the counts by any libm.
    """
    import math

    rows = _dsir_bucket_counts(
        docs, target_mod, n_buckets, id_col, text_col
    ).collect()
    ct = {r["f"]: r["ct"] for r in rows}
    cr = {r["f"]: r["cr"] for r in rows}
    t_tot, r_tot = sum(ct.values()), sum(cr.values())
    if t_tot == 0 or r_tot == 0:
        raise ValueError(
            f"empty DSIR split: target features={t_tot}, raw features={r_tot}"
        )
    ln_t_den = math.log(t_tot + n_buckets)
    ln_r_den = math.log(r_tot + n_buckets)
    return [
        math.log(ct.get(f, 0) + 1)
        - ln_t_den
        - math.log(cr.get(f, 0) + 1)
        + ln_r_den
        for f in range(n_buckets)
    ]


def _dsir_scored(
    docs: DataFrame,
    lam: list[float],
    n_buckets: int,
    id_col: str,
    text_col: str,
    with_tokens: bool = False,
) -> DataFrame:
    """Per-doc DSIR log weight as ONE Arrow kernel: the trained
    per-bucket ratios ride a broadcast, each doc's buckets are hashed
    in Python (:func:`_dsir_features_py`) and folded in
    ascending-bucket order with a plain float loop — the identical
    IEEE summation order as :func:`_dsir_log_weight`'s sequential
    ``F.aggregate`` (and the oracle's ``list_reduce``), so weights are
    bit-equal. Output: (doc_id, lw DOUBLE[, n_tokens INT]); rounding
    stays with the callers' Spark expressions.

    ``with_tokens`` adds the tokenize count in the same pass (the
    token-budget selector's second full tokenize disappears)."""
    import pandas as pd

    spark = docs.sparkSession
    lbc = spark.sparkContext.broadcast([float(x) for x in lam])
    out_schema = f"doc_id long, lw double"
    if with_tokens:
        out_schema += ", n_tokens int"

    def score(batches):
        lam_l = lbc.value
        for pdf in batches:
            if not len(pdf):
                continue
            lws = []
            ntk = []
            for text in pdf["__text"].values:
                feats = _dsir_features_py(text, n_buckets)
                s = 0.0
                for f in sorted(feats):
                    s = s + lam_l[f]
                lws.append(s)
                if with_tokens:
                    ntk.append(
                        sum(1 for t in (text or "").split(" ") if t)
                    )
            out = {"doc_id": pdf["__id"].values, "lw": lws}
            if with_tokens:
                out["n_tokens"] = pd.Series(ntk, dtype="int32")
            yield pd.DataFrame(out)

    return docs.select(
        F.col(id_col).alias("__id"), F.col(text_col).alias("__text")
    ).mapInPandas(score, out_schema)


def _dsir_log_weight(lam: list[float], text_col, n_buckets: int):
    """Per-row DSIR log importance weight: fold the trained per-bucket
    ratios over the doc's feature occurrences in ascending-bucket order
    (a deterministic float summation order the oracle mirrors). Pure
    map — the model rides the plan as a literal array, so scoring a
    100 TB corpus is shuffle-free."""
    lam_lit = F.array(*[F.lit(float(x)) for x in lam])
    bkts = F.array_sort(_dsir_feature_buckets(text_col, n_buckets))
    return F.aggregate(
        bkts,
        F.lit(0.0),
        lambda acc, f: acc
        + F.element_at(lam_lit, (f + F.lit(1)).cast("int")),
    )


def dsir_importance_weights(
    docs: DataFrame,
    target_mod: int = 10,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR log importance weights for every raw-pool doc: how much
    more target-like than raw-like its hashed n-gram bag is. The
    trainable domain-relevance filter of real pretraining pipelines
    (the DoReMi/DSIR family), next to the rule-based Gopher filters
    and the NB classifier.

    Output: (doc_id, log_weight DOUBLE rounded-6).
    """
    lam = dsir_feature_log_ratios(
        docs, target_mod=target_mod, n_buckets=n_buckets,
        id_col=id_col, text_col=text_col,
    )
    scored = _dsir_scored(
        docs.filter(F.pmod(F.col(id_col), F.lit(target_mod)) != 0),
        lam, n_buckets, id_col, text_col,
    )
    return scored.select(
        "doc_id", F.round(F.col("lw"), 6).alias("log_weight")
    )


def dsir_select(
    docs: DataFrame,
    n_select: int = 50,
    target_mod: int = 10,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    u_scale: int = 1 << 20,
) -> DataFrame:
    """DSIR selection: keep ``n_select`` raw docs by Gumbel-top-k over
    the importance weights — sampling WITHOUT replacement proportional
    to the importance weight, the paper's resampling step. The Gumbel
    noise is derived from a salted portable hash of the stable id
    (``u = (h mod u_scale + 0.5) / u_scale`` is exact in binary64 for a
    power-of-two scale, then ``g = -ln(-ln(u))``), so the draw is
    deterministic, content-independent, and engine-portable — the same
    discipline as :func:`hash_split`.

    Scale shape: model training is the bounded aggregation of
    :func:`dsir_feature_log_ratios`; scoring + keying are shuffle-free
    row-local expressions; selection is orderBy+limit —
    TakeOrderedAndProject, per-partition partial top-k, never a global
    sort. The rank window runs over the <= n_select survivors only.

    Output: (doc_id, log_weight, sel_key DOUBLE rounded-6, sel_rank INT).
    """
    if n_select < 1:
        raise ValueError(f"n_select must be >= 1, got {n_select}")
    top = (
        _dsir_keyed(
            docs, target_mod, n_buckets, id_col, text_col, u_scale,
            with_tokens=False,
        )
        .orderBy(F.round(F.col("key"), 10).desc(), F.col("doc_id").asc())
        .limit(n_select)
    )
    w = Window.orderBy(F.round(F.col("key"), 10).desc(), F.col("doc_id").asc())
    return top.select(
        "doc_id",
        F.round(F.col("lw"), 6).alias("log_weight"),
        F.round(F.col("key"), 6).alias("sel_key"),
        F.row_number().over(w).alias("sel_rank"),
    )


def _dsir_keyed(
    docs: DataFrame,
    target_mod: int,
    n_buckets: int,
    id_col: str,
    text_col: str,
    u_scale: int,
    with_tokens: bool = True,
) -> DataFrame:
    """Shared DSIR selection head: the raw pool with (doc_id, lw, key)
    where key = log weight + deterministic Gumbel. One expression tree
    for the count-budget and token-budget selectors so their keys
    cannot drift. ``with_tokens=False`` drops the ``n_tokens`` column
    (a full second tokenize pass per row) for the count-budget
    selector, which never reads it — the shared-tree goal is the KEY
    expression, not the token count."""
    lam = dsir_feature_log_ratios(
        docs, target_mod=target_mod, n_buckets=n_buckets,
        id_col=id_col, text_col=text_col,
    )
    scored = _dsir_scored(
        docs.filter(F.pmod(F.col(id_col), F.lit(target_mod)) != 0),
        lam, n_buckets, id_col, text_col, with_tokens=with_tokens,
    )
    h = F.pmod(
        portable_hash64(
            F.concat(F.col("doc_id").cast("string"), F.lit(":dsir"))
        ),
        F.lit(u_scale),
    )
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(u_scale))
    gumbel = -F.log(-F.log(u))
    cols = [
        F.col("doc_id"),
        F.col("lw"),
        (F.col("lw") + gumbel).alias("key"),
    ]
    if with_tokens:
        cols.append(F.col("n_tokens"))
    return scored.select(*cols)


def dsir_select_tokens(
    docs: DataFrame,
    token_budget: int,
    target_mod: int = 10,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    u_scale: int = 1 << 20,
    partitions: int | None = None,
) -> DataFrame:
    """DSIR selection at a TOKEN budget — the form production data
    selection actually runs ("give me the most target-like N-token
    subset"): walk the raw pool in descending Gumbel-key order and
    keep docs while the running token total stays within the budget.

    The running total over the key order is the same global prefix sum
    as :func:`pack_chunks` / :func:`epoch_shuffle`, computed the same
    way: range-partition on the sort key (negated rounded key, so the
    ascending range order IS the selection order; negation is exact in
    binary64), materialize once, per-partition token totals to the
    driver, broadcast exclusive offsets, scan within sorted partitions.
    No global window, no single-partition stage.

    Output: (doc_id, log_weight, sel_key DOUBLE rounded-6,
    n_tokens INT, cum_tokens LONG) for the kept docs —
    cum_tokens includes the doc's own tokens and is <= token_budget.
    """
    import pandas as pd

    if token_budget < 1:
        raise ValueError(f"token_budget must be >= 1, got {token_budget}")
    spark = docs.sparkSession
    n_parts = partitions or spark.sparkContext.defaultParallelism
    # rounding happens in Spark expressions (HALF_UP, the oracle's
    # rule) — pandas .round is half-even and must not touch values
    keyed = _dsir_keyed(
        docs, target_mod, n_buckets, id_col, text_col, u_scale
    ).select(
        "doc_id",
        F.round(F.col("lw"), 6).alias("lw"),
        F.round(F.col("key"), 6).alias("key"),
        (-F.round(F.col("key"), 10)).alias("nkey"),
        F.col("n_tokens").cast("int").alias("n_tokens"),
    )
    ranged = keyed.repartitionByRange(
        n_parts, F.col("nkey"), F.col("doc_id")
    ).transform(materialize, eager=True)
    totals = {
        r["pid"]: r["tot"]
        for r in ranged.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.sum("n_tokens").alias("tot"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in range(n_parts):
        offsets[pid] = acc
        acc += int(totals.get(pid, 0) or 0)
    bc = spark.sparkContext.broadcast(offsets)
    budget = int(token_budget)

    def scan(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        running = int(bc.value.get(pid, 0))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            counts = pdf["n_tokens"].astype("int64")
            ends = running + counts.cumsum()
            running = int(ends.iloc[-1])
            keep = ends <= budget
            if not keep.any():
                continue
            out = pdf.loc[keep]
            yield pd.DataFrame(
                {
                    "doc_id": out["doc_id"],
                    "log_weight": out["lw"],
                    "sel_key": out["key"],
                    "n_tokens": out["n_tokens"],
                    "cum_tokens": ends[keep],
                }
            )

    return ranged.sortWithinPartitions("nkey", "doc_id").mapInPandas(
        scan,
        schema=(
            "doc_id long, log_weight double, sel_key double,"
            " n_tokens int, cum_tokens long"
        ),
    )


def epoch_shuffle(
    docs: DataFrame,
    epoch: int = 0,
    id_col: str = "doc_id",
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic global epoch shuffle: every training run reads
    the corpus in a fresh pseudo-random order, and that order must be
    reproducible (resumable jobs, bitwise-identical reruns) and cheap
    at 100 TB. Each row's position is its rank under ``(salted stable-
    id hash, id)`` — content-independent, a different permutation per
    ``epoch``, identical across engines (the portable md5 family).

    The global rank is the same trap as :func:`pack_chunks`'s prefix
    sum: ``row_number() OVER (ORDER BY key)`` runs on ONE partition.
    Same cure: range-partition by the sort key (materialized once so
    both jobs see identical assignment), count rows per partition
    (<= #partitions rows to the driver), broadcast exclusive offsets,
    number WITHIN each sorted partition — every stage parallel, no row
    leaves its range partition.

    Output: (id_col, shuffle_pos LONG) — a permutation of 0..n-1.
    """
    import pandas as pd

    if epoch < 0:
        raise ValueError(f"epoch must be >= 0, got {epoch}")
    spark = docs.sparkSession
    n_parts = partitions or spark.sparkContext.defaultParallelism
    key = portable_hash64(
        F.concat(F.col(id_col).cast("string"), F.lit(f":shuffle:{epoch}"))
    )
    ranged = (
        docs.select(F.col(id_col), key.alias("skey"))
        .repartitionByRange(n_parts, F.col("skey"), F.col(id_col))
        .transform(materialize, eager=True)
    )
    counts = {
        r["pid"]: r["n"]
        for r in ranged.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in range(n_parts):
        offsets[pid] = acc
        acc += int(counts.get(pid, 0) or 0)
    bc = spark.sparkContext.broadcast(offsets)

    def number(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        running = int(bc.value.get(pid, 0))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "shuffle_pos": range(running, running + len(pdf)),
                }
            )
            running += len(pdf)

    return ranged.sortWithinPartitions("skey", id_col).mapInPandas(
        number, schema=f"{id_col} long, shuffle_pos long"
    )


def dsir_divergence(
    docs: DataFrame,
    target_mod: int = 10,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Divergence report for the DSIR model: KL(target || raw) and
    KL(raw || target) over the add-one-smoothed hashed-feature
    distributions — the monitoring number a DSIR/DoReMi-style
    selection pipeline tracks (how far the raw pool sits from the
    target domain; selection is pointless at ~0 and unreliable when
    the distributions barely overlap). Both smoothed distributions
    are proper (they sum to 1 over all n_buckets buckets), so both
    KLs are >= 0.

    Computed entirely in-engine: one map-side-combined aggregation to
    <= n_buckets (f, ct, cr) rows, a broadcast 1-row totals join, and
    the per-bucket terms folded in ascending-bucket order (collect to
    ONE bounded row — the counts table is <= n_buckets rows by
    construction) plus the closed-form contribution of the
    (n_buckets - active) buckets unseen in either pool.

    Output: 1 row (active_buckets INT, kl_target_raw DOUBLE rounded-6,
    kl_raw_target DOUBLE rounded-6).
    """
    cnt = _dsir_bucket_counts(docs, target_mod, n_buckets, id_col, text_col)
    tot = cnt.agg(
        F.sum("ct").alias("tt"),
        F.sum("cr").alias("rt"),
        F.count(F.lit(1)).alias("nf"),
    )
    ttb = (F.col("tt") + F.lit(n_buckets)).cast("double")
    rtb = (F.col("rt") + F.lit(n_buckets)).cast("double")
    lam = (
        F.log((F.col("ct") + 1).cast("double"))
        - F.log(ttb)
        - F.log((F.col("cr") + 1).cast("double"))
        + F.log(rtb)
    )
    pt = (F.col("ct") + 1).cast("double") / ttb
    pr = (F.col("cr") + 1).cast("double") / rtb
    terms = cnt.crossJoin(F.broadcast(tot)).select(
        "f",
        "tt",
        "rt",
        "nf",
        (pt * lam).alias("t_term"),
        (pr * (-lam)).alias("r_term"),
    )
    folded = terms.groupBy("tt", "rt", "nf").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("f", "t_term"))),
            F.lit(0.0),
            lambda a, s: a + s["t_term"],
        ).alias("fold_t"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("f", "r_term"))),
            F.lit(0.0),
            lambda a, s: a + s["r_term"],
        ).alias("fold_r"),
    )
    unseen = (F.lit(n_buckets) - F.col("nf")).cast("double")
    lam0 = -F.log(ttb) + F.log(rtb)
    return folded.select(
        F.col("nf").cast("int").alias("active_buckets"),
        F.round(
            F.col("fold_t") + unseen * (F.lit(1.0) / ttb) * lam0, 6
        ).alias("kl_target_raw"),
        F.round(
            F.col("fold_r")
            + unseen * (F.lit(1.0) / rtb) * (F.log(ttb) - F.log(rtb)),
            6,
        ).alias("kl_raw_target"),
    )


def collocations_pmi(
    docs: DataFrame,
    min_count: int = 5,
    top_n: int = 200,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top collocations by pointwise mutual information over adjacent
    token bigrams — the phrase-mining statistic tokenizer/vocab
    induction and stopword-phrase filters run over a pretraining
    corpus (word2vec's phrase pass, NLTK's collocation finders).

    PMI(a,b) = ln( p(a,b) / (p(a) p(b)) ) with p(a,b) over the bigram
    total and p(·) over the token total, computed as a fixed-order sum
    of ln's of EXACT integers (each count is exact in binary64), so
    the score is bit-identical across engines — the same discipline as
    the DSIR/NB log-ratio operators. ``min_count`` drops the unstable
    low-frequency tail (classic PMI degeneracy: a 1-occurrence pair of
    two rare words maxes the score).

    Scale shape: one tokenize pass feeds BOTH aggregations (bigrams by
    row-local zip of the token array with its tail — no second corpus
    scan, no join back to docs); each agg is map-side combined; the
    two grand totals are one broadcast row; selection is
    orderBy+limit (TakeOrderedAndProject — per-partition top-n, never
    a global sort) and the rank window runs over exactly ``top_n``
    rows by construction.

    Output: (left, right, pair_count, pmi DOUBLE rounded-6, rank).
    """
    from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.text import tokenize

    toks = docs.select(tokenize(F.col(text_col)).alias("t"))
    pairs = toks.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("t"), 1, F.greatest(F.size("t") - 1, F.lit(0))),
                F.slice(F.col("t"), 2, F.greatest(F.size("t") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("l"), b.alias("r")),
            )
        ).alias("p")
    ).select(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    big = pairs.groupBy("left", "right").agg(
        F.count(F.lit(1)).alias("pair_count")
    )
    totals = uni.agg(
        F.sum("wc").alias("n_tok"),
    ).crossJoin(big.agg(F.sum("pair_count").alias("n_big")))
    scored = (
        big.filter(F.col("pair_count") >= min_count)
        .join(uni.withColumnRenamed("w", "left"), "left")
        .withColumnRenamed("wc", "c_left")
        .join(uni.withColumnRenamed("w", "right"), "right")
        .withColumnRenamed("wc", "c_right")
        .crossJoin(F.broadcast(totals))
        .select(
            "left",
            "right",
            "pair_count",
            # fixed left-to-right IEEE order, every ln arg an exact int
            (
                F.log(F.col("pair_count").cast("double"))
                + F.log(F.col("n_tok").cast("double"))
                + F.log(F.col("n_tok").cast("double"))
                - F.log(F.col("n_big").cast("double"))
                - F.log(F.col("c_left").cast("double"))
                - F.log(F.col("c_right").cast("double"))
            ).alias("pmi_raw"),
        )
    )
    # constant partition key: the rank window runs over the ALREADY
    # top_n-limited rows (<= 200), so one partition is the intent, not
    # an accident
    w = Window.partitionBy(F.lit(0)).orderBy(
        F.round(F.col("pmi_raw"), 10).desc(),
        F.col("left").asc(),
        F.col("right").asc(),
    )
    return (
        scored.orderBy(
            F.round(F.col("pmi_raw"), 10).desc(),
            F.col("left").asc(),
            F.col("right").asc(),
        )
        .limit(top_n)
        .select(
            "left",
            "right",
            "pair_count",
            F.round(F.col("pmi_raw"), 6).alias("pmi"),
            F.row_number().over(w).alias("rank"),
        )
    )
