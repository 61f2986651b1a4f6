"""Text-analysis functions for training-data pipelines: token
counting, quality scoring, language ID, document fingerprinting.

All built-in-expression columns over the ``documents`` table — no
UDFs, shuffle-free per-row work, and every one of them is renderable
as ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from finding_similar_high_dimensional_items_for_big_data_sets_spark.config import MERSENNE31
from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.hashing import (
    portable_hash64,
)
from finding_similar_high_dimensional_items_for_big_data_sets_spark.functions.text import tokenize

# Tiny deterministic stopword lists per language for the heuristic
# language scorer. Chosen from high-frequency closed-class words.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr": ("le", "la", "de", "et", "un", "est", "que", "en"),
    "zh": ("de5", "shi4", "le5", "zai4", "wo3", "you3", "he2", "ren2"),
}

ENGLISH_STOPWORDS = LANG_MARKERS["en"] + ("that", "was", "for", "on", "with")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokenize(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-flavored token estimate: count word-piece-like units — runs
    of letters, runs of digits, and single punctuation marks — via a
    tokenizer regex. A deterministic proxy for subword token counts.
    """
    pieces = F.regexp_extract_all(
        text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0
    )
    return F.size(pieces)


def char_count(text: Column) -> Column:
    return F.length(text)


def avg_word_length(text: Column) -> Column:
    toks = tokenize(text)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio(text: Column) -> Column:
    """Fraction of non-space characters that are punctuation."""
    nospace = F.regexp_replace(text, r"\s+", "")
    punct = F.length(F.regexp_replace(nospace, r"[A-Za-z0-9]", ""))
    return F.when(F.length(nospace) > 0, punct / F.length(nospace)).otherwise(F.lit(0.0))


def stopword_ratio(text: Column, stopwords: tuple[str, ...] = ENGLISH_STOPWORDS) -> Column:
    toks = tokenize(F.lower(text))
    sw = F.array(*[F.lit(s) for s in stopwords])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def distinct_token_ratio(text: Column) -> Column:
    """Lexical diversity: distinct/total tokens (low => boilerplate)."""
    toks = tokenize(text)
    return F.when(
        F.size(toks) > 0, F.size(F.array_distinct(toks)) / F.size(toks)
    ).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0, 1]: rewards reasonable
    length, lexical diversity, and low punctuation noise.

    score = 0.4 * min(1, tokens/50) + 0.4 * distinct_ratio
          + 0.2 * (1 - min(1, 4 * punct_ratio))
    """
    n = token_count(text)
    return (
        0.4 * F.least(F.lit(1.0), n / F.lit(50.0))
        + 0.4 * distinct_token_ratio(text)
        + 0.2 * (F.lit(1.0) - F.least(F.lit(1.0), 4.0 * punct_ratio(text)))
    )


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language marker-hit counts for the heuristic classifier."""
    toks = tokenize(F.lower(text))
    out = {}
    for lang, markers in LANG_MARKERS.items():
        marr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(marr, t)))
    return out


def lang_id(text: Column) -> Column:
    """Heuristic language ID: language with the most marker hits;
    'und' (undetermined) when no marker appears. Ties resolved by
    language-code order (deterministic)."""
    scores = lang_scores(text)
    pairs = F.array(
        *[
            F.struct(scores[lang].alias("hits"), F.lit(lang).alias("lang"))
            for lang in sorted(LANG_MARKERS)
        ]
    )
    ordered = F.array_sort(pairs)  # ascending (hits, lang)
    top_hits = F.element_at(ordered, -1)["hits"]
    winner = F.element_at(
        F.filter(ordered, lambda p: p["hits"] == top_hits), 1
    )["lang"]
    return F.when(top_hits > 0, winner).otherwise(F.lit("und"))


def doc_fingerprint(text: Column) -> Column:
    """Order-sensitive rolling document fingerprint: fold the portable
    hash of each token into an accumulator mod 2^31-1.

        fp = fold(tokens, 0, (acc, t) -> (acc * 31 + H(t)) mod p)

    Detects exact token-sequence duplicates irrespective of extra
    whitespace; cheap enough to run on every document at ingest.
    """
    toks = tokenize(text)
    return F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: F.pmod(
            acc * 31 + F.pmod(portable_hash64(t), F.lit(MERSENNE31)),
            F.lit(MERSENNE31),
        ),
    )


def word_ngram_multiset(tokens: Column, n: int) -> Column:
    """All word n-grams in document order, WITH multiplicity (unlike
    ``text.word_shingles``, which dedups and falls back to the whole
    doc for short inputs). Documents with fewer than ``n`` tokens
    yield an empty array — repetition over an n-gram needs at least
    one n-gram to exist.
    """
    if n <= 0:
        raise ValueError("n must be >= 1")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(tokens) - F.lit(n - 1)),
        lambda i: F.array_join(F.slice(tokens, i, n), " "),
    )
    return F.when(F.size(tokens) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def top_ngram_count(grams: Column) -> Column:
    """Multiplicity of the most frequent element (0 for empty input).

    Row-local O(d*m) over d distinct / m total grams — no explode, no
    shuffle; documents are short (hundreds of tokens), so the quadratic
    per-row term is constant-bounded and the corpus pass stays linear.
    """
    return F.aggregate(
        F.array_distinct(grams),
        F.lit(0),
        lambda acc, g: F.greatest(
            acc, F.size(F.filter(grams, lambda x: x == g))
        ),
    )


def dup_ngram_occurrences(grams: Column) -> Column:
    """Number of gram OCCURRENCES whose value appears >= 2 times in the
    document (Gopher-style "duplicate n-gram fraction" numerator).
    The multiplicity scan runs once per distinct gram (transform to
    counts first, then fold) — not once per fold reference."""
    counts = F.transform(
        F.array_distinct(grams),
        lambda g: F.size(F.filter(grams, lambda x: x == g)),
    )
    return F.aggregate(
        counts,
        F.lit(0),
        lambda acc, c: acc + F.when(c >= 2, c).otherwise(F.lit(0)),
    )


def token_entropy(tokens: Column) -> Column:
    """Shannon entropy (nats) of the document's token distribution:
    ``ln(n) - (1/n) * sum_t c_t * ln(c_t)`` over token counts c_t.
    0.0 for empty documents; 0.0 for single-token-type documents;
    ln(n) for all-distinct documents. A boilerplate/keyword-stuffing
    quality signal complementary to ``distinct_token_ratio`` (entropy
    sees the SHAPE of the repetition, not just its amount).

    Float-parity discipline: the fold runs over the SORTED distinct
    tokens so the summation order is identical in every engine and at
    any partitioning (IEEE addition is order-sensitive); callers round
    the result before comparisons (oracle rounds to 6 decimals).
    Row-local higher-order functions only — shuffle-free.
    """
    n = F.size(tokens)
    counts = F.transform(
        F.array_sort(F.array_distinct(tokens)),
        lambda tok: F.size(F.filter(tokens, lambda x: x == tok)).cast("double"),
    )
    s = F.aggregate(
        counts, F.lit(0.0), lambda acc, c: acc + c * F.log(c)
    )
    return F.when(n > 0, F.log(n.cast("double")) - s / n).otherwise(F.lit(0.0))


# PII patterns (pii_scrub). One dialect-portable subset of Java regex
# and RE2: character classes, bounded repetition, and \b word
# boundaries only — no lookaround, no backreferences, so Spark's
# java.util.regex and DuckDB's RE2 agree on every match. Both engines
# treat \d as ASCII digits by default.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
}


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind PII match counts over the ORIGINAL text (so a phone
    number inside an email's local part counts under both kinds —
    counts are independent detectors, not a partition of the text).
    Row-local ``regexp_count``, shuffle-free."""
    return {
        kind: F.regexp_count(text, F.lit(pat)).cast("int")
        for kind, (pat, _) in PII_PATTERNS.items()
    }


def pii_redact(text: Column) -> Column:
    """Replace every PII match with its placeholder token, applying
    the patterns in ``PII_PATTERNS`` insertion order (email first, so
    an address containing an IP-shaped domain is redacted whole rather
    than leaving ``user@<IP>`` fragments). Deterministic: both engines
    apply global replacement left-to-right per pattern."""
    out = text
    for pat, token in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, token)
    return out
