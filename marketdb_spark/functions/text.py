"""Text-analysis column functions for LLM training-data pipelines
(SURVEY §2B [N]): tokenization, stats, language-ID heuristic, document
fingerprinting. All pure `pyspark.sql.functions` compositions — JVM-side,
codegen'd, no Python UDFs in the hot path — so they run at 100 TB without
serialization overhead, and every one has an exact DuckDB-SQL equivalent
for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword lists for the n-gram-free language-ID heuristic. Deliberately
# tiny and deterministic — the point is the operator shape (per-language
# token-overlap scoring), not linguistic accuracy.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "fr": ("le", "la", "et", "les", "des", "un", "une"),
    "es": ("el", "los", "las", "y", "una", "que", "por"),
    "de": ("der", "die", "das", "und", "ein", "nicht", "ist"),
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization, empty tokens removed."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, r"\s+"), lambda t: t != F.lit(""))


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("bigint")


def punct_count(text: Column | str) -> Column:
    """Count of punctuation chars from a fixed class (stable across engines)."""
    c = F.col(text) if isinstance(text, str) else text
    return (
        F.length(c) - F.length(F.regexp_replace(c, r"[.,!?;:]", ""))
    ).cast("bigint")


def avg_token_len(text: Column | str) -> Column:
    """Mean token length: int/int → one double division (deterministic)."""
    c = F.col(text) if isinstance(text, str) else text
    n = token_count(c)
    total = F.length(F.regexp_replace(c, r"\s+", ""))
    return F.when(n > 0, total.cast("double") / n).otherwise(F.lit(None))


def stopword_score(text_tokens: Column, lang: str) -> Column:
    """Number of tokens that are stopwords of ``lang`` (with multiplicity)."""
    words = LANG_STOPWORDS[lang]
    return F.size(F.filter(text_tokens, lambda t: t.isin(*words))).cast("bigint")


def language_id(text: Column | str) -> Column:
    """Pick the language whose stopword hit-count is highest; ties resolve
    to the lexicographically LAST language code (array_max over
    (score, lang) structs — the DuckDB oracle's CASE ordering in
    _LANG_ORACLE deliberately mirrors this); all-zero → 'und'."""
    toks = tokens(text)
    scored = F.array(
        *[
            F.struct(
                stopword_score(toks, lang).alias("score"),
                # struct max = (highest score, then lexicographically LAST
                # lang) — keep _LANG_ORACLE's CASE order in sync
                F.lit(lang).alias("lang"),
            )
            for lang in sorted(LANG_STOPWORDS)
        ]
    )
    best = F.array_max(
        F.filter(scored, lambda s: s["score"] > 0)
    )  # max by (score, lang); null if none positive
    return F.coalesce(best["lang"], F.lit("und"))


def normalize_text(text: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace,
    trim. Mirrors exact-dedup normalization used across the pipeline."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    (md5 is identical across Spark and DuckDB, making this oracle-exact;
    content-defined, so re-ingest is idempotent — the reference's
    deterministic row+qualifier identity, Trade.scala:56-57.)"""
    return F.md5(normalize_text(text))


def token_hash64(token: Column) -> Column:
    """Portable 60-bit token hash: first 15 hex digits of md5, as BIGINT.
    Used by minhash — chosen over xxhash64 because the DuckDB oracle can
    compute the identical value."""
    return F.conv(F.substring(F.md5(token), 1, 15), 16, 10).cast("bigint")
