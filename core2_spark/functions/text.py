"""Text-analysis column functions for training-data pipelines
(SURVEY.md §2.12) — all pure Catalyst column algebra (no UDFs in the
hot path), so they codegen and scale linearly with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language
# heuristic.  Deterministic and SQL-expressible so the DuckDB oracle
# can replicate scoring exactly.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "y", "que", "en", "un"),
    "fr": ("le", "la", "de", "et", "un", "une", "que"),
    "de": ("der", "die", "das", "und", "ein", "zu", "ist"),
}

# BPE-ish pre-tokenization: word pieces, numbers, or single punctuation.
BPE_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization."""
    return F.split(F.trim(text), " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("bigint")


def bpe_token_count(text: Column) -> Column:
    """Token count under the BPE-ish regex pre-tokenizer."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_REGEX), F.lit(0))).cast("bigint")


def stopword_hits(text: Column, lang: str) -> Column:
    """How many tokens are stopwords of ``lang``."""
    words = STOPWORDS[lang]
    toks = tokens(F.lower(text))

    # `x IN (words)` as a chain of equality ORs (codegen-friendly).
    def is_stop(x: Column) -> Column:
        out = x == F.lit(words[0])
        for w in words[1:]:
            out = out | (x == F.lit(w))
        return out

    return F.size(F.filter(toks, is_stop)).cast("bigint")


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: length band + alpha ratio +
    mean-token-length band.  Deterministic column algebra."""
    n_chars = F.length(text).cast("double")
    n_toks = token_count(text).cast("double")
    alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", "")).cast("double")
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
    mean_tok_len = F.when(n_toks > 0, n_chars / n_toks).otherwise(F.lit(0.0))
    len_band = F.when((n_toks >= 5) & (n_toks <= 1000), F.lit(1.0)).otherwise(F.lit(0.3))
    tok_band = F.when((mean_tok_len >= 3) & (mean_tok_len <= 12), F.lit(1.0)).otherwise(
        F.lit(0.5)
    )
    return (0.4 * len_band + 0.3 * alpha_ratio + 0.3 * tok_band).cast("double")


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text
    (lowercase, collapsed whitespace) — the exact-dedup key."""
    normalized = F.regexp_replace(F.lower(F.trim(text)), "\\s+", " ")
    return F.md5(normalized)
