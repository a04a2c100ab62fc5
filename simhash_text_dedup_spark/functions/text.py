"""Text-analysis column functions for training-data pipelines.

All JVM-side built-ins (whole-stage codegen) — no UDFs. Each function is
designed to have an exact ANSI-SQL equivalent (DuckDB-oracle-checkable):
token counting, quality scoring, language-ID heuristic, and a
rolling-hash document fingerprint (the reference's docid-digest analog,
spider/common/util/MD5.java:89-113 → here xxhash64).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A tiny frozen stopword list shared with the SQL oracle (language-id +
# quality heuristics). Deliberately small so the SQL stays readable.
STOPWORDS_EN = ["the", "of", "and", "to", "in", "is", "for", "that", "with", "a"]


def token_count(text: Column) -> Column:
    """Whitespace-token count (empty string -> 0). SQL equivalent:
    CASE WHEN text = '' THEN 0 ELSE len(string_split(text, ' ')) END."""
    return (
        F.when(text == "", F.lit(0))
        .otherwise(F.size(F.split(text, " ")))
        .cast("bigint")
    )


def avg_token_len(text: Column) -> Column:
    """Mean token length over whitespace tokens, 0.0 for empty text."""
    n = token_count(text)
    # total non-space chars = length - (tokens - 1) separators
    return F.round(
        F.when(n == 0, F.lit(0.0)).otherwise(
            (F.length(text) - (n - F.lit(1))) / n
        ),
        4,
    )


def digit_ratio(text: Column) -> Column:
    """Fraction of characters that are digits, 0.0 for empty text."""
    stripped = F.regexp_replace(text, "[0-9]", "")
    return F.round(
        F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
            (F.length(text) - F.length(stripped)) / F.length(text)
        ),
        4,
    )


def stopword_hits(text: Column) -> Column:
    """Number of whitespace tokens that are frozen English stopwords."""
    toks = F.split(text, " ")
    return F.size(F.filter(toks, lambda t: t.isin(STOPWORDS_EN))).cast("bigint")


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0, 1]: favors mid-length tokens,
    penalizes digit soup. Frozen formula (shared with the SQL oracle)."""
    atl = avg_token_len(text)
    return F.round(
        F.greatest(
            F.lit(0.0),
            F.least(
                F.lit(1.0),
                F.lit(1.0)
                - F.abs(atl - F.lit(5.0)) / F.lit(10.0)
                - digit_ratio(text),
            ),
        ),
        4,
    )


# --- integer-exact (permille) variants -------------------------------
# Cross-engine float round() implementations disagree at decimal
# boundaries (observed: DuckDB round(0.92104999..., 4) -> 0.9211 vs
# Spark/Python -> 0.921). These variants use only exact integer
# arithmetic, so any ANSI-SQL engine reproduces them bit-for-bit.

def _idiv(num: Column, den: Column) -> Column:
    """Exact integer division for non-negative longs."""
    return ((num - F.pmod(num, den)) / den).cast("bigint")


def avg_token_len_milli(text: Column) -> Column:
    """floor(1000 * mean token length); 0 for empty text."""
    n = token_count(text)
    total_chars = (F.length(text) - (n - F.lit(1))).cast("bigint")
    return F.when(n == 0, F.lit(0).cast("bigint")).otherwise(
        _idiv(total_chars * 1000, n)
    )


def digit_permille(text: Column) -> Column:
    """floor(1000 * digit ratio); 0 for empty text."""
    stripped = F.regexp_replace(text, "[0-9]", "")
    n_digits = (F.length(text) - F.length(stripped)).cast("bigint")
    return F.when(F.length(text) == 0, F.lit(0).cast("bigint")).otherwise(
        _idiv(n_digits * 1000, F.length(text).cast("bigint"))
    )


def quality_permille(text: Column) -> Column:
    """Integer quality score in [0, 1000]: favors ~5-char tokens,
    penalizes digit soup. quality = 1000 - |atl_milli - 5000| div 10
    - digit_permille, clamped."""
    atl = avg_token_len_milli(text)
    penalty = _idiv(F.abs(atl - F.lit(5000)), F.lit(10))
    return F.greatest(
        F.lit(0).cast("bigint"),
        F.least(
            F.lit(1000).cast("bigint"),
            (F.lit(1000) - penalty - digit_permille(text)).cast("bigint"),
        ),
    )


def doc_fingerprint(text: Column) -> Column:
    """64-bit rolling document fingerprint (content digest), JVM-side."""
    return F.xxhash64(text)


def doc_fingerprint_md5(text: Column, hex_chars: int = 15) -> Column:
    """60-bit MD5-prefix content fingerprint (the reference's digest
    docid is MD5-based, spider/common/util/MD5.java:89-113).  Unlike
    xxhash64, MD5 is standardized across engines, so this variant is
    exactly SQL-reproducible; 15 hex chars = 60 bits keeps the value
    inside a signed BIGINT.  Doubles as the key for deterministic
    hash sampling (fp % k == r selects a uniform, reproducible,
    engine-independent slice)."""
    return F.conv(F.substring(F.md5(text), 1, hex_chars), 16, 10).cast("bigint")
