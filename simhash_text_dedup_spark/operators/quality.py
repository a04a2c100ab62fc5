"""Composite document-quality filter (Gopher-style rules).

The rule battery of Rae et al. 2021 (Gopher, App. A) / Penedo et al.
2023 (RefinedWeb §3.1), re-expressed over this repo's integer-exact
metric set so every rule is engine-portable (CLAUDE.md rule 4 — no
cross-engine float rounding):

  token-count window, mean-token-length window, minimum stopword hits,
  digit-density cap, duplicate-line cap and modal-bigram cap (the two
  in-document repetition signals from operators/repetition.py).

Output is one row per document with the failing rule names joined into
a stable `reasons` string (empty == keep) — the shape a curation
pipeline writes next to the corpus so downstream mixes can re-slice by
reason without recomputing.

Plan shape (the 100-TB consideration): the per-row rules are pure
whole-stage-codegen column expressions over the document scan; only the
repetition metrics aggregate (explode -> two-level groupBy, map-side
combined, keyed by doc_id) — one corpus exchange total, inherited from
repetition_stats.  The reference analog is the defensive-rejection
kill path (P4, incload/SpamPageGenerate.java) generalized from
exact-dup flooding to in-document quality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simhash_text_dedup_spark.functions.text import (
    avg_token_len_milli,
    digit_permille,
    stopword_hits,
    token_count,
)

from .repetition import repetition_stats


def quality_filter(
    docs: DataFrame,
    *,
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_atl_milli: int = 3_000,
    max_atl_milli: int = 10_000,
    min_stopwords: int = 0,
    max_digit_permille: int = 200,
    max_dup_line_permille: int = 300,
    max_top_bigram_permille: int = 180,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, reasons, keep): every document scored against
    the rule battery; `reasons` is the comma-joined list of failed rule
    names in fixed rule order ('' == clean), keep = no rule failed.

    Defaults follow Gopher App. A where a portable analog exists
    (token window 50..100k, mean token length 3..10, dup-line 30%,
    modal bigram 18%); `min_stopwords` defaults OFF (0) because the
    corpus is multilingual/code and the frozen stopword list is
    English (enable with >= 2 for English-only slices)."""
    t = F.col("text")
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    rep = repetition_stats(base)
    scored = (
        base.select(
            "doc_id",
            token_count(t).alias("n_tokens"),
            avg_token_len_milli(t).alias("atl_milli"),
            stopword_hits(t).alias("stop_hits"),
            digit_permille(t).alias("digit_pm"),
        )
        .join(
            rep.select(
                "doc_id", "dup_line_permille", "top_bigram_permille"
            ),
            "doc_id",
        )
    )
    # concat_ws skips NULLs in BOTH Spark and DuckDB, so the failed
    # rule names join in fixed order with no gaps
    reasons = F.concat_ws(
        ",",
        F.when(F.col("n_tokens") < min_tokens, F.lit("too_few_tokens")),
        F.when(F.col("n_tokens") > max_tokens, F.lit("too_many_tokens")),
        F.when(
            (F.col("atl_milli") < min_atl_milli)
            | (F.col("atl_milli") > max_atl_milli),
            F.lit("token_len"),
        ),
        F.when(F.col("stop_hits") < min_stopwords, F.lit("stopwords")),
        F.when(F.col("digit_pm") > max_digit_permille, F.lit("digits")),
        F.when(
            F.col("dup_line_permille") > max_dup_line_permille,
            F.lit("dup_lines"),
        ),
        F.when(
            F.col("top_bigram_permille") > max_top_bigram_permille,
            F.lit("top_bigram"),
        ),
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        reasons.alias("reasons"),
        (reasons == "").alias("keep"),
    )


def quality_survivors(docs: DataFrame, **kwargs) -> DataFrame:
    """The documents that pass every rule (original schema) — the
    left_semi composition curation jobs chain before dedup."""
    id_col = kwargs.get("id_col", "doc_id")
    flags = quality_filter(docs, **kwargs)
    return docs.join(
        flags.filter(F.col("keep")).select(F.col("doc_id").alias(id_col)),
        id_col,
        "left_semi",
    )
