"""Repetition statistics and corpus-level boilerplate-line removal.

Two curation operators a training-data pipeline runs next to the
near-dup pass (both are public-literature heuristics, re-expressed as
Spark aggregation plans):

- ``repetition_stats``: per-document repetition flags in the style of
  the Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
  Methods, Analysis & Insights from Training Gopher", App. A —
  duplicate-line fraction, duplicate-line character fraction, top
  word-bigram mass).  Documents dominated by one repeated line or
  n-gram are low-quality templating/spam; the reference's spam
  pre-pass (incload/SpamPageGenerate.java:61-90) kills the exact-dup
  flavor of the same pathology, this operator scores the in-document
  flavor.
- ``strip_boilerplate_lines``: corpus-level line dedup (the
  CCNet/C4-style boilerplate rule: a line occurring in more than
  ``max_line_occurrences`` documents is navigation/footer chrome, not
  content) — drop such lines from every document, preserving the
  original order of the survivors.

Plan shape (the 100-TB consideration): per-document modal counts are
computed by explode -> two-level groupBy, NOT per-row O(len^2)
``array_filter`` scans — partial aggregation combines counts map-side,
so the (doc, line/bigram) shuffle carries at most one record per
distinct value per document, and the corpus-wide line-frequency table
in ``strip_boilerplate_lines`` is a plain hash aggregation on the line
value (never collected to the driver; joined back by key, AQE free to
broadcast it when small).  Every metric is integer-exact permille
(CLAUDE.md rule 4: cross-engine float round() disagrees), so the
DuckDB oracle reproduces the output bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simhash_text_dedup_spark.functions.text import _idiv


def _zero_guard_permille(num, den):
    """1000 * num div den, 0 when den is NULL or 0 (exact integers)."""
    return F.when(
        den.isNull() | (den == 0), F.lit(0).cast("bigint")
    ).otherwise(_idiv(num * 1000, den))


def repetition_stats(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_lines, dup_line_permille, dup_line_char_permille,
    n_bigrams, top_bigram_permille) per document.

    Frozen metric spec (shared with the SQL oracle):
    - lines = text split on \\n (empty text is one empty line);
    - dup_line_permille = 1000 * (line occurrences beyond each first
      occurrence) div n_lines;
    - dup_line_char_permille = 1000 * (characters on lines whose value
      occurs more than once in the doc) div (total line characters);
    - bigrams = adjacent whitespace-token pairs; top_bigram_permille =
      1000 * (count of the most frequent bigram) div n_bigrams.
    """
    d = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))

    per_line = (
        d.select("doc_id", F.explode(F.split("text", "\n")).alias("line"))
        .groupBy("doc_id", "line")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("chars", F.length("line").cast("bigint"))
    )
    line_agg = per_line.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_lines"),
        (F.sum("cnt") - F.count(F.lit(1))).alias("dup_occ"),
        F.sum(F.col("cnt") * F.col("chars")).alias("total_chars"),
        F.sum(
            F.when(F.col("cnt") > 1, F.col("cnt") * F.col("chars")).otherwise(
                F.lit(0)
            )
        ).alias("dup_chars"),
    )

    # adjacent-token bigrams stay inside the row (zip of two slices —
    # no index arithmetic after the explode), then one (doc, bigram)
    # aggregation for the modal count
    toks = F.split("text", " ")
    bigrams = F.zip_with(
        F.expr("slice(__toks, 1, greatest(size(__toks) - 1, 0))"),
        F.expr("slice(__toks, 2, greatest(size(__toks) - 1, 0))"),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    per_bg = (
        d.withColumn("__toks", toks)
        .select("doc_id", F.explode(bigrams).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    bg_agg = per_bg.groupBy("doc_id").agg(
        F.max("cnt").alias("top_cnt"), F.sum("cnt").alias("n_bg")
    )

    # every doc has >= 1 line (split('') == ['']), so line_agg is the
    # spine; docs with < 2 tokens simply have no bigram row
    return (
        line_agg.join(bg_agg, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_lines").cast("bigint").alias("n_lines"),
            _zero_guard_permille(F.col("dup_occ"), F.col("n_lines")).alias(
                "dup_line_permille"
            ),
            _zero_guard_permille(
                F.col("dup_chars"), F.col("total_chars")
            ).alias("dup_line_char_permille"),
            F.coalesce(F.col("n_bg"), F.lit(0)).cast("bigint").alias(
                "n_bigrams"
            ),
            _zero_guard_permille(F.col("top_cnt"), F.col("n_bg")).alias(
                "top_bigram_permille"
            ),
        )
    )


def strip_boilerplate_lines(
    docs: DataFrame,
    *,
    max_line_occurrences: int = 2,
    min_line_chars: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level boilerplate removal: drop every line whose exact
    value appears in the corpus more than ``max_line_occurrences``
    times AND is at least ``min_line_chars`` long (short/empty lines
    are structural, not boilerplate — kept).  Returns
    (doc_id, n_lines, n_kept, kept_text) with surviving lines
    rejoined by \\n in their original order.

    Three exchanges total, all keyed aggregations: (1) corpus-wide
    line-frequency hash agg (map-side combined — the frequency table
    is one row per distinct line, not per occurrence), (2) the
    frequency join back onto the exploded lines (AQE may broadcast the
    hot-line table: rows above the threshold are a tiny minority), and
    (3) the per-document reassembly agg.  Order is restored with an
    in-row array_sort over (pos, line) structs — no window functions,
    no driver collection.
    """
    d = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    lines = d.select(
        "doc_id", F.posexplode(F.split("text", "\n")).alias("pos", "line")
    )

    # corpus-wide frequency of each boilerplate-eligible line value
    hot = (
        lines.filter(F.length("line") >= min_line_chars)
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("occ"))
        .filter(F.col("occ") > max_line_occurrences)
        .select("line", F.lit(True).alias("is_hot"))
    )

    kept = (
        lines.join(hot, "line", "left")
        .withColumn("keep", F.col("is_hot").isNull())
    )
    return (
        kept.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("keep").cast("bigint")).alias("n_kept"),
            F.array_sort(
                F.collect_list(
                    F.when(F.col("keep"), F.struct("pos", "line")).otherwise(
                        F.lit(None)
                    )
                )
            ).alias("__kept_lines"),
        )
        .select(
            "doc_id",
            F.col("n_lines").cast("bigint").alias("n_lines"),
            F.col("n_kept").cast("bigint").alias("n_kept"),
            F.concat_ws(
                "\n", F.expr("transform(__kept_lines, s -> s.line)")
            ).alias("kept_text"),
        )
    )
