"""Corpus data-card report: the per-slice statistics table a dataset
release ships with (HuggingFace dataset cards, Dolma/RedPajama corpus
reports) — doc counts, source diversity, size totals, emptiness and
exact-duplication rates per language.

Spark shape: one hash aggregation over the corpus for the per-slice
stats, plus one digest aggregation + join-back for the duplication
rate (duplicate groups are GLOBAL — a doc duplicated across languages
counts in each language's rate).  Everything is built-ins and
integer-exact (permille via integer division), so the whole report is
SQL-twin-verifiable and engine-portable.

Reference anchor: the reference's counter metrics per round
(SURVEY §2 A7) restated as a corpus-level reporting operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import _idiv, token_count


def corpus_report(
    df: DataFrame,
    slice_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """One row per slice_col value:
      n_docs, n_sources (distinct), n_empty (zero-token docs),
      total_chars, total_tokens, mean_tokens (integer),
      n_exact_dup (docs sharing an md5 digest with ANY other doc,
      corpus-global), dup_permille."""
    toks = token_count(F.col(text_col))
    digest = F.md5(F.col(text_col))

    base = df.select(
        F.col(slice_col).alias("slice"),
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        F.length(F.col(text_col)).cast("bigint").alias("n_chars"),
        toks.alias("n_tokens"),
        digest.alias("__digest"),
    )
    # global duplicate digests (tiny relative to the corpus: one row
    # per digest occurring twice or more)
    dup_digests = (
        base.groupBy("__digest")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .select("__digest")
    )
    flagged = base.join(
        dup_digests.withColumn("__dup", F.lit(True)), "__digest", "left"
    )
    per_slice = flagged.groupBy("slice").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum(F.when(F.col("n_tokens") == 0, 1).otherwise(0)).cast("bigint").alias("n_empty"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum(F.when(F.col("__dup"), 1).otherwise(0)).cast("bigint").alias("n_exact_dup"),
    )
    return per_slice.select(
        "slice", "n_docs", "n_sources", "n_empty", "total_chars",
        "total_tokens",
        _idiv(F.col("total_tokens"), F.col("n_docs")).alias("mean_tokens"),
        "n_exact_dup",
        _idiv(F.col("n_exact_dup") * 1000, F.col("n_docs")).alias("dup_permille"),
    )
