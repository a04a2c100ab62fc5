"""Corpus-wide n-gram vocabulary statistics.

The corpus-frequency table a tokenizer-training / vocabulary-analysis
step needs (the counting pass under BPE/WordPiece training, and the
corpus-stats reports in Gopher/RefinedWeb appendices): for each word
n-gram of a given width, its total occurrence count and document
frequency, with a deterministic global top-k.

Plan shape (the 100-TB consideration): occurrences and document
frequency come from ONE two-level aggregation — (gram, doc) partial
counts combine map-side, then one exchange on the gram key folds both
the occurrence sum and the distinct-doc count; the global top-k is
orderBy().limit(), which compiles to TakeOrderedAndProject
(per-partition heap + driver merge of k rows — no full-sort shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .decontaminate import _gram_rows, _ngrams_from_tokens


def top_ngrams(
    corpus: DataFrame,
    *,
    width: int = 1,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(gram, n_occurrences, n_docs, rank): the k most frequent word
    ``width``-grams corpus-wide; ties broken by gram value so the
    ranking is total and engine-portable."""
    per_doc = (
        _gram_rows(corpus, width, id_col, text_col)
        .select(
            "doc_id",
            F.explode(_ngrams_from_tokens(F.col("__toks"), width)).alias(
                "gram"
            ),
        )
        .groupBy("gram", "doc_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    totals = per_doc.groupBy("gram").agg(
        F.sum("cnt").alias("n_occurrences"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    w = (
        totals.orderBy(F.col("n_occurrences").desc(), "gram")
        .limit(k)
    )
    # rank assigned AFTER the top-k cut: the window runs over k rows,
    # not the vocabulary
    from pyspark.sql import Window

    rank_w = Window.orderBy(F.col("n_occurrences").desc(), "gram")
    return w.withColumn("rank", F.row_number().over(rank_w)).select(
        "gram",
        F.col("n_occurrences").cast("bigint").alias("n_occurrences"),
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("rank").cast("bigint").alias("rank"),
    )
