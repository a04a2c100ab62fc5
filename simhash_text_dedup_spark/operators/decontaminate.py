"""Benchmark decontamination: flag corpus documents that share word
n-grams with a (small) evaluation/benchmark set.

The public training-data hygiene step (GPT-3 appendix C / Gopher
App. A style): before training, any document overlapping an eval
benchmark by an exact n-gram is removed so the benchmark stays held
out.  This is a different contract from near-dup detection — the probe
side is a FIXED SMALL set and the match is exact-substring-shaped
(shared n-gram), not similarity-shaped.

Plan shape (the 100-TB consideration): the benchmark n-gram set is
tiny (thousands of docs) and is distinct-ed then BROADCAST; the corpus
side streams — each document row expands to its n-gram positions
map-side, hash-joins against the broadcast set with no shuffle of the
corpus, and the per-document hit count folds back with one partial
aggregation on doc_id.  Nothing corpus-sized is ever exchanged on a
text key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _word_ngrams(text_col: str, width: int) -> F.Column:
    """Array of whitespace-word n-grams of the given width (in-row;
    empty when the document has fewer than `width` tokens).  The
    sequence bound is guarded: Spark's sequence(1, n) runs DESCENDING
    for n < 1 rather than returning an empty array."""
    return F.expr(
        f"CASE WHEN size(split({text_col}, ' ')) < {width}"
        f" THEN array()"
        f" ELSE transform("
        f"   sequence(1, size(split({text_col}, ' ')) - {width} + 1),"
        f"   i -> concat_ws(' ', slice(split({text_col}, ' '), i, {width})))"
        f" END"
    )


def contaminated_docs(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    ngram_width: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_hits): corpus documents sharing at least one exact
    word n-gram with the benchmark set; n_hits counts the overlapping
    n-gram POSITIONS in the document (a repeated contaminated gram
    counts each occurrence).  Decontaminate by anti-joining this
    result against the corpus."""
    bench_grams = (
        benchmark.select(
            F.explode(_word_ngrams(text_col, ngram_width)).alias("gram")
        )
        .distinct()
    )
    corpus_grams = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_word_ngrams(text_col, ngram_width)).alias("gram"),
    )
    return (
        corpus_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    ngram_width: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The corpus minus every contaminated document (left_anti on the
    hit list — same schema as the input corpus)."""
    hits = contaminated_docs(
        corpus, benchmark, ngram_width=ngram_width,
        id_col=id_col, text_col=text_col,
    )
    return corpus.join(
        hits.withColumnRenamed("doc_id", id_col).select(id_col),
        id_col,
        "left_anti",
    )
