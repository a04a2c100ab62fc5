"""Cross-document duplicate-span detection and removal.

The exact-substring dedup step from Lee et al. 2021 ("Deduplicating
Training Data Makes Language Models Better"): long verbatim passages
shared across documents (license headers, quoted articles, templated
sections) are removed from every copy but one, instead of dropping
whole documents.  Their implementation is a monolithic suffix array
over the concatenated corpus; that is the wrong shape for a cluster, so
this operator re-expresses the same contract Spark-first as the
standard n-gram-anchor reduction:

  1. every document explodes to its word ``width``-grams WITH positions
     (map-side, in-row — no state);
  2. one hash aggregation keyed on the gram finds grams occurring in
     ``min_docs``+ distinct documents, and elects the owner (minimum
     doc_id) that will keep its copy;
  3. duplicated gram positions join back (same key — the groupBy's
     hash partitioning is reused, and AQE may broadcast the dup-gram
     table when duplication is sparse) and merge per-document into
     maximal spans with a gaps-and-islands window (two hit grams
     belong to one span iff their starts are <= ``width`` apart, i.e.
     their coverage is contiguous);
  4. ``strip_dup_spans`` drops the covered word positions from every
     non-owner copy and reassembles the survivors in order (the same
     in-row array_sort reassembly as strip_boilerplate_lines — no
     driver collection).

A span reported here is a maximal run of duplicated ``width``-grams,
i.e. a shared passage of >= ``width`` words — the n-gram-anchored
approximation of the suffix-array result (passages shorter than
``width`` words are below the dedup threshold by construction).

Scale shape (the 100-TB consideration): the only corpus-sized exchange
is the gram-key shuffle that the frequency aggregation needs anyway;
with ``hash_grams=True`` the shuffle carries 8-byte xxhash64 keys
instead of gram strings (a >= 5x payload cut at width 8; a hash
collision can only ADD a rare false duplicate anchor, never lose one,
which matches the approximate contract).  Steps 3-4 are keyed by
doc_id — per-document locality, no skew beyond document length.

Reference anchor: the owner-keeps-its-copy rule is the span-level
analog of the reference's keep-first winner selection
(incload/DeDupReduce.java keep/delete actions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .decontaminate import _gram_rows, _ngrams_from_tokens


def _gram_positions(
    corpus: DataFrame, width: int, id_col: str, text_col: str
) -> DataFrame:
    """(doc_id, pos, gram): every word n-gram with its 0-based start
    position; documents shorter than ``width`` words emit nothing.
    The split is materialized once per document (split-once rule, see
    _ngrams_from_tokens)."""
    return _gram_rows(corpus, width, id_col, text_col).select(
        "doc_id",
        F.posexplode(_ngrams_from_tokens(F.col("__toks"), width)).alias(
            "pos", "gram"
        ),
    )


def dup_gram_hits(
    corpus: DataFrame,
    *,
    width: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_grams: bool = False,
) -> DataFrame:
    """(doc_id, pos, owner_doc, n_docs): each position of a word
    ``width``-gram that occurs in >= ``min_docs`` distinct documents,
    tagged with the owning document (minimum doc_id containing the
    gram).  ``hash_grams`` shuffles 8-byte xxhash64 keys instead of
    gram strings (scale path; collisions only add anchors)."""
    g = _gram_positions(corpus, width, id_col, text_col)
    if hash_grams:
        g = g.select("doc_id", "pos", F.xxhash64("gram").alias("gram"))
    dup = (
        g.groupBy("gram")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("owner_doc"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )
    return g.join(dup, "gram").select("doc_id", "pos", "owner_doc", "n_docs")


def dup_spans(
    corpus: DataFrame,
    *,
    width: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_grams: bool = False,
    skip_owned: bool = False,
) -> DataFrame:
    """(doc_id, span_start, span_end, n_grams): maximal duplicated
    spans per document, in word coordinates (span covers words
    [span_start, span_end] inclusive).  With ``skip_owned`` the grams
    this document owns are exempt first — the report then covers only
    non-owned duplication (strip_dup_spans additionally protects word
    positions that an owned gram overlaps, see its docstring)."""
    hits = dup_gram_hits(
        corpus,
        width=width,
        min_docs=min_docs,
        id_col=id_col,
        text_col=text_col,
        hash_grams=hash_grams,
    )
    if skip_owned:
        hits = hits.filter(F.col("doc_id") != F.col("owner_doc"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        hits.select("doc_id", "pos")
        .withColumn(
            "_new_island",
            F.when(
                F.col("pos") - F.lag("pos").over(w) > F.lit(width), F.lit(1)
            ).otherwise(F.lit(0)),
        )
        .withColumn("_island", F.sum("_new_island").over(run))
        .groupBy("doc_id", "_island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(width - 1)).alias("span_end"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .select("doc_id", "span_start", "span_end", "n_grams")
    )


def strip_dup_spans(
    corpus: DataFrame,
    *,
    width: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_grams: bool = False,
) -> DataFrame:
    """(doc_id, n_words, n_removed, stripped_text): every word position
    covered by a duplicated gram this document does NOT own — and by no
    gram it DOES own — is removed.  The owned-position exemption is the
    survival guarantee: each duplicated gram's words are protected in
    its owner document, so every shared passage survives somewhere.
    Without it, overlapping grams with DIFFERENT owners could delete
    every copy of a passage corpus-wide (doc A owns the left gram,
    doc B the right one, a third doc owns neither: removing all
    non-owned positions in A and B kills the overlap in both).
    Survivors rejoin by ' ' in original order (single-space
    tokenization round-trips exactly, concat_ws keeps empty tokens)."""
    hits = dup_gram_hits(
        corpus,
        width=width,
        min_docs=min_docs,
        id_col=id_col,
        text_col=text_col,
        hash_grams=hash_grams,
    ).localCheckpoint(eager=False)

    def _positions(df):
        return df.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(width - 1))
            ).alias("wpos"),
        ).distinct()

    covered = _positions(
        hits.filter(F.col("doc_id") != F.col("owner_doc"))
    ).join(
        _positions(hits.filter(F.col("doc_id") == F.col("owner_doc"))),
        ["doc_id", "wpos"],
        "left_anti",
    )
    words = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("wpos", "word"),
    )
    kept = words.join(covered.withColumn("_cut", F.lit(True)), ["doc_id", "wpos"], "left")
    return (
        kept.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.col("_cut").isNotNull().cast("bigint")).alias("n_removed"),
            F.array_sort(
                F.collect_list(
                    F.when(F.col("_cut").isNull(), F.struct("wpos", "word"))
                )
            ).alias("__kept"),
        )
        .select(
            "doc_id",
            F.col("n_words").cast("bigint").alias("n_words"),
            F.col("n_removed").cast("bigint").alias("n_removed"),
            F.concat_ws(" ", F.expr("transform(__kept, s -> s.word)")).alias(
                "stripped_text"
            ),
        )
    )
