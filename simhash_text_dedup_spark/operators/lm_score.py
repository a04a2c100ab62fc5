"""CCNet-style n-gram language-model quality scoring.

CCNet (Wenzek et al. 2020) scores every document with a language-model
perplexity and cuts the corpus into head/middle/tail quality buckets at
the perplexity terciles; the head bucket feeds training.  This operator
restates that pipeline distributively and integer-exactly:

- ``train_ngram_lm``: an MLE word-n-gram model as a
  (prefix, gram, c_gram, c_prefix) count table built from ONE gram-key
  aggregation (partial counts combine map-side; the prefix totals fold
  from the vocabulary-sized count table, never from the corpus again).
- ``lm_score``: per-document mean conditional probability in permille.
  Integer arithmetic only — a float log-prob/perplexity would
  hash-drift across libm implementations (CLAUDE.md rule 4), and the
  permille mean orders documents the same way for bucketing.  Default
  add-1 smoothing (the integer-exact stand-in for KenLM's Kneser-Ney):
  unsmoothed self-trained MLE assigns probability 1 to every singleton
  continuation, so unique junk scores PERFECT — smoothing shifts mass
  toward frequent grams, which is the quality signal.  ``add_k=0``
  gives pure MLE with unseen grams contributing 0.
- ``lm_quality_buckets``: head/middle/tail assignment via VALUE
  thresholds read off the score histogram.  Scores live in [0, 1000],
  so the histogram has at most 1001 rows — the tercile cut points come
  from a running sum over that tiny table, never a global
  row_number/ntile over the corpus (the one-partition window a naive
  port would use is exactly the quota_topk scale-killer fixed in
  round 2).  Documents tied at a cut all take the higher bucket, so
  assignment is a pure per-row predicate — deterministic and
  engine-portable under ties.

Plan shape (the 100-TB consideration): scoring joins the corpus gram
stream to the LM table on the gram key — the LM table is
vocabulary-sized (NOT broadcastable at web scale), so this is a plain
shuffle join on a short string key with AQE free to broadcast it when
small; the per-document fold is a hash aggregation with map-side
combine.  The three bucket thresholds are scalars and broadcast.

Reference anchor: the reference scores pages with composite quality
signals before selection (DeDupMapper.java score plumbing); this is the
public LM-based analog used by CCNet/RefinedWeb-style curation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import _idiv


def _prefix_gram_rows(
    corpus: DataFrame, width: int, id_col: str, text_col: str
) -> DataFrame:
    """(doc_id, prefix, gram): one row per word n-gram position, with
    the (width-1)-word prefix alongside.  The token split is
    materialized in its own projection (referencing split(text) inside
    the transform lambda re-splits per element — quadratic per doc,
    see decontaminate._gram_rows)."""
    if width < 2:
        raise ValueError("lm width must be >= 2 (conditional model)")
    toks = F.col("__toks")
    n = F.size(toks)
    positions = F.when(
        n < width, F.array().cast("array<int>")
    ).otherwise(F.sequence(F.lit(1), (n - F.lit(width) + F.lit(1)).cast("int")))
    return (
        corpus.select(
            F.col(id_col).alias("doc_id"),
            F.split(F.col(text_col), " ").alias("__toks"),
        )
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    positions,
                    lambda i: F.struct(
                        F.concat_ws(" ", F.slice(toks, i, width - 1)).alias(
                            "prefix"
                        ),
                        F.concat_ws(" ", F.slice(toks, i, width)).alias(
                            "gram"
                        ),
                    ),
                )
            ).alias("__s"),
        )
        .select("doc_id", F.col("__s.prefix").alias("prefix"),
                F.col("__s.gram").alias("gram"))
    )


def train_ngram_lm(
    corpus: DataFrame,
    *,
    width: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(prefix, gram, c_gram, c_prefix): MLE word-``width``-gram counts.
    P(last word | prefix) = c_gram / c_prefix, kept as exact integers so
    scoring stays engine-portable."""
    counts = (
        _prefix_gram_rows(corpus, width, id_col, text_col)
        .groupBy("prefix", "gram")
        .agg(F.count(F.lit(1)).alias("c_gram"))
    )
    prefix_totals = counts.groupBy("prefix").agg(
        F.sum("c_gram").alias("c_prefix")
    )
    return counts.join(prefix_totals, "prefix").select(
        "prefix",
        "gram",
        F.col("c_gram").cast("bigint").alias("c_gram"),
        F.col("c_prefix").cast("bigint").alias("c_prefix"),
    )


def _doc_gram_only_counts(
    corpus: DataFrame, width: int, id_col: str, text_col: str
) -> DataFrame:
    """(doc_id, gram, n) WITHOUT the prefix column: the prefix is a
    function of the gram (its first width-1 space-joined tokens —
    tokens are split on ' ' so they contain no spaces), so shuffling it
    alongside every gram position is pure payload (guide §2.3).  The
    self-trained scoring path re-derives it vocab-sized via
    substring_index AFTER the aggregation."""
    if width < 2:
        raise ValueError("lm width must be >= 2 (conditional model)")
    toks = F.col("__toks")
    n = F.size(toks)
    positions = F.when(
        n < width, F.array().cast("array<int>")
    ).otherwise(F.sequence(F.lit(1), (n - F.lit(width) + F.lit(1)).cast("int")))
    return (
        corpus.select(
            F.col(id_col).alias("doc_id"),
            F.split(F.col(text_col), " ").alias("__toks"),
        )
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    positions,
                    lambda i: F.concat_ws(" ", F.slice(toks, i, width)),
                )
            ).alias("gram"),
        )
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _self_trained_scored(
    corpus: DataFrame, width: int, add_k: int, id_col: str, text_col: str
) -> DataFrame:
    """Self-trained scoring with the minimal plan: ONE corpus-sized
    gram explode + aggregation, ONE corpus-sized probability join (on
    the gram alone — the prefix is gram-derived, so the separate
    prefix-level join the generic path needs for unseen grams never
    adds information when the model trained on the same corpus), and
    vocab-sized everything else.  Output identical to
    _score_from_counts over _doc_gram_counts (same integer
    arithmetic)."""
    per_doc = _doc_gram_only_counts(
        corpus, width, id_col, text_col
    ).localCheckpoint(eager=False)
    counts = per_doc.groupBy("gram").agg(F.sum("n").alias("c_gram"))
    with_prefix = counts.withColumn(
        "prefix", F.substring_index(F.col("gram"), " ", width - 1)
    )
    prefix_totals = with_prefix.groupBy("prefix").agg(
        F.sum("c_gram").alias("c_prefix")
    )
    # lm fans out below (probability join + vocab count) — cut lineage
    # so the vocab-sized model aggregation runs once per consumer read
    lm = (
        with_prefix.join(prefix_totals, "prefix")
        .select("gram", "c_gram", "c_prefix")
        .localCheckpoint(eager=False)
    )
    if add_k == 0:
        joined = per_doc.join(lm, "gram", "left")
        p = F.when(
            F.col("c_gram").isNull(), F.lit(0).cast("bigint")
        ).otherwise(_idiv(F.lit(1000) * F.col("c_gram"), F.col("c_prefix")))
    else:
        vocab = prefix_totals.agg(F.count(F.lit(1)).alias("__v"))
        joined = per_doc.join(lm, "gram", "left").join(F.broadcast(vocab))
        p = _idiv(
            F.lit(1000)
            * (F.coalesce(F.col("c_gram"), F.lit(0)) + F.lit(add_k)),
            F.coalesce(F.col("c_prefix"), F.lit(0))
            + F.lit(add_k) * F.col("__v"),
        )
    scored = (
        joined.select("doc_id", "n", p.alias("p"))
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_grams"),
            F.sum(F.col("n") * F.col("p")).alias("sum_p"),
        )
        .select(
            "doc_id",
            F.col("n_grams").cast("bigint").alias("n_grams"),
            _idiv(F.col("sum_p"), F.col("n_grams")).alias("score_permille"),
        )
    )
    return (
        corpus.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("bigint").alias(
                "n_grams"
            ),
            F.coalesce(F.col("score_permille"), F.lit(0))
            .cast("bigint")
            .alias("score_permille"),
        )
    )


def _doc_gram_counts(
    corpus: DataFrame, width: int, id_col: str, text_col: str
) -> DataFrame:
    """(doc_id, prefix, gram, n): per-document gram-position counts —
    the shared base both model training and scoring fold from."""
    return (
        _prefix_gram_rows(corpus, width, id_col, text_col)
        .groupBy("doc_id", "prefix", "gram")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def lm_score(
    corpus: DataFrame,
    lm: DataFrame,
    *,
    width: int = 2,
    add_k: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_grams, score_permille): mean conditional probability
    of the document's gram positions under ``lm``, in permille —
    per position ``1000 * (c_gram + k) div (c_prefix + k * V)`` with
    V = number of distinct prefixes in the model (the frozen smoothing
    vocabulary).  ``add_k=0`` is pure MLE (unseen grams contribute 0).
    Documents with fewer than ``width`` tokens score 0 with
    n_grams = 0.  V is a broadcast scalar; the prefix-total join is
    LM-sized, never corpus-sized."""
    per_doc = _doc_gram_counts(corpus, width, id_col, text_col)
    return _score_from_counts(corpus, per_doc, lm, add_k, id_col)


def _score_from_counts(
    corpus: DataFrame,
    per_doc: DataFrame,
    lm: DataFrame,
    add_k: int,
    id_col: str,
) -> DataFrame:
    if add_k > 0:
        # lm fans out below (probability join + prefix/vocab derivation)
        # — cut lineage so the model aggregation runs once, not per
        # consumer branch
        lm = lm.localCheckpoint(eager=False)
    if add_k == 0:
        joined = per_doc.join(lm, ["prefix", "gram"], "left")
        p = F.when(
            F.col("c_gram").isNull(), F.lit(0).cast("bigint")
        ).otherwise(_idiv(F.lit(1000) * F.col("c_gram"), F.col("c_prefix")))
    else:
        prefixes = lm.select("prefix", "c_prefix").distinct()
        vocab = prefixes.agg(F.count(F.lit(1)).alias("__v"))
        joined = (
            per_doc.join(
                lm.select("prefix", "gram", "c_gram"),
                ["prefix", "gram"],
                "left",
            )
            .join(prefixes, "prefix", "left")
            .join(F.broadcast(vocab))
        )
        p = _idiv(
            F.lit(1000)
            * (F.coalesce(F.col("c_gram"), F.lit(0)) + F.lit(add_k)),
            F.coalesce(F.col("c_prefix"), F.lit(0))
            + F.lit(add_k) * F.col("__v"),
        )
    scored = (
        joined
        .select("doc_id", "n", p.alias("p"))
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_grams"),
            F.sum(F.col("n") * F.col("p")).alias("sum_p"),
        )
        .select(
            "doc_id",
            F.col("n_grams").cast("bigint").alias("n_grams"),
            _idiv(F.col("sum_p"), F.col("n_grams")).alias("score_permille"),
        )
    )
    # short documents produce no gram rows — re-attach them with score 0
    return (
        corpus.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("bigint").alias(
                "n_grams"
            ),
            F.coalesce(F.col("score_permille"), F.lit(0))
            .cast("bigint")
            .alias("score_permille"),
        )
    )


def _ceil_div(num: Column, den: int) -> Column:
    return _idiv(num + F.lit(den - 1), F.lit(den))


def lm_quality_buckets(
    scored: DataFrame, *, score_col: str = "score_permille"
) -> DataFrame:
    """Adds ``bucket`` in {'head','middle','tail'}: CCNet's quality
    terciles, highest scores = head.  Cut points are the scores of the
    ceil(N/3)-th and ceil(2N/3)-th ranked documents, computed from the
    score HISTOGRAM (<= 1001 rows — the running sum runs over the tiny
    table, never the corpus); rows tied at a cut all take the higher
    bucket, so the per-row assignment is a broadcast-scalar CASE."""
    s = F.col(score_col)
    # scored fans out (histogram + final bucket join) and the histogram
    # fans out again (total + running sum) — cut lineage at both so the
    # scoring DAG and the tiny aggregate each run once
    scored = scored.localCheckpoint(eager=False)
    hist = (
        scored.groupBy(s.alias("__s"))
        .agg(F.count(F.lit(1)).alias("__c"))
        .localCheckpoint(eager=False)
    )
    # single-partition window is safe here: the histogram is bounded by
    # the score domain (1001 values), not the corpus
    cum_w = Window.orderBy(F.col("__s").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    n_total = hist.agg(F.sum("__c").alias("__n"))
    cum = hist.select("__s", F.sum("__c").over(cum_w).alias("__cum")).join(
        F.broadcast(n_total)
    )
    cuts = cum.agg(
        F.max(
            F.when(F.col("__cum") >= _ceil_div(F.col("__n"), 3), F.col("__s"))
        ).alias("__head_cut"),
        F.max(
            F.when(
                F.col("__cum") >= _ceil_div(F.lit(2) * F.col("__n"), 3),
                F.col("__s"),
            )
        ).alias("__mid_cut"),
    )
    out = scored.join(F.broadcast(cuts))
    bucket = (
        F.when(s >= F.col("__head_cut"), F.lit("head"))
        .when(s >= F.col("__mid_cut"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return out.select(*scored.columns, bucket.alias("bucket"))


def lm_quality(
    corpus: DataFrame,
    *,
    width: int = 2,
    add_k: int = 1,
    reference_corpus: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The full CCNet-style pass: train the n-gram model on
    ``reference_corpus`` (default: the corpus itself — the
    self-supervised variant), score every document, assign
    head/middle/tail buckets.  (doc_id, n_grams, score_permille,
    bucket)."""
    if reference_corpus is None:
        # self-trained: explode + aggregate the corpus gram stream ONCE
        # (lineage cut), fold the model out of the per-doc counts, then
        # score with a single gram-keyed join — prefixes never shuffle
        # corpus-sized (see _self_trained_scored)
        scored = _self_trained_scored(corpus, width, add_k, id_col, text_col)
    else:
        lm = train_ngram_lm(
            reference_corpus, width=width, id_col=id_col, text_col=text_col
        )
        scored = lm_score(
            corpus, lm, width=width, add_k=add_k, id_col=id_col,
            text_col=text_col,
        )
    return lm_quality_buckets(scored)
