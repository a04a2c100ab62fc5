"""Hashed-feature linear text classifier (fastText-style filtering,
trained and scored entirely in Spark).

LLaMA/RedPajama/CCNet-style pipelines score every crawl document with
a small supervised linear classifier (wiki-reference quality,
language, toxicity) before heavier processing.  This module restates
that pattern Spark-first and integer-exactly:

- ``hashed_features``: distinct hashed unigram + word-bigram buckets
  per document — the hashing trick bounds the MODEL at ``n_buckets``
  rows regardless of vocabulary, which is what makes it broadcastable
  at web scale (deliberate contrast with lm_score.py, whose
  vocabulary-sized LM table must shuffle-join).  bucket =
  md5-prefix(feature) mod n_buckets: deterministic and
  engine-portable, no engine-internal hash in the frozen surface.
- ``train_linear_classifier``: per-bucket Laplace-smoothed positive
  rate in permille, from ONE feature aggregation (partial counts
  combine map-side; the label rides the exploded feature row, so the
  corpus is read once).
- ``classifier_score``: mean bucket weight over each document's
  features, integer permille; buckets unseen in training contribute
  the 500 prior, featureless documents score exactly 500.  The model
  is broadcast — scoring is a map-side join + hash aggregation; the
  corpus never shuffles on a text key.

Integer arithmetic throughout (CLAUDE.md rule 4): float log-odds
would hash-drift across libm builds, and the permille mean preserves
ordering for thresholding.  Tokenization is the corpus convention
shared with decontaminate/vocab: split on single spaces, empty tokens
dropped.

Reference anchor: the reference feeds per-page quality scores into
winner selection (incload/PageNode.java pr plumbing); this is the
public classifier-based analog that produces such scores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import _idiv

DEFAULT_BUCKETS = 1 << 18
PRIOR_PERMILLE = 500


def _bucket(col, n_buckets: int):
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long"),
        F.lit(int(n_buckets)),
    )


def hashed_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    carry: list | None = None,
) -> DataFrame:
    """(doc_id, bucket [, carry...]): one row per DISTINCT unigram /
    word-bigram feature of each document (doc-frequency semantics;
    bucket collisions within a doc count once per colliding feature).
    The dedup is an IN-ROW array_distinct before the explode — no
    corpus-wide distinct shuffle — and the token split materializes
    once per document (split-once rule: an inline split inside the
    bigram lambda would re-split per element, quadratic per doc)."""
    carry = list(carry or [])  # column NAMES on df, carried through
    toks = df.select(
        F.col(id_col).alias("doc_id"), *carry,
        F.filter(F.split(F.col(text_col), " "), lambda x: x != "").alias("__toks"),
    )
    feats = toks.select(
        "doc_id", *carry,
        F.array_distinct(
            F.concat(
                F.col("__toks"),
                F.expr(
                    "CASE WHEN size(__toks) < 2 THEN array()"
                    " ELSE transform(slice(__toks, 1, size(__toks) - 1),"
                    " (x, i) -> concat(x, ' ', element_at(__toks, i + 2))) END"
                ),
            )
        ).alias("__fs"),
    )
    return feats.select(
        "doc_id", *carry, F.explode("__fs").alias("f")
    ).select("doc_id", *carry, _bucket(F.col("f"), n_buckets).alias("bucket"))


def train_linear_classifier(
    labeled: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
    n_buckets: int = DEFAULT_BUCKETS,
    alpha: int = 1,
) -> DataFrame:
    """(bucket, n_pos, n_neg, weight_permille) from a labeled corpus
    (label_col boolean).  weight = 1000 * (n_pos + alpha) /
    (n_pos + n_neg + 2*alpha), integer division — Laplace-smoothed
    per-bucket positive rate.  At most n_buckets output rows."""
    feats = hashed_features(
        labeled.withColumn("__y", F.col(label_col)),
        id_col, text_col, n_buckets, carry=["__y"],
    )
    counts = feats.groupBy("bucket").agg(
        F.sum(F.when(F.col("__y"), 1).otherwise(0)).cast("bigint").alias("n_pos"),
        F.count(F.lit(1)).cast("bigint").alias("__n"),
    )
    a = int(alpha)
    return counts.select(
        "bucket", "n_pos",
        (F.col("__n") - F.col("n_pos")).alias("n_neg"),
        _idiv(
            (F.col("n_pos") + F.lit(a)) * 1000, F.col("__n") + F.lit(2 * a)
        ).alias("weight_permille"),
    )


def classifier_score(
    df: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    threshold_permille: int = PRIOR_PERMILLE,
    prior_permille: int = PRIOR_PERMILLE,
) -> DataFrame:
    """(doc_id, n_features, score_permille, pred): mean model weight
    over each document's features; buckets unseen in training (and
    featureless docs) contribute prior_permille.  Calibration: set
    BOTH threshold_permille and prior_permille to the training base
    rate (fastText's bias analog) — unseen features are then neutral
    evidence instead of dragging every score toward 500, which under
    an unbalanced prior misclassifies wholesale.  The model (bounded
    by n_buckets) is BROADCAST: no corpus shuffle before the per-doc
    aggregation."""
    feats = hashed_features(df, id_col, text_col, n_buckets)
    per_doc = (
        feats.join(
            F.broadcast(model.select("bucket", "weight_permille")),
            "bucket", "left",
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.sum(
                F.coalesce("weight_permille", F.lit(int(prior_permille)))
            ).alias("__s"),
        )
        .select(
            "doc_id", "n_features",
            _idiv(F.col("__s"), F.col("n_features")).alias("score_permille"),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_features", F.lit(0)).alias("n_features"),
            F.coalesce("score_permille", F.lit(int(prior_permille))).alias("score_permille"),
        )
        .withColumn("pred", F.col("score_permille") >= F.lit(int(threshold_permille)))
    )
