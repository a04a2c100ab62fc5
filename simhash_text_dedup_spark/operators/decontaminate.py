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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ngrams_from_tokens(toks: Column, width: int) -> Column:
    """Array of word n-grams built from an ALREADY-SPLIT token array.

    Callers must materialize the split in its own projection
    (`.select(split(text).alias("__toks"))`, then build grams from
    `__toks` in a second select): referencing split(text) inline would
    re-split the document inside the per-element transform lambda —
    O(tokens) work per gram, quadratic per document (measured 6s for
    1.5 MB of text before this split-once rewrite).  Catalyst keeps
    the two projections separate because the token array is referenced
    more than once.

    The sequence bound is guarded: Spark's sequence(1, n) runs
    DESCENDING for n < 1 rather than returning an empty array."""
    n = F.size(toks)
    return F.when(
        n < width, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - F.lit(width) + F.lit(1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, width)),
        )
    )


def _gram_rows(
    corpus: DataFrame, width: int, id_col: str, text_col: str
) -> DataFrame:
    """(doc_id, __toks) with the split materialized once per document."""
    return corpus.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("__toks"),
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
    # the benchmark side needs only the text column (no id contract:
    # callers may pass a bare text table)
    bench_grams = (
        benchmark.select(F.split(F.col(text_col), " ").alias("__toks"))
        .select(
            F.explode(
                _ngrams_from_tokens(F.col("__toks"), ngram_width)
            ).alias("gram")
        )
        .distinct()
    )
    corpus_grams = _gram_rows(corpus, ngram_width, id_col, text_col).select(
        "doc_id",
        F.explode(_ngrams_from_tokens(F.col("__toks"), ngram_width)).alias(
            "gram"
        ),
    )
    return (
        corpus_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def semantic_contaminated(
    corpus_emb: DataFrame,
    bench_emb: DataFrame,
    *,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    max_bench_rows: int = 500_000,
) -> DataFrame:
    """(vec_id, n_matches, contaminated): corpus embeddings whose
    cosine similarity against ANY benchmark embedding reaches
    ``threshold`` — the semantic sibling of the exact-n-gram check
    above (paraphrased eval items slip an exact-gram filter; they do
    not slip an embedding match).

    Plan shape at 100 TB: the benchmark set is SMALL by contract
    (eval suites are 10^3-10^5 items) — it is collected once, L2-
    normalized into a single numpy matrix, and shipped in the Arrow
    UDF closure; the corpus side is ONE vectorized batch-matmul pass
    with no shuffle and no join (plan-asserted).  n_matches is an
    integer so the oracle check stays bit-for-bit; the float scores
    never leave the kernel.  ``max_bench_rows`` guards the driver
    collect — a benchmark bigger than that is not a benchmark.
    NULL benchmark embeddings are dropped (malformed rows cannot match
    anything); an EMPTY benchmark yields n_matches = 0 everywhere."""
    # single bounded job: the cap is enforced by the limit itself, not
    # a separate count() pass over the benchmark query
    rows = (
        bench_emb.select(emb_col)
        .where(F.col(emb_col).isNotNull())
        .limit(max_bench_rows + 1)
        .collect()
    )
    if len(rows) > max_bench_rows:
        raise ValueError(
            f"benchmark side exceeds max_bench_rows={max_bench_rows}; "
            "semantic_contaminated broadcasts the benchmark by design "
            "— use the LSH near-pair join for corpus-vs-corpus scale"
        )
    if not rows:
        return corpus_emb.select(
            F.col(id_col).alias("vec_id"),
            F.lit(0).cast("bigint").alias("n_matches"),
            F.lit(False).alias("contaminated"),
        )
    B = np.array([r[0] for r in rows], dtype=np.float64)
    bn = np.sqrt((B * B).sum(axis=1))
    thr = float(threshold)

    @F.pandas_udf("bigint")
    def n_matches(col: pd.Series) -> pd.Series:
        M = np.array(col.tolist(), dtype=np.float64)
        mn = np.sqrt((M * M).sum(axis=1))
        # dot / (|m| * |b|), the same formulation as the SQL twin; a
        # zero norm makes the denominator infinite -> cosine 0 -> no
        # match, matching the twin's division-by-zero row falling out
        # of its FILTER
        denom = np.outer(mn, bn)
        denom = np.where(denom == 0.0, np.inf, denom)
        sims = (M @ B.T) / denom
        return pd.Series((sims >= thr).sum(axis=1).astype("int64"))

    return corpus_emb.select(
        F.col(id_col).alias("vec_id"),
        n_matches(F.col(emb_col)).alias("n_matches"),
    ).withColumn("contaminated", F.col("n_matches") > 0)


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
