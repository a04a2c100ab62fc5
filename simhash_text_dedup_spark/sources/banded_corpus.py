"""Pre-banded, bucketed corpus fingerprint layout — the write-once
join accelerator for incremental rounds.

At 10^12 files the dominant RECURRING cost of an incremental round is
the corpus side of the band join (plans/incremental.candidate_pairs):
every round re-explodes the full fingerprint table into band rows and
re-SHUFFLES them on the band key, even though both are write-once
computations — a fingerprint's band rows never change, and the
shuffle layout can be baked into storage.

This module fixes that with the bucketing primitive
(sources/io.write_bucketed_table):

  * `write_banded_corpus` explodes (doc_id, entity_id, fingerprint,
    score) into rows keyed by the FUSED band key
    (bkey = band << band_bits | band_key — one join column, so the
    bucket spec matches the join key exactly) and saves them
    bucketBy(bkey), sorted within buckets.  Runs once per corpus
    commit, not once per round.
  * `candidate_pairs_banded` reproduces candidate_pairs' exact pair
    domain — new x new emitted once, new x live-old always, old x old
    never, each pair only in its first matching band — but the
    corpus side reads the saved table with NO Exchange: the only
    shuffle in the round's join moves the (small) NEW batch
    (asserted in tests/test_banded_corpus.py).  Stale rows of
    re-crawled entities are excluded with a broadcast anti-join
    against the new batch's (small) entity set, so the corpus is
    never shuffled for that either.

Storage cost: n_bands rows of ~40 bytes per document — ~160 B/doc at
the frozen 4-band spec, negligible next to content.

Reference analog: the in-heap MemTable the reference rebuilds per
round (incload/MemTable.java:154-212) IS this table, recomputed from
scratch every time; here it persists bucketed across rounds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from simhash_text_dedup_spark.config import DedupConfig
from simhash_text_dedup_spark.functions.simhash import band_key, hamming_col
from simhash_text_dedup_spark.sources.io import write_bucketed_table


def fused_band_keys(fp: Column, cfg: DedupConfig) -> Column:
    """array<int> of band << band_bits | band_key — one fused join
    column per band (bucket spec == join key)."""
    return F.array(
        *[
            (
                F.lit(i << cfg.band_bits)
                + band_key(fp, i, cfg.n_bands, cfg.band_bits)
            ).cast("int")
            for i in range(cfg.n_bands)
        ]
    )


def write_banded_corpus(
    base_fps: DataFrame,
    table: str,
    cfg: DedupConfig = DedupConfig(),
    n_buckets: int = 64,
) -> None:
    """Explode the corpus fingerprint table (doc_id, entity_id,
    fingerprint, score) into fused-band-key rows and save bucketed by
    bkey.  Write once per corpus commit; every subsequent round's
    band join reads it shuffle-free."""
    banded = base_fps.select(
        "doc_id",
        "entity_id",
        "fingerprint",
        "score",
        F.explode(fused_band_keys(F.col("fingerprint"), cfg)).alias("bkey"),
    )
    write_bucketed_table(banded, table, "bkey", n_buckets=n_buckets)


def _first_match(cfg: DedupConfig) -> Column:
    """Emit each pair only in its first matching band: this row's band
    (bkey >> band_bits) must be the smallest j where the two
    fingerprints agree — same zero-shuffle predicate as
    candidate_pairs."""
    band = F.shiftrightunsigned(F.col("bkey"), cfg.band_bits)
    pred = F.lit(True)
    for j in range(cfg.n_bands - 1):
        j_matches = band_key(F.col("a_fp"), j, cfg.n_bands, cfg.band_bits) == band_key(
            F.col("b_fp"), j, cfg.n_bands, cfg.band_bits
        )
        pred = pred & ((band <= F.lit(j)) | ~j_matches)
    return pred


def candidate_pairs_banded(
    spark: SparkSession,
    new_side: DataFrame,
    banded_corpus_table: str,
    cfg: DedupConfig = DedupConfig(),
) -> DataFrame:
    """Incremental candidate generation against the SAVED banded
    corpus: identical pair set and schema to
    plans/incremental.candidate_pairs(new_side, new_side ∪ live-old)
    — parity pinned by tests — but the corpus side is read
    co-located (no Exchange).

    new_side carries (doc_id, fingerprint, is_new=true, is_loaded,
    score).  Stale base rows of re-crawled entities are excluded via
    a broadcast anti-join on the new batch's entity set; pass the
    new batch's entity_id inside new_side as `entity_id` when
    re-crawls are possible, else corpus rows are all live.
    """
    from simhash_text_dedup_spark.plans.incremental import candidate_pairs

    # --- new x new: the batch is small; the plain in-memory join
    nn = candidate_pairs(new_side, new_side, cfg)

    # --- new x corpus: bucketed co-located join on the fused key
    corpus = spark.table(banded_corpus_table)
    if "entity_id" in new_side.columns:
        live = corpus.join(
            F.broadcast(new_side.select("entity_id").distinct()),
            "entity_id",
            "left_anti",
        )
    else:
        live = corpus
    left = new_side.select(
        F.col("doc_id").alias("a_id"),
        F.col("fingerprint").alias("a_fp"),
        F.col("is_loaded").alias("a_loaded"),
        F.col("score").alias("a_score"),
        F.explode(fused_band_keys(F.col("fingerprint"), cfg)).alias("bkey"),
    )
    right = live.select(
        "bkey",
        F.col("doc_id").alias("b_id"),
        F.col("fingerprint").alias("b_fp"),
        F.col("score").alias("b_score"),
    )
    nc = (
        left.join(right, "bkey")
        .withColumn("hamming", hamming_col(F.col("a_fp"), F.col("b_fp")))
        .filter((F.col("hamming") <= cfg.hamming_k) & (F.col("a_id") != F.col("b_id")))
        .filter(_first_match(cfg))
        .select(
            "a_id",
            "b_id",
            "hamming",
            F.lit(True).alias("a_is_new"),
            F.lit(False).alias("b_is_new"),
            "a_loaded",
            F.lit(True).alias("b_loaded"),
            "a_score",
            "b_score",
        )
    )
    return nn.unionByName(nc)
