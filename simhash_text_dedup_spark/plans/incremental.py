"""Incremental (new-batch vs existing-corpus) dedup round.

The reference is incremental by construction: each crawl round loads the
new batch's urlid->finger map into the mappers and probes it with every
scanned row (new + already-loaded old), so candidate pairs always
involve at least one NEW document; old x old is never compared
(incload/DeDupMapper.java:70-81,97-248, SURVEY.md §3.1).

Semantics reproduced here:
  * pair domain   = (new x new, emitted once) ∪ (old x new)
                    — direction rule E5, DeDupMapper.java:220-226
  * unchanged     : a new version whose fingerprint equals the entity's
                    already-loaded fingerprint -> "unload" list (do not
                    re-index), DeDupMapper.java:147-153
  * spam kill     : within the new batch, DeDupMapper setup path /
                    SpamPageGenerate
  * selection     : per verified pair, loser = lower score; loser NEW ->
                    delete list, loser OLD/loaded -> modify list
                    (SelectLogicReducer.java:74-103)

Scale shape: the probe side is the full corpus fingerprint table (read
from the previous round's checkpoint — parquet/Iceberg snapshot); only
band keys of the NEW batch build the join's left side, so the shuffle is
O(|new| + matching buckets of |corpus|), not O(|corpus|^2).  When the
new batch is small it broadcasts (Catalyst/AQE decides; the reference's
in-heap memtable is exactly a hand-rolled broadcast join, SURVEY §2.3 J1).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simhash_text_dedup_spark.config import DedupConfig
from simhash_text_dedup_spark.functions.simhash import (
    band_entries,
    band_key,
    hamming_col,
)
from simhash_text_dedup_spark.operators.cluster import connected_components
from simhash_text_dedup_spark.operators.spam import spam_pass
from simhash_text_dedup_spark.plans.pipeline import (
    Checkpointer,
    fingerprint_stage,
    prepare_documents,
)


@dataclass
class IncrementalResult:
    new_fingerprints: DataFrame  # doc_id, fingerprint, score, is_new, ...
    unload: DataFrame            # doc_id, entity_id — unchanged re-crawls
    spam_kills: DataFrame        # doc_id, ref_doc_id
    pairs: DataFrame             # a_id, b_id, hamming, a_is_new, b_is_new
    delete_list: DataFrame       # doc_id (new losers)
    modify_list: DataFrame       # doc_id (already-loaded losers)
    clusters: DataFrame          # doc_id, cluster_id (touched subgraph)


def _banded(fps: DataFrame, cfg: DedupConfig) -> DataFrame:
    return fps.select(
        "doc_id",
        "fingerprint",
        "is_new",
        "score",
        F.explode(band_entries(F.col("fingerprint"), cfg.n_bands, cfg.band_bits)).alias("e"),
    ).select("doc_id", "fingerprint", "is_new", "score", "e.band", "e.band_key")


def run_incremental(
    spark: SparkSession,
    new_docs: DataFrame,
    base: DataFrame | None,
    cfg: DedupConfig = DedupConfig(),
    checkpoint_dir: str | None = None,
    resume: bool = True,
) -> IncrementalResult:
    """One incremental round.

    new_docs: input_hint table for the new batch (repo, path, commit,
              lang, content [, score]).
    base:     fingerprint table of the already-loaded corpus with columns
              (doc_id, entity_id, fingerprint, score) — typically the
              previous round's `new_fingerprints` checkpoint appended to
              the running corpus table; None for the first round.
    """
    ck = Checkpointer(spark, checkpoint_dir, resume)

    parallelism = spark.sparkContext.defaultParallelism
    if new_docs.rdd.getNumPartitions() < parallelism:
        new_docs = new_docs.repartition(parallelism)

    prepared = prepare_documents(new_docs).withColumn(
        "entity_id", F.xxhash64("repo", "path")
    )
    new_fps = ck.through(
        fingerprint_stage(prepared, cfg).join(
            prepared.select("doc_id", "entity_id"), "doc_id"
        ),
        "new_fingerprints",
    )

    if base is None:
        base = spark.createDataFrame(
            [], "doc_id long, entity_id long, fingerprint long, score double"
        )
    base_fps = base.select(
        "doc_id", "entity_id", "fingerprint", "score",
        F.lit(False).alias("is_new"),
    )

    # --- unchanged re-crawls -> unload (DeDupMapper.java:147-153)
    unload = ck.through(
        new_fps.alias("n")
        .join(
            base_fps.alias("o"),
            (F.col("n.entity_id") == F.col("o.entity_id"))
            & (F.col("n.fingerprint") == F.col("o.fingerprint")),
            "left_semi",
        )
        .select("doc_id", "entity_id"),
        "unload",
    )

    # --- spam kill within the new batch
    survivors, kills = spam_pass(new_fps, cfg.spam_threshold)
    kills = ck.through(kills, "spam_kills")
    new_side = survivors.select(
        "doc_id", "fingerprint", F.lit(True).alias("is_new"), "score"
    )

    # --- band join: new (left) vs new ∪ old (right); old x old excluded
    all_side = new_side.unionByName(
        base_fps.select("doc_id", "fingerprint", "is_new", "score")
    )
    left = _banded(new_side, cfg).select(
        "band", "band_key",
        F.col("doc_id").alias("a_id"), F.col("fingerprint").alias("a_fp"),
        F.col("is_new").alias("a_is_new"), F.col("score").alias("a_score"),
    )
    right = _banded(all_side, cfg).select(
        "band", "band_key",
        F.col("doc_id").alias("b_id"), F.col("fingerprint").alias("b_fp"),
        F.col("is_new").alias("b_is_new"), F.col("score").alias("b_score"),
    )
    joined = left.join(right, ["band", "band_key"]).filter(
        # new x new once (a<b); new x old always kept (direction E5)
        (~F.col("b_is_new")) | (F.col("a_id") < F.col("b_id"))
    )
    first_match = F.lit(True)
    for j in range(cfg.n_bands - 1):
        j_matches = band_key(F.col("a_fp"), j, cfg.n_bands, cfg.band_bits) == band_key(
            F.col("b_fp"), j, cfg.n_bands, cfg.band_bits
        )
        first_match = first_match & ((F.col("band") <= F.lit(j)) | ~j_matches)

    pairs = ck.through(
        joined.withColumn("hamming", hamming_col(F.col("a_fp"), F.col("b_fp")))
        .filter((F.col("hamming") <= cfg.hamming_k) & (F.col("a_id") != F.col("b_id")))
        .filter(first_match)
        .select(
            "a_id", "b_id", "hamming",
            "a_is_new", "b_is_new", "a_score", "b_score",
        ),
        "pairs",
    )

    # --- per-pair loser -> delete (new) / modify (loaded)
    # (SelectLogicMapper.java:39-44 orientation + SelectLogicReducer split)
    loser_id = F.when(
        (F.col("a_score") > F.col("b_score"))
        | ((F.col("a_score") == F.col("b_score")) & (F.col("a_id") < F.col("b_id"))),
        F.struct(F.col("b_id").alias("doc_id"), F.col("b_is_new").alias("is_new")),
    ).otherwise(
        F.struct(F.col("a_id").alias("doc_id"), F.col("a_is_new").alias("is_new"))
    )
    losers = pairs.select(loser_id.alias("l")).select("l.doc_id", "l.is_new")
    # a doc can lose in several pairs; also never delete a doc that wins
    # elsewhere against a lower-scored loser? Reference greedy handles
    # that globally; here we use the parallel cc-style rule: any doc that
    # loses at least one pair is a loser (documented delta, cfg.selection
    # = 'greedy' for reference-exact behavior via run_dedup).
    delete_list = ck.through(
        losers.filter(F.col("is_new")).select("doc_id").distinct(), "delete_list"
    )
    modify_list = ck.through(
        losers.filter(~F.col("is_new")).select("doc_id").distinct(), "modify_list"
    )

    cc = connected_components(
        pairs.select("a_id", "b_id"), cfg.cc_max_iter, cfg.cc_driver_threshold
    )

    return IncrementalResult(
        new_fingerprints=new_fps,
        unload=unload,
        spam_kills=kills,
        pairs=pairs,
        delete_list=delete_list,
        modify_list=modify_list,
        clusters=cc,
    )
