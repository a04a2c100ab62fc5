"""End-to-end dedup pipeline: fingerprint -> spam kill -> exact groups
-> band join -> Hamming verify -> connected components -> selection.

Spark translation of the reference's two-job DAG
(incload/Driver.java:6-21: DeDup then SelectLogic; orchestration
SelectAndSendJob.java:241-426), with the stage-folder state machine
replaced by parquet checkpoints (SURVEY.md §3.2, §7.1 item 7).

Each stage is a pure DataFrame -> DataFrame function; `run_dedup` wires
them and optionally checkpoints each stage to `<dir>/<stage>` parquet,
skipping stages whose checkpoint already exists (resume).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simhash_text_dedup_spark.config import DedupConfig
from simhash_text_dedup_spark.functions.simhash import simhash_udf
from simhash_text_dedup_spark.operators.cluster import connected_components
from simhash_text_dedup_spark.operators.pairs import exact_groups, near_pairs
from simhash_text_dedup_spark.operators.selection import (
    assign_actions_cc,
    assign_actions_greedy,
)
from simhash_text_dedup_spark.operators.spam import spam_pass


def prepare_documents(docs: DataFrame) -> DataFrame:
    """Normalize an input_hint table (repo, path, commit, lang, content)
    — or any table already carrying doc_id/content — into the pipeline
    schema: doc_id, content, content_sha256, score, is_new.

    doc_id   = xxhash64(repo, path, commit) — the stand-in for the
               reference's 8-byte-MD5 urlid (spider/common/util/
               MD5.java:89-113); stable, JVM-side, no UDF.
    sha256   = per-row content invariant (BASELINE input_hint).
    score    = deterministic pseudo-score in [0,1) when absent — the
               reference's `pr` analog (incload/PageNode.java:107-109).
    is_new   = true when absent (full self-dedup batch).
    """
    cols = set(docs.columns)
    out = docs
    if "doc_id" not in cols:
        out = out.withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
    if "content" not in cols and "text" in cols:
        out = out.withColumn("content", F.col("text"))
    out = out.withColumn("content_sha256", F.sha2(F.col("content"), 256))
    if "score" not in cols:
        out = out.withColumn(
            "score",
            (F.pmod(F.xxhash64("content_sha256"), F.lit(1000000)) / 1000000.0),
        )
    if "is_new" not in cols:
        out = out.withColumn("is_new", F.lit(True))
    return out


def fingerprint_stage(prepared: DataFrame, cfg: DedupConfig) -> DataFrame:
    """doc_id, fingerprint, score, is_new, content_sha256."""
    return prepared.select(
        "doc_id",
        simhash_udf(cfg.shingle_width)(F.col("content")).alias("fingerprint"),
        "score",
        "is_new",
        "content_sha256",
    )


@dataclass
class DedupResult:
    fingerprints: DataFrame
    spam_kills: DataFrame
    pairs: DataFrame       # a_id, b_id, hamming, kind ('exact'|'near')
    clusters: DataFrame    # doc_id, cluster_id, score, is_new,
    #                        is_representative, action
    metrics: dict


class Checkpointer:
    """Parquet stage checkpoints with existence-based resume — the Spark
    analog of the reference's *_old folder state machine
    (SelectAndSendJob.java:852-934)."""

    def __init__(self, spark: SparkSession, root: str | None, resume: bool = True):
        self.spark, self.root, self.resume = spark, root, resume

    def through(self, df: DataFrame, stage: str) -> DataFrame:
        if not self.root:
            return df
        path = os.path.join(self.root, stage)
        marker = os.path.join(path, "_SUCCESS")
        if not (self.resume and os.path.exists(marker)):
            df.write.mode("overwrite").parquet(path)
        return self.spark.read.parquet(path)


def run_dedup(
    spark: SparkSession,
    docs: DataFrame,
    cfg: DedupConfig = DedupConfig(),
    checkpoint_dir: str | None = None,
    resume: bool = True,
) -> DedupResult:
    ck = Checkpointer(spark, checkpoint_dir, resume)
    metrics: dict = {}

    prepared = prepare_documents(docs)
    fps = ck.through(fingerprint_stage(prepared, cfg), "fingerprints")

    survivors, kills = spam_pass(fps, cfg.spam_threshold)
    survivors = ck.through(survivors, "survivors")
    kills = ck.through(kills, "spam_kills")

    distinct_fps, exact_edges = exact_groups(survivors)
    near = near_pairs(distinct_fps, cfg)
    pairs = ck.through(exact_edges.unionByName(near), "pairs")

    cc = connected_components(pairs.select("a_id", "b_id"), cfg.cc_max_iter)

    # attach singletons (docs in no edge) with cluster_id = doc_id
    meta = survivors.select("doc_id", "score", "is_new")
    clusters_meta = (
        meta.join(cc, "doc_id", "left")
        .withColumn("cluster_id", F.coalesce(F.col("cluster_id"), F.col("doc_id")))
    )

    if cfg.selection == "greedy":
        clusters = assign_actions_greedy(clusters_meta, pairs.select("a_id", "b_id"))
    else:
        clusters = assign_actions_cc(clusters_meta)
    clusters = ck.through(clusters, "clusters")

    return DedupResult(
        fingerprints=fps,
        spam_kills=kills,
        pairs=pairs,
        clusters=clusters,
        metrics=metrics,
    )
