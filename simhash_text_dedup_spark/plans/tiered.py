"""Tiered deduplication: exact -> near (SimHash) -> semantic.

The industrial curation shape (FineWeb / Dolma / SemDeDup ablations all
report removal per stage): run the CHEAPEST tier first, feed only its
survivors to the next tier, and attribute every removed document to the
tier that killed it — the attribution is what lets a data card say
"X%% exact, Y%% near, Z%% semantic" and lets an ablation turn one tier
off without re-running the others.

Cost ordering at 100 TB (why the tiers are in this order):

  1. exact — ONE hash aggregation on the 8-byte fingerprint (a window
     over the fingerprint partitioning: single exchange, map-side
     combine).  Web/code crawls are typically 30-50%% exact duplicates,
     so this removes the bulk mass before anything multiplies rows.
  2. near — the production SimHash band join (operators/pairs.near_pairs:
     first-matching-band predicate, salted hot buckets) over exact
     SURVIVORS only.  Because tier 1 leaves at most one document per
     distinct fingerprint, the x n_bands band explode never sees the
     exact-duplicate mass, and an exact-flood family can no longer
     create a hot band bucket by itself — the tier ordering structurally
     provides what the reference's spam pre-pass
     (incload/SpamPageGenerate.java:78) exists to provide.  (Floods of
     NEAR-identical fingerprints still exist; the salted hot-bucket
     routing inside near_pairs handles those.)
  3. semantic — SemDeDup (operators/semdedup.py) over the embeddings of
     near survivors.  The within-cluster pairwise screen is the only
     super-linear stage, so it runs last, on the smallest set.

Winner convention: tiers 1-2 elect a deterministic representative
(min doc_id of the exact group / of the connected component — the
min-doc_id convention is single-sourced from operators/spam.spam_tag,
and winner_id IS the CC min-label cluster id for near losers).  The
contract is that a NON-NULL winner_id always references a KEPT
document: an exact loser whose group representative itself loses the
near tier is resolved one hop to that component's winner, and any
winner removed by the semantic screen is nulled out.  The semantic
tier's dominance rule is pairwise (SemDeDup keeps the
least-prototypical member of each duplicate group; there is no single
group key), so semantic deletions — and deletes whose representative
the semantic screen removed — carry a NULL winner_id.

Reference anchor: the keep/delete action semantics mirror the
reference's winner-selection stage (incload/DeDupReduce.java); the
tiering itself is the composition a training-data pipeline runs on top.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simhash_text_dedup_spark.config import DedupConfig
from simhash_text_dedup_spark.operators.cluster import connected_components
from simhash_text_dedup_spark.operators.pairs import near_pairs

TIER_EXACT = "exact"
TIER_NEAR = "near"
TIER_SEMANTIC = "semantic"


def tiered_dedup(
    fps: DataFrame,
    cfg: DedupConfig,
    *,
    embeddings: DataFrame | None = None,
    semantic_threshold: float = 0.9,
    n_lists: int = 64,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """fps(doc_id, fingerprint) -> (doc_id, action, tier, winner_id).

    action in {'keep', 'delete'}; for deletes, tier names the stage
    that removed the document and winner_id the surviving
    representative — non-NULL winner_id ALWAYS references a keep row;
    NULL means the semantic screen removed the document or its
    representative (see module docstring).  Keeps have tier NULL and
    winner_id = doc_id.

    `embeddings` (vec_id, embedding) enables the semantic tier over
    the near survivors that HAVE an embedding row (vec_id == doc_id);
    survivors without one pass through untouched.  `centroids` /
    `n_lists` / `semantic_threshold` forward to operators/semdedup
    (centroids is the oracle/testing hook: literal centroids make
    every stage after k-means training SQL-expressible).

    Plan shape: tier 1 is one exchange on the fingerprint; tier 2 is
    the production band join over at most one row per distinct
    fingerprint; tier 3 inherits semdedup's broadcast-centroid +
    list_id-exchange shape.  The windowed frame is lineage-cut once so
    the (possibly pandas-UDF-built) fps input is not recomputed per
    output branch.
    """
    from simhash_text_dedup_spark.operators.spam import spam_tag

    base = fps.select("doc_id", "fingerprint")

    # --- tier 1: exact -- one exchange on the fingerprint ------------
    # winner election single-sourced from spam_tag (min doc_id per
    # fingerprint, the reference's keep-first convention)
    tagged = (
        spam_tag(base)
        .drop("fp_count")
        .withColumnRenamed("fp_first", "winner_id")
        .localCheckpoint(eager=False)
    )
    exact_del = tagged.filter(F.col("doc_id") != F.col("winner_id")).select(
        "doc_id", "winner_id"
    )
    # at most one doc per distinct fingerprint from here on
    survivors = tagged.filter(F.col("doc_id") == F.col("winner_id")).select(
        "doc_id", "fingerprint"
    )

    # --- tier 2: near -- production band join + CC min-label ---------
    # lineage-cut the pair set: connected_components consumes it twice
    # (strategy probe + chosen strategy) and would otherwise run the
    # whole band join twice (guide §1.2)
    pairs = near_pairs(survivors, cfg).localCheckpoint(eager=False)
    labels = connected_components(
        pairs.select("a_id", "b_id"),
        max_iter=cfg.cc_max_iter,
        driver_threshold=cfg.cc_driver_threshold,
    )
    # min-label CC: the component's label IS its min doc_id == winner
    near_del = (
        labels.filter(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id", F.col("cluster_id").alias("winner_id"))
        .localCheckpoint(eager=False)
    )
    survivors = survivors.join(near_del.select("doc_id"), "doc_id", "left_anti")

    # an exact group's representative may itself lose the near tier;
    # resolve one hop to that component's winner so winner_id keeps
    # pointing at a surviving row (CC winners never lose the near tier)
    exact_del = exact_del.join(
        near_del.select(
            F.col("doc_id").alias("winner_id"),
            F.col("winner_id").alias("_near_winner"),
        ),
        "winner_id",
        "left",
    ).select(
        "doc_id",
        F.coalesce("_near_winner", "winner_id").alias("winner_id"),
    )

    # --- tier 3: semantic -- SemDeDup over survivor embeddings -------
    sem_del = None
    if embeddings is not None:
        from simhash_text_dedup_spark.operators.semdedup import semdedup

        emb = embeddings.join(
            survivors.select(F.col("doc_id").alias("vec_id")),
            "vec_id",
            "left_semi",
        )
        sem_del = (
            semdedup(
                emb,
                threshold=semantic_threshold,
                n_lists=n_lists,
                centroids=centroids,
            )
            .filter(F.col("action") == "delete")
            .select(F.col("vec_id").alias("doc_id"))
            .localCheckpoint(eager=False)
        )
        survivors = survivors.join(sem_del, "doc_id", "left_anti")

        # contract: a non-NULL winner_id references a KEPT row — null
        # out winners the semantic screen removed (pairwise dominance
        # elects no replacement)
        sem_gone = sem_del.select(
            F.col("doc_id").alias("winner_id"), F.lit(True).alias("_gone")
        )

        def _null_dead_winners(losers: DataFrame) -> DataFrame:
            return losers.join(sem_gone, "winner_id", "left").select(
                "doc_id",
                F.when(F.col("_gone").isNotNull(), F.lit(None).cast("long"))
                .otherwise(F.col("winner_id"))
                .alias("winner_id"),
            )

        exact_del = _null_dead_winners(exact_del)
        near_out = _null_dead_winners(near_del)
    else:
        near_out = near_del

    def _losers(df: DataFrame, tier: str) -> DataFrame:
        return df.select(
            "doc_id",
            F.lit("delete").alias("action"),
            F.lit(tier).alias("tier"),
            "winner_id",
        )

    keeps = survivors.select(
        "doc_id",
        F.lit("keep").alias("action"),
        F.lit(None).cast("string").alias("tier"),
        F.col("doc_id").alias("winner_id"),
    )
    out = (
        _losers(exact_del, TIER_EXACT)
        .unionByName(_losers(near_out, TIER_NEAR))
        .unionByName(keeps)
    )
    if sem_del is not None:
        out = out.unionByName(
            sem_del.select(
                "doc_id",
                F.lit("delete").alias("action"),
                F.lit(TIER_SEMANTIC).alias("tier"),
                F.lit(None).cast("long").alias("winner_id"),
            )
        )
    return out


def tier_report(actions: DataFrame) -> DataFrame:
    """(tier, n_docs) removal accounting over tiered_dedup output —
    the data-card line.  Keeps report as tier='keep'."""
    return (
        actions.groupBy(
            F.coalesce("tier", F.lit("keep")).alias("tier")
        ).agg(F.count(F.lit(1)).alias("n_docs"))
    )


def tiered_survivors(
    docs: DataFrame, fps: DataFrame, cfg: DedupConfig, **kwargs
) -> DataFrame:
    """docs rows (original schema, joined on doc_id) that survive all
    enabled tiers — the left_semi composition callers feed into
    training-set assembly.  Accepts every `tiered_dedup` keyword."""
    actions = tiered_dedup(fps, cfg, **kwargs)
    return docs.join(
        actions.filter(F.col("action") == "keep").select("doc_id"),
        "doc_id",
        "left_semi",
    )
