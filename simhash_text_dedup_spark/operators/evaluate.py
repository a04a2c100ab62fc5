"""Pair-counting evaluation of a clustering against a reference.

The north rule grades the pipeline by DUP-PAIR RECALL vs the reference
clusters; at test scale we pin exact equality (tests/test_pipeline.py),
but a production run over 10^12 files needs the same metric as a
DISTRIBUTED job: compare the produced clustering against a golden
clustering (a labeled sample, a previous run, or the reference's
output) without ever materializing the O(sum n_c^2) pair sets.

Standard pair-counting contingency approach: join the two labelings on
doc_id, count docs per (pred_cluster, gold_cluster) cell, and derive

    tp_pairs   = sum_cells  C(n_cell, 2)     (pairs both agree on)
    pred_pairs = sum_pred_clusters C(n, 2)   (pairs the run claims)
    gold_pairs = sum_gold_clusters C(n, 2)   (pairs the truth holds)

    precision = tp/pred_pairs, recall = tp/gold_pairs.

Everything is groupBy/agg with map-side partial aggregation — ONE
shuffle of the joined labeling into contingency cells plus two tiny
shuffles of (cluster-id, count) records, no pair expansion, no driver
materialization; survives any corpus size whose CLUSTER-ID cardinality
fits a shuffle (i.e. all of them).  Ratios are reported integer-exact
in permille (1000*tp DIV denom) so a SQL oracle can reproduce them
bit-for-bit (CLAUDE.md hard rule 4: float round() differs between
engines at decimal boundaries).

Reference analog: the reference validated rounds by counting DupPair
records per selection decision (incload/SelectLogicReducer.java
counters); this operator is the same bookkeeping generalized to a
clustering-vs-clustering contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sum_c2(sizes: DataFrame, alias: str) -> DataFrame:
    """one row: sum of C(n, 2) over a (.., n) sizes frame."""
    return sizes.agg(
        F.coalesce(
            F.sum(F.expr("n * (n - 1) div 2")), F.lit(0).cast("long")
        ).alias(alias)
    )


def pair_counting_stats(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """pred(doc_id, cluster_id) x gold(doc_id, cluster_id) ->
    one row: (tp_pairs, pred_pairs, gold_pairs, precision_permille,
    recall_permille), computed over the doc_ids PRESENT IN BOTH
    labelings (inner join — callers decide how to label singletons).

    The corpus-sized join is traversed ONCE: the contingency `cells`
    aggregation is the only exchange over it, and all three pair sums
    derive from the (small) cells table — per-cluster sizes are sums of
    cell counts, so the marginals never re-read the join (the identical
    cells subtree is shared; Spark's ReuseExchange collapses it to one
    physical scan+join+shuffle).
    """
    joined = (
        pred.select("doc_id", F.col("cluster_id").alias("pred_c"))
        .join(
            gold.select("doc_id", F.col("cluster_id").alias("gold_c")),
            "doc_id",
        )
        .select("pred_c", "gold_c")
    )
    cells = joined.groupBy("pred_c", "gold_c").agg(
        F.count(F.lit(1)).alias("n")
    )
    tp = _sum_c2(cells, "tp_pairs")
    pp = _sum_c2(
        cells.groupBy("pred_c").agg(F.sum("n").alias("n")), "pred_pairs"
    )
    gp = _sum_c2(
        cells.groupBy("gold_c").agg(F.sum("n").alias("n")), "gold_pairs"
    )
    return (
        tp.crossJoin(pp)
        .crossJoin(gp)
        .select(
            "tp_pairs",
            "pred_pairs",
            "gold_pairs",
            F.expr(
                "CASE WHEN pred_pairs > 0"
                " THEN (1000 * tp_pairs) div pred_pairs END"
            ).alias("precision_permille"),
            F.expr(
                "CASE WHEN gold_pairs > 0"
                " THEN (1000 * tp_pairs) div gold_pairs END"
            ).alias("recall_permille"),
        )
    )


def radius_sweep(pairs: DataFrame, max_radius: int = 3) -> DataFrame:
    """Per-Hamming-radius candidate volume: the tuning table for the
    verification budget.

    The reference runs at a FIXED radius 3 (incload/DeDupMapper.java
    band layout; 4 bands x 16 bits is pigeonhole-complete for <= 3).
    A user re-tuning for a new corpus wants to know what each radius
    unit costs and buys BEFORE committing a full run: this sweep takes
    the verified pair set (near_pairs output, `hamming` column) and
    reports, per radius 0..max_radius, the exact pair count, the
    cumulative count a run at that radius would verify, and its
    integer-permille share of the max-radius total.

    Note on the radius-0 row: it counts only radius-0 pairs PRESENT IN
    THE VERIFIED PAIR SET.  In the pipeline, exact-fingerprint
    duplicates are collapsed by the upstream fingerprint grouping and
    never reach near_pairs (which emits hamming in [1, k]), so on a
    corpus with exact dups the radius-0 row is structurally 0 and
    understates what radius 0 'buys' — read the exact-dup group sizes
    (exact_groups / spam stats) for that share instead.

    Scale shape: one map-side-combined groupBy onto <= max_radius+1
    keys; the windows run over that <= max_radius+1-row frame, never
    over the corpus.  Ratios are integer-exact (CLAUDE.md rule 4).
    """
    spark = pairs.sparkSession
    radii = spark.range(0, max_radius + 1).withColumnRenamed("id", "radius")
    counts = (
        pairs.filter(F.col("hamming") <= max_radius)
        .groupBy(F.col("hamming").cast("bigint").alias("radius"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    from pyspark.sql import Window

    w_cum = Window.orderBy("radius").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    return (
        radii.join(counts, "radius", "left")
        .fillna(0, ["n_pairs"])
        .select(
            "radius",
            "n_pairs",
            F.sum("n_pairs").over(w_cum).alias("cum_pairs"),
            F.sum("n_pairs").over(w_all).alias("tot"),
        )
        .select(
            "radius",
            "n_pairs",
            "cum_pairs",
            F.expr(
                "CASE WHEN tot = 0 THEN 0"
                " ELSE (1000 * cum_pairs) div tot END"
            ).cast("bigint").alias("share_permille"),
        )
    )
