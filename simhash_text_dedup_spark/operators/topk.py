"""Total-order top-k with an old/new quota split (SURVEY.md §2.6 T1).

Reference semantics (hbase/mapreduce/TotalValueSort.java:279-316): the
fetch budget `k` is split between OLD and NEW records by `oldNewRatio` —
the total-order-partitioned reducer range is divided so old records fill
the first `old_ratio * reducers` partitions and new records the rest;
each side contributes its own score-descending top records.  When one
side has fewer records than its quota, the other side's range covers
the remainder (the partition index arithmetic at :288-306).

Spark-first restatement: the reference built sampled range partitioning
(TotalValueSort.java:74-86,310-316) precisely because a single-reducer
sort does not scale; the Spark analog of that property is per-side
`orderBy().limit(k)` — TakeOrderedAndProject, i.e. per-partition top-k
with map-side pre-filter plus a driver merge of k rows per partition.
A side can never contribute more than `k` rows even when the other side
donates its whole quota, so limiting each side to `k` is a safe
over-approximation; ranking then runs over the <= 2k survivors only.
The full table is never windowed, never globally sorted, and never
shuffled onto a 2-partition key (the round-2 VERDICT scale-killer:
`Window.partitionBy(is_old)` funnels the entire table into at most two
tasks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def quota_topk(
    df: DataFrame,
    k: int,
    old_ratio: float = 0.5,
    order_by: list[Column] | None = None,
    is_old: str = "is_old",
) -> DataFrame:
    """Top-k rows with the budget split old/new by `old_ratio`.

    quota_old = floor(k * old_ratio); quota_new = k - quota_old.  A
    side that cannot fill its quota donates the shortfall to the other
    side (TotalValueSort's partition-range spill).  `order_by` defaults
    to score desc, doc_id asc; ties are deterministic.
    Adds `rank` (1-based within the side's ordering).
    """
    order_by = order_by or [F.col("score").desc(), F.col("doc_id").asc()]
    # floor(k * old_ratio) with a binary-float guard: 100 * 0.29 is
    # 28.999999999999996 and plain int() would under-allocate the side
    quota_old = int(k * old_ratio + 1e-9)
    quota_new = k - quota_old

    # a NULL flag counts as "new" everywhere (filter, counts, limit) —
    # with a bare F.col(is_old) a NULL row would fall out of BOTH side
    # filters and silently vanish from the result
    old_flag = F.coalesce(F.col(is_old), F.lit(False))

    # rank window runs over a side's <= k survivors (post-limit), so the
    # "single partition" it implies holds k rows, not the table
    w = Window.orderBy(*order_by)

    def _side_topk(cond: Column) -> DataFrame:
        return (
            df.filter(cond)
            .orderBy(*order_by)
            .limit(k)  # TakeOrderedAndProject: per-partition top-k + driver merge
            .withColumn("rank", F.row_number().over(w))
        )

    ranked = _side_topk(old_flag).unionByName(_side_topk(~old_flag))

    # per-side totals for the spill arithmetic: one map-side-combined
    # count aggregation over the table (the analog of the reference's
    # InputSampler pre-pass), broadcast as a single row
    counts = df.groupBy().agg(
        F.sum(F.when(old_flag, 1).otherwise(0)).alias("_n_old"),
        F.sum(F.when(old_flag, 0).otherwise(1)).alias("_n_new"),
    )
    spill_to_old = F.greatest(F.lit(0), F.lit(quota_new) - F.col("_n_new"))
    spill_to_new = F.greatest(F.lit(0), F.lit(quota_old) - F.col("_n_old"))
    limit = F.when(
        old_flag, F.lit(quota_old) + spill_to_old
    ).otherwise(F.lit(quota_new) + spill_to_new)

    return (
        ranked.crossJoin(F.broadcast(counts))
        .filter(F.col("rank") <= limit)
        .drop("_n_old", "_n_new")
    )
