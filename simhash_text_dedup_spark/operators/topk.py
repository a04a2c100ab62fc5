"""Total-order top-k with an old/new quota split (SURVEY.md §2.6 T1).

Reference semantics (hbase/mapreduce/TotalValueSort.java:279-316): the
fetch budget `k` is split between OLD and NEW records by `oldNewRatio` —
the total-order-partitioned reducer range is divided so old records fill
the first `old_ratio * reducers` partitions and new records the rest;
each side contributes its own score-descending top records.  When one
side has fewer records than its quota, the other side's range covers
the remainder (the partition index arithmetic at :288-306).

Spark-first restatement (SURVEY prescribes "two filtered limits
unioned"): rank each side independently with a window, compute each
side's spill-adjusted limit from the other side's total count (one tiny
broadcast of a 1-row aggregate), and filter — no global sort, no
sampling stage (Spark's range partitioner only kicks in if a total
order is requested downstream).
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

    w = Window.partitionBy(is_old).orderBy(*order_by)
    ranked = df.withColumn("rank", F.row_number().over(w))

    counts = df.groupBy().agg(
        F.sum(F.when(F.col(is_old), 1).otherwise(0)).alias("_n_old"),
        F.sum(F.when(F.col(is_old), 0).otherwise(1)).alias("_n_new"),
    )
    spill_to_old = F.greatest(F.lit(0), F.lit(quota_new) - F.col("_n_new"))
    spill_to_new = F.greatest(F.lit(0), F.lit(quota_old) - F.col("_n_old"))
    limit = F.when(
        F.col(is_old), F.lit(quota_old) + spill_to_old
    ).otherwise(F.lit(quota_new) + spill_to_new)

    return (
        ranked.crossJoin(F.broadcast(counts))
        .filter(F.col("rank") <= limit)
        .drop("_n_old", "_n_new")
    )
