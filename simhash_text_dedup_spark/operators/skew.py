"""Shared hot-bucket routing mechanics for quadratic self-joins.

Every corpus self-join on a bucket key (SimHash bands, MinHash bands,
LSH sketch bands, SemDeDup clusters) has the same skew hazard — one
over-populated bucket serializes its |bucket|^2 comparison into a
single task — and the same remedy: split rows into cold/hot by a
(tiny, broadcast) over-cap histogram, join cold buckets plainly, and
join hot buckets on an extra salt column (probe side hashed, build
side replicated per salt) so the quadratic block spreads across
`salt_partitions` tasks.  Routing is correctness-independent as long
as bucket membership is row-determined: every row is entirely cold or
entirely hot, and within a hot bucket each (a, b) pair meets in
exactly one salt.

This module carries the mechanics ONCE for the self-join family
(minhash_pairs / semdedup / lsh_near_pairs).  The SimHash path in
operators/pairs.py keeps its own routing: its cap counts DISTINCT
fingerprints per bucket (not rows) and interacts with the spam
pre-pass and drop mode — different semantics, deliberately not
unified."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_hot_buckets(
    df: DataFrame, keys: list, cap: int
) -> tuple[DataFrame, DataFrame]:
    """(cold, hot): rows split by whether their bucket (the `keys`
    tuple) holds more than `cap` rows.  The over-cap histogram is one
    row per hot bucket — lineage-cut and broadcast to both branches."""
    hot = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > int(cap))
        .select(*keys)
        .localCheckpoint(eager=False)
    )
    return (
        df.join(F.broadcast(hot), keys, "left_anti"),
        df.join(F.broadcast(hot), keys, "left_semi"),
    )


def salt_probe(df: DataFrame, id_col: str, salt_partitions: int) -> DataFrame:
    """Probe side of the salted sub-join: one deterministic salt per
    row, derived from the row's id."""
    return df.withColumn(
        "salt",
        F.pmod(F.xxhash64(id_col), F.lit(int(salt_partitions))).cast("int"),
    )


def salt_build(df: DataFrame, salt_partitions: int) -> DataFrame:
    """Build side of the salted sub-join: replicated once per salt
    value, so every probe row meets every build row exactly once."""
    return df.withColumn(
        "salt",
        F.explode(F.array(*[F.lit(i) for i in range(int(salt_partitions))])),
    )
