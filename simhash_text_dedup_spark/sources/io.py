"""Partitioned / bucketed output writers.

The reference ships results to downstream consumers with hand-rolled
partition alignment: HFiles split exactly on HBase region boundaries
(spider/hbase/mapreduce/ParseResultImporter.java:231-290) and send-files
fanned out 1024 ways by the low bits of the docid
(SelectAndSendJob.java:1006-1018, getDocidMod).  The Spark-native
equivalents below let a consumer read any id range without scanning
everything (partition pruning on the bucket column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_bucketed_by_id(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    mode: str = "overwrite",
) -> None:
    """Write partitioned by pmod(id, n_buckets) — the reference's
    1024-way docid fan-out (S10). Readers filtering on the bucket column
    get partition pruning for free."""
    (
        df.withColumn("bucket", F.pmod(F.col(id_col), F.lit(n_buckets)).cast("int"))
        .repartition("bucket")
        .write.mode(mode)
        .partitionBy("bucket")
        .parquet(path)
    )


def write_named_outputs(
    outputs: dict[str, DataFrame],
    base: str,
    formats: dict[str, str] | None = None,
    mode: str = "overwrite",
) -> dict[str, str]:
    """Multiple NAMED outputs, each in its own format — the Spark analog
    of the reference's MultipleOutputs side files (S11: the incload jobs
    emit delete/modify/unload/send lists as differently-formatted named
    outputs next to the main result, SelectAndSendJob.java:541-673).

    formats maps name -> 'parquet' | 'json' | 'csv' (default parquet).
    Returns {name: path}."""
    formats = formats or {}
    paths: dict[str, str] = {}
    for name, df in outputs.items():
        fmt = formats.get(name, "parquet")
        path = f"{base}/{name}"
        w = df.write.mode(mode)
        if fmt == "csv":
            w = w.option("header", "true")
        w.format(fmt).save(path)
        paths[name] = path
    return paths


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed, in-bucket-sorted saved table (`bucketBy` +
    `sortBy`): two tables bucketed on the same key with the same bucket
    count join with NO Exchange — the co-located sort-merge join that
    makes repeated corpus-x-metadata joins shuffle-free at 100 TB
    (asserted in tests/test_plans.py::test_bucketed_join_is_shuffle_free).
    The Spark-native analog of the reference's region-aligned layouts
    (ParseResultImporter.java:231-290): co-locate once at write time,
    join forever without moving data."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def write_sorted_within_partitions(
    df: DataFrame,
    path: str,
    partition_col: str,
    sort_col: str,
    n_partitions: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-partition on partition_col and sort rows within each file —
    the Spark analog of the reference's region-boundary-aligned HFile
    writes (S9: TotalOrderPartitioner over region start keys)."""
    parts = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(parts, F.col(partition_col))
        .sortWithinPartitions(sort_col)
        .write.mode(mode)
        .parquet(path)
    )
