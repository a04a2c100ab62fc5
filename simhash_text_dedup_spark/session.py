"""SparkSession factory with the pipeline's standard local-mode tuning.

Designed for a multi-executor cluster (everything is partition-count
driven, nothing materializes O(corpus) on the driver); in this sandbox
it runs on local[N] which models N executor cores.
"""

from __future__ import annotations

import os

import pandas as pd  # module-level: pandas_udf type hints resolve here
from pyspark.sql import SparkSession

# appIds whose JVM Python-runner path has been warmed (getOrCreate can
# hand the same live session back to several get_spark calls)
_PY_RUNNER_WARMED: set[str] = set()


def _warm_python_runner(spark: SparkSession) -> None:
    """Pay the JVM's one-time Python-runner/Arrow initialization at
    session creation instead of inside the first UDF-bearing query.

    The first Arrow-UDF stage a fresh JVM executes costs ~3.5 s of
    one-time setup (measured on this sandbox: 3.56/3.67/4.08 s for a
    trivial pandas-UDF stage at 1/8/32 partitions vs 0.3-0.4 s for the
    identical second stage — constant in partition count, so it is
    class-loading/buffer init in the runner machinery, not worker
    spawn).  Each runner CLASS then pays a smaller own first-use cost
    (after the scalar warm: first applyInPandas 0.75 s vs 0.32 s
    steady, first mapInPandas 0.52 s vs 0.21 s), so all three shapes
    the pipeline uses are exercised once.  Production executors are
    long-lived and every pipeline in this repo runs Arrow UDF stages,
    so initializing the path at startup is the steady-state-honest
    shape; a 64-row range touches no input data.  Failure is
    non-fatal: the first real UDF stage then pays the init exactly as
    before."""
    app_id = spark.sparkContext.applicationId
    if app_id in _PY_RUNNER_WARMED:
        return
    _PY_RUNNER_WARMED.add(app_id)
    try:
        from pyspark.sql import functions as F
        from pyspark.sql.pandas.functions import pandas_udf

        @pandas_udf("long")
        def _wp(s: pd.Series) -> pd.Series:
            return s

        def _wg(pdf: pd.DataFrame) -> pd.DataFrame:
            return pdf

        def _wm(it):
            yield from it

        base = spark.range(0, 64, 1, 2).withColumn("g", F.col("id") % 4)
        base.select(F.count(_wp("id"))).collect()
        noop = lambda df: df.write.format("noop").mode("overwrite").save()  # noqa: E731
        noop(base.groupBy("g").applyInPandas(_wg, "id long, g long"))
        noop(base.mapInPandas(_wm, "id long, g long"))
    except Exception:  # pragma: no cover - defensive; warmup only
        pass


def get_spark(
    app: str = "simhash-text-dedup-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores * 2, 8)
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _warm_python_runner(spark)
    return spark
