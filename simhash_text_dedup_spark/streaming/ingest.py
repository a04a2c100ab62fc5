"""Structured-Streaming ingestion — the idiomatic Spark replacement for
the reference's infinite driver loop that polls HDFS folders every 10 s
and processes one timestamped batch at a time
(spider/hadoop/jobcontrol/SelectAndSendJob.java:68,118-172,244-258;
SURVEY.md §2.9).

`stream_fingerprint_ingest` watches a directory of documents parquet
files; each micro-batch is fingerprinted (same pandas-UDF kernel as the
batch pipeline) and appended to the fingerprint corpus table.  The file
source's checkpoint replaces the reference's *_old folder renames as the
exactly-once / resume mechanism.  Trigger.AvailableNow drains what is
present and stops — matching the reference's batch-per-round behavior
while remaining a real streaming query (continuous deployment = same
code with a processingTime trigger).

`windowed_event_stats` is the watermarked tumbling-window aggregation
over the events stream (late data handled by the watermark) — the
streaming analog of q_events_hourly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from simhash_text_dedup_spark.config import DedupConfig
from simhash_text_dedup_spark.plans.pipeline import fingerprint_stage, prepare_documents

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def write_fingerprint_batch(
    batch_df: DataFrame,
    batch_id: int,
    output_dir: str,
    cfg: DedupConfig = DedupConfig(),
) -> None:
    """Idempotent micro-batch sink: fingerprint the batch and OVERWRITE
    its own `batch_id=<id>` partition directory — a replay after a
    partial write replaces, never duplicates."""
    fps = fingerprint_stage(prepare_documents(batch_df), cfg)
    fps.write.mode("overwrite").parquet(f"{output_dir}/batch_id={batch_id}")


def stream_fingerprint_ingest(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: DedupConfig = DedupConfig(),
    available_now: bool = True,
):
    """Watch input_dir for new documents parquet files; write
    (doc_id, fingerprint, score, is_new, content_sha256, batch_id) to
    output_dir.  Returns the StreamingQuery (caller awaits/stops).

    Effectively-once sink: each micro-batch OVERWRITES its own
    `batch_id=<id>` partition directory, so a batch replayed after a
    mid-write failure replaces its partial output instead of appending
    duplicates (plain mode('append') would be at-least-once —
    round-1 ADVICE).  Readers see batch_id as a partition column."""
    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", "16")
        .parquet(input_dir)
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        write_fingerprint_batch(batch_df, batch_id, output_dir, cfg)

    writer = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="10 seconds")
    return writer.start()


def windowed_event_stats(
    events_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window aggregation over a streaming events
    DataFrame; append-mode safe (final results emitted once the
    watermark passes)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )
