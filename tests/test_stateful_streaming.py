"""Stateful streaming per-entity fingerprint tracking (§2.9 extension:
applyInPandasWithState), state preserved across micro-batches."""

import os

from pyspark.sql import types as T

from simhash_text_dedup_spark.streaming.stateful import track_entity_versions

SCHEMA = T.StructType(
    [
        T.StructField("entity_id", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("fingerprint", T.LongType()),
    ]
)


def _write_batch(spark, path, rows, name):
    import pandas as pd

    pd.DataFrame(
        rows, columns=["entity_id", "doc_id", "fingerprint"]
    ).astype("int64").to_parquet(f"{path}/{name}.parquet", index=False)


def test_decisions_across_micro_batches(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("state")
    in_dir = str(root / "in")
    ck = str(root / "ck")
    os.makedirs(in_dir)

    out_dir = str(root / "out")

    def run_round():
        stream = spark.readStream.schema(SCHEMA).option(
            "maxFilesPerTrigger", "1"
        ).parquet(in_dir)
        q = (
            track_entity_versions(stream)
            .writeStream.outputMode("append").format("parquet")
            .option("path", out_dir).option("checkpointLocation", ck)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        return {
            (r.entity_id, r.doc_id): r.decision
            for r in spark.read.parquet(out_dir).collect()
        }

    # micro-batch 1: entities 1 and 2 appear
    _write_batch(spark, in_dir, [(1, 10, 111), (2, 20, 222)], "b0")
    got = run_round()
    assert got == {(1, 10): "new", (2, 20): "new"}

    # round 2 (new stream run, SAME checkpoint -> state restored):
    # entity 1 unchanged fingerprint, entity 2 modified, entity 3 new
    _write_batch(
        spark, in_dir, [(1, 11, 111), (2, 21, 999), (3, 30, 333)], "b1"
    )
    got2 = run_round()
    assert got2 == {
        (1, 10): "new",
        (2, 20): "new",
        (1, 11): "unchanged",
        (2, 21): "modified",
        (3, 30): "new",
    }
