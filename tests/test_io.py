"""Partitioned output writers (reference S9/S10 analogs)."""

import os

from pyspark.sql import functions as F

from simhash_text_dedup_spark.sources.io import (
    write_bucketed_by_id,
    write_sorted_within_partitions,
)


def test_bucketed_write_prunes(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("bk") / "t")
    df = spark.range(0, 5000).withColumn("doc_id", F.col("id") * 7919)
    write_bucketed_by_id(df, out, n_buckets=16)
    # directory layout has bucket= partitions
    buckets = [d for d in os.listdir(out) if d.startswith("bucket=")]
    assert len(buckets) == 16
    back = spark.read.parquet(out)
    assert back.count() == 5000
    # filtering on bucket prunes partitions (plan shows PartitionFilters)
    plan = back.filter(F.col("bucket") == 3)._jdf.queryExecution().executedPlan().toString()
    assert "bucket" in plan
    assert back.filter("bucket = 3").count() == df.filter(
        F.pmod(F.col("doc_id"), F.lit(16)) == 3
    ).count()


def test_sorted_within_partitions(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("srt") / "t")
    df = spark.range(0, 2000).withColumn("doc_id", (F.col("id") * 48271) % 99991)
    write_sorted_within_partitions(df, out, "doc_id", "doc_id", n_partitions=4)
    import pyarrow.parquet as pq
    import glob

    files = glob.glob(f"{out}/*.parquet")
    assert len(files) >= 3
    ranges = []
    for f in files:
        col = pq.read_table(f, columns=["doc_id"]).column("doc_id").to_pylist()
        assert col == sorted(col), "rows not sorted within file"
        if col:
            ranges.append((min(col), max(col)))
    # files cover disjoint ranges (range partitioning)
    ranges.sort()
    for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
        assert a_hi <= b_lo


def test_named_outputs_multiple_formats(spark, tmp_path):
    """S11: multiple named side outputs, each in its own format."""
    from simhash_text_dedup_spark.sources.io import write_named_outputs

    a = spark.createDataFrame([(1, "x"), (2, "y")], "doc_id long, v string")
    b = spark.createDataFrame([(3,)], "doc_id long")
    paths = write_named_outputs(
        {"main": a, "kill_list": b},
        str(tmp_path / "out"),
        formats={"kill_list": "csv"},
    )
    assert spark.read.parquet(paths["main"]).count() == 2
    got = spark.read.option("header", "true").csv(paths["kill_list"]).collect()
    assert [int(r.doc_id) for r in got] == [3]


def test_parallel_corpus_generation_deterministic():
    """Block-parallel generation is deterministic and carries planted
    families in every block."""
    from simhash_text_dedup_spark.sources.corpus import (
        CorpusSpec,
        generate_corpus_parallel,
    )

    spec = CorpusSpec(n_docs=400, seed=7, spam_threshold=5)
    d1, m1 = generate_corpus_parallel(spec, block_docs=150)
    d2, m2 = generate_corpus_parallel(spec, block_docs=150)
    assert d1.equals(d2) and m1.equals(m2)
    assert len(d1) == 400
    assert (m1.family.str.startswith("F-NEAR")).sum() >= 3  # per block
