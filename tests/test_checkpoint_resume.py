"""Checkpoint/resume + lineage metrics (north rule: resumable from
checkpoint with per-partition lineage)."""

import json
import os
import time

from simhash_text_dedup_spark.config import DedupConfig
from simhash_text_dedup_spark.plans.pipeline import run_dedup
from simhash_text_dedup_spark.sources.corpus import CorpusSpec, generate_corpus

CFG = DedupConfig(spam_threshold=5)


def test_resume_skips_stages_and_matches(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ckpt"))
    docs, _ = generate_corpus(CorpusSpec(n_docs=300, seed=21))
    df = spark.createDataFrame(docs)

    t0 = time.time()
    r1 = run_dedup(spark, df, CFG, checkpoint_dir=root, resume=False)
    first = {(x.doc_id, x.cluster_id, x.action) for x in r1.clusters.collect()}
    cold = time.time() - t0

    t0 = time.time()
    r2 = run_dedup(spark, df, CFG, checkpoint_dir=root, resume=True)
    second = {(x.doc_id, x.cluster_id, x.action) for x in r2.clusters.collect()}
    warm = time.time() - t0

    assert first == second
    assert warm < cold * 0.7  # resumed run must skip recomputation
    # every stage directory has a success marker
    for stage in ("fingerprints", "spam_tagged", "pairs", "clusters"):
        assert os.path.exists(os.path.join(root, stage, "_SUCCESS")), stage


def test_lineage_written(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("lin"))
    docs, _ = generate_corpus(CorpusSpec(n_docs=200, seed=22))
    res = run_dedup(
        spark, spark.createDataFrame(docs), CFG,
        checkpoint_dir=root, resume=False, lineage=True,
    )
    res.clusters.count()
    path = os.path.join(root, "_lineage.json")
    assert os.path.exists(path)
    stages = json.load(open(path))
    names = [s["stage"] for s in stages]
    assert names == ["fingerprints", "spam_tagged", "pairs", "clusters"]
    for s in stages:
        assert s["rows"] >= 0 and s["n_partitions"] >= 0
        assert "per_partition" in s and "partition_rows" in s
    fp = stages[0]
    assert fp["rows"] == 200
