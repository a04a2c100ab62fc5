"""Continuous dedup rounds (streaming/dedup.py): each micro-batch runs
a full incremental round against the snapshot-table corpus, MERGE-
commits the survivors, and ships per-batch delete/modify/unload lists
— the streaming restatement of the reference's folder-polling round
loop (SelectAndSendJob.java:118-172)."""

import os

import pandas as pd
from pyspark.sql import functions as F

from simhash_text_dedup_spark.config import DedupConfig
from simhash_text_dedup_spark.sources.corpus import CorpusSpec, generate_corpus
from simhash_text_dedup_spark.sources.snapshots import SnapshotTable
from simhash_text_dedup_spark.streaming.dedup import stream_dedup_rounds

CFG = DedupConfig(spam_threshold=5)


def test_stream_dedup_rounds_commit_and_lists(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("sdedup")
    in_dir = str(root / "in")
    os.makedirs(in_dir)
    corpus_dir = str(root / "corpus")
    lists_dir = str(root / "lists")
    ck = str(root / "ck")

    docs, _ = generate_corpus(CorpusSpec(n_docs=120, seed=11))
    first = docs.iloc[:100]
    first.to_parquet(f"{in_dir}/round0.parquet", index=False)

    q = stream_dedup_rounds(spark, in_dir, corpus_dir, lists_dir, ck, CFG)
    q.awaitTermination(240)

    committed1 = SnapshotTable(spark, corpus_dir).read()
    n1 = committed1.count()
    assert n1 > 0
    # one committed row per entity
    assert committed1.select("entity_id").distinct().count() == n1

    # round 2: 10 unchanged re-crawls of docs KNOWN committed in round 1
    # (spam-killed/deleted docs never load, so a re-crawl of one is not
    # an unload) + the 20 remaining new docs
    committed_entities = {
        r.entity_id for r in committed1.select("entity_id").collect()
    }
    first_entities = (
        spark.createDataFrame(first)
        .withColumn("entity_id", F.xxhash64("repo", "path"))
        .select("path", "entity_id")
        .collect()
    )
    keep_paths = [
        r.path for r in first_entities if r.entity_id in committed_entities
    ][:10]
    assert len(keep_paths) == 10
    recrawl = first[first.path.isin(keep_paths)]
    second = pd.concat([recrawl, docs.iloc[100:]], ignore_index=True)
    second.to_parquet(f"{in_dir}/round1.parquet", index=False)

    q2 = stream_dedup_rounds(spark, in_dir, corpus_dir, lists_dir, ck, CFG)
    q2.awaitTermination(240)

    committed2 = SnapshotTable(spark, corpus_dir).read()
    # corpus grew (some of the 20 new docs may dedup away, never shrink)
    assert committed2.select("entity_id").distinct().count() >= n1

    # stream checkpoint made it two batches; the second batch's unload
    # list holds exactly the 10 unchanged re-crawls
    batch_dirs = sorted(os.listdir(lists_dir))
    assert len(batch_dirs) == 2, batch_dirs
    unload = spark.read.parquet(f"{lists_dir}/{batch_dirs[-1]}/unload")
    assert unload.count() == 10

    # replaying the same round (fresh checkpoint, same input file) is
    # idempotent on the corpus: MERGE by entity_id upserts identical rows
    before = {
        (r.entity_id, r.fingerprint)
        for r in committed2.select("entity_id", "fingerprint").collect()
    }
    q3 = stream_dedup_rounds(
        spark, in_dir, corpus_dir, lists_dir, str(root / "ck_replay"), CFG
    )
    q3.awaitTermination(240)
    after = {
        (r.entity_id, r.fingerprint)
        for r in SnapshotTable(spark, corpus_dir)
        .read().select("entity_id", "fingerprint").collect()
    }
    assert after == before


def test_stream_dedup_banded_rounds(spark, tmp_path_factory, monkeypatch):
    """banded_corpus_table wiring (round-3 VERDICT #5): the second
    micro-batch's round must run through the SAVED banded layout (only
    the new side shuffles), the commit step must MAINTAIN the layout
    (live count tracks the corpus), and the committed corpus must be
    identical to a plain (non-banded) stream over the same input."""
    import simhash_text_dedup_spark.streaming.dedup as sd
    from simhash_text_dedup_spark.sources.banded_corpus import (
        candidate_pairs_banded,
        live_doc_count,
    )

    root = tmp_path_factory.mktemp("sdedupb")
    in_dir = str(root / "in")
    os.makedirs(in_dir)
    docs, _ = generate_corpus(CorpusSpec(n_docs=120, seed=23))
    docs.iloc[:70].to_parquet(f"{in_dir}/round0.parquet", index=False)

    wh = tmp_path_factory.mktemp("sbdwh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS sbd LOCATION '{wh}'")
    calls = []
    real_run = sd.run_incremental

    def spy(spark_, new_docs, base, cfg, **kw):
        calls.append(kw.get("banded_corpus_table"))
        return real_run(spark_, new_docs, base, cfg, **kw)

    monkeypatch.setattr(sd, "run_incremental", spy)
    try:
        corpus_dir = str(root / "corpus")
        q = stream_dedup_rounds(
            spark, in_dir, corpus_dir, str(root / "lists"),
            str(root / "ck"), CFG, banded_corpus_table="sbd.corpus",
        )
        q.awaitTermination(240)
        # batch 0: empty corpus -> plain round, then layout bootstrap
        assert calls == [None]
        n1 = SnapshotTable(spark, corpus_dir).read().count()
        assert live_doc_count(spark, "sbd.corpus", CFG) == n1

        docs.iloc[70:].to_parquet(f"{in_dir}/round1.parquet", index=False)
        q2 = stream_dedup_rounds(
            spark, in_dir, corpus_dir, str(root / "lists"),
            str(root / "ck"), CFG, banded_corpus_table="sbd.corpus",
        )
        q2.awaitTermination(240)
        assert calls[-1] == "sbd.corpus"  # round 2 used the layout
        committed = SnapshotTable(spark, corpus_dir).read()
        assert live_doc_count(spark, "sbd.corpus", CFG) == committed.count()

        # identical corpus to the plain stream over the same files
        plain_dir = str(root / "plain_corpus")
        for ck in ("pck",):
            qp = stream_dedup_rounds(
                spark, in_dir, plain_dir, str(root / "plain_lists"),
                str(root / ck), CFG,
            )
            qp.awaitTermination(240)
        got = {
            (r.entity_id, r.fingerprint)
            for r in committed.select("entity_id", "fingerprint").collect()
        }
        want = {
            (r.entity_id, r.fingerprint)
            for r in SnapshotTable(spark, plain_dir)
            .read().select("entity_id", "fingerprint").collect()
        }
        assert got == want and len(want) > 0

        # co-location survives maintenance: the cold corpus side of a
        # fresh round join over the MAINTAINED table feeds its join
        # with no exchange (only the new side hashes on bkey alone)
        import io as _io
        import re
        from contextlib import redirect_stdout

        new_side = spark.createDataFrame(
            [(999001, 0x0F1E2D3C4B5A6978)],
            "doc_id long, fingerprint long",
        ).select(
            "doc_id", "fingerprint", F.lit(True).alias("is_new"),
            F.lit(False).alias("is_loaded"), F.lit(1.0).alias("score"),
        )
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = candidate_pairs_banded(spark, new_side, "sbd.corpus", CFG)
            buf = _io.StringIO()
            with redirect_stdout(buf):
                j.explain("formatted")
            plan = buf.getvalue()
            assert "Bucketed: true" in plan, plan
            single = re.findall(r"hashpartitioning\(bkey#\d+, \d+\)", plan)
            assert len(single) == 1, plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP DATABASE IF EXISTS sbd CASCADE")


def test_stream_dedup_quality_prefilter(spark, tmp_path_factory):
    """Junk docs failing the rule battery never reach the corpus; the
    per-batch flag table ships next to the round lists."""
    root = tmp_path_factory.mktemp("sdedup_q")
    in_dir = str(root / "in")
    os.makedirs(in_dir)
    corpus_dir = str(root / "corpus")
    lists_dir = str(root / "lists")
    ck = str(root / "ck")

    docs, _ = generate_corpus(CorpusSpec(n_docs=60, seed=23))
    junk = pd.DataFrame(
        [
            {"repo": "junkrepo", "path": f"j{i}", "commit": "c0",
             "lang": "python", "content": "x y"}
            for i in range(5)
        ]
    )
    pd.concat([docs, junk], ignore_index=True).to_parquet(
        f"{in_dir}/round0.parquet", index=False
    )

    q = stream_dedup_rounds(
        spark, in_dir, corpus_dir, lists_dir, ck, CFG,
        quality_prefilter=True,
    )
    q.awaitTermination(240)

    committed = (
        SnapshotTable(spark, corpus_dir).read()
        .withColumn("is_junk", F.col("entity_id").isin(
            [r.entity_id for r in spark.createDataFrame(junk)
             .withColumn("entity_id", F.xxhash64("repo", "path"))
             .select("entity_id").collect()]))
    )
    assert committed.filter("is_junk").count() == 0
    assert committed.count() > 0
    flags = spark.read.parquet(f"{lists_dir}/batch_id=0/quality_flags")
    assert flags.filter("NOT keep").count() >= 5
