#!/usr/bin/env python
"""spark-submit entry point for INCREMENTAL dedup rounds against a
snapshot-table corpus (north rule: resumable from Iceberg snapshot
checkpoints; reference analog: the per-round incload DeDup+SelectLogic
jobs probing the loaded HBase corpus).

    spark-submit --py-files simhash_text_dedup_spark.zip \
        jobs/run_incremental.py --new-batch <documents parquet> \
        --corpus-table <snapshot table dir> --output <dir> \
        [--checkpoint <dir>] [--spam-threshold N] [--selection cc|greedy]
        [--resume] [--banded-corpus-table <name>]
        [--minhash-sigs-table <snapshot dir>]

--minhash-sigs-table enables the MinHash borderline path for the round
(cfg.enable_minhash): the batch's signatures probe the corpus
signature table across the same new-vs-old domain, MinHash-verified
pairs (kind='minhash') join the pair set, and after the commit the
batch's signatures MERGE into the table by entity_id — the signature
analog of the fingerprint corpus table.

--banded-corpus-table routes the round's band join through the SAVED
pre-banded bucketed layout (sources/banded_corpus.py): the corpus
side reads co-located with zero shuffle — only the new batch's band
rows move — and after the MERGE commit the layout is MAINTAINED
(append the batch, tombstone superseded re-crawl rows) instead of the
per-round O(corpus) memtable rebuild the reference performs
(incload/MemTable.java:80-212).  Bootstraps on the first round and
self-heals (rebuild) if the layout drifts from the corpus.

Round contract:
  1. base = corpus table's CURRENT snapshot (or empty on round 1);
  2. run_incremental(new_batch, base) -> pairs, unload, delete/modify;
  3. MERGE the round's new fingerprints into the corpus table by
     entity_id (re-crawls replace their previous row; commit is atomic
     and optimistic — a concurrent round conflicts instead of
     corrupting);
  4. side lists written as named outputs (S11): delete/modify as csv
     (the reference ships these as text lists), pairs/unload as parquet.

With real Iceberg, step 3 is
  MERGE INTO corpus t USING updates s ON t.entity_id = s.entity_id
  WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
"""

from __future__ import annotations

import argparse


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--new-batch", required=True)
    p.add_argument("--corpus-table", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--spam-threshold", type=int, default=1000)
    p.add_argument("--selection", choices=["cc", "greedy"], default="cc")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--banded-corpus-table", default=None)
    p.add_argument("--minhash-sigs-table", default=None)
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from simhash_text_dedup_spark.config import DedupConfig
    from simhash_text_dedup_spark.plans.incremental import run_incremental
    from simhash_text_dedup_spark.sources.io import write_named_outputs
    from simhash_text_dedup_spark.sources.snapshots import SnapshotTable

    spark = SparkSession.builder.appName("simhash-dedup-incremental").getOrCreate()
    cfg = DedupConfig(spam_threshold=args.spam_threshold, selection=args.selection)

    corpus = SnapshotTable(spark, args.corpus_table)
    base = None if corpus.is_empty() else corpus.read()
    new_docs = spark.read.parquet(args.new_batch)

    banded = None
    n_base = None
    if args.banded_corpus_table is not None and base is not None:
        from simhash_text_dedup_spark.sources.banded_corpus import (
            assert_banded_sync,
            write_banded_corpus,
        )

        n_base = base.count()
        try:
            assert_banded_sync(spark, args.banded_corpus_table, base, cfg)
        except Exception:
            # missing (first round after bootstrap) or drifted: rebuild
            write_banded_corpus(base, args.banded_corpus_table, cfg)
        banded = args.banded_corpus_table

    sigs_table = None
    base_sigs = None
    if args.minhash_sigs_table is not None:
        cfg = cfg.with_(enable_minhash=True)
        sigs_table = SnapshotTable(spark, args.minhash_sigs_table)
        base_sigs = None if sigs_table.is_empty() else sigs_table.read()

    res = run_incremental(
        spark, new_docs, base, cfg,
        checkpoint_dir=args.checkpoint, resume=args.resume,
        banded_corpus_table=banded, verify_banded_sync=False,
        base_sigs=base_sigs,
    )

    # commit ONLY docs that should exist in the corpus going forward:
    # spam-killed rows and delete-list losers are never loaded (the
    # reference drops them before the HBase bulk-load) — committing
    # them would re-seed next round's band join with the very floods
    # the spam pass exists to kill
    to_commit = (
        res.new_fingerprints
        .join(res.spam_kills.select("doc_id"), "doc_id", "left_anti")
        .join(res.delete_list.select("doc_id"), "doc_id", "left_anti")
        .select("doc_id", "entity_id", "fingerprint", "score")
    )
    if args.banded_corpus_table is not None:
        to_commit = to_commit.localCheckpoint(eager=False)
    snap = corpus.merge(to_commit, key_cols=["entity_id"])
    if args.banded_corpus_table is not None:
        from simhash_text_dedup_spark.sources.banded_corpus import (
            maintain_banded_corpus,
        )

        action = maintain_banded_corpus(
            spark, args.banded_corpus_table, base, n_base, to_commit,
            corpus.read(), cfg,
        )
        print(f"banded corpus maintenance: {action}")
    if sigs_table is not None and res.new_signatures is not None:
        # signature commit mirrors the fingerprint commit: the join to
        # to_commit keeps exactly the surviving docs (spam kills and
        # delete-list losers never load)
        sig_commit = (
            res.new_signatures
            .join(to_commit.select("doc_id", "score"), "doc_id")
            .select("doc_id", "entity_id", "sig", "bands", "score")
        )
        ssnap = sigs_table.merge(sig_commit, key_cols=["entity_id"])
        print(f"committed signature snapshot {ssnap}")
    write_named_outputs(
        {
            "delete_list": res.delete_list,
            "modify_list": res.modify_list,
            "unload": res.unload,
            "pairs": res.pairs,
            "clusters": res.clusters,
        },
        args.output,
        formats={"delete_list": "csv", "modify_list": "csv"},
    )
    print(f"committed corpus snapshot {snap}")
    spark.stop()


if __name__ == "__main__":
    main()
