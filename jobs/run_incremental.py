#!/usr/bin/env python
"""spark-submit entry point for INCREMENTAL dedup rounds against a
snapshot-table corpus (north rule: resumable from Iceberg snapshot
checkpoints; reference analog: the per-round incload DeDup+SelectLogic
jobs probing the loaded HBase corpus).

    spark-submit --py-files simhash_text_dedup_spark.zip \
        jobs/run_incremental.py --new-batch <documents parquet> \
        --corpus-table <snapshot table dir> --output <dir> \
        [--checkpoint <dir>] [--spam-threshold N] [--selection cc|greedy]
        [--resume]

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

    res = run_incremental(
        spark, new_docs, base, cfg,
        checkpoint_dir=args.checkpoint, resume=args.resume,
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
    snap = corpus.merge(to_commit, key_cols=["entity_id"])
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
