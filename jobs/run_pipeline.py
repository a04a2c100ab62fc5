#!/usr/bin/env python
"""spark-submit entry point for the dedup pipeline.

    spark-submit --py-files simhash_text_dedup_spark.zip \
        jobs/run_pipeline.py --input <documents parquet/table> \
        --checkpoint <dir> --output <dir> [--spam-threshold N]
        [--selection cc|greedy] [--minhash] [--containment]
        [--quality-prefilter] [--radius-sweep] [--resume] [--lineage]

On a cluster, package the library with
    (cd <repo> && zip -r simhash_text_dedup_spark.zip simhash_text_dedup_spark)
and pass it via --py-files (BASELINE north rule launch contract).
"""

from __future__ import annotations

import argparse


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--spam-threshold", type=int, default=1000)
    p.add_argument("--selection", choices=["cc", "greedy"], default="cc")
    p.add_argument("--minhash", action="store_true")
    p.add_argument("--containment", action="store_true")
    p.add_argument("--substring", action="store_true",
                   help="suffix-array LCS verification of MinHash-band "
                        "candidates (kind='substring')")
    p.add_argument("--lcs-ratio", type=float, default=0.8)
    p.add_argument("--quality-prefilter", action="store_true",
                   help="drop documents failing the Gopher-style rule "
                        "battery BEFORE fingerprinting (flags written "
                        "to <output>/quality_flags)")
    p.add_argument("--radius-sweep", action="store_true",
                   help="write the per-Hamming-radius verification-"
                        "budget table (<output>/radius_sweep) from the "
                        "run's own pair set")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--lineage", action="store_true")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from simhash_text_dedup_spark.config import DedupConfig
    from simhash_text_dedup_spark.plans.pipeline import run_dedup

    spark = SparkSession.builder.appName("simhash-dedup").getOrCreate()
    cfg = DedupConfig(
        spam_threshold=args.spam_threshold,
        selection=args.selection,
        enable_minhash=args.minhash,
        enable_containment=args.containment,
        enable_substring=args.substring,
        lcs_ratio=args.lcs_ratio,
    )
    docs = spark.read.parquet(args.input)
    if args.quality_prefilter:
        from pyspark.sql import functions as F

        from simhash_text_dedup_spark.operators.quality import quality_filter

        # a unique, deterministic per-document key (the digest docid is
        # only assigned later, inside prepare_documents)
        qid = F.xxhash64("repo", "path", "commit")
        flags = quality_filter(
            docs.withColumn("__qid", qid), id_col="__qid", text_col="content"
        )
        flags.write.mode("overwrite").parquet(f"{args.output}/quality_flags")
        # join against the just-written table, not the flags lineage —
        # otherwise the rule battery (a corpus exchange) runs twice
        flags = spark.read.parquet(f"{args.output}/quality_flags")
        docs = (
            docs.withColumn("__qid", qid)
            .join(
                flags.filter(F.col("keep")).select(
                    F.col("doc_id").alias("__qid")
                ),
                "__qid",
                "left_semi",
            )
            .drop("__qid")
        )
    res = run_dedup(
        spark, docs, cfg,
        checkpoint_dir=args.checkpoint,
        resume=args.resume,
        lineage=args.lineage,
    )
    res.clusters.write.mode("overwrite").parquet(f"{args.output}/clusters")
    res.pairs.write.mode("overwrite").parquet(f"{args.output}/pairs")
    res.spam_kills.write.mode("overwrite").parquet(f"{args.output}/spam_kills")
    if args.radius_sweep:
        from simhash_text_dedup_spark.operators.evaluate import radius_sweep

        # read the pairs just written so the round DAG is not replayed;
        # non-Hamming kinds (minhash/containment/substring) carry NULL
        # hamming and fall out of the sweep's radius filter
        sweep_src = spark.read.parquet(f"{args.output}/pairs")
        radius_sweep(sweep_src).write.mode("overwrite").parquet(
            f"{args.output}/radius_sweep"
        )
    # per-run counters (A7 analog), filled for free by the writes above
    import json

    print("observed_metrics:",
          json.dumps(res.metrics["observed_metrics"]()))
    spark.stop()


if __name__ == "__main__":
    main()
