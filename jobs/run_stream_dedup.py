#!/usr/bin/env python
"""spark-submit entry point for CONTINUOUS dedup: a Structured
Streaming file source where every micro-batch runs one incremental
dedup round against the snapshot-table corpus (streaming/dedup.py —
the reference's folder-polling round loop,
SelectAndSendJob.java:118-172, as a streaming query).

    spark-submit --py-files simhash_text_dedup_spark.zip \
        jobs/run_stream_dedup.py --input <watched documents dir> \
        --corpus-table <snapshot table dir> --lists <dir> \
        --checkpoint <dir> [--spam-threshold N] [--selection cc|greedy]
        [--continuous] [--banded-corpus-table <name>]

Default drains what is present and exits (availableNow — one "round"
per invocation, cron-able); --continuous keeps the query running with
a 10 s trigger (same code, deployed as a service).

--banded-corpus-table opts rounds into the maintained pre-banded
bucketed join layout (sources/banded_corpus.py): the corpus side of
each round's band join reads co-located with zero shuffle, and the
commit step appends the batch / tombstones superseded rows.  The
layout is bootstrapped from the first commit and self-heals (rebuild)
if it drifts from the corpus.
"""

from __future__ import annotations

import argparse


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--corpus-table", required=True)
    p.add_argument("--lists", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--spam-threshold", type=int, default=1000)
    p.add_argument("--selection", choices=["cc", "greedy"], default="cc")
    p.add_argument("--continuous", action="store_true")
    p.add_argument("--banded-corpus-table", default=None)
    p.add_argument("--quality-prefilter", action="store_true",
                   help="run the Gopher rule battery on every batch "
                        "before the round; flags ship with the lists")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from simhash_text_dedup_spark.config import DedupConfig
    from simhash_text_dedup_spark.streaming.dedup import stream_dedup_rounds

    spark = SparkSession.builder.appName("simhash-dedup-stream").getOrCreate()
    cfg = DedupConfig(
        spam_threshold=args.spam_threshold, selection=args.selection
    )
    q = stream_dedup_rounds(
        spark,
        args.input,
        args.corpus_table,
        args.lists,
        args.checkpoint,
        cfg,
        available_now=not args.continuous,
        banded_corpus_table=args.banded_corpus_table,
        quality_prefilter=args.quality_prefilter,
    )
    q.awaitTermination()


if __name__ == "__main__":
    main()
