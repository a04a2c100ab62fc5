#!/usr/bin/env python
"""spark-submit entry point: COMPACT the maintained banded corpus
layout (sources/banded_corpus.py).

    spark-submit --py-files simhash_text_dedup_spark.zip \
        jobs/compact_banded.py --corpus-table <snapshot table dir> \
        --banded-corpus-table <name> [--n-buckets N]

Per-round maintenance is append + tombstone (bucketed parquet cannot
delete in place): superseded re-crawl rows stay on disk, masked by a
broadcast anti-join, and buckets that drifted over band_bucket_cap
keep their pre-drift rows in the co-located table.  Compaction is the
LSM-style counterpart — a fresh `write_banded_corpus` from the corpus
snapshot drops every tombstoned row, re-classifies hot/cold buckets
from current stats, and resets the tombstone list.  Run it when
`__tombstones` grows past broadcast comfort (~10M rows) or after a
newly-hot-bucket warning; with real Iceberg the tombstone half of
this job disappears (MERGE row deletes), the hot/cold re-split
remains.
"""

from __future__ import annotations

import argparse


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--corpus-table", required=True)
    p.add_argument("--banded-corpus-table", required=True)
    p.add_argument("--n-buckets", type=int, default=64)
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from simhash_text_dedup_spark.config import DedupConfig
    from simhash_text_dedup_spark.sources.banded_corpus import (
        assert_banded_sync,
        write_banded_corpus,
    )
    from simhash_text_dedup_spark.sources.snapshots import SnapshotTable

    spark = SparkSession.builder.appName("simhash-banded-compact").getOrCreate()
    cfg = DedupConfig()
    corpus = SnapshotTable(spark, args.corpus_table)
    base = corpus.read().select("doc_id", "entity_id", "fingerprint", "score")
    write_banded_corpus(base, args.banded_corpus_table, cfg, args.n_buckets)
    assert_banded_sync(spark, args.banded_corpus_table, base, cfg)
    print(
        f"compacted {args.banded_corpus_table} from corpus snapshot "
        f"{corpus.current_snapshot()}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
