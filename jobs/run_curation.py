#!/usr/bin/env python
"""spark-submit entry point for the corpus-curation operators
(the quality/hygiene pass a training-data pipeline runs before or
alongside the near-dup pipeline).

    spark-submit --py-files simhash_text_dedup_spark.zip \
        jobs/run_curation.py --input <documents parquet> \
        --output <dir> \
        [--repetition] [--strip-boilerplate] [--max-line-occ N]
        [--decontaminate <benchmark parquet>] [--ngram-width N]
        [--sample-mod K] [--sample-rem R]

Outputs (each a parquet dir under --output, only when requested):
    repetition/      per-doc Gopher-style repetition flags
    stripped/        boilerplate-line-removed corpus (doc_id, kept_text)
    contaminated/    docs sharing an n-gram with the benchmark set
    sample/          deterministic MD5 hash sample (fp % K == R)

The input only needs (doc_id, text)-shaped columns; pass --id-col /
--text-col for other names.
"""

from __future__ import annotations

import argparse


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--repetition", action="store_true")
    p.add_argument("--strip-boilerplate", action="store_true")
    p.add_argument("--max-line-occ", type=int, default=2,
                   help="lines occurring more than this corpus-wide "
                        "are boilerplate")
    p.add_argument("--min-line-chars", type=int, default=1)
    p.add_argument("--decontaminate", default=None, metavar="BENCH_PARQUET",
                   help="path to the held-out benchmark documents")
    p.add_argument("--ngram-width", type=int, default=13)
    p.add_argument("--sample-mod", type=int, default=None, metavar="K",
                   help="write the deterministic fp %% K == R hash sample")
    p.add_argument("--sample-rem", type=int, default=0, metavar="R")
    args = p.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("corpus-curation").getOrCreate()
    docs = spark.read.parquet(args.input)
    kw = dict(id_col=args.id_col, text_col=args.text_col)

    if args.repetition:
        from simhash_text_dedup_spark.operators.repetition import (
            repetition_stats,
        )

        repetition_stats(docs, **kw).write.mode("overwrite").parquet(
            f"{args.output}/repetition"
        )
    if args.strip_boilerplate:
        from simhash_text_dedup_spark.operators.repetition import (
            strip_boilerplate_lines,
        )

        strip_boilerplate_lines(
            docs,
            max_line_occurrences=args.max_line_occ,
            min_line_chars=args.min_line_chars,
            **kw,
        ).write.mode("overwrite").parquet(f"{args.output}/stripped")
    if args.decontaminate:
        from simhash_text_dedup_spark.operators.decontaminate import (
            contaminated_docs,
        )

        bench = spark.read.parquet(args.decontaminate)
        contaminated_docs(
            docs, bench, ngram_width=args.ngram_width, **kw
        ).write.mode("overwrite").parquet(f"{args.output}/contaminated")
    if args.sample_mod:
        from simhash_text_dedup_spark.functions.text import (
            doc_fingerprint_md5,
        )

        fp = doc_fingerprint_md5(F.col(args.text_col))
        docs.filter(fp % args.sample_mod == args.sample_rem).write.mode(
            "overwrite"
        ).parquet(f"{args.output}/sample")


if __name__ == "__main__":
    main()
