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
        [--quality] [--code-filter] [--license] [--permissive-only]
        [--strip-dup-spans] [--span-width N] [--span-min-docs N]
        [--temperature-sample N --group-col lang]
        [--semdedup <embeddings parquet>] [--semdedup-threshold X]
        [--semantic-decontaminate <bench embeddings parquet>]
        [--semantic-threshold X] [--embeddings <corpus emb parquet>]
        [--tiered-dedup] (semantic tier joins in --embeddings when given)
        [--pii-scrub] [--vocab-top K] [--vocab-width N]
        [--learn-bpe N_MERGES] [--bpe-token-counts]
        [--lm-quality] [--lm-width N] [--lm-add-k K]
        [--assign-splits 980,10,10] [--split-clusters <clusters parquet>]
        [--chunk-tokens N] [--chunk-overlap K]

Outputs (each a parquet dir under --output, only when requested):
    repetition/      per-doc Gopher-style repetition flags
    stripped/        boilerplate-line-removed corpus (doc_id, kept_text)
    contaminated/    docs sharing an n-gram with the benchmark set
    semantic_contaminated/  corpus vectors cosine-matching a benchmark
                     embedding (paraphrase-robust decontamination)
    sample/          deterministic MD5 hash sample (fp % K == R)
    quality/         composite rule-battery flags (doc_id, reasons, keep)
    code_quality/    Stack/StarCoder code-file filter flags + keep
    licenses/        per-file license id (SPDX/phrase) + permissive flag
    licensed/        permissive-license-only corpus cut
    despanned/       cross-doc duplicate-span-stripped corpus
    mixed/           temperature-weighted stratified sample
    semdedup/        embedding-cluster semantic dedup actions
    tiered_actions/  exact -> near -> semantic cascade actions with
                     per-tier attribution (doc_id, action, tier,
                     winner_id)
    tiered_report/   per-tier removal accounting (tier, n_docs)
    tiered_survivors/ corpus rows surviving every enabled tier
    scrubbed/        PII/secret-redacted corpus + per-class counts
    vocab/           corpus-wide top-k n-gram frequency table
    bpe_merges/      learned BPE merge table (rank-ordered)
    bpe_tokens/      per-doc token counts under the learned merges
    lm_quality/      CCNet-style n-gram LM score + head/middle/tail bucket
    splits/          leakage-safe cluster-keyed train/valid/test assignment
    chunks/          fixed-width token-window passages (sliding window)

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
    p.add_argument("--lang-id", default=None, metavar="LANGS",
                   help="label every doc with the detected language "
                        "(functions/langid.py, all 53 reference "
                        "profile codes); pass a "
                        "comma list (e.g. en,de,fr) to ALSO write the "
                        "kept subset, or 'all' to only label — the "
                        "CCNet-style first gate")
    p.add_argument("--quality", action="store_true",
                   help="composite Gopher-style quality rule battery")
    p.add_argument("--code-filter", action="store_true",
                   help="Stack/StarCoder code-file filter battery")
    p.add_argument("--license", action="store_true",
                   help="per-file SPDX/phrase license id + permissive "
                        "flag")
    p.add_argument("--permissive-only", action="store_true",
                   help="also write the permissive-license corpus cut "
                        "(implies --license)")
    p.add_argument("--strip-dup-spans", action="store_true",
                   help="remove cross-doc duplicated word spans "
                        "(owner copy survives)")
    p.add_argument("--span-width", type=int, default=8)
    p.add_argument("--span-min-docs", type=int, default=2)
    p.add_argument("--temperature-sample", type=int, default=None,
                   metavar="TOTAL",
                   help="alpha=0.5 temperature stratified sample size")
    p.add_argument("--group-col", default="lang")
    p.add_argument("--semdedup", default=None, metavar="EMB_PARQUET",
                   help="embeddings table (vec_id, embedding) for "
                        "semantic dedup")
    p.add_argument("--semdedup-threshold", type=float, default=0.9)
    p.add_argument("--semdedup-lists", type=int, default=64)
    p.add_argument("--semantic-decontaminate", default=None,
                   metavar="BENCH_EMB_PARQUET",
                   help="benchmark embeddings (vec_id, embedding) for "
                        "semantic decontamination; needs --embeddings")
    p.add_argument("--semantic-threshold", type=float, default=0.9)
    p.add_argument("--embeddings", default=None,
                   metavar="CORPUS_EMB_PARQUET",
                   help="corpus embeddings table (vec_id, embedding)")
    p.add_argument("--tiered-dedup", action="store_true",
                   help="exact -> near (SimHash) -> semantic cascade "
                        "with per-tier attribution; the semantic tier "
                        "runs only when --embeddings is given")
    p.add_argument("--pii-scrub", action="store_true",
                   help="redact email/IP/secret literals")
    p.add_argument("--vocab-top", type=int, default=None, metavar="K",
                   help="write the corpus-wide top-K n-gram table")
    p.add_argument("--vocab-width", type=int, default=1)
    p.add_argument("--learn-bpe", type=int, default=None,
                   metavar="N_MERGES",
                   help="learn a BPE merge table from the corpus")
    p.add_argument("--bpe-token-counts", action="store_true",
                   help="also write per-doc token counts under the "
                        "learned merges (requires --learn-bpe)")
    p.add_argument("--lm-quality", action="store_true",
                   help="CCNet-style n-gram LM quality score + buckets")
    p.add_argument("--lm-width", type=int, default=2)
    p.add_argument("--lm-add-k", type=int, default=1)
    p.add_argument("--lm-reference", default=None, metavar="REF_PARQUET",
                   help="train the LM on this corpus instead of --input")
    p.add_argument("--assign-splits", default=None, metavar="PERMILLES",
                   help="comma permille ratios, e.g. 980,10,10 for "
                        "train/valid/test")
    p.add_argument("--split-names", default="train,valid,test")
    p.add_argument("--split-clusters", default=None,
                   metavar="CLUSTERS_PARQUET",
                   help="(doc_id, cluster_id) labeling to key the split "
                        "on (leakage-safe); omit only for an already-"
                        "deduplicated corpus")
    p.add_argument("--chunk-tokens", type=int, default=None, metavar="N",
                   help="write fixed-N-token sliding-window passages")
    p.add_argument("--chunk-overlap", type=int, default=0)
    p.add_argument("--chunk-last-window", default="clamp",
                   choices=("clamp", "ragged"),
                   help="clamp = full-width last window (re-covers "
                        "tokens); ragged = short tail, exact partition "
                        "at overlap 0")
    args = p.parse_args()

    # validate flag pairs BEFORE any Spark work: discovering a missing
    # companion flag after hours of earlier stages is the worst time
    if args.semantic_decontaminate and not args.embeddings:
        raise SystemExit(
            "--semantic-decontaminate needs --embeddings "
            "(the corpus embedding table)"
        )
    if args.bpe_token_counts and not args.learn_bpe:
        raise SystemExit("--bpe-token-counts needs --learn-bpe")

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
    if args.lang_id:
        from simhash_text_dedup_spark.functions.langid import detect_lang

        labeled = docs.withColumn("lang_pred", detect_lang(F.col(args.text_col)))
        labeled.select(args.id_col, "lang_pred").write.mode(
            "overwrite"
        ).parquet(f"{args.output}/lang_id")
        if args.lang_id != "all":
            keep = [s.strip() for s in args.lang_id.split(",") if s.strip()]
            labeled.filter(F.col("lang_pred").isin(keep)).drop(
                "lang_pred"
            ).write.mode("overwrite").parquet(f"{args.output}/lang_kept")
    if args.quality:
        from simhash_text_dedup_spark.operators.quality import quality_filter

        quality_filter(docs, **kw).write.mode("overwrite").parquet(
            f"{args.output}/quality"
        )
    if args.code_filter:
        from simhash_text_dedup_spark.operators.code_quality import (
            code_filter,
        )

        code_filter(docs, **kw).write.mode("overwrite").parquet(
            f"{args.output}/code_quality"
        )
    if args.license or args.permissive_only:
        from simhash_text_dedup_spark.functions.license_id import (
            detect_license,
            is_permissive,
        )

        labeled = docs.withColumn(
            "license", detect_license(F.col(args.text_col))
        ).withColumn("permissive", is_permissive(F.col("license")))
        labeled.select(args.id_col, "license", "permissive").write.mode(
            "overwrite"
        ).parquet(f"{args.output}/licenses")
        if args.permissive_only:
            labeled.filter("permissive").drop(
                "license", "permissive"
            ).write.mode("overwrite").parquet(f"{args.output}/licensed")
    if args.strip_dup_spans:
        from simhash_text_dedup_spark.operators.dupspans import (
            strip_dup_spans,
        )

        strip_dup_spans(
            docs,
            width=args.span_width,
            min_docs=args.span_min_docs,
            hash_grams=True,
            **kw,
        ).write.mode("overwrite").parquet(f"{args.output}/despanned")
    if args.temperature_sample:
        from simhash_text_dedup_spark.operators.mixing import (
            temperature_sample,
        )

        temperature_sample(
            docs, args.group_col, args.temperature_sample,
            id_col=args.id_col,
        ).write.mode("overwrite").parquet(f"{args.output}/mixed")
    if args.semdedup:
        from simhash_text_dedup_spark.operators.semdedup import semdedup

        emb = spark.read.parquet(args.semdedup)
        semdedup(
            emb,
            threshold=args.semdedup_threshold,
            n_lists=args.semdedup_lists,
        ).write.mode("overwrite").parquet(f"{args.output}/semdedup")
    if args.semantic_decontaminate:
        from simhash_text_dedup_spark.operators.decontaminate import (
            semantic_contaminated,
        )

        corpus_emb = spark.read.parquet(args.embeddings)
        bench_emb = spark.read.parquet(args.semantic_decontaminate)
        semantic_contaminated(
            corpus_emb, bench_emb, threshold=args.semantic_threshold
        ).write.mode("overwrite").parquet(
            f"{args.output}/semantic_contaminated"
        )
    if args.tiered_dedup:
        from simhash_text_dedup_spark.config import DedupConfig
        from simhash_text_dedup_spark.plans.pipeline import (
            fingerprint_stage,
            prepare_documents,
        )
        from simhash_text_dedup_spark.plans.tiered import (
            tier_report,
            tiered_dedup,
        )

        cfg = DedupConfig()
        d = docs
        # drop pre-existing target columns before renaming: a rename
        # onto an occupied name yields duplicate columns and downstream
        # AMBIGUOUS_REFERENCE; the explicitly-named column supersedes
        if args.id_col != "doc_id":
            if "doc_id" in d.columns:
                d = d.drop("doc_id")
            d = d.withColumnRenamed(args.id_col, "doc_id")
        if args.text_col not in ("text", "content"):
            if "text" in d.columns:
                d = d.drop("text")
            d = d.withColumnRenamed(args.text_col, "text")
        fps = fingerprint_stage(prepare_documents(d), cfg).select(
            "doc_id", "fingerprint"
        )
        emb = (
            spark.read.parquet(args.embeddings) if args.embeddings else None
        )
        # three sinks read the cascade; cut lineage so the pandas-UDF
        # fingerprint stage and the band join run once, not per sink
        actions = tiered_dedup(
            fps,
            cfg,
            embeddings=emb,
            semantic_threshold=args.semdedup_threshold,
            n_lists=args.semdedup_lists,
        ).localCheckpoint(eager=False)
        actions.write.mode("overwrite").parquet(
            f"{args.output}/tiered_actions"
        )
        tier_report(actions).write.mode("overwrite").parquet(
            f"{args.output}/tiered_report"
        )
        d.join(
            actions.filter(F.col("action") == "keep").select("doc_id"),
            "doc_id",
            "left_semi",
        ).write.mode("overwrite").parquet(
            f"{args.output}/tiered_survivors"
        )
    if args.pii_scrub:
        from simhash_text_dedup_spark.operators.scrub import pii_scrub

        pii_scrub(docs, **kw).write.mode("overwrite").parquet(
            f"{args.output}/scrubbed"
        )
    if args.vocab_top:
        from simhash_text_dedup_spark.operators.vocab import top_ngrams

        top_ngrams(
            docs, width=args.vocab_width, k=args.vocab_top, **kw
        ).write.mode("overwrite").parquet(f"{args.output}/vocab")
    if args.learn_bpe:
        from simhash_text_dedup_spark.operators.bpe import (
            bpe_tokenize,
            learn_bpe,
        )

        merges = learn_bpe(
            docs, n_merges=args.learn_bpe, text_col=args.text_col
        )
        merges.write.mode("overwrite").parquet(
            f"{args.output}/bpe_merges"
        )
        if args.bpe_token_counts:
            saved = spark.read.parquet(f"{args.output}/bpe_merges")
            bpe_tokenize(docs, saved, **kw).write.mode(
                "overwrite"
            ).parquet(f"{args.output}/bpe_tokens")
    if args.lm_quality:
        from simhash_text_dedup_spark.operators.lm_score import lm_quality

        ref = (
            spark.read.parquet(args.lm_reference)
            if args.lm_reference
            else None
        )
        lm_quality(
            docs, width=args.lm_width, add_k=args.lm_add_k,
            reference_corpus=ref, **kw,
        ).write.mode("overwrite").parquet(f"{args.output}/lm_quality")
    if args.assign_splits:
        from simhash_text_dedup_spark.operators.splits import assign_splits

        ratios = tuple(int(x) for x in args.assign_splits.split(","))
        names = tuple(args.split_names.split(","))
        clusters = (
            spark.read.parquet(args.split_clusters)
            if args.split_clusters
            else None
        )
        assign_splits(
            docs, clusters, ratios_permille=ratios, names=names,
            id_col=args.id_col,
        ).write.mode("overwrite").parquet(f"{args.output}/splits")
    if args.chunk_tokens:
        from simhash_text_dedup_spark.operators.chunking import (
            chunk_documents,
        )

        chunk_documents(
            docs, chunk_tokens=args.chunk_tokens,
            overlap=args.chunk_overlap,
            last_window=args.chunk_last_window, **kw,
        ).write.mode("overwrite").parquet(f"{args.output}/chunks")


if __name__ == "__main__":
    main()
