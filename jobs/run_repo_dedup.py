#!/usr/bin/env python
"""spark-submit entry point for REPOSITORY-granularity curation: fork
detection / repo dedup, head-commit snapshot selection, and repo-context
training-document concatenation (the repo-level pass a source-code
corpus runs BEFORE file-level near-dup — The Stack / StarCoder recipe).

    spark-submit --py-files simhash_text_dedup_spark.zip \
        jobs/run_repo_dedup.py --input <documents parquet> \
        --output <dir> \
        [--head-snapshot] [--fork-pairs] [--actions] [--dedup] \
        [--repo-context [--max-files N] [--order-col path]] \
        [--n-perms 16] [--n-bands 8] \
        [--jaccard-permille 500] [--containment-permille 900]

The input is the input_hint code-corpus shape
(repo, path, commit, lang, content); only the columns each requested
stage reads must exist: fork detection needs (repo, content),
head-snapshot needs (repo, path, commit, content), repo-context needs
(repo, --order-col, --text-col).

Outputs (each a parquet dir under --output, only when requested):
    head/          per-(repo, path) latest-commit rows + history depth
    fork_pairs/    verified fork pairs with exact Jaccard/containment
    repo_actions/  keep/drop per repo (fork clusters, most-files wins)
    deduped/       surviving documents (fork losers removed)
    contexts/      per-repo concatenated training documents

Stage composition note: --dedup shares the digest/pair/action
computation with --fork-pairs/--actions (checkpointed once), so
requesting them together writes the intermediate evidence of exactly
the decision the dedup applied, at no extra pass over the corpus.
"""

from __future__ import annotations

import argparse


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--text-col", default="content",
                   help="file-content column (input_hint: content)")
    p.add_argument("--head-snapshot", action="store_true",
                   help="write per-(repo, path) latest-commit rows")
    p.add_argument("--fork-pairs", action="store_true",
                   help="write verified fork pairs with exact overlap "
                        "statistics")
    p.add_argument("--actions", action="store_true",
                   help="write keep/drop per repo (implies the fork "
                        "pair computation)")
    p.add_argument("--dedup", action="store_true",
                   help="write the surviving documents (fork losers "
                        "removed)")
    p.add_argument("--repo-context", action="store_true",
                   help="write per-repo concatenated training "
                        "documents")
    p.add_argument("--order-col", default="path",
                   help="deterministic file order inside a repo "
                        "context")
    p.add_argument("--max-files", type=int, default=64,
                   help="per-repo file cap applied BEFORE the "
                        "concatenation aggregate")
    p.add_argument("--file-sep", default="\n<|file_sep|>\n")
    p.add_argument("--n-perms", type=int, default=16)
    p.add_argument("--n-bands", type=int, default=8)
    p.add_argument("--jaccard-permille", type=int, default=500)
    p.add_argument("--containment-permille", type=int, default=900)
    args = p.parse_args()

    if not any((args.head_snapshot, args.fork_pairs, args.actions,
                args.dedup, args.repo_context)):
        raise SystemExit(
            "nothing requested: pass at least one of --head-snapshot, "
            "--fork-pairs, --actions, --dedup, --repo-context"
        )

    from pyspark.sql import SparkSession

    from simhash_text_dedup_spark.operators.repo_dedup import (
        RepoDedupConfig,
        fork_pairs,
        head_snapshot,
        repo_context_docs,
        repo_dedup_actions,
        repo_file_digests,
        repo_signatures,
    )

    cfg = RepoDedupConfig(
        n_perms=args.n_perms,
        n_bands=args.n_bands,
        jaccard_permille=args.jaccard_permille,
        containment_permille=args.containment_permille,
    )

    spark = SparkSession.builder.appName("repo-dedup").getOrCreate()
    docs = spark.read.parquet(args.input)
    if args.text_col != "content":
        if "content" in docs.columns:
            # withColumnRenamed would otherwise produce TWO 'content'
            # columns and every downstream F.col('content') becomes
            # AMBIGUOUS_REFERENCE; the explicit text col supersedes
            docs = docs.drop("content")
        docs = docs.withColumnRenamed(args.text_col, "content")

    if args.head_snapshot:
        head_snapshot(docs).write.mode("overwrite").parquet(
            f"{args.output}/head"
        )

    if args.fork_pairs or args.actions or args.dedup:
        # shared upstream for every fork-decision output: digests feed
        # the signatures AND the exact verify, so checkpoint them once
        fd = repo_file_digests(docs).localCheckpoint(eager=False)
        pairs = fork_pairs(fd, repo_signatures(fd, cfg), cfg)
        if args.actions or args.dedup:
            # multiple outputs consume `pairs`; persist so the band
            # join runs once, not once per sink
            pairs = pairs.localCheckpoint(eager=False)
        if args.fork_pairs:
            pairs.write.mode("overwrite").parquet(
                f"{args.output}/fork_pairs"
            )
        if args.actions or args.dedup:
            actions = repo_dedup_actions(fd, pairs, cfg)
            if args.actions and args.dedup:
                actions = actions.localCheckpoint(eager=False)
            if args.actions:
                actions.write.mode("overwrite").parquet(
                    f"{args.output}/repo_actions"
                )
            if args.dedup:
                # same keep-set join as operators/repo_dedup.dedup_repos
                # but over the actions already computed above — the
                # digest/signature/band-join stages run exactly once
                # per job, not once per requested output.  NOT
                # broadcast: the keep list is O(n_repos); AQE still
                # broadcasts it when actually small.
                keep = actions.filter("action = 'keep'").select("repo")
                docs.join(keep, "repo", "left_semi").write.mode(
                    "overwrite"
                ).parquet(f"{args.output}/deduped")

    if args.repo_context:
        repo_context_docs(
            docs,
            order_col=args.order_col,
            text_col="content",
            sep=args.file_sep,
            max_files=args.max_files,
        ).write.mode("overwrite").parquet(f"{args.output}/contexts")

    n_out = sum(
        1
        for flag in (args.head_snapshot, args.fork_pairs, args.actions,
                     args.dedup, args.repo_context)
        if flag
    )
    print(f"repo-dedup job wrote {n_out} output dir(s) under "
          f"{args.output}")
    spark.stop()


if __name__ == "__main__":
    main()
