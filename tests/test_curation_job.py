"""jobs/run_curation.py drives all four curation outputs from one CLI
invocation (in-process: getOrCreate reuses the test session instead of
paying a spark-submit JVM)."""

import importlib.util
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_job():
    spec = importlib.util.spec_from_file_location(
        "run_curation", os.path.join(REPO, "jobs", "run_curation.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_run_curation_all_outputs(spark, tmp_path, monkeypatch):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon end\nFOOTER"),
            (2, "alpha beta gamma delta epsilon zeta\nFOOTER"),
            (3, "totally different content here\nFOOTER"),
            (4, "short"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    inp, bpath, out = (str(tmp_path / d) for d in ("in", "bench", "out"))
    docs.write.parquet(inp)
    bench.write.parquet(bpath)

    monkeypatch.setattr(
        sys,
        "argv",
        [
            "run_curation.py",
            "--input", inp, "--output", out,
            "--repetition", "--strip-boilerplate", "--max-line-occ", "2",
            "--decontaminate", bpath, "--ngram-width", "5",
            "--sample-mod", "1",
        ],
    )
    _load_job().main()

    rep = spark.read.parquet(f"{out}/repetition")
    assert rep.count() == 4
    assert set(rep.columns) >= {"doc_id", "dup_line_permille",
                                "top_bigram_permille"}

    stripped = {
        r.doc_id: r.kept_text
        for r in spark.read.parquet(f"{out}/stripped").collect()
    }
    assert "FOOTER" not in stripped[1] and stripped[4] == "short"

    cont = {
        r.doc_id for r in spark.read.parquet(f"{out}/contaminated").collect()
    }
    assert cont == {1, 2}  # both contain the benchmark 5-gram; 3/4 don't

    # sample-mod 1 selects everything: the sample is the full corpus
    assert spark.read.parquet(f"{out}/sample").count() == 4


def test_run_curation_new_outputs(spark, tmp_path, monkeypatch):
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, f"u1 u2 {shared} v1 v2 v3 v4", "en"),
            (2, f"w1 {shared} w2 w3 w4 w5 w6", "en"),
            (3, "totally different content here now ok", "de"),
            (4, "short", "de"),
        ],
        "doc_id long, text string, lang string",
    )
    emb = spark.createDataFrame(
        [(i, [float(i == j) for j in range(8)]) for i in range(6)]
        + [(100, [1.0] + [0.0] * 7)],  # near-dup of vec 0
        "vec_id long, embedding array<float>",
    )
    inp, epath, out = (str(tmp_path / d) for d in ("in", "emb", "out"))
    docs.write.parquet(inp)
    emb.write.parquet(epath)

    monkeypatch.setattr(
        sys,
        "argv",
        [
            "run_curation.py",
            "--input", inp, "--output", out,
            "--quality",
            "--strip-dup-spans", "--span-width", "5",
            "--temperature-sample", "3", "--group-col", "lang",
            "--semdedup", epath, "--semdedup-threshold", "0.9",
            "--semdedup-lists", "4",
            "--embeddings", epath,
            "--semantic-decontaminate", epath,
            "--semantic-threshold", "0.99",
        ],
    )
    _load_job().main()

    q = spark.read.parquet(f"{out}/quality")
    assert set(q.columns) == {"doc_id", "n_tokens", "reasons", "keep"}
    assert q.count() == 4

    despanned = {
        r.doc_id: r for r in spark.read.parquet(f"{out}/despanned").collect()
    }
    assert despanned[1].n_removed == 0          # owner keeps the passage
    assert despanned[2].n_removed == 8          # non-owner loses it

    mixed = spark.read.parquet(f"{out}/mixed").collect()
    assert 0 < len(mixed) <= 3

    sd = {r.vec_id: r.action for r in
          spark.read.parquet(f"{out}/semdedup").collect()}
    assert len(sd) == 7
    # identical direction pair (0, 100): exactly one survives
    assert {sd[0], sd[100]} == {"keep", "delete"}

    # bench == corpus at threshold 0.99: every vector matches at least
    # itself; the (0, 100) same-direction pair matches each other too
    sc = {r.vec_id: r.n_matches for r in
          spark.read.parquet(f"{out}/semantic_contaminated").collect()}
    assert len(sc) == 7 and all(v >= 1 for v in sc.values())
    assert sc[0] == 2 and sc[100] == 2


def test_run_curation_code_and_license(spark, tmp_path, monkeypatch):
    docs = spark.createDataFrame(
        [
            (1, "// SPDX-License-Identifier: MIT\ndef ok(): return 1\n"),
            (
                2,
                "// Licensed under the Apache License, Version 2.0\n"
                "fn main() {}\n",
            ),
            (
                3,
                "// under the terms of the GNU General Public License, "
                "version 3\nint main() { return 0; }\n",
            ),
            (4, "plain file with no header at all\n"),
            # hex blob: fails the code filter's hex_data rule
            (5, "deadbeef" * 50),
        ],
        "doc_id long, text string",
    )
    inp, out = (str(tmp_path / d) for d in ("in", "out"))
    docs.write.parquet(inp)

    monkeypatch.setattr(
        sys,
        "argv",
        [
            "run_curation.py",
            "--input", inp, "--output", out,
            "--code-filter",
            "--permissive-only",
            "--learn-bpe", "6", "--bpe-token-counts",
        ],
    )
    _load_job().main()

    lic = {
        r.doc_id: (r.license, r.permissive)
        for r in spark.read.parquet(f"{out}/licenses").collect()
    }
    assert lic[1] == ("MIT", True)
    assert lic[2] == ("Apache-2.0", True)
    assert lic[3] == ("GPL-3.0-only", False)
    assert lic[4] == ("none", False)

    kept = {
        r.doc_id for r in spark.read.parquet(f"{out}/licensed").collect()
    }
    assert kept == {1, 2}  # GPL and unlicensed files are cut
    assert set(spark.read.parquet(f"{out}/licensed").columns) == {
        "doc_id", "text"
    }

    cq = {
        r.doc_id: r.keep
        for r in spark.read.parquet(f"{out}/code_quality").collect()
    }
    assert cq[1] and cq[4]
    assert not cq[5]  # pure hex blob trips hex_data

    merges = spark.read.parquet(f"{out}/bpe_merges").orderBy("rank")
    mrows = merges.collect()
    assert [r.rank for r in mrows] == list(range(len(mrows)))
    assert 0 < len(mrows) <= 6
    assert all(r.merged == r.left_sym + r.right_sym for r in mrows)
    toks = {
        r.doc_id: r.n_bpe_tokens
        for r in spark.read.parquet(f"{out}/bpe_tokens").collect()
    }
    assert set(toks) == {1, 2, 3, 4, 5} and all(
        v > 0 for v in toks.values()
    )


def test_run_pipeline_quality_prefilter(spark, tmp_path, monkeypatch):
    """--quality-prefilter drops rule-failing docs before
    fingerprinting and writes the flag table."""
    from simhash_text_dedup_spark.sources.corpus import (
        CorpusSpec,
        generate_corpus,
    )

    docs, _ = generate_corpus(CorpusSpec(n_docs=80, seed=13))
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    spark.createDataFrame(docs).write.parquet(inp)

    spec = importlib.util.spec_from_file_location(
        "run_pipeline", os.path.join(REPO, "jobs", "run_pipeline.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "run_pipeline.py",
            "--input", inp, "--output", out,
            "--spam-threshold", "5", "--quality-prefilter",
        ],
    )
    # run_pipeline stops its session on exit (correct under
    # spark-submit); in-process it would kill the shared test fixture
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    mod.main()

    flags = spark.read.parquet(f"{out}/quality_flags")
    n_keep = flags.filter("keep").count()
    assert 0 < n_keep <= 80
    clusters = spark.read.parquet(f"{out}/clusters")
    # only surviving docs reach the dedup stage
    assert clusters.count() <= n_keep


def test_run_curation_lm_and_splits(spark, tmp_path, monkeypatch):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat sat on the hat"),
            (3, "zq xv jk lp"),
            (4, "the cat sat"),
        ],
        "doc_id long, text string",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1)], "doc_id long, cluster_id long"
    )
    inp, cpath, out = (str(tmp_path / d) for d in ("in", "cl", "out"))
    docs.write.parquet(inp)
    clusters.write.parquet(cpath)

    monkeypatch.setattr(
        sys,
        "argv",
        [
            "run_curation.py",
            "--input", inp, "--output", out,
            "--lm-quality", "--lm-width", "2", "--lm-add-k", "1",
            "--assign-splits", "800,100,100",
            "--split-clusters", cpath,
            "--chunk-tokens", "3", "--chunk-overlap", "1",
        ],
    )
    _load_job().main()

    lm = {r.doc_id: r for r in
          spark.read.parquet(f"{out}/lm_quality").collect()}
    assert set(lm) == {1, 2, 3, 4}
    assert lm[1].score_permille > lm[3].score_permille  # junk scores low
    assert lm[3].bucket == "tail"

    sp = {r.doc_id: r for r in spark.read.parquet(f"{out}/splits").collect()}
    assert sp[1].split == sp[2].split           # cluster members co-split
    assert sp[1].split_key == sp[2].split_key == 1
    assert {r.split for r in sp.values()} <= {"train", "valid", "test"}

    # doc 1 has 6 tokens: width 3 / overlap 1 -> starts 0, 2, 3 (clamp)
    ch = sorted(
        (r.start_token, r.n_tokens)
        for r in spark.read.parquet(f"{out}/chunks").collect()
        if r.doc_id == 1
    )
    assert ch == [(0, 3), (2, 3), (3, 3)]


def test_run_curation_tiered_dedup(spark, tmp_path, monkeypatch):
    """--tiered-dedup: exact -> near -> semantic cascade through the
    PRODUCTION fingerprint (120-token base doc: an identical copy lands
    in the exact tier, a last-token variant fingerprints at Hamming 3
    -> near tier; the embedding pair resolves in the semantic tier)."""
    base = " ".join(f"token{i}" for i in range(120))
    near = " ".join([f"token{i}" for i in range(119)] + ["tokenX"])
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),                       # exact duplicate of 1
            (3, near),                       # Hamming-3 near dup of 1
            (4, "completely unrelated body of text one two three"),
            (5, "another document that shares nothing with the rest"),
            (6, "a third standalone unique document right here"),
        ],
        "doc_id long, text string",
    )
    # one k-means list (two near-identical vectors would otherwise
    # train into two singleton clusters and never meet in the screen)
    emb = spark.createDataFrame(
        [
            (4, [1.0, 0.0, 0.0, 0.0]),
            (5, [0.9, 0.1, 0.0, 0.0]),       # cosine ~0.994 with 4
        ],
        "vec_id long, embedding array<double>",
    )
    inp, epath, out = (str(tmp_path / d) for d in ("in", "emb", "out"))
    docs.write.parquet(inp)
    emb.write.parquet(epath)

    monkeypatch.setattr(
        sys,
        "argv",
        [
            "run_curation.py",
            "--input", inp, "--output", out,
            "--tiered-dedup", "--embeddings", epath,
            "--semdedup-threshold", "0.9", "--semdedup-lists", "1",
        ],
    )
    _load_job().main()

    acts = {
        r.doc_id: (r.action, r.tier, r.winner_id)
        for r in spark.read.parquet(f"{out}/tiered_actions").collect()
    }
    assert len(acts) == 6
    assert acts[1] == ("keep", None, 1)
    assert acts[2] == ("delete", "exact", 1)
    assert acts[3] == ("delete", "near", 1)
    assert acts[6] == ("keep", None, 6)
    # the embedding pair: exactly one of 4/5 is the semantic delete
    sem = [d for d in (4, 5) if acts[d][0] == "delete"]
    assert len(sem) == 1 and acts[sem[0]][1:] == ("semantic", None)

    rep = {
        r.tier: r.n_docs
        for r in spark.read.parquet(f"{out}/tiered_report").collect()
    }
    assert rep == {"exact": 1, "near": 1, "semantic": 1, "keep": 3}

    surv = spark.read.parquet(f"{out}/tiered_survivors")
    assert set(surv.columns) == {"doc_id", "text"}
    ids = {r.doc_id for r in surv.collect()}
    assert ids == {1, 6} | {d for d in (4, 5) if acts[d][0] == "keep"}


def test_run_curation_lang_id_gate(spark, tmp_path, monkeypatch):
    """--lang-id labels every doc and writes the kept-languages subset
    (the CCNet-style first gate, wired round 5)."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox is in the garden with the dog"),
            (2, "der hund und die katze sind nicht auf dem dach"),
            (3, "これは日本語のテキストですカタカナも含みます"),
            (4, "zzz qqq 123"),
        ],
        "doc_id long, text string",
    )
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    docs.write.parquet(inp)
    monkeypatch.setattr(
        sys, "argv",
        ["run_curation.py", "--input", inp, "--output", out,
         "--lang-id", "en,de"],
    )
    _load_job().main()
    labels = {
        r.doc_id: r.lang_pred
        for r in spark.read.parquet(f"{out}/lang_id").collect()
    }
    assert labels == {1: "en", 2: "de", 3: "ja", 4: "und"}
    kept = {r.doc_id for r in spark.read.parquet(f"{out}/lang_kept").collect()}
    assert kept == {1, 2}
