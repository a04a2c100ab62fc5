"""jobs/run_repo_dedup.py drives the repo-granularity outputs from one
CLI invocation (in-process: getOrCreate reuses the test session instead
of paying a spark-submit JVM)."""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_job():
    spec = importlib.util.spec_from_file_location(
        "run_repo_dedup", os.path.join(REPO, "jobs", "run_repo_dedup.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _file(tag: str, i: int) -> str:
    return f"// file {tag}-{i}\nint f_{tag}_{i}(int x) {{ return x + {i}; }}\n"


@pytest.fixture(scope="module")
def job_input(spark, tmp_path_factory):
    """repoA (root, 10 files, one file with two commits), repoD
    (byte-identical fork of A), repoC (10 unrelated files)."""
    a = [_file("a", i) for i in range(10)]
    c = [_file("c", i) for i in range(10)]
    rows = []
    for repo, files in (("repoA", a), ("repoD", a), ("repoC", c)):
        rows += [
            {"repo": repo, "path": f"src/f{i}.c", "commit": "c1",
             "lang": "c", "content": t}
            for i, t in enumerate(files)
        ]
    # a second, later commit of repoA's first file: head must win
    rows.append({"repo": "repoA", "path": "src/f0.c", "commit": "c2",
                 "lang": "c", "content": "// head revision\n"})
    inp = str(tmp_path_factory.mktemp("repo_job") / "docs")
    spark.createDataFrame(rows).write.parquet(inp)
    return inp


def test_repo_job_all_outputs(spark, job_input, tmp_path, monkeypatch):
    out = str(tmp_path / "out")
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "run_repo_dedup.py",
            "--input", job_input, "--output", out,
            "--head-snapshot", "--fork-pairs", "--actions", "--dedup",
            "--repo-context", "--max-files", "4",
        ],
    )
    # the job stops its session on exit (correct under spark-submit);
    # in-process it would kill the shared test fixture
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    _load_job().main()

    # head snapshot: one row per (repo, path); repoA/src/f0.c at c2
    head = spark.read.parquet(f"{out}/head")
    assert head.count() == 30
    f0 = head.filter("repo = 'repoA' and path = 'src/f0.c'").collect()[0]
    assert f0.commit == "c2" and f0.n_commits == 2

    # fork pairs: exactly the identical-fork pair A~D (repoC unrelated);
    # note the A-side digest set includes BOTH commits of f0.c, so the
    # pair is containment-1000, not jaccard-1000
    pairs = spark.read.parquet(f"{out}/fork_pairs").collect()
    assert {(r.a_repo, r.b_repo) for r in pairs} == {("repoA", "repoD")}
    assert pairs[0].containment_permille == 1000

    # actions: the fork cluster keeps exactly one of A/D (A has the
    # extra head-revision digest, so it wins on n_files), C keeps itself
    acts = {r.repo: r.action
            for r in spark.read.parquet(f"{out}/repo_actions").collect()}
    assert acts == {"repoA": "keep", "repoD": "drop", "repoC": "keep"}

    # dedup: repoD's rows are gone, everything else survives
    surv = spark.read.parquet(f"{out}/deduped")
    assert surv.filter("repo = 'repoD'").count() == 0
    assert surv.count() == 21  # 11 repoA rows + 10 repoC rows

    # contexts: one row per repo, capped at --max-files 4
    ctx = {r.repo: r for r in
           spark.read.parquet(f"{out}/contexts").collect()}
    assert set(ctx) == {"repoA", "repoD", "repoC"}
    assert ctx["repoA"].n_files == 4 and ctx["repoA"].n_files_total == 11
    assert "<|file_sep|>" in ctx["repoA"].context_text


def test_repo_job_requires_a_stage(job_input, tmp_path, monkeypatch):
    monkeypatch.setattr(
        sys, "argv",
        ["run_repo_dedup.py", "--input", job_input,
         "--output", str(tmp_path / "o")],
    )
    with pytest.raises(SystemExit, match="nothing requested"):
        _load_job().main()
