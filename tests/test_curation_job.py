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
