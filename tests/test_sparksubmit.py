"""North-rule launch contract: the pipeline runs via
`spark-submit --py-files <package.zip> jobs/run_pipeline.py` with no
repo checkout on the executors' path."""

import os
import subprocess
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _zip_package(dst: str) -> None:
    pkg = os.path.join(REPO, "simhash_text_dedup_spark")
    with zipfile.ZipFile(dst, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))


def test_spark_submit_py_files(spark, tmp_path):
    from simhash_text_dedup_spark.sources.corpus import CorpusSpec, generate_corpus

    docs, _ = generate_corpus(CorpusSpec(n_docs=120, seed=13))
    inp = str(tmp_path / "in")
    spark.createDataFrame(docs).write.mode("overwrite").parquet(inp)

    pkg_zip = str(tmp_path / "pkg.zip")
    _zip_package(pkg_zip)
    out = str(tmp_path / "out")
    env = {**os.environ, "PYTHONPATH": ""}  # package must come from --py-files
    res = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", pkg_zip,
            os.path.join(REPO, "jobs", "run_pipeline.py"),
            "--input", inp, "--output", out, "--spam-threshold", "5",
            "--radius-sweep",
        ],
        cwd=str(tmp_path),  # NOT the repo root: no implicit import path
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    for side in ("clusters", "pairs", "spam_kills", "radius_sweep"):
        assert os.path.exists(os.path.join(out, side, "_SUCCESS")), side
    n = spark.read.parquet(f"{out}/clusters").count()
    assert n > 0
    sweep = {r.radius: r for r in spark.read.parquet(f"{out}/radius_sweep").collect()}
    assert sorted(sweep) == [0, 1, 2, 3]
    n_hamming_pairs = (
        spark.read.parquet(f"{out}/pairs").filter("hamming IS NOT NULL").count()
    )
    assert sweep[3].cum_pairs == n_hamming_pairs
    assert sweep[3].share_permille in (0, 1000)
