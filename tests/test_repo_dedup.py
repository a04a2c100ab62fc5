"""Repo-level fork detection + dedup (operators/repo_dedup.py).

Brute-force parity: digest sets and Jaccard/containment recomputed
with Python sets + hashlib (independent of the Spark md5 fold), fork
pairs and keep/drop actions pinned on a planted fork topology.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from simhash_text_dedup_spark.operators.repo_dedup import (
    RepoDedupConfig,
    dedup_repos,
    fork_candidates,
    fork_pairs,
    repo_dedup_actions,
    repo_file_digests,
    repo_profiles,
    repo_signatures,
)

CFG = RepoDedupConfig()


def _file(tag: str, i: int) -> str:
    return f"// file {tag}-{i}\nint f_{tag}_{i}(int x) {{ return x + {i}; }}\n"


def _repo_rows(repo: str, files: list[str]):
    return [
        {"repo": repo, "path": f"src/f{i}.c", "commit": "c1",
         "lang": "c", "content": c}
        for i, c in enumerate(files)
    ]


@pytest.fixture(scope="module")
def fork_docs(spark):
    """Planted topology:
      repoA: 10 files                         (fork-network root)
      repoB: 8 of A's files + 1 own          (J = 8/11 ~ 727)
      repoC: 10 unrelated files              (negative control)
      repoD: byte-identical copy of A        (J = 1000)
      repoE: 6 of B's-shared + B's own + 2   (chains via B)
      repoF: 3 of A's files, nothing else    (subset: J = 300,
                                              containment = 1000)
      repoG: 1 unique file                   (singleton)
    """
    a = [_file("a", i) for i in range(10)]
    b = a[:8] + [_file("b", 0)]
    c = [_file("c", i) for i in range(10)]
    e = a[:6] + [_file("b", 0)] + [_file("e", i) for i in range(2)]
    f_ = a[:3]
    g = [_file("g", 0)]
    rows = (
        _repo_rows("repoA", a) + _repo_rows("repoB", b) + _repo_rows("repoC", c)
        + _repo_rows("repoD", a) + _repo_rows("repoE", e) + _repo_rows("repoF", f_)
        + _repo_rows("repoG", g)
    )
    return spark.createDataFrame(rows), {
        "repoA": a, "repoB": b, "repoC": c, "repoD": a,
        "repoE": e, "repoF": f_, "repoG": g,
    }


def _py_digest(content: str) -> int:
    return int(hashlib.md5(content.encode()).hexdigest()[:15], 16)


def _py_sets(files_by_repo):
    return {r: {_py_digest(c) for c in fs} for r, fs in files_by_repo.items()}


def _py_md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_bands(digests, n_perms=16, n_bands=8):
    """Exact replay of the frozen md5 signature/band spec."""
    r = n_perms // n_bands
    sig = [min(_py_md5_60(f"{i}:{d}") for d in digests)
           for i in range(n_perms)]
    return [
        _py_md5_60(":".join([f"b{j}"] + [str(sig[j * r + k]) for k in range(r)]))
        for j in range(n_bands)
    ]


def _py_pairs(sets, j_cut=500, c_cut=900):
    """Brute-force verify restricted to banding-surfaced candidates —
    the band keys are replayed exactly (md5 family), so this is a
    deterministic golden, not a probabilistic approximation."""
    bands = {r: _py_bands(s) for r, s in sets.items()}
    out = {}
    repos = sorted(sets)
    for i, a in enumerate(repos):
        for b in repos[i + 1:]:
            if not any(x == y for x, y in zip(bands[a], bands[b])):
                continue
            inter = len(sets[a] & sets[b])
            un = len(sets[a] | sets[b])
            jac = 1000 * inter // un
            con = 1000 * inter // min(len(sets[a]), len(sets[b]))
            if jac >= j_cut or con >= c_cut:
                out[(a, b)] = (len(sets[a]), len(sets[b]), inter, jac, con)
    return out


def test_digests_and_profiles_match_hashlib(spark, fork_docs):
    docs, files = fork_docs
    sets = _py_sets(files)
    got = {
        (r.repo, r.digest)
        for r in repo_file_digests(docs).collect()
    }
    want = {(r, d) for r, ds in sets.items() for d in ds}
    assert got == want
    prof = {r.repo: r.n_files for r in repo_profiles(
        repo_file_digests(docs)).collect()}
    assert prof == {r: len(s) for r, s in sets.items()}


def test_fork_pairs_exact_parity(spark, fork_docs):
    docs, files = fork_docs
    fd = repo_file_digests(docs)
    sigs = repo_signatures(fd, CFG)
    got = {
        (r.a_repo, r.b_repo): (r.n_a, r.n_b, r.n_common,
                               r.jaccard_permille, r.containment_permille)
        for r in fork_pairs(fd, sigs, CFG).collect()
    }
    want = _py_pairs(_py_sets(files))
    # banding is a recall sieve: every banding-surfaced pair must carry
    # EXACT stats; on this fixture every wanted pair has J >= 0.3 with
    # 16 perms over >= 3 shared files — all surface (checked below)
    assert got == want
    # the planted relations specifically
    assert ("repoA", "repoD") in got and got[("repoA", "repoD")][3] == 1000
    assert ("repoA", "repoB") in got
    assert ("repoA", "repoF") in got  # subset fork via containment
    assert got[("repoA", "repoF")][4] == 1000
    assert not any("repoC" in p or "repoG" in p for p in got)


def test_candidates_distinct_no_dedup_shuffle(spark, fork_docs):
    docs, _ = fork_docs
    fd = repo_file_digests(docs)
    sigs = repo_signatures(fd, CFG)
    cands = fork_candidates(sigs, CFG)
    rows = [(r.a_repo, r.b_repo) for r in cands.collect()]
    assert len(rows) == len(set(rows)), "first-shared-band predicate must dedup"
    plan = cands._jdf.queryExecution().executedPlan().toString()
    assert "Deduplicate" not in plan and "Window" not in plan
    # pure codegen: no Python evaluation anywhere in the operator
    assert "EvalPython" not in plan


def test_hot_bucket_routing_parity(spark, fork_docs):
    docs, files = fork_docs
    fd = repo_file_digests(docs)
    sigs = repo_signatures(fd, CFG)
    hot_cfg = RepoDedupConfig(band_bucket_cap=1, salt_partitions=4)
    plain = {(r.a_repo, r.b_repo) for r in fork_pairs(fd, sigs, CFG).collect()}
    salted = {(r.a_repo, r.b_repo)
              for r in fork_pairs(fd, sigs, hot_cfg).collect()}
    assert plain == salted


def test_actions_topology(spark, fork_docs):
    docs, files = fork_docs
    fd = repo_file_digests(docs)
    sigs = repo_signatures(fd, CFG)
    pairs = fork_pairs(fd, sigs, CFG)
    acts = {r.repo: (r.cluster_repo, r.action)
            for r in repo_dedup_actions(fd, pairs, CFG).collect()}
    assert len(acts) == 7
    # A,B,D,E,F chain into one cluster labeled by min name repoA;
    # winner = most files -> repoA (10; tie with D broken by name)
    for r in ["repoA", "repoB", "repoD", "repoE", "repoF"]:
        assert acts[r][0] == "repoA", acts
    assert acts["repoA"][1] == "keep"
    for r in ["repoB", "repoD", "repoE", "repoF"]:
        assert acts[r][1] == "drop"
    # untouched repos keep themselves
    assert acts["repoC"] == ("repoC", "keep")
    assert acts["repoG"] == ("repoG", "keep")


def test_dedup_repos_end_to_end(spark, fork_docs):
    docs, files = fork_docs
    out = dedup_repos(docs, CFG)
    kept = {r.repo for r in out.select("repo").distinct().collect()}
    assert kept == {"repoA", "repoC", "repoG"}
    # winner keeps ALL its rows
    assert out.filter(F.col("repo") == "repoA").count() == len(files["repoA"])


def test_signature_plan_single_exchange_no_python(spark, fork_docs):
    docs, _ = fork_docs
    sigs = repo_signatures(repo_file_digests(docs), CFG)
    plan = sigs._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    # digest distinct + repo agg: the signature itself adds ONE
    # exchange on repo above the distinct's (repo, digest) exchange
    assert plan.count("Exchange") <= 2


def test_repo_context_docs(spark):
    from simhash_text_dedup_spark.operators.repo_dedup import (
        repo_context_docs,
    )

    docs = spark.createDataFrame(
        [
            (3, "r1", "third"),
            (1, "r1", "first"),
            (2, "r1", "second"),
            (10, "r2", "solo"),
        ],
        "doc_id long, repo string, text string",
    )
    got = {
        r.repo: r
        for r in repo_context_docs(docs, sep="|").collect()
    }
    assert got["r1"].context_text == "first|second|third"
    assert got["r1"].n_files == 3 and got["r1"].n_files_total == 3
    assert got["r2"].context_text == "solo"
    assert got["r1"].n_chars == len("first|second|third")

    capped = {
        r.repo: r
        for r in repo_context_docs(docs, sep="|", max_files=2).collect()
    }
    # cap keeps the FIRST files by order_col and reports the true total
    assert capped["r1"].context_text == "first|second"
    assert capped["r1"].n_files == 2 and capped["r1"].n_files_total == 3
