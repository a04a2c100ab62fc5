"""Suffix-array substring check (operators/substring.py): the LCS
kernel is exact (brute-force parity), the Spark operator agrees with
python's C substring semantics on containment, the F-CONTAIN corpus
fixtures are caught, and the edit-distance verifier matches a
reference DP."""

import random

import pytest
from pyspark.sql import functions as F

from simhash_text_dedup_spark.operators.substring import (
    edit_distance_pairs,
    lcs_bytes,
    pair_lcs,
)


def _brute_lcs(a: bytes, b: bytes) -> int:
    best = 0
    for i in range(len(a)):
        for j in range(i + best + 1, len(a) + 1):
            if a[i:j] in b:
                best = j - i
            else:
                break
    return best


def test_lcs_kernel_brute_force_parity():
    rng = random.Random(99)
    for _ in range(200):
        alpha = rng.choice([b"ab", b"abcd", b"xyz{}|"])
        a = bytes(rng.choice(alpha) for _ in range(rng.randrange(0, 50)))
        b = bytes(rng.choice(alpha) for _ in range(rng.randrange(0, 50)))
        assert lcs_bytes(a, b) == _brute_lcs(a, b), (a, b)


def test_lcs_kernel_containment_and_edges():
    assert lcs_bytes(b"hello world", b"xxhelloxx") == 5
    assert lcs_bytes(b"abc", b"abc") == 3
    assert lcs_bytes(b"", b"abc") == 0
    assert lcs_bytes(b"aaaaaaaa", b"aaaa") == 4
    big = bytes(random.Random(1).randrange(256) for _ in range(4000))
    assert lcs_bytes(big, big[500:2500]) == 2000


@pytest.fixture(scope="module")
def pair_frames(spark):
    rng = random.Random(5)
    docs = []
    for i in range(30):
        docs.append((i, "".join(rng.choice("abcdef \n") for _ in range(rng.randrange(5, 120)))))
    # planted containment: doc 100+i embeds doc i
    for i in range(5):
        docs.append((100 + i, "HEADER\n" + docs[i][1] + "\nFOOTER"))
    prepared = spark.createDataFrame(docs, "doc_id long, content string")
    pairs = [(i, 100 + i) for i in range(5)]
    pairs += [(a, b) for a in range(0, 10) for b in range(a + 1, 10)]
    cands = spark.createDataFrame(pairs, "a_id long, b_id long")
    return cands, prepared, dict(docs)


def test_pair_lcs_matches_brute_force(spark, pair_frames):
    cands, prepared, by_id = pair_frames
    rows = pair_lcs(cands, prepared).collect()
    assert len(rows) == cands.count()
    for r in rows:
        a = by_id[r.a_id].encode()
        b = by_id[r.b_id].encode()
        want = _brute_lcs(a, b)
        assert r.lcs_len == want, (r.a_id, r.b_id)
        assert r.contained == (want == min(len(a), len(b)) and want > 0)
    assert sum(r.contained for r in rows) >= 5  # all planted pairs


def test_pair_lcs_catches_f_contain_fixtures(spark):
    """The corpus generator's F-CONTAIN families (doc B embeds doc A)
    must come back contained=true with lcs_len == len(A)."""
    from simhash_text_dedup_spark.sources.corpus import (
        CorpusSpec,
        generate_corpus,
    )

    docs_pdf, manifest = generate_corpus(CorpusSpec(n_docs=400, seed=42))
    fam = manifest[manifest.family.str.startswith("F-CONTAIN")]
    assert len(fam) > 0
    # doc ids are not pre-assigned in the raw corpus frame: key by path
    prepared = spark.createDataFrame(
        docs_pdf[["path", "content"]]
    ).withColumn("doc_id", F.xxhash64("path"))
    path_to_id = {
        r.path: r.doc_id for r in prepared.select("path", "doc_id").collect()
    }
    pairs = []
    for _, grp in fam.groupby("family"):
        paths = grp.path.tolist()
        assert len(paths) == 2
        pairs.append((path_to_id[paths[0]], path_to_id[paths[1]]))
    cands = spark.createDataFrame(pairs, "a_id long, b_id long")
    res = pair_lcs(cands, prepared.select("doc_id", "content")).collect()
    assert len(res) == len(pairs)
    assert all(r.contained for r in res), res


def _brute_edit(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_distance_pairs_matches_dp(spark, pair_frames):
    cands, prepared, by_id = pair_frames
    rows = edit_distance_pairs(cands, prepared).collect()
    assert len(rows) == cands.count()
    for r in rows:
        assert r.edit_dist == _brute_edit(by_id[r.a_id], by_id[r.b_id])
    # threshold filter
    kept = edit_distance_pairs(cands, prepared, max_dist=10).collect()
    assert all(r.edit_dist <= 10 for r in kept)


def test_edit_distance_is_pure_jvm(spark, pair_frames):
    """No Python eval node anywhere in the edit-distance plan — the
    whole verify is codegen (built-in levenshtein)."""
    import io
    from contextlib import redirect_stdout

    cands, prepared, _ = pair_frames
    buf = io.StringIO()
    with redirect_stdout(buf):
        edit_distance_pairs(cands, prepared).explain("formatted")
    plan = buf.getvalue()
    # (createDataFrame test inputs legitimately mention
    # applySchemaToPythonRDD; the assertion targets eval nodes)
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                 "FlatMapGroupsInPandas"):
        assert node not in plan, plan


def test_substring_verified_pairs_threshold(spark):
    """substring_verified_pairs keeps a pair iff the LCS covers
    >= lcs_ratio of the shorter doc; containment is the 1.0 case."""
    from simhash_text_dedup_spark.operators.substring import (
        substring_verified_pairs,
    )

    block = "shared block of text " * 10  # 210 chars
    docs = [
        (1, block),                                  # contained in 2
        (2, "HEAD " + block + " TAIL"),
        (3, block + "unique tail xyzw"),             # ~93% of 3 shared w/ 4
        (4, block + "other ending qqq"),
        (5, "completely different content here aaa"),
        (6, "nothing in common with five bbb ccc"),
    ]
    prepared = spark.createDataFrame(docs, "doc_id long, content string")
    cands = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6)], "a_id long, b_id long"
    )
    kept = substring_verified_pairs(cands, prepared, lcs_ratio=0.8).collect()
    got = {(r.a_id, r.b_id): r for r in kept}
    assert set(got) == {(1, 2), (3, 4)}, kept
    assert all(r.kind == "substring" for r in kept)
    assert got[(1, 2)].lcs_fraction == 1.0
    assert 0.8 <= got[(3, 4)].lcs_fraction < 1.0
    # strict ratio drops the partial-overlap pair too
    strict = substring_verified_pairs(cands, prepared, lcs_ratio=0.99).collect()
    assert {(r.a_id, r.b_id) for r in strict} == {(1, 2)}


def test_run_dedup_substring_path_clusters_contain_fixtures(spark):
    """enable_substring alone (minhash verify + containment both off)
    must still cluster the F-CONTAIN corpus families: MinHash bands
    only generate candidates, the suffix-array check confirms them."""
    from simhash_text_dedup_spark.config import DedupConfig
    from simhash_text_dedup_spark.plans.pipeline import run_dedup
    from simhash_text_dedup_spark.sources.corpus import (
        CorpusSpec,
        generate_corpus,
    )

    docs_pdf, man = generate_corpus(CorpusSpec(n_docs=300, seed=42))
    cfg = DedupConfig(spam_threshold=5, enable_substring=True)
    res = run_dedup(spark, spark.createDataFrame(docs_pdf), cfg)
    kinds = {(r.a_id, r.b_id): r.kind for r in res.pairs.collect()}
    assert any(k == "substring" for k in kinds.values()), (
        "no substring-verified pairs in the pipeline output"
    )
    iddf = (
        spark.createDataFrame(docs_pdf)
        .withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
        .select("doc_id", "repo", "path", "commit")
        .toPandas()
    )
    man2 = man.merge(iddf, on=["repo", "path", "commit"])
    cl = {r.doc_id: r.cluster_id for r in res.clusters.collect()}
    n_contain_hit = 0
    for fam, grp in man2.groupby("family"):
        if fam.rsplit("-", 1)[0] == "F-CONTAIN" and len(grp.doc_id) == 2:
            ids = list(grp.doc_id)
            if cl[ids[0]] == cl[ids[1]]:
                n_contain_hit += 1
    assert n_contain_hit >= 1, "substring path clustered no F-CONTAIN family"
