"""n-gram LM quality scoring (CCNet-style) and leakage-safe splits."""

import hashlib

from pyspark.sql import functions as F

from simhash_text_dedup_spark.operators.lm_score import (
    lm_quality,
    lm_quality_buckets,
    lm_score,
    train_ngram_lm,
)
from simhash_text_dedup_spark.operators.splits import (
    assign_splits,
    split_leakage,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


# ---------------------------------------------------------------- LM --


def test_lm_counts_hand_computed(spark):
    d = _docs(spark, ["a b a b", "a b c", "x", ""])
    lm = {
        (r.prefix, r.gram): (r.c_gram, r.c_prefix)
        for r in train_ngram_lm(d).collect()
    }
    assert lm == {
        ("a", "a b"): (3, 3),
        ("b", "b a"): (1, 2),
        ("b", "b c"): (1, 2),
    }


def test_lm_score_mle_hand_computed(spark):
    d = _docs(spark, ["a b a b", "a b c", "x", ""])
    lm = train_ngram_lm(d)
    got = {
        r.doc_id: (r.n_grams, r.score_permille)
        for r in lm_score(d, lm, add_k=0).collect()
    }
    # doc0: p(a b)=1000 twice, p(b a)=500 -> 2500 // 3 = 833
    # doc1: p(a b)=1000, p(b c)=500 -> 1500 // 2 = 750
    # doc2/doc3: fewer than 2 tokens -> 0 grams, score 0
    assert got == {0: (3, 833), 1: (2, 750), 2: (0, 0), 3: (0, 0)}


def test_lm_score_smoothed_hand_computed(spark):
    d = _docs(spark, ["a b a b", "a b c", "x", ""])
    lm = train_ngram_lm(d)
    got = {
        r.doc_id: (r.n_grams, r.score_permille)
        for r in lm_score(d, lm, add_k=1).collect()
    }
    # V = |{a, b}| = 2
    # p(a b) = 1000*(3+1)//(3+2) = 800; p(b a) = p(b c) = 2000//4 = 500
    # doc0: (800*2 + 500) // 3 = 700; doc1: (800 + 500) // 2 = 650
    assert got == {0: (3, 700), 1: (2, 650), 2: (0, 0), 3: (0, 0)}


def test_lm_unseen_grams(spark):
    train = _docs(spark, ["a b a b"])
    lm = train_ngram_lm(train)
    probe = _docs(spark, ["q r s"])  # nothing seen
    row = lm_score(probe, lm, add_k=0).collect()[0]
    assert (row.n_grams, row.score_permille) == (2, 0)
    # smoothed: unseen prefix -> 1000*k // (k*V) = 1000 // 2 = 500
    row = lm_score(probe, lm, add_k=1).collect()[0]
    assert (row.n_grams, row.score_permille) == (2, 500)


def test_lm_smoothing_penalizes_unique_junk(spark):
    # the failure mode that motivates add_k: under self-trained MLE a
    # document of singleton grams scores a PERFECT 1000
    d = _docs(spark, ["the cat sat", "the cat sat", "zq xv jk lp"])
    lm = train_ngram_lm(d)
    mle = {r.doc_id: r.score_permille
           for r in lm_score(d, lm, add_k=0).collect()}
    assert mle[2] == 1000  # junk looks perfect without smoothing
    sm = {r.doc_id: r.score_permille
          for r in lm_score(d, lm, add_k=1).collect()}
    assert sm[0] > sm[2]


def test_buckets_terciles_and_tie_rule(spark):
    scored = spark.createDataFrame(
        [(i, s) for i, s in enumerate([600, 500, 400, 300, 200, 100])],
        "doc_id bigint, score_permille bigint",
    )
    got = {
        r.doc_id: r.bucket for r in lm_quality_buckets(scored).collect()
    }
    assert got == {0: "head", 1: "head", 2: "middle", 3: "middle",
                   4: "tail", 5: "tail"}
    # all-tied corpus: every row sits at the head cut -> all head
    tied = spark.createDataFrame(
        [(i, 10) for i in range(3)], "doc_id bigint, score_permille bigint"
    )
    assert {r.bucket for r in lm_quality_buckets(tied).collect()} == {"head"}


def test_lm_quality_end_to_end_deterministic(spark):
    texts = [
        "the cat sat on the mat",
        "the cat sat on the hat",
        "zq xv jk lp",  # no shared grams -> low score
        "the cat sat",
    ]
    d = _docs(spark, texts)
    a = sorted(map(tuple, lm_quality(d).collect()))
    b = sorted(map(tuple, lm_quality(d).collect()))
    assert a == b
    by_id = {t[0]: t for t in a}
    # the repeated "the cat sat" docs outscore the junk doc
    assert by_id[0][2] > by_id[2][2]
    assert by_id[2][3] == "tail"
    assert {t[3] for t in a} <= {"head", "middle", "tail"}


def test_lm_plan_has_no_python_nodes(spark):
    d = _docs(spark, ["a b c", "a b d"])
    plan = lm_quality(d)._jdf.queryExecution().executedPlan().toString()
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan


# ------------------------------------------------------------ splits --


def _expected_split(key, ratios=(980, 10, 10), names=("train", "valid", "test")):
    h = int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16) % 1000
    acc = 0
    for r, n in zip(ratios, names):
        acc += r
        if h < acc:
            return n
    raise AssertionError


def test_cluster_members_share_split(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(1, 6)], "doc_id bigint"
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4)], "doc_id bigint, cluster_id bigint"
    )
    got = {
        r.doc_id: (r.split_key, r.split)
        for r in assign_splits(docs, clusters).collect()
    }
    assert got[1] == got[2] == got[3] == (1, _expected_split(1))
    assert got[4] == (4, _expected_split(4))
    assert got[5] == (5, _expected_split(5))  # unclustered -> own id


def test_split_ratios_and_determinism(spark):
    docs = spark.createDataFrame([(i,) for i in range(2000)], "doc_id bigint")
    s = assign_splits(
        docs, ratios_permille=(800, 100, 100), names=("tr", "va", "te")
    )
    counts = {r.split: r.n for r in
              s.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert abs(counts["tr"] - 1600) < 100
    assert abs(counts["va"] - 200) < 60
    assert abs(counts["te"] - 200) < 60
    assert sorted(map(tuple, s.collect())) == sorted(
        map(tuple, assign_splits(
            docs, ratios_permille=(800, 100, 100), names=("tr", "va", "te")
        ).collect())
    )


def test_split_validation():
    import pytest

    with pytest.raises(ValueError):
        assign_splits(None, ratios_permille=(500, 400), names=("a", "b"))
    with pytest.raises(ValueError):
        assign_splits(None, ratios_permille=(500, 500), names=("a",))


def test_leakage_zero_on_cluster_keyed_split(spark):
    from simhash_text_dedup_spark.operators.cluster import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21)], "a_id bigint, b_id bigint"
    )
    all_ids = [1, 2, 3, 10, 11, 20, 21, 99]
    docs = spark.createDataFrame([(i,) for i in all_ids], "doc_id bigint")
    cc = connected_components(pairs)
    assigned = assign_splits(
        docs, cc, ratios_permille=(500, 250, 250),
        names=("train", "valid", "test"),
    )
    matrix = split_leakage(pairs, assigned).collect()
    assert all(r.split_a == r.split_b for r in matrix)
    assert sum(r.n_pairs for r in matrix) == 4
    # doc-level hashing on the same pairs DOES leak (negative control)
    naive = assign_splits(
        docs, None, ratios_permille=(500, 250, 250),
        names=("train", "valid", "test"),
    )
    naive_matrix = split_leakage(pairs, naive).collect()
    crossed = sum(r.n_pairs for r in naive_matrix if r.split_a != r.split_b)
    assert crossed > 0  # holds for this fixed id set (md5 is frozen)


def test_split_stable_under_corpus_growth(spark):
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1)], "doc_id bigint, cluster_id bigint"
    )
    small = spark.createDataFrame([(1,), (2,)], "doc_id bigint")
    grown = spark.createDataFrame(
        [(i,) for i in [1, 2, 7, 8, 9]], "doc_id bigint"
    )
    a = {r.doc_id: r.split for r in assign_splits(small, clusters).collect()}
    b = {r.doc_id: r.split for r in assign_splits(grown, clusters).collect()}
    assert all(b[k] == v for k, v in a.items())
