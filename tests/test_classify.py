"""Hashed-feature linear classifier: brute-force parity, integer
exactness, edge docs, broadcast-model plan."""

import hashlib

import pandas as pd
from pyspark.sql import functions as F

from simhash_text_dedup_spark.operators.classify import (
    classifier_score,
    hashed_features,
    train_linear_classifier,
)

N = 1 << 20  # collision-free at test scale


def _bucket(f: str, n: int = N) -> int:
    return int(hashlib.md5(f.encode()).hexdigest()[:15], 16) % n


def _feats(text: str) -> list:
    t = [x for x in text.split(" ") if x]
    fs = t + [f"{a} {b}" for a, b in zip(t, t[1:])]
    return [_bucket(f) for f in dict.fromkeys(fs)]


POS = ["good wiki article text", "good curated article text"]
NEG = ["spam buy now spam", "buy spam pills now"]


def _train_df(spark):
    rows = [(i, t, True) for i, t in enumerate(POS)] + [
        (10 + i, t, False) for i, t in enumerate(NEG)
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "label"])
    )


def test_features_match_reference(spark):
    df = _train_df(spark)
    got = hashed_features(df, n_buckets=N).toPandas()
    for i, text in enumerate(POS):
        assert sorted(got[got.doc_id == i].bucket) == sorted(_feats(text))
    # repeated token ("spam") deduped per doc, bigrams distinct
    assert sorted(got[got.doc_id == 10].bucket) == sorted(_feats(NEG[0]))


def test_train_and_score_bruteforce_parity(spark):
    df = _train_df(spark)
    model = train_linear_classifier(df, n_buckets=N)
    mp = {r.bucket: r.weight_permille for r in model.collect()}
    # python replication
    from collections import Counter
    pos_c, all_c = Counter(), Counter()
    for i, t in enumerate(POS + NEG):
        for b in _feats(t):
            all_c[b] += 1
            if i < len(POS):
                pos_c[b] += 1
    exp = {b: (1000 * (pos_c[b] + 1)) // (all_c[b] + 2) for b in all_c}
    assert mp == exp
    # hand check: 'good' appears in both pos docs only -> (2+1)*1000//(2+2)
    assert mp[_bucket("good")] == 750
    assert mp[_bucket("spam")] == 250

    test = spark.createDataFrame(
        pd.DataFrame(
            [(100, "good spam unseen_token"), (101, ""), (102, "   ")],
            columns=["doc_id", "text"],
        )
    )
    out = {r.doc_id: r for r in classifier_score(test, model, n_buckets=N).collect()}
    fs = _feats("good spam unseen_token")
    exp_score = sum(exp.get(b, 500) for b in fs) // len(fs)
    assert out[100].score_permille == exp_score
    assert out[100].n_features == len(fs) == 5
    # featureless docs take the 500 prior exactly
    for d in (101, 102):
        assert out[d].n_features == 0 and out[d].score_permille == 500
        assert out[d].pred  # >= threshold


def test_model_is_broadcast_no_text_key_shuffle(spark):
    df = _train_df(spark)
    # materialize the model (at scale it is read back from its table);
    # the SCORING plan must then shuffle only on doc_id — the feature
    # stream meets the broadcast model map-side
    model = spark.createDataFrame(
        train_linear_classifier(df, n_buckets=N).toPandas()
    )
    scored = classifier_score(df, model, n_buckets=N)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    import re
    for part in re.findall(r"hashpartitioning\((\w+)#", plan):
        assert part == "doc_id", plan