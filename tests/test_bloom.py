"""Broadcast Bloom pre-filter: frozen-family position parity (JVM vs
numpy), recall-losslessness, exact verification, map-side probe plan."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from simhash_text_dedup_spark.operators.bloom import (
    _positions_np,
    bloom_maybe_contains,
    bloom_positions_udf,
    bloom_prefilter,
    build_bloom_words,
)

M, K = 1 << 10, 4


def test_udf_positions_match_numpy(spark):
    vals = [0, 1, -1, 2**63 - 1, -(2**63), 123456789123456789, -98765]
    df = spark.createDataFrame(pd.DataFrame({"d": pd.Series(vals, dtype="int64")}))
    got = {
        r.d: list(r.p)
        for r in df.select("d", bloom_positions_udf(M, K)(F.col("d")).alias("p")).collect()
    }
    exp = _positions_np(np.array(vals, dtype=np.int64).view(np.uint64), M, K)
    for v, row in zip(vals, exp):
        assert got[v] == [int(np.int64(x)) for x in row], v


def _frames(spark):
    corpus = spark.createDataFrame(
        pd.DataFrame({"d": pd.Series([i * 7919 for i in range(400)], dtype="int64")})
    )
    # batch: 100 true dups + 300 novel digests
    new = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": pd.Series(range(400), dtype="int64"),
            "d": pd.Series(
                [i * 7919 for i in range(100)]
                + [10_000_000 + i * 104729 for i in range(300)],
                dtype="int64",
            ),
        })
    )
    return new, corpus


def test_prefilter_lossless_and_verified(spark):
    new, corpus = _frames(spark)
    out = bloom_prefilter(new, corpus, "d", m_bits=M, k=K).toPandas()
    truth = {i * 7919 for i in range(400)}
    assert len(out) == 400
    # recall-lossless: every true duplicate is flagged maybe_dup
    assert out[out.d.isin(truth)].maybe_dup.all()
    # exact verification resolves bloom false positives
    assert (out.is_dup == out.d.isin(truth)).all()
    # at 1600 set bits in 1024 slots, false positives MUST occur — the
    # verification join provably does work (deterministic family)
    assert out.maybe_dup.sum() > out.is_dup.sum()


def test_probe_is_map_side(spark):
    new, corpus = _frames(spark)
    words = build_bloom_words(corpus, "d", M, K)
    flagged = bloom_maybe_contains(new, "d", words, M, K)
    plan = flagged._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "Exchange" not in plan  # probe adds no shuffle


def test_words_match_numpy_reference(spark):
    new, corpus = _frames(spark)
    words = build_bloom_words(corpus, "d", M, K)
    ref = np.zeros(M // 64, dtype=np.uint64)
    vals = np.array([i * 7919 for i in range(400)], dtype=np.int64).view(np.uint64)
    for row in _positions_np(vals, M, K):
        for p in row:
            ref[int(p) >> 6] |= np.uint64(1) << np.uint64(int(p) & 63)
    assert (words == ref).all()
