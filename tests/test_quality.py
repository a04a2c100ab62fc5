"""Composite Gopher-style quality filter."""

from pyspark.sql import functions as F

from simhash_text_dedup_spark.operators.quality import (
    quality_filter,
    quality_survivors,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_rules_fire_with_stable_reason_order(spark):
    long_clean = " ".join(
        f"word{chr(97 + i % 26)}{chr(97 + i // 26)}" for i in range(60)
    )  # 60 distinct 6-char tokens, no digits
    docs = _df(
        spark,
        [
            (1, long_clean),
            (2, "short doc"),  # too_few_tokens (+ token_len: atl 4000 ok)
            (3, " ".join(["x"] * 60)),  # token_len (atl 1000) + top_bigram
            (4, "\n".join(["same line"] * 30) + " " + " ".join(["y"] * 50)),
        ],
    )
    got = {r.doc_id: r for r in quality_filter(docs, min_tokens=10).collect()}
    assert got[1].keep and got[1].reasons == ""
    assert "too_few_tokens" in got[2].reasons and not got[2].keep
    assert got[3].reasons.startswith("token_len")
    assert "top_bigram" in got[3].reasons
    # fixed rule order: token_len before top_bigram, comma-joined
    assert got[3].reasons == "token_len,top_bigram"
    assert "dup_lines" in got[4].reasons


def test_empty_doc_fails_token_floor_only_when_set(spark):
    docs = _df(spark, [(1, "")])
    got = quality_filter(docs, min_tokens=1).collect()[0]
    assert got.n_tokens == 0
    assert "too_few_tokens" in got.reasons
    relaxed = quality_filter(docs, min_tokens=0, min_atl_milli=0).collect()[0]
    assert relaxed.keep


def test_survivors_composition(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    flags = quality_filter(docs)
    keep_ids = {r.doc_id for r in flags.collect() if r.keep}
    surv = quality_survivors(docs)
    assert {r.doc_id for r in surv.select("doc_id").collect()} == keep_ids
    assert set(surv.columns) == set(docs.columns)


def test_stopword_rule_optional(spark):
    docs = _df(spark, [(1, " ".join(["wort"] * 60))])  # no EN stopwords
    on = quality_filter(docs, min_stopwords=2, min_atl_milli=4000, max_atl_milli=5000)
    assert "stopwords" in on.collect()[0].reasons
    off = quality_filter(docs, min_stopwords=0, min_atl_milli=4000, max_atl_milli=5000)
    r = off.collect()[0].reasons
    assert "stopwords" not in r
