"""Column functions in functions/text.py that aren't already pinned by
the oracle replica: the MD5-prefix fingerprint must equal hashlib's
digest bit-for-bit (it is the cross-engine-reproducible variant of the
reference's MD5 docid)."""

import hashlib

from pyspark.sql import functions as F

from simhash_text_dedup_spark.functions.text import doc_fingerprint_md5


def test_doc_fingerprint_md5_matches_hashlib(spark):
    texts = ["", "abc", "hello world", "päö unicode", "a" * 999]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select(
        "text", doc_fingerprint_md5(F.col("text")).alias("fp")
    ).collect()
    assert len(rows) == len(texts)
    for r in rows:
        expect = int(hashlib.md5(r.text.encode("utf-8")).hexdigest()[:15], 16)
        assert r.fp == expect, r.text[:20]


def test_deterministic_sample_is_stable(spark):
    # the % 8 slice is a pure function of content: same rows selected
    # regardless of partitioning
    texts = [(i, f"doc body {i}") for i in range(64)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    fp = doc_fingerprint_md5(F.col("text"))
    a = {r.doc_id for r in df.filter(fp % 8 == 0).collect()}
    b = {
        r.doc_id
        for r in df.repartition(7).filter(fp % 8 == 0).collect()
    }
    assert a == b
    expected = {
        i
        for i, t in texts
        if int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % 8 == 0
    }
    assert a == expected
