"""PII scrubbing + corpus n-gram vocabulary stats."""

from pyspark.sql import functions as F

from simhash_text_dedup_spark.operators.scrub import pii_scrub
from simhash_text_dedup_spark.operators.vocab import top_ngrams


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_pii_scrub_counts_and_placeholders(spark):
    docs = _df(
        spark,
        [
            (1, "mail bob@corp.io or eve.x@a.b.org now"),
            (2, "server at 10.0.42.7 and 192.168.1.1:8080"),
            (3, "key = deadbeefdeadbeefdeadbeefdeadbeef done"),
            (4, "clean text with no sensitive literals"),
        ],
    )
    got = {r.doc_id: r for r in pii_scrub(docs).collect()}
    assert (got[1].n_email, got[1].n_ipv4, got[1].n_secret) == (2, 0, 0)
    assert got[1].scrubbed_text == "mail <EMAIL> or <EMAIL> now"
    assert got[2].n_ipv4 == 2
    assert got[2].scrubbed_text == "server at <IP> and <IP>:8080"
    assert got[3].n_secret == 1
    assert "<SECRET>" in got[3].scrubbed_text
    assert "deadbeef" not in got[3].scrubbed_text
    assert got[4].scrubbed_text == "clean text with no sensitive literals"
    assert (got[4].n_email, got[4].n_ipv4, got[4].n_secret) == (0, 0, 0)


def test_pii_scrub_is_pure_map(spark):
    import io
    from contextlib import redirect_stdout

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    buf = io.StringIO()
    with redirect_stdout(buf):
        pii_scrub(docs).explain("formatted")
    plan = buf.getvalue()
    # a 100-TB redaction sweep must be scan -> project: no exchange,
    # no UDF
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan


def test_top_ngrams_counts_and_rank(spark):
    docs = _df(
        spark,
        [
            (1, "a b a b c"),
            (2, "a b x"),
            (3, "z z"),
        ],
    )
    got = {r.gram: (r.n_occurrences, r.n_docs, r.rank) for r in
           top_ngrams(docs, width=2, k=3).collect()}
    # "a b": 2 occurrences in doc1 + 1 in doc2
    assert got["a b"] == (3, 2, 1)
    assert len(got) == 3
    # deterministic ties: "b a" < "b c" < ... by gram value at count 1
    ranks = sorted(got.values(), key=lambda t: t[2])
    assert [r for _, _, r in ranks] == [1, 2, 3]


def test_top_ngrams_unigram_fixture_smoke(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = top_ngrams(docs, width=1, k=10).collect()
    assert len(rows) == 10
    occ = [r.n_occurrences for r in sorted(rows, key=lambda r: r.rank)]
    assert occ == sorted(occ, reverse=True)
    assert all(r.n_docs <= r.n_occurrences for r in rows)
