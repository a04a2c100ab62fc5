"""Cross-document duplicate-span detection/removal (Lee et al. style)."""

from pyspark.sql import functions as F

from simhash_text_dedup_spark.operators.dupspans import (
    dup_gram_hits,
    dup_spans,
    strip_dup_spans,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


SHARED6 = "alpha beta gamma delta epsilon zeta"  # 6 words


def test_dup_spans_merge_into_one_island(spark):
    # a 6-word shared passage with width 4 -> 3 duplicated grams that
    # merge into ONE maximal span covering exactly the passage
    docs = _df(
        spark,
        [
            (1, f"u1 u2 {SHARED6} v1 v2"),
            (2, f"w1 {SHARED6} w2 w3 w4"),
        ],
    )
    got = {
        r.doc_id: (r.span_start, r.span_end, r.n_grams)
        for r in dup_spans(docs, width=4, min_docs=2).collect()
    }
    # doc 1: passage at word 2..7; doc 2: at word 1..6
    assert got[1] == (2, 7, 3)
    assert got[2] == (1, 6, 3)


def test_dup_spans_gap_splits_islands(spark):
    filler = " ".join(f"f{i}" for i in range(10))
    docs = _df(
        spark,
        [
            (1, f"{SHARED6} {filler} {SHARED6.upper()}"),
            (2, f"x0 {SHARED6} y0 {SHARED6.upper()} z0"),
        ],
    )
    got = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in dup_spans(docs, width=4, min_docs=2).collect()
    )
    # both docs report TWO spans (the lower+upper passages), not one
    assert [d for d, _, _ in got] == [1, 1, 2, 2]


def test_strip_keeps_owner_copy(spark):
    docs = _df(
        spark,
        [
            (1, f"u1 u2 {SHARED6} v1 v2"),
            (2, f"w1 {SHARED6} w2 w3 w4"),
            (3, "n1 n2 n3 n4 n5 n6 n7"),
        ],
    )
    got = {r.doc_id: r for r in strip_dup_spans(docs, width=4, min_docs=2).collect()}
    # owner (min doc_id containing the grams) keeps its text verbatim
    assert got[1].stripped_text == f"u1 u2 {SHARED6} v1 v2"
    assert got[1].n_removed == 0
    # the non-owner loses exactly the shared passage
    assert got[2].stripped_text == "w1 w2 w3 w4"
    assert got[2].n_removed == 6
    # untouched docs round-trip exactly
    assert got[3].stripped_text == "n1 n2 n3 n4 n5 n6 n7"
    assert got[3].n_removed == 0


def test_hits_report_owner_and_doc_count(spark):
    docs = _df(
        spark,
        [
            (7, f"{SHARED6} a b"),
            (9, f"c {SHARED6} d"),
            (11, f"e f {SHARED6}"),
        ],
    )
    hits = dup_gram_hits(docs, width=6, min_docs=2).collect()
    assert len(hits) == 3  # one 6-gram hit per doc
    for r in hits:
        assert r.owner_doc == 7
        assert r.n_docs == 3


def test_hash_grams_parity(spark):
    docs = _df(
        spark,
        [
            (1, f"u1 u2 {SHARED6} v1 v2"),
            (2, f"w1 {SHARED6} w2 w3 w4"),
            (3, "n1 n2 n3 n4 n5 n6 n7"),
        ],
    )
    plain = sorted(map(tuple, dup_spans(docs, width=4, min_docs=2).collect()))
    hashed = sorted(
        map(tuple, dup_spans(docs, width=4, min_docs=2, hash_grams=True).collect())
    )
    assert plain == hashed


def test_strip_on_fixture_round_trips_unaffected_docs(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    out = strip_dup_spans(docs, width=8, min_docs=2)
    joined = (
        out.join(docs.select("doc_id", "text"), "doc_id")
        .select("doc_id", "n_removed", (F.col("stripped_text") == F.col("text")).alias("same"))
        .collect()
    )
    for r in joined:
        if r.n_removed == 0:
            # single-space reassembly must round-trip the source text
            assert r.same, r.doc_id


def test_strip_multi_owner_overlap_preserves_every_passage(spark):
    # overlapping dup grams with DIFFERENT owners: doc1 owns 'A B C D',
    # doc2 owns 'B C D E'/'C D E F'. Owned positions are exempt, so
    # each passage survives in its owner even where a non-owned gram
    # overlaps it; only doc3 (owning nothing) is fully stripped.
    docs = _df(
        spark,
        [
            (1, "X A B C D Y"),
            (2, "P A B C D E F Q"),
            (3, "A B C D E F"),
        ],
    )
    got = {r.doc_id: r for r in strip_dup_spans(docs, width=4, min_docs=2).collect()}
    assert got[1].stripped_text == "X A B C D Y"       # owner, untouched
    assert got[1].n_removed == 0
    # doc2: non-owned 'A B C D' covers 1-4, owned grams cover 2-6 ->
    # only position 1 ('A') is removed
    assert got[2].stripped_text == "P B C D E F Q"
    assert got[2].n_removed == 1
    # doc3 owns nothing -> fully stripped
    assert got[3].stripped_text == ""
    assert got[3].n_removed == 6


def test_strip_hash_grams_parity(spark):
    docs = _df(
        spark,
        [
            (1, "X A B C D Y"),
            (2, "P A B C D E F Q"),
            (3, "A B C D E F"),
            (4, "totally unrelated words here now"),
        ],
    )
    plain = sorted(map(tuple, strip_dup_spans(docs, width=4, min_docs=2).collect()))
    hashed = sorted(
        map(
            tuple,
            strip_dup_spans(docs, width=4, min_docs=2, hash_grams=True).collect(),
        )
    )
    assert plain == hashed
