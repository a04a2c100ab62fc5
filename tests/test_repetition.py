"""Repetition flags + corpus boilerplate-line removal
(operators/repetition.py): hand-computed permille values, edge docs
(empty text, single token), order preservation and the all-dropped
document in strip_boilerplate_lines."""

from pyspark.sql import functions as F

from simhash_text_dedup_spark.operators.repetition import (
    repetition_stats,
    strip_boilerplate_lines,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_repetition_stats_hand_values(spark):
    d = _docs(
        spark,
        [
            "a\nb\na\nc",     # dup line 'a'; no spaces -> no bigrams
            "x y x y x",      # modal bigram 'x y' twice of four
            "",               # one empty line, no bigrams
            "w w w w",        # all bigrams identical
        ],
    )
    rows = {r.doc_id: r for r in repetition_stats(d).collect()}
    assert len(rows) == 4

    r = rows[0]
    assert (r.n_lines, r.dup_line_permille) == (4, 250)       # 1 of 4 repeated
    assert r.dup_line_char_permille == 500                    # 'a' twice = 2 of 4 chars
    assert (r.n_bigrams, r.top_bigram_permille) == (0, 0)

    r = rows[1]
    assert (r.n_lines, r.dup_line_permille, r.dup_line_char_permille) == (1, 0, 0)
    assert (r.n_bigrams, r.top_bigram_permille) == (4, 500)

    r = rows[2]
    assert (r.n_lines, r.dup_line_permille, r.dup_line_char_permille) == (1, 0, 0)
    assert (r.n_bigrams, r.top_bigram_permille) == (0, 0)

    r = rows[3]
    assert (r.n_bigrams, r.top_bigram_permille) == (3, 1000)


def test_repetition_stats_duplicate_empty_lines(spark):
    # blank lines repeat; they are zero-char so the char fraction stays 0
    d = _docs(spark, ["a\n\nb\n\nc"])
    r = repetition_stats(d).collect()[0]
    assert r.n_lines == 5
    assert r.dup_line_permille == 200          # one repeated '' of 5 lines
    assert r.dup_line_char_permille == 0


def test_strip_boilerplate_hand_case(spark):
    d = _docs(
        spark,
        [
            "keep1\nFOOTER\nkeep2",
            "FOOTER\nunique2",
            "FOOTER",
            "solo doc",
        ],
    )
    out = {
        r.doc_id: r
        for r in strip_boilerplate_lines(d, max_line_occurrences=2).collect()
    }
    assert (out[0].n_lines, out[0].n_kept, out[0].kept_text) == (
        3, 2, "keep1\nkeep2",
    )
    assert (out[1].n_kept, out[1].kept_text) == (1, "unique2")
    # every line dropped -> empty text, row still present
    assert (out[2].n_lines, out[2].n_kept, out[2].kept_text) == (1, 0, "")
    assert out[3].kept_text == "solo doc"


def test_strip_boilerplate_short_lines_exempt(spark):
    # empty/short lines repeat corpus-wide but are structural: kept
    d = _docs(spark, ["a\n\nbb\n\ncc", "x\n\nyy"])
    out = {
        r.doc_id: r
        for r in strip_boilerplate_lines(
            d, max_line_occurrences=2, min_line_chars=1
        ).collect()
    }
    assert out[0].kept_text == "a\n\nbb\n\ncc"
    assert out[1].kept_text == "x\n\nyy"


def test_strip_boilerplate_order_preserved(spark):
    # drop a middle line; survivors keep original relative order even
    # though the reassembly goes through an unordered aggregation
    boiler = "NAV"
    texts = [f"l{i}a\n{boiler}\nl{i}b\nl{i}c" for i in range(6)]
    d = _docs(spark, texts).repartition(4)
    out = {
        r.doc_id: r
        for r in strip_boilerplate_lines(d, max_line_occurrences=2).collect()
    }
    for i in range(6):
        assert out[i].kept_text == f"l{i}a\nl{i}b\nl{i}c"


def test_strip_boilerplate_within_doc_occurrences_count(spark):
    # the occurrence budget is corpus-total, not distinct-docs: three
    # copies inside one document cross max_line_occurrences=2 alone
    d = _docs(spark, ["SP\nSP\nSP\nbody"])
    r = strip_boilerplate_lines(d, max_line_occurrences=2).collect()[0]
    assert (r.n_lines, r.n_kept, r.kept_text) == (4, 1, "body")
