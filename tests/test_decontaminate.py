"""Benchmark decontamination (operators/decontaminate.py): exact
n-gram hit semantics, repeat counting, width edges, anti-join output,
and the broadcast-join plan shape."""

from pyspark.sql import functions as F

from simhash_text_dedup_spark.operators.decontaminate import (
    contaminated_docs,
    decontaminate,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hit_semantics(spark):
    bench = _df(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    corpus = _df(
        spark,
        [
            (1, "xx the quick brown fox jumps yy"),   # shares a 5-gram
            (2, "quick brown fox leaps over fences"), # only 3-gram overlap
            (3, "completely unrelated text here now"),
        ],
    )
    hits = {r.doc_id: r.n_hits for r in
            contaminated_docs(corpus, bench, ngram_width=5).collect()}
    assert hits == {1: 1}  # exactly 'the quick brown fox jumps'

    kept = sorted(
        r.doc_id
        for r in decontaminate(corpus, bench, ngram_width=5).collect()
    )
    assert kept == [2, 3]


def test_repeated_gram_counts_each_position(spark):
    bench = _df(spark, [(100, "a b c d e")])
    corpus = _df(spark, [(1, "a b c d e z a b c d e")])
    hits = contaminated_docs(corpus, bench, ngram_width=5).collect()
    assert hits[0].n_hits == 2


def test_short_docs_have_no_grams(spark):
    bench = _df(spark, [(100, "a b c d e")])
    corpus = _df(spark, [(1, "a b c d"), (2, "")])
    assert contaminated_docs(corpus, bench, ngram_width=5).count() == 0
    assert decontaminate(corpus, bench, ngram_width=5).count() == 2


def test_benchmark_side_is_broadcast(spark):
    bench = _df(spark, [(100, "a b c d e")])
    corpus = _df(spark, [(1, "a b c d e f")])
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        contaminated_docs(corpus, bench, ngram_width=5).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    # exactly one gram exchange: the benchmark side's distinct().  A
    # second one would mean the corpus side is being shuffled on the
    # text key, which the broadcast exists to prevent.
    import re

    assert len(re.findall(r"hashpartitioning\(gram#\d+", plan)) == 1, plan


def test_benchmark_needs_only_text_column(spark):
    from pyspark.sql import functions as F  # noqa: F811

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon more"), (2, "nothing shared")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("alpha beta gamma delta epsilon",)], "text string"
    )  # no id column at all
    got = contaminated_docs(corpus, bench, ngram_width=5).collect()
    assert [(r.doc_id, r.n_hits) for r in got] == [(1, 1)]


def test_semantic_contaminated_values(spark):
    from simhash_text_dedup_spark.operators.decontaminate import (
        semantic_contaminated,
    )

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),   # exact copy of bench vec
            (2, [5.0, 0.0, 0.0]),   # scaled copy -> cosine 1
            (3, [0.0, 1.0, 0.0]),   # orthogonal to b1, copy of b2
            (4, [0.0, 0.0, 1.0]),   # orthogonal to both
            (5, [1.0, 1.0, 0.0]),   # cos ~0.707 vs both bench vecs
            (6, [0.0, 0.0, 0.0]),   # zero vector: matches nothing
        ],
        "vec_id long, embedding array<double>",
    )
    bench = spark.createDataFrame(
        [(101, [2.0, 0.0, 0.0]), (102, [0.0, 3.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    got = {
        r.vec_id: (r.n_matches, r.contaminated)
        for r in semantic_contaminated(
            corpus, bench, threshold=0.9
        ).collect()
    }
    assert got == {
        1: (1, True),
        2: (1, True),
        3: (1, True),
        4: (0, False),
        5: (0, False),
        6: (0, False),
    }
    # a looser threshold picks up the 45-degree vector against BOTH
    loose = {
        r.vec_id: r.n_matches
        for r in semantic_contaminated(
            corpus, bench, threshold=0.7
        ).collect()
    }
    assert loose[5] == 2


def test_semantic_contaminated_bench_cap(spark):
    import pytest as _pytest

    from simhash_text_dedup_spark.operators.decontaminate import (
        semantic_contaminated,
    )

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(ValueError, match="max_bench_rows"):
        semantic_contaminated(emb, emb, max_bench_rows=5)


def test_semantic_contaminated_no_shuffle_single_arrow_stage(spark):
    import io as _io
    import re as _re
    from contextlib import redirect_stdout as _rs

    from simhash_text_dedup_spark.operators.decontaminate import (
        semantic_contaminated,
    )

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    bench = emb.limit(2)
    df = semantic_contaminated(emb, bench, threshold=0.99)
    buf = _io.StringIO()
    with _rs(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan, plan
    assert len(_re.findall(r"^\(\d+\) ArrowEvalPython", plan, _re.M)) == 1, plan


def test_semantic_oracle_threshold_margin():
    """Boundary-margin canary: the semantic_decontaminate entry derives
    an INTEGER n_matches from float cosine >= 0.35 comparisons computed
    in different summation orders on the two engines.  That is only
    bit-for-bit safe because no sf0.01 (corpus, bench) cosine sits near
    the threshold — pin the margin so a testdata regeneration that
    lands a point close to 0.35 fails HERE, not as an oracle flake."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/embeddings.parquet')"
    )
    (margin,) = con.execute(
        """
        WITH e AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ), b AS (SELECT v AS bv FROM e ORDER BY vec_id LIMIT 5)
        SELECT min(abs(list_dot_product(e.v, b.bv)
                 / (sqrt(list_dot_product(e.v, e.v))
                    * sqrt(list_dot_product(b.bv, b.bv))) - 0.35))
        FROM e CROSS JOIN b
        """
    ).fetchone()
    assert margin > 1e-6, (
        f"a cosine sits {margin} from the 0.35 threshold — cross-engine "
        "float noise could flip n_matches; move the entry threshold"
    )
