"""Corpus data-card report: hand-computed stats, global dup groups."""

import pandas as pd

from simhash_text_dedup_spark.operators.report import corpus_report


def test_corpus_report_hand_values(spark):
    rows = [
        # doc_id, text, lang, source
        (1, "x y", "a", "s1"),
        (2, "x y", "a", "s2"),   # exact dup of 1
        (3, "", "a", "s1"),      # empty
        (4, "x y", "b", "s3"),   # dup of 1/2 — GLOBAL group spans langs
        (5, "p q r", "b", "s3"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    )
    out = {r.slice: r for r in corpus_report(df).collect()}
    a, b = out["a"], out["b"]
    assert (a.n_docs, a.n_sources, a.n_empty) == (3, 2, 1)
    assert (a.total_chars, a.total_tokens) == (6, 4)   # 'x y' has 2 tokens
    assert a.mean_tokens == 1                          # 4 // 3
    assert (a.n_exact_dup, a.dup_permille) == (2, 666)
    assert (b.n_docs, b.n_sources, b.n_empty) == (2, 1, 0)
    assert (b.n_exact_dup, b.dup_permille) == (1, 500)  # cross-lang dup
