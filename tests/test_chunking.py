"""Fixed-width token-window document chunking."""

import pytest
from pyspark.sql import functions as F

from simhash_text_dedup_spark.operators.chunking import chunk_documents


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def _toks(n):
    return " ".join(f"t{i}" for i in range(n))


def test_windows_hand_computed(spark):
    # 10 tokens, width 4, overlap 1 -> stride 3 -> starts 0, 3, 6
    d = _docs(spark, [_toks(10)])
    got = sorted(
        (r.chunk_idx, r.start_token, r.n_tokens, r.chunk_text)
        for r in chunk_documents(d, chunk_tokens=4, overlap=1).collect()
    )
    assert got == [
        (0, 0, 4, "t0 t1 t2 t3"),
        (1, 3, 4, "t3 t4 t5 t6"),
        (2, 6, 4, "t6 t7 t8 t9"),
    ]


def test_last_window_clamped_full_width(spark):
    # 11 tokens, width 4, stride 3 -> naive starts 0,3,6,9; last clamps
    # to n - width = 7 so every window stays exactly 4 wide
    d = _docs(spark, [_toks(11)])
    got = sorted(
        (r.start_token, r.n_tokens)
        for r in chunk_documents(d, chunk_tokens=4, overlap=1).collect()
    )
    assert got == [(0, 4), (3, 4), (6, 4), (7, 4)]


def test_short_and_exact_docs_single_window(spark):
    d = _docs(spark, [_toks(2), _toks(4), ""])
    rows = chunk_documents(d, chunk_tokens=4, overlap=1).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert [(r.start_token, r.n_tokens) for r in by_doc[0]] == [(0, 2)]
    assert [(r.start_token, r.n_tokens) for r in by_doc[1]] == [(0, 4)]
    # empty string splits to [''] -> one 1-token window of ''
    assert [(r.n_tokens, r.chunk_text) for r in by_doc[2]] == [(1, "")]


def test_full_coverage_property(spark):
    lengths = [1, 3, 7, 8, 9, 16, 17, 31, 64, 100]
    d = _docs(spark, [_toks(n) for n in lengths])
    rows = chunk_documents(d, chunk_tokens=8, overlap=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.start_token, r.n_tokens))
    for doc_id, n in enumerate(lengths):
        covered = set()
        starts = sorted(s for s, _ in by_doc[doc_id])
        assert starts == sorted(set(starts))  # strictly increasing
        for s, w in by_doc[doc_id]:
            if n >= 8:
                assert w == 8  # all windows full-width
            covered.update(range(s, s + w))
        assert covered == set(range(n))  # every token in some window


def test_ragged_disjoint_roundtrip(spark):
    # ragged mode at overlap 0 exactly partitions the document
    texts = [_toks(13), _toks(4), "lone"]
    d = _docs(spark, texts)
    rows = chunk_documents(
        d, chunk_tokens=5, overlap=0, last_window="ragged"
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, t in enumerate(texts):
        parts = [r.chunk_text for r in
                 sorted(by_doc[i], key=lambda r: r.chunk_idx)]
        assert " ".join(parts) == t


def test_clamp_duplicates_tail_ragged_runs_short(spark):
    # the semantic difference between the two last-window rules:
    # n=13, width 5, overlap 0 -> clamp: [0,5) [5,10) [8,13) (tokens
    # 8-9 re-covered, all windows full); ragged: [0,5) [5,10) [10,13)
    d = _docs(spark, [_toks(13)])
    clamp = sorted(
        (r.start_token, r.n_tokens)
        for r in chunk_documents(d, chunk_tokens=5, overlap=0).collect()
    )
    assert clamp == [(0, 5), (5, 5), (8, 5)]
    ragged = sorted(
        (r.start_token, r.n_tokens)
        for r in chunk_documents(
            d, chunk_tokens=5, overlap=0, last_window="ragged"
        ).collect()
    )
    assert ragged == [(0, 5), (5, 5), (10, 3)]


def test_ragged_coverage_with_overlap(spark):
    lengths = [1, 3, 7, 8, 9, 16, 17, 31, 64, 100]
    d = _docs(spark, [_toks(n) for n in lengths])
    rows = chunk_documents(
        d, chunk_tokens=8, overlap=3, last_window="ragged"
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.start_token, r.n_tokens))
    for doc_id, n in enumerate(lengths):
        covered = set()
        for s, w in by_doc[doc_id]:
            assert w >= 1  # every window contributes tokens
            covered.update(range(s, s + w))
        assert covered == set(range(n))


def test_overlap_validation(spark):
    d = _docs(spark, ["a b"])
    with pytest.raises(ValueError):
        chunk_documents(d, chunk_tokens=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_documents(d, chunk_tokens=4, overlap=-1)
    with pytest.raises(ValueError):
        chunk_documents(d, chunk_tokens=4, overlap=1, last_window="pad")


def test_plan_no_shuffle_no_python(spark):
    d = _docs(spark, [_toks(20)])
    plan = (
        chunk_documents(d, chunk_tokens=8, overlap=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for node in ("Exchange", "BatchEvalPython", "ArrowEvalPython",
                 "MapInPandas"):
        assert node not in plan
