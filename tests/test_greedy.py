"""Reference-exact greedy selection mode: exact action parity with the
single-process reference greedy (SelectLogicReducer.java:56-104)."""

import pytest

from simhash_text_dedup_spark.config import DedupConfig
from simhash_text_dedup_spark.plans.pipeline import run_dedup
from simhash_text_dedup_spark.reference_impl import Doc, reference_dedup
from simhash_text_dedup_spark.sources.corpus import CorpusSpec, generate_corpus

CFG = DedupConfig(spam_threshold=5, selection="greedy")


@pytest.fixture(scope="module")
def result(spark):
    docs_pdf, _ = generate_corpus(CorpusSpec(n_docs=400, seed=42))
    return run_dedup(spark, spark.createDataFrame(docs_pdf), CFG)


@pytest.fixture(scope="module")
def golden(result):
    docs = [
        Doc(r.doc_id, r.fingerprint, r.score, r.is_new)
        for r in result.fingerprints.collect()
    ]
    return reference_dedup(
        docs, hamming_k=CFG.hamming_k, spam_threshold=CFG.spam_threshold,
        selection="greedy",
    )


def test_greedy_actions_match_reference(result, golden):
    got = {r.doc_id: r.action for r in result.clusters.collect()}
    assert got == golden.actions


def test_greedy_keeps_more_than_cc_on_chains(spark):
    """Greedy can keep a doc whose killer was itself killed — the
    documented semantic delta vs cc mode (SURVEY §7.1 item 6)."""
    docs_pdf, _ = generate_corpus(CorpusSpec(n_docs=400, seed=42))
    cc = run_dedup(spark, spark.createDataFrame(docs_pdf),
                   CFG.with_(selection="cc"))
    gr = run_dedup(spark, spark.createDataFrame(docs_pdf), CFG)
    n_keep_cc = cc.clusters.filter("action = 'keep'").count()
    n_keep_gr = gr.clusters.filter("action = 'keep'").count()
    assert n_keep_gr >= n_keep_cc


def test_greedy_warns_on_mega_component(spark):
    """The mega-component guard lives INSIDE the applyInPandas pass
    (round-3 ADVICE: no extra eager Spark job at construction time):
    the component function warns past the threshold, and constructing
    assign_actions_greedy runs ZERO Spark actions."""
    from unittest.mock import patch

    import pandas as pd
    from pyspark.sql import DataFrame as _DF

    from simhash_text_dedup_spark.operators.selection import (
        _greedy_component,
        assign_actions_greedy,
    )

    n = 30
    rows = [
        {"doc_id": i, "cluster_id": 0, "score": float(i), "is_new": True,
         "b_doc": i}
        for i in range(n)
    ] + [
        {"doc_id": a, "cluster_id": 0, "score": float(a), "is_new": True,
         "b_doc": b}
        for a in range(n) for b in range(a + 1, n)
    ]
    with pytest.warns(RuntimeWarning, match="single task"):
        out_pdf = _greedy_component(pd.DataFrame(rows), warn_pairs=100)
    assert (out_pdf["action"] == "keep").sum() == 1  # clique -> one keeper

    meta = spark.createDataFrame(
        [(i, 0, float(i), True) for i in range(n)],
        "doc_id long, cluster_id long, score double, is_new boolean",
    )
    edges = spark.createDataFrame(
        [(a, b) for a in range(n) for b in range(a + 1, n)],
        "a_id long, b_id long",
    )

    def _boom(*a, **k):
        raise AssertionError("assign_actions_greedy ran an eager action")

    with patch.object(_DF, "collect", _boom), patch.object(_DF, "count", _boom):
        out = assign_actions_greedy(meta, edges, warn_pairs_per_component=100)
    # semantics unchanged by the guard: clique -> one keeper
    assert out.filter("action = 'keep'").count() == 1


def test_greedy_check_disabled_stays_silent(spark):
    import warnings as _w

    from simhash_text_dedup_spark.operators.selection import (
        assign_actions_greedy,
    )

    meta = spark.createDataFrame(
        [(0, 0, 1.0, True), (1, 0, 0.5, True)],
        "doc_id long, cluster_id long, score double, is_new boolean",
    )
    edges = spark.createDataFrame([(0, 1)], "a_id long, b_id long")
    with _w.catch_warnings():
        _w.simplefilter("error", RuntimeWarning)
        out = assign_actions_greedy(meta, edges, warn_pairs_per_component=None)
        assert out.count() == 2


def test_greedy_multi_component_frame_equals_per_component():
    """The mapInPandas rewrite hands _greedy_component a whole hash
    PARTITION of components at once; the global score-ordered walk must
    make exactly the per-component decisions (components share no
    docs, so a shared dead set cannot interfere)."""
    import pandas as pd

    from simhash_text_dedup_spark.operators.selection import _greedy_component

    def comp(cluster, ids_scores, pairs):
        rows = [
            {"doc_id": i, "cluster_id": cluster, "score": s, "is_new": True,
             "b_doc": i}
            for i, s in ids_scores
        ] + [
            {"doc_id": a, "cluster_id": cluster,
             "score": dict(ids_scores)[a], "is_new": True, "b_doc": b}
            for a, b in pairs
        ]
        return rows

    # component 0: chain 10-11-12 (interleaved scores); component 1:
    # clique 20,21,22 — scores chosen so the global sort interleaves
    # the two components' pairs
    c0 = comp(0, [(10, 5.0), (11, 3.0), (12, 4.0)], [(10, 11), (11, 12)])
    c1 = comp(1, [(20, 4.5), (21, 3.5), (22, 2.5)],
              [(20, 21), (20, 22), (21, 22)])

    def run(rows):
        out = _greedy_component(pd.DataFrame(rows), warn_pairs=None)
        return {r.doc_id: (r.is_representative, r.action)
                for r in out.itertuples()}

    merged = run(c0 + c1)
    separate = {**run(c0), **run(c1)}
    assert merged == separate
    # sanity: the clique kept exactly one
    assert sum(merged[i][0] for i in (20, 21, 22)) == 1
