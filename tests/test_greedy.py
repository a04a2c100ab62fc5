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
