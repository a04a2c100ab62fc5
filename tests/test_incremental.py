"""Incremental new-vs-old round semantics (reference §3.1 DeDup job)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from simhash_text_dedup_spark.config import DedupConfig
from simhash_text_dedup_spark.plans.incremental import run_incremental
from simhash_text_dedup_spark.plans.pipeline import prepare_documents, fingerprint_stage
from simhash_text_dedup_spark.sources.corpus import CorpusSpec, generate_corpus, _perturb

CFG = DedupConfig(spam_threshold=5)


def _mkdocs(rows):
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


@pytest.fixture(scope="module")
def scenario(spark):
    base_pdf, _ = generate_corpus(CorpusSpec(n_docs=120, seed=9))
    base_df = spark.createDataFrame(base_pdf)
    prepared = prepare_documents(base_df).withColumn(
        "entity_id", F.xxhash64("repo", "path")
    )
    base_fps = (
        fingerprint_stage(prepared, CFG)
        .join(prepared.select("doc_id", "entity_id"), "doc_id")
        .select("doc_id", "entity_id", "fingerprint", "score")
    )

    # new batch: unchanged re-crawl, near-dup of old doc, new x new pair,
    # and a unique doc
    row0 = base_pdf.iloc[0]   # re-crawled, unchanged content
    row1 = base_pdf.iloc[1]   # re-crawled with small edit (near-dup of old)
    import random

    rng = random.Random(123)
    edited = _perturb(rng, row1.content, 1)
    fresh = "def brand_new_function(arg):\n    " + " ".join(
        f"unique_token_{i}" for i in range(80)
    )
    fresh2 = fresh.replace("unique_token_40", "renamed_tok")
    new_pdf = _mkdocs(
        [
            (row0.repo, row0.path, "c" * 40, row0.lang, row0.content),
            (row1.repo, row1.path, "d" * 40, row1.lang, edited),
            ("orgN/repoN", "src/a/new1.py", "e" * 40, "python", fresh),
            ("orgN/repoN", "src/a/new2.py", "f" * 40, "python", fresh2),
            ("orgN/repoN", "src/a/uniq.py", "a1" * 20, "python", "only one tiny doc"),
        ]
    )
    res = run_incremental(spark, spark.createDataFrame(new_pdf), base_fps, CFG)
    return res, base_pdf, new_pdf


def test_unchanged_recrawl_goes_to_unload(spark, scenario):
    res, base_pdf, new_pdf = scenario
    unload = res.unload.toPandas()
    # exactly the unchanged re-crawl (doc 0 of the new batch)
    expected_entity = spark.createDataFrame(new_pdf.iloc[[0]]).select(
        F.xxhash64("repo", "path").alias("e")
    ).collect()[0].e
    assert list(unload.entity_id) == [expected_entity]


def test_pair_domain_excludes_old_x_old(scenario):
    res, *_ = scenario
    pairs = res.pairs.toPandas()
    assert len(pairs) > 0
    assert (pairs.a_is_new | pairs.b_is_new).all()
    # left side is always from the new batch in this plan
    assert pairs.a_is_new.all()


def test_near_dup_of_old_found(spark, scenario):
    res, base_pdf, new_pdf = scenario
    pairs = res.pairs.toPandas()
    old_partners = pairs[~pairs.b_is_new]
    # the edited re-crawl of row1 must pair with its old version
    # (calibrated edit of 1 token on a >=30-line doc stays within Hamming 3
    # most of the time; assert at least one new-old pair exists)
    assert len(old_partners) >= 1


def test_new_x_new_found_once(spark, scenario):
    res, base_pdf, new_pdf = scenario
    newnew = res.pairs.filter("a_is_new and b_is_new").toPandas()
    assert len(newnew) >= 1
    assert (newnew.a_id < newnew.b_id).all()
    # no duplicate undirected pairs
    keys = set(map(tuple, newnew[["a_id", "b_id"]].values))
    assert len(keys) == len(newnew)


def test_delete_vs_modify_split(scenario):
    res, *_ = scenario
    dels = set(res.delete_list.toPandas().doc_id)
    mods = set(res.modify_list.toPandas().doc_id)
    assert dels.isdisjoint(mods) or dels == mods == set()
    # losers that are new -> delete; old -> modify
    pairs = res.pairs.toPandas()
    for _, p in pairs.iterrows():
        if (p.a_score, -p.a_id) > (p.b_score, -p.b_id):
            loser, loser_new = p.b_id, p.b_is_new
        else:
            loser, loser_new = p.a_id, p.a_is_new
        assert loser in (dels if loser_new else mods)
