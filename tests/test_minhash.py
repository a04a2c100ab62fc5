"""MinHash/LSH + containment borderline path (north_star M5)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from simhash_text_dedup_spark.config import DedupConfig
from simhash_text_dedup_spark.functions.minhash import (
    band_keys_from_sigs,
    minhash_batch,
)
from simhash_text_dedup_spark.plans.pipeline import run_dedup
from simhash_text_dedup_spark.sources.corpus import CorpusSpec, generate_corpus


def jaccard_tokens(a: str, b: str, w: int = 3) -> float:
    from simhash_text_dedup_spark.fingerprint_core import tokenize

    def sh(t):
        toks = tokenize(t)
        return {tuple(toks[i : i + w]) for i in range(max(len(toks) - w + 1, 1))}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / max(len(sa | sb), 1)


def test_minhash_estimates_jaccard():
    base = " ".join(f"tok{i}" for i in range(300))
    variants = [
        base,
        base.replace("tok10", "X").replace("tok200", "Y"),
        " ".join(f"tok{i}" for i in range(150)),  # half of base
        "completely different words entirely " * 20,
    ]
    sigs = minhash_batch(variants, n_perms=128)
    for i in (1, 2, 3):
        est = (sigs[0] == sigs[i]).mean()
        true = jaccard_tokens(base, variants[i])
        assert abs(est - true) < 0.15, (i, est, true)


def test_minhash_deterministic_across_batching():
    docs = [f"alpha beta gamma {i} delta" * (i % 5 + 1) for i in range(50)]
    whole = minhash_batch(docs)
    parts = np.vstack([minhash_batch(docs[:20]), minhash_batch(docs[20:])])
    assert (whole == parts).all()


def test_band_keys_shape():
    sigs = minhash_batch(["a b c d e f g h", "a b c d e f g h"], n_perms=128)
    bands = band_keys_from_sigs(sigs, 32, 4)
    assert bands.shape == (2, 32)
    assert (bands[0] == bands[1]).all()  # identical docs -> identical keys


@pytest.fixture(scope="module")
def ext_result(spark):
    docs_pdf, man = generate_corpus(CorpusSpec(n_docs=300, seed=42))
    cfg = DedupConfig(
        spam_threshold=5, enable_minhash=True, enable_containment=True
    )
    res = run_dedup(spark, spark.createDataFrame(docs_pdf), cfg)
    return res, man, docs_pdf


def test_extended_pipeline_catches_borderline_and_containment(spark, ext_result):
    res, man, docs_pdf = ext_result
    iddf = (
        spark.createDataFrame(docs_pdf)
        .withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
        .select("doc_id", "repo", "path", "commit")
        .toPandas()
    )
    man = man.merge(iddf, on=["repo", "path", "commit"])
    cl = {r.doc_id: r.cluster_id for r in res.clusters.collect()}
    kinds = {
        (r.a_id, r.b_id): r.kind for r in res.pairs.collect()
    }
    assert any(k == "minhash" for k in kinds.values()), "no minhash pairs found"

    n_contain_hit = 0
    for fam, grp in man.groupby("family"):
        kind = fam.rsplit("-", 1)[0]
        ids = list(grp.doc_id)
        if kind == "F-BORDER" and len(ids) == 2:
            # SimHash missed these (Hamming 4..8); MinHash must cluster them
            assert cl[ids[0]] == cl[ids[1]], f"{fam} not clustered by minhash"
        if kind == "F-CONTAIN" and len(ids) == 2:
            if cl[ids[0]] == cl[ids[1]]:
                n_contain_hit += 1
    assert n_contain_hit >= 1, "containment path caught nothing"


def test_minhash_candidates_have_no_dedup_shuffle(spark):
    """Candidate dedup is the first-shared-band codegen predicate, not
    a dropDuplicates exchange over the (worst-case quadratic) join
    output — and results stay duplicate-free."""
    import io
    from contextlib import redirect_stdout

    from simhash_text_dedup_spark.config import DedupConfig
    from simhash_text_dedup_spark.operators.minhash_pairs import (
        minhash_candidates,
        minhash_signatures,
    )

    cfg = DedupConfig(enable_minhash=True)
    docs = spark.createDataFrame(
        [(i, ("alpha beta gamma delta " * 6) + (f"x{i} " * (i % 4)))
         for i in range(40)],
        "doc_id long, content string",
    )
    cands = minhash_candidates(minhash_signatures(docs, cfg), cfg)
    buf = io.StringIO()
    with redirect_stdout(buf):
        cands.explain("formatted")
    plan = buf.getvalue()
    assert "HashAggregate" not in plan, plan
    assert "Deduplicate" not in plan, plan
    rows = cands.collect()
    assert len({(r.a_id, r.b_id) for r in rows}) == len(rows)
    assert len(rows) > 0  # heavy shared shingles guarantee collisions


def test_minhash_candidates_hot_bucket_salt_parity(spark):
    from pyspark.sql import functions as F  # noqa: F811

    from simhash_text_dedup_spark.config import DedupConfig
    from simhash_text_dedup_spark.operators.minhash_pairs import (
        minhash_candidates,
        minhash_signatures,
    )

    base = spark.createDataFrame(
        [(i, f"some distinct document body number {i} with words")
         for i in range(20)]
        + [(100 + i, "the exact same templated flood body every time x")
           for i in range(30)],
        "doc_id long, content string",
    ).withColumnRenamed("content", "content")
    cfg_plain = DedupConfig(band_bucket_cap=100000)
    cfg_salt = DedupConfig(band_bucket_cap=10, salt_partitions=4)
    sigs = minhash_signatures(
        base.select("doc_id", F.col("content")), cfg_plain
    ).localCheckpoint()
    plain = sorted(map(tuple, minhash_candidates(sigs, cfg_plain).collect()))
    salted = sorted(map(tuple, minhash_candidates(sigs, cfg_salt).collect()))
    assert plain == salted
    # the flood really pairs quadratically among itself
    flood = [(a, b) for a, b in plain if a >= 100 and b >= 100]
    assert len(flood) == 30 * 29 // 2


# ---------------------------------------------------------------------
# Band-plan tuning: the classic LSH S-curve solver (no Spark needed).
# ---------------------------------------------------------------------
def test_plan_minhash_bands_properties():
    from simhash_text_dedup_spark.functions.minhash import (
        lsh_collision_prob,
        plan_minhash_bands,
    )

    prev_rows = 0
    for t in (0.2, 0.3, 0.5, 0.7, 0.8, 0.9):
        b, r = plan_minhash_bands(t, 128)
        assert b >= 1 and r >= 1 and b * r <= 128
        # stricter thresholds need longer rows (sharper S-curve knee)
        assert r >= prev_rows
        prev_rows = r
        # the chosen plan discriminates around its threshold
        lo = lsh_collision_prob(max(t - 0.15, 0.01), b, r)
        hi = lsh_collision_prob(min(t + 0.15, 0.99), b, r)
        assert hi > lo
        assert 0.2 < lsh_collision_prob(t, b, r) < 0.9

    # deterministic pins (midpoint integration is exact arithmetic)
    assert plan_minhash_bands(0.5, 128) == (25, 5)
    assert plan_minhash_bands(0.5, 16) == (5, 3)

    # recall-weighted tuning at the default threshold recovers the
    # config's pinned 32x4 — the right objective for a dedup pipeline
    # whose candidates are exactly verified downstream
    assert plan_minhash_bands(0.5, 128, fp_weight=0.1, fn_weight=0.9) == (32, 4)
    # precision-weighting pushes the other way (longer rows)
    bp, rp = plan_minhash_bands(0.5, 128, fp_weight=0.9, fn_weight=0.1)
    assert rp > 4

    with pytest.raises(ValueError):
        plan_minhash_bands(0.0)
    with pytest.raises(ValueError):
        plan_minhash_bands(1.0)


def test_pair_union_dedup_is_hash_agg_not_window(spark, ext_result):
    """Round-5 (VERDICT r4 #5): the multi-matcher kind-priority dedup
    is a min(struct(prio,...)) hash aggregate, NOT a row_number window
    — no sort-based Window exchange over the pair set."""
    res, _, _ = ext_result
    plan = res.pairs._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    # and the result still carries exactly one row per pair
    pdf = res.pairs.toPandas()
    assert not pdf.duplicated(["a_id", "b_id"]).any()
