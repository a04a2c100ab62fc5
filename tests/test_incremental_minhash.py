"""Incremental MinHash/LSH round semantics: the new-vs-old pair domain
(reference §3.1 probe rule, incload/DeDupMapper.java:70-81,220-226)
applied to the MinHash borderline path — new x new once, new x
live-old always, old x old never, stale rows of re-crawled entities
excluded (DeDupMapper.java:156-158 finger=newfinger)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from simhash_text_dedup_spark.config import DedupConfig
from simhash_text_dedup_spark.functions.minhash import (
    band_keys_from_sigs,
    minhash_batch,
)
from simhash_text_dedup_spark.operators.minhash_pairs import (
    minhash_signatures,
    minhash_verified_pairs_incremental,
)

CFG = DedupConfig(jaccard_threshold=0.5, spam_threshold=5)


def _tokens(prefix, n):
    return " ".join(f"{prefix}_{i}" for i in range(n))


@pytest.fixture(scope="module")
def domain():
    """(docs pdf, new_ids, old_ids, entity map) — planted families:
    O1/O2 old near-dups (must NOT pair: old x old), N1 near-dup of O1,
    N2 near-dup of N1 (new x new, once), R modified re-crawl of O3
    (O3's stale row excluded -> no (R, O3) pair), U unchanged re-crawl
    of O4, plus unique fillers."""
    o1 = _tokens("alpha", 60)
    o2 = o1.replace("alpha_10", "changed_tok")          # old x old near-dup
    o3 = _tokens("gamma", 60)
    o4 = _tokens("delta", 60)
    n1 = o1.replace("alpha_50", "edited_tok")           # new x old near-dup
    n2 = n1.replace("alpha_20", "another_tok")          # new x new near-dup
    r = o3.replace("gamma_5", "recrawl_tok")            # modified re-crawl
    rows = [
        # doc_id, entity_id, content, is_new
        (1, 1, o1, False),
        (2, 2, o2, False),
        (3, 3, o3, False),
        (4, 4, o4, False),
        (5, 5, _tokens("eps", 60), False),
        (11, 11, n1, True),
        (12, 12, n2, True),
        (13, 3, r, True),                               # re-crawl of O3
        (14, 4, o4, True),                              # unchanged re-crawl
        (15, 15, _tokens("zeta", 60), True),
        (16, 16, o1, True),   # exact copy of O1 under a NEW entity:
        #                       Hamming 0 -> SimHash 'near' pair, and a
        #                       MinHash est=1.0 pair — kind priority check
    ]
    return pd.DataFrame(rows, columns=["doc_id", "entity_id", "content", "is_new"])


def _expected_pairs(pdf, cfg):
    """Brute-force numpy expectation: candidates share >= 1 band within
    the incremental domain (stale rows excluded), verified by signature
    Jaccard >= threshold."""
    new_entities = set(pdf[pdf.is_new].entity_id)
    live = pdf[pdf.is_new | ~pdf.entity_id.isin(new_entities)].reset_index(drop=True)
    sigs = minhash_batch(live.content.tolist(), cfg.minhash_perms,
                         cfg.minhash_shingle_width)
    bands = band_keys_from_sigs(sigs, cfg.minhash_bands, cfg.minhash_rows)
    out = set()
    for i in range(len(live)):
        for j in range(len(live)):
            a, b = live.iloc[i], live.iloc[j]
            if not a.is_new or a.doc_id == b.doc_id:
                continue
            if b.is_new and not a.doc_id < b.doc_id:
                continue
            if not (bands[i] == bands[j]).any():
                continue
            est = float((sigs[i] == sigs[j]).mean())
            if est >= cfg.jaccard_threshold:
                out.add((a.doc_id, b.doc_id, est))
    return out


def _run(spark, pdf, cfg):
    df = spark.createDataFrame(pdf)
    sigs = minhash_signatures(df.select("doc_id", "content"), cfg).join(
        df.select("doc_id", "entity_id", "is_new"), "doc_id"
    )
    new_sigs = sigs.filter("is_new").select(
        "doc_id", "entity_id", "sig", "bands",
        F.lit(False).alias("is_loaded"),
        (F.col("doc_id") / 100.0).alias("score"),
    )
    base_sigs = sigs.filter("NOT is_new").select(
        "doc_id", "entity_id", "sig", "bands",
        (F.col("doc_id") / 100.0).alias("score"),
    )
    return minhash_verified_pairs_incremental(new_sigs, base_sigs, cfg)


def test_incremental_domain_matches_bruteforce(spark, domain):
    got = _run(spark, domain, CFG).toPandas()
    got_set = {(r.a_id, r.b_id, round(r.est_jaccard, 9)) for r in got.itertuples()}
    exp = {(a, b, round(e, 9)) for a, b, e in _expected_pairs(domain, CFG)}
    assert got_set == exp
    assert len(exp) >= 3  # the planted families actually fire
    # planted semantics, explicitly:
    ab = {(r.a_id, r.b_id) for r in got.itertuples()}
    assert (11, 1) in ab          # new x old kept, new on the a side
    assert (11, 12) in ab         # new x new once, a < b
    assert (12, 11) not in ab
    assert not any(a in (1, 2, 3, 4, 5) for a, _ in ab)  # old never on a side
    assert (13, 3) not in ab      # stale row of re-crawled entity excluded
    assert (14, 4) not in ab


def test_pairs_emitted_once_no_dedup_shuffle(spark, domain):
    got = _run(spark, domain, CFG)
    counts = got.groupBy("a_id", "b_id").count().filter("count > 1")
    assert counts.count() == 0
    # the first-shared-band predicate does the dedup; no Deduplicate /
    # row_number window over the candidate join output
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Deduplicate" not in plan and "row_number" not in plan


def test_hot_bucket_routing_parity(spark, domain):
    base = _run(spark, domain, CFG)
    salted = _run(spark, domain, CFG.with_(band_bucket_cap=1, salt_partitions=3))
    b = {(r.a_id, r.b_id, round(r.est_jaccard, 9)) for r in base.toPandas().itertuples()}
    s = {(r.a_id, r.b_id, round(r.est_jaccard, 9)) for r in salted.toPandas().itertuples()}
    assert b == s and len(b) > 0


def test_run_incremental_minhash_integration(spark, domain):
    """Full round with enable_minhash: minhash pairs join the pair set
    with kind='minhash', SimHash pairs keep kind='near' and win on
    overlap; the round returns the batch signatures for corpus append."""
    from simhash_text_dedup_spark.plans.incremental import run_incremental
    from simhash_text_dedup_spark.plans.pipeline import (
        fingerprint_stage,
        prepare_documents,
    )

    pdf = domain
    base_rows = pdf[~pdf.is_new]
    base_docs = spark.createDataFrame(
        pd.DataFrame({
            "repo": ["r/" + str(e) for e in base_rows.entity_id],
            "path": ["p" + str(e) + ".py" for e in base_rows.entity_id],
            "commit": ["a" * 40] * len(base_rows),
            "lang": ["python"] * len(base_rows),
            "content": base_rows.content.tolist(),
        })
    )
    cfg = CFG.with_(enable_minhash=True)
    prepared = prepare_documents(base_docs).withColumn(
        "entity_id", F.xxhash64("repo", "path")
    )
    base_fps = fingerprint_stage(prepared, cfg).join(
        prepared.select("doc_id", "entity_id"), "doc_id"
    ).select("doc_id", "entity_id", "fingerprint", "score")
    base_sigs = minhash_signatures(prepared, cfg).join(
        prepared.select("doc_id", "entity_id", "score"), "doc_id"
    ).select("doc_id", "entity_id", "sig", "bands", "score")

    new_rows = pdf[pdf.is_new]
    new_docs = spark.createDataFrame(
        pd.DataFrame({
            # re-crawls share repo/path with their base entity
            "repo": ["r/" + str(e) for e in new_rows.entity_id],
            "path": ["p" + str(e) + ".py" for e in new_rows.entity_id],
            "commit": ["b" * 40] * len(new_rows),
            "lang": ["python"] * len(new_rows),
            "content": new_rows.content.tolist(),
        })
    )
    res = run_incremental(spark, new_docs, base_fps, cfg, base_sigs=base_sigs)
    pairs = res.pairs.toPandas()
    assert set(pairs.columns) >= {"a_id", "b_id", "kind", "est_jaccard", "hamming"}
    assert (pairs.kind == "minhash").any()
    # near + minhash never duplicate a pair
    assert pairs.groupby(["a_id", "b_id"]).size().max() == 1
    # the exact-copy plant (doc 16 == O1) is Hamming 0: that pair must
    # carry kind='near' even though MinHash also finds it at est=1.0
    near = pairs[pairs.kind == "near"]
    assert len(near) > 0 and near.hamming.notna().all()
    mh = pairs[pairs.kind == "minhash"]
    assert mh.est_jaccard.ge(cfg.jaccard_threshold).all()
    assert res.new_signatures is not None
    assert res.new_signatures.count() == len(new_rows)
    # loser lists still work over the widened pair schema
    assert res.delete_list.count() + res.modify_list.count() > 0


def test_two_round_signature_table_loop(spark, tmp_path):
    """Steady state across rounds: round 1 commits its signatures into
    a snapshot table (the jobs/run_incremental.py --minhash-sigs-table
    loop); round 2 reads them back (parquet round-trip of the sig/bands
    arrays) and finds a MinHash-only pair against a round-1 doc."""
    from simhash_text_dedup_spark.plans.incremental import run_incremental
    from simhash_text_dedup_spark.sources.snapshots import SnapshotTable

    cfg = CFG.with_(enable_minhash=True)

    def _docs_df(rows):
        return spark.createDataFrame(
            pd.DataFrame({
                "repo": [r[0] for r in rows],
                "path": [r[1] for r in rows],
                "commit": [r[2] for r in rows],
                "lang": ["python"] * len(rows),
                "content": [r[3] for r in rows],
            })
        )

    t1 = _tokens("omega", 60)
    round1 = _docs_df([("r/x", "a.py", "c" * 40, t1),
                       ("r/x", "b.py", "c" * 40, _tokens("psi", 60))])
    res1 = run_incremental(spark, round1, None, cfg)
    fp_table = SnapshotTable(spark, str(tmp_path / "fps"))
    sig_table = SnapshotTable(spark, str(tmp_path / "sigs"))
    commit1 = res1.new_fingerprints.select(
        "doc_id", "entity_id", "fingerprint", "score")
    fp_table.merge(commit1, key_cols=["entity_id"])
    sig_table.merge(
        res1.new_signatures.join(commit1.select("doc_id", "score"), "doc_id")
        .select("doc_id", "entity_id", "sig", "bands", "score"),
        key_cols=["entity_id"],
    )

    # heavy CONTIGUOUS edit: a 16-token block rewrite destroys ~18 of
    # 58 width-3 shingles (far beyond SimHash's Hamming-3 radius) but
    # keeps shingle Jaccard ~0.53 >= threshold — the borderline family
    # MinHash exists for
    toks = t1.split()
    for i in range(16):
        toks[i] = f"edit_{i}"
    round2 = _docs_df([("r/y", "c.py", "d" * 40, " ".join(toks))])
    res2 = run_incremental(
        spark, round2, fp_table.read(), cfg, base_sigs=sig_table.read()
    )
    pairs = res2.pairs.toPandas()
    mh = pairs[(pairs.kind == "minhash") & ~pairs.b_is_new]
    assert len(mh) == 1 and mh.est_jaccard.iloc[0] >= cfg.jaccard_threshold
    assert not (pairs.kind == "near").any()  # beyond the SimHash radius
