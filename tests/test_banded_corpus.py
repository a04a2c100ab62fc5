"""Pre-banded bucketed corpus layout: pair-set parity with the
per-round candidate generator, and the co-location property (the
corpus side of the round join never shuffles)."""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from simhash_text_dedup_spark.config import DedupConfig
from simhash_text_dedup_spark.plans.incremental import candidate_pairs
from simhash_text_dedup_spark.sources.banded_corpus import (
    candidate_pairs_banded,
    write_banded_corpus,
)

CFG = DedupConfig()


@pytest.fixture(scope="module")
def fps(spark):
    # spread fingerprints + planted 1-bit mutants (guaranteed pairs)
    rows = []
    for i in range(400):
        fp = (i * 2654435761 * 40503) % (1 << 60)
        rows.append((i, fp))
        if i % 5 == 0:
            rows.append((i + 100000, fp ^ (1 << (i % 60))))
    return spark.createDataFrame(rows, "doc_id long, fingerprint long")


def _sides(fps):
    is_new = (F.col("doc_id") % 2 == 1) | (F.col("doc_id") >= 100000)
    score = F.col("fingerprint").bitwiseAND(F.lit(1048575)).cast("double")
    tagged = fps.select(
        "doc_id", "fingerprint", is_new.alias("is_new"),
        (~is_new).alias("is_loaded"), score.alias("score"),
    )
    new_side = tagged.filter("is_new")
    corpus = tagged.filter("NOT is_new").select(
        "doc_id", F.col("doc_id").alias("entity_id"), "fingerprint", "score"
    )
    return new_side, corpus, tagged


def test_banded_corpus_pair_parity(spark, tmp_path_factory, fps):
    """candidate_pairs_banded over the saved layout must produce the
    IDENTICAL pair set to the per-round candidate_pairs."""
    wh = tmp_path_factory.mktemp("bandedwh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bct LOCATION '{wh}'")
    try:
        new_side, corpus, tagged = _sides(fps)
        write_banded_corpus(corpus, "bct.banded", CFG, n_buckets=8)
        got = {
            (r.a_id, r.b_id, r.hamming)
            for r in candidate_pairs_banded(
                spark, new_side, "bct.banded", CFG
            ).collect()
        }
        want = {
            (r.a_id, r.b_id, r.hamming)
            for r in candidate_pairs(new_side, tagged, CFG).collect()
        }
        assert got == want
        assert len(want) > 0  # planted mutants guarantee pairs
    finally:
        spark.sql("DROP DATABASE IF EXISTS bct CASCADE")


def test_banded_join_corpus_side_never_shuffles(spark, tmp_path_factory, fps):
    """The round join against the saved layout must read the corpus
    bucketed (co-located): exactly ONE exchange hashes on the fused
    bkey — the small NEW side — never the corpus scan."""
    wh = tmp_path_factory.mktemp("bandedwh2")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bct2 LOCATION '{wh}'")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        new_side, corpus, _ = _sides(fps)
        write_banded_corpus(corpus, "bct2.banded", CFG, n_buckets=8)
        j = candidate_pairs_banded(
            spark, new_side.drop("entity_id"), "bct2.banded", CFG
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "Bucketed: true" in plan, plan
        assert "SelectedBucketsCount" in plan, plan
        # exactly one exchange hashes on the fused key (the NEW side);
        # the corpus scan feeds its SortMergeJoin with no exchange
        # (formatted mode prints Exchange arguments on their own line)
        n_bkey_exchanges = plan.count("hashpartitioning(bkey")
        assert n_bkey_exchanges == 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP DATABASE IF EXISTS bct2 CASCADE")
