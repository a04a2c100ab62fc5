"""plans/tiered.py — the exact -> near -> semantic cascade with
per-tier attribution (tier ordering, winner election, survivor
pass-through for docs without embeddings)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from simhash_text_dedup_spark.config import DedupConfig
from simhash_text_dedup_spark.plans.tiered import (
    tier_report,
    tiered_dedup,
    tiered_survivors,
)

# pairwise Hamming >= 24 between the families (asserted below), so the
# only near pair is A vs A^1
A = 0x123456789ABCDEF0
B = 0x0F0F0F0F0F0F0F0F
C = 0xFFF0000FFFF0000F
D = 0x5A5A5A5A5A5A5A5A

CFG = DedupConfig()


def test_fixture_geometry():
    for x, y in [(A, B), (A, C), (A, D), (B, C), (B, D), (C, D)]:
        assert bin(x ^ y).count("1") > CFG.hamming_k


def _signed(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


@pytest.fixture(scope="module")
def fps(spark):
    rows = [
        (1, A), (2, A), (3, A),  # exact group -> winner 1
        (4, A ^ 1),              # Hamming 1 from A -> near loser to 1
        (5, B), (6, C), (7, D),  # unique fingerprints
    ]
    return spark.createDataFrame(
        [(d, _signed(f)) for d, f in rows],
        "doc_id long, fingerprint long",
    )


@pytest.fixture(scope="module")
def embeddings(spark):
    # list-0 near-dup pair (5, 6): 5 is exactly the centroid
    # (centroid_sim 1.0), 6 slightly off (lower centroid_sim -> higher
    # keep-priority under SemDeDup's least-prototypical rule), cosine
    # (5, 6) ~ 0.994 >= 0.9 -> 5 is the semantic delete.  4's embedding
    # is identical to 5's but 4 dies at the NEAR tier, so it must never
    # reach (or influence) the semantic screen.  1 and 7 have no / a
    # lone-list embedding and pass through.
    rows = [
        (4, [1.0, 0.0, 0.0, 0.0]),
        (5, [1.0, 0.0, 0.0, 0.0]),
        (6, [0.9, 0.1, 0.0, 0.0]),
        (7, [0.0, 1.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


CENTROIDS = np.eye(2, 4)


def _actions(df):
    return {
        r.doc_id: (r.action, r.tier, r.winner_id) for r in df.collect()
    }


def test_full_cascade(spark, fps, embeddings):
    out = tiered_dedup(
        fps, CFG, embeddings=embeddings,
        semantic_threshold=0.9, centroids=CENTROIDS,
    )
    assert out.columns == ["doc_id", "action", "tier", "winner_id"]
    acts = _actions(out)
    assert acts == {
        1: ("keep", None, 1),
        2: ("delete", "exact", 1),
        3: ("delete", "exact", 1),
        4: ("delete", "near", 1),
        5: ("delete", "semantic", None),
        6: ("keep", None, 6),
        7: ("keep", None, 7),
    }


def test_report_and_survivors(spark, fps, embeddings):
    out = tiered_dedup(
        fps, CFG, embeddings=embeddings,
        semantic_threshold=0.9, centroids=CENTROIDS,
    )
    rep = {r.tier: r.n_docs for r in tier_report(out).collect()}
    assert rep == {"exact": 2, "near": 1, "semantic": 1, "keep": 3}

    docs = fps.select("doc_id", F.concat(F.lit("doc-"), "doc_id").alias("text"))
    surv = tiered_survivors(
        docs, fps, CFG, embeddings=embeddings,
        semantic_threshold=0.9, centroids=CENTROIDS,
    )
    assert surv.columns == ["doc_id", "text"]
    assert {r.doc_id for r in surv.collect()} == {1, 6, 7}


def test_no_semantic_tier(spark, fps):
    acts = _actions(tiered_dedup(fps, CFG))
    # without embeddings, 5 survives and no semantic tier exists
    assert acts[5] == ("keep", None, 5)
    assert {a[1] for a in acts.values()} == {None, "exact", "near"}


def test_semantic_sees_only_survivor_embeddings(spark, fps, embeddings):
    # raise the threshold so nothing is cosine-similar enough except
    # identical vectors: 4 (near loser) and 5 share an identical
    # embedding, but 4 must already be out of the screen, so 5 keeps
    out = tiered_dedup(
        fps, CFG, embeddings=embeddings,
        semantic_threshold=0.999, centroids=CENTROIDS,
    )
    acts = _actions(out)
    assert acts[4] == ("delete", "near", 1)
    assert acts[5] == ("keep", None, 5)


def test_winner_resolution_and_semantic_nullout(spark):
    """Contract: a non-NULL winner_id always references a keep row.
    (a) an exact loser whose group representative loses the near tier
    resolves one hop to the component winner; (b) winners removed by
    the semantic screen null out."""
    fps = spark.createDataFrame(
        [
            # chain: 11/12 exact group (winner 11); 11 then loses the
            # near tier to 10 -> 12's winner must resolve to 10
            (10, _signed(A ^ 1)), (11, _signed(A)), (12, _signed(A)),
            # null-out: 21 exact-loses to 20; 20 then loses the
            # semantic tier (dominated by 22) -> 21's winner is NULL
            (20, _signed(B)), (21, _signed(B)), (22, _signed(C)),
        ],
        "doc_id long, fingerprint long",
    )
    emb = spark.createDataFrame(
        [
            (20, [1.0, 0.0, 0.0, 0.0]),   # centroid itself: csim 1.0
            (22, [0.9, 0.1, 0.0, 0.0]),   # lower csim -> keep-priority
        ],
        "vec_id long, embedding array<double>",
    )
    acts = _actions(
        tiered_dedup(
            fps, CFG, embeddings=emb,
            semantic_threshold=0.9, centroids=CENTROIDS,
        )
    )
    assert acts == {
        10: ("keep", None, 10),
        11: ("delete", "near", 10),
        12: ("delete", "exact", 10),        # resolved through 11
        20: ("delete", "semantic", None),
        21: ("delete", "exact", None),      # winner 20 semantic-dead
        22: ("keep", None, 22),
    }
