"""MinHash/LSH candidate generation + signature-Jaccard verification,
and the substring-containment check for borderline pairs.

Complements the SimHash band join (operators/pairs.py): SimHash with
Hamming <= 3 has high precision but misses heavier edits and
containment; MinHash banding (32 bands x 4 rows over 128 perms) catches
Jaccard >= ~0.7 pairs, and the containment check catches doc-inside-doc
(F-CONTAIN fixtures).  Both feed the same edge set / clustering stage.

Scale shape: the banded self-join shuffles (doc_id, band_idx,
band_key) plus the earlier-band prefix (avg n_bands/2 longs — the
price of the no-shuffle first-shared-band dedup predicate); the wide
128-long signatures are joined back onto the (small) candidate set
afterwards and never ride the big shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simhash_text_dedup_spark.config import DedupConfig
from simhash_text_dedup_spark.functions.minhash import minhash_udf


def minhash_signatures(prepared: DataFrame, cfg: DedupConfig) -> DataFrame:
    """doc_id, sig (array<bigint> n_perms), bands (array<bigint> n_bands)."""
    mh = minhash_udf(cfg.minhash_perms, cfg.minhash_bands, cfg.minhash_shingle_width)
    return prepared.select(
        "doc_id", mh(F.col("content")).alias("m")
    ).select("doc_id", "m.sig", "m.bands")


def minhash_candidates(sigs: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Distinct candidate pairs (a_id < b_id) sharing >= 1 LSH band.

    A pair sharing several bands is emitted ONLY in its first shared
    band — a whole-stage-codegen predicate requires every earlier band
    position to differ: the same no-shuffle dedup recipe as the
    SimHash band join (operators/pairs.py) and lsh_topk, instead of a
    dropDuplicates exchange over the JOIN OUTPUT (worst-case quadratic
    in a hot bucket).  Each exploded row carries only the PREFIX of
    earlier band keys it needs (avg n_bands/2 longs — linear
    transport traded for the unbounded dedup shuffle).

    Hot band buckets (> cfg.band_bucket_cap members — templated
    near-identical shingle floods below the exact-dup spam threshold)
    route through the salted sub-join, same algebra as near_pairs /
    lsh_near_pairs: cold buckets keep the plain first-match predicate,
    a pair whose FIRST shared band is hot emits exactly once from the
    salted hot branch."""
    from .skew import salt_build, salt_probe, split_hot_buckets

    # lineage cut: the banded explode rides on the (expensive) minhash
    # UDF and feeds the hot histogram plus both join branches; the
    # pipeline path checkpoints sigs upstream, but direct callers
    # (e.g. the oracle entries) would otherwise re-run the UDF per
    # consumer
    banded = sigs.select(
        "doc_id", "bands",
        F.posexplode("bands").alias("band_idx", "band_key"),
    ).select(
        "doc_id", "band_idx", "band_key",
        F.expr("slice(bands, 1, band_idx)").alias("prefix"),
    ).localCheckpoint(eager=False)
    cold, hot_rows = split_hot_buckets(
        banded, ["band_idx", "band_key"], cfg.band_bucket_cap
    )

    def _sides(df):
        left = df.select(
            "band_idx", "band_key", F.col("doc_id").alias("a_id"),
            F.col("prefix").alias("a_prefix"),
        )
        right = df.select(
            "band_idx", "band_key", F.col("doc_id").alias("b_id"),
            F.col("prefix").alias("b_prefix"),
        )
        return left, right

    earlier_match = F.exists(
        F.zip_with(
            F.col("a_prefix"), F.col("b_prefix"), lambda x, y: x == y
        ),
        lambda m: m,
    )

    def _cands(left, right, keys):
        return (
            left.join(right, keys)
            .filter(F.col("a_id") < F.col("b_id"))
            .filter(~earlier_match)
            .select("a_id", "b_id")
        )

    cands = _cands(*_sides(cold), ["band_idx", "band_key"])
    lh, rh = _sides(hot_rows)
    return cands.unionByName(
        _cands(
            salt_probe(lh, "a_id", cfg.salt_partitions),
            salt_build(rh, cfg.salt_partitions),
            ["band_idx", "band_key", "salt"],
        )
    )


def minhash_verified_pairs(
    sigs: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """(a_id, b_id, est_jaccard, kind='minhash') with signature-estimated
    Jaccard >= cfg.jaccard_threshold."""
    cands = minhash_candidates(sigs, cfg)
    a = sigs.select(F.col("doc_id").alias("a_id"), F.col("sig").alias("a_sig"))
    b = sigs.select(F.col("doc_id").alias("b_id"), F.col("sig").alias("b_sig"))
    n = cfg.minhash_perms
    matches = F.size(
        F.filter(
            F.zip_with(F.col("a_sig"), F.col("b_sig"), lambda x, y: x == y),
            lambda t: t,
        )
    )
    return (
        cands.join(a, "a_id")
        .join(b, "b_id")
        .withColumn("est_jaccard", matches / F.lit(float(n)))
        .filter(F.col("est_jaccard") >= cfg.jaccard_threshold)
        .select("a_id", "b_id", "est_jaccard", F.lit("minhash").alias("kind"))
    )


def minhash_verified_pairs_incremental(
    new_sigs: DataFrame, base_sigs: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """Incremental MinHash/LSH round: verified near-dup pairs between a
    NEW signature batch and the already-committed corpus signatures.

    Pair domain mirrors plans/incremental.candidate_pairs (the
    reference's probe rule, incload/DeDupMapper.java:70-81,220-226):
    new x new emitted once (a_id < b_id), new x live-old always kept
    (new doc on the `a` side), old x old never compared.  Stale base
    rows of re-crawled entities are excluded up front — the reference
    mapper overwrites finger with newfinger (DeDupMapper.java:156-158),
    so a new version never pairs with its own previous signature.

    new_sigs:  (doc_id, entity_id, sig, bands, is_loaded, score) — the
               batch's signatures (minhash_signatures over the round's
               spam survivors, entity/score bookkeeping joined on).
    base_sigs: (doc_id, entity_id, sig, bands, score) — the corpus
               signature table committed by previous rounds (the
               MinHash analog of the fingerprint base table).

    Returns (a_id, b_id, est_jaccard, a_is_new, b_is_new, a_loaded,
    b_loaded, a_score, b_score) with est_jaccard >= jaccard_threshold;
    `a` is always the new side.

    Scale shape: identical to the batch join — only (doc_id, band_idx,
    band_key, earlier-band prefix) rides the shuffle; the wide
    signatures join back onto the small candidate set.  Hot band
    buckets (corpus-side histogram > band_bucket_cap) leave the plain
    equi-join for the salted sub-join: the big corpus bucket is hashed
    across salt_partitions by b_id, the (tiny) new rows sharing the
    hot key are replicated per salt.  A pair is emitted only in its
    first shared band — pure signature arithmetic, so the hot/cold
    routing never double-emits or drops a pair.
    """
    # stale-row exclusion: every entity participates once, with its
    # CURRENT signature
    base_live = base_sigs.join(
        new_sigs.select("entity_id").distinct(), "entity_id", "left_anti"
    )
    # lineage cuts: both frames sit on the (expensive) minhash UDF and
    # feed the hot histogram + both join branches + the verify join-back
    new_side = new_sigs.select(
        "doc_id", "sig", "bands",
        F.lit(True).alias("is_new"), "is_loaded", "score",
    ).localCheckpoint(eager=False)
    all_side = new_side.unionByName(
        base_live.select(
            "doc_id", "sig", "bands",
            F.lit(False).alias("is_new"), F.lit(True).alias("is_loaded"),
            "score",
        )
    ).localCheckpoint(eager=False)

    def _banded(side: DataFrame) -> DataFrame:
        return side.select(
            "doc_id", "is_new",
            F.posexplode("bands").alias("band_idx", "band_key"),
            F.col("bands").alias("_bands"),
        ).select(
            "doc_id", "is_new", "band_idx", "band_key",
            F.expr("slice(_bands, 1, band_idx)").alias("prefix"),
        )

    left = _banded(new_side).select(
        "band_idx", "band_key",
        F.col("doc_id").alias("a_id"), F.col("prefix").alias("a_prefix"),
    )
    right = _banded(all_side).select(
        "band_idx", "band_key",
        F.col("doc_id").alias("b_id"), F.col("prefix").alias("b_prefix"),
        F.col("is_new").alias("b_is_new"),
    )

    earlier_match = F.exists(
        F.zip_with(
            F.col("a_prefix"), F.col("b_prefix"), lambda x, y: x == y
        ),
        lambda m: m,
    )

    def _cands(lf: DataFrame, rf: DataFrame, keys: list) -> DataFrame:
        return (
            lf.join(rf, keys)
            .filter((~F.col("b_is_new")) | (F.col("a_id") < F.col("b_id")))
            .filter(F.col("a_id") != F.col("b_id"))
            .filter(~earlier_match)
            .select("a_id", "b_id", "b_is_new")
        )

    from .skew import salt_build, salt_probe

    keys = ["band_idx", "band_key"]
    hot = (
        right.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > int(cfg.band_bucket_cap))
        .select(*keys)
        .localCheckpoint(eager=False)
    )
    cold = _cands(
        left.join(F.broadcast(hot), keys, "left_anti"),
        right.join(F.broadcast(hot), keys, "left_anti"),
        keys,
    )
    hot_pairs = _cands(
        salt_build(left.join(F.broadcast(hot), keys, "left_semi"),
                   cfg.salt_partitions),
        salt_probe(right.join(F.broadcast(hot), keys, "left_semi"),
                   "b_id", cfg.salt_partitions),
        keys + ["salt"],
    )
    cands = cold.unionByName(hot_pairs)

    n = cfg.minhash_perms
    a_meta = new_side.select(
        F.col("doc_id").alias("a_id"), F.col("sig").alias("a_sig"),
        F.col("is_loaded").alias("a_loaded"), F.col("score").alias("a_score"),
    )
    b_meta = all_side.select(
        F.col("doc_id").alias("b_id"), F.col("sig").alias("b_sig"),
        F.col("is_loaded").alias("b_loaded"), F.col("score").alias("b_score"),
    )
    matches = F.size(
        F.filter(
            F.zip_with(F.col("a_sig"), F.col("b_sig"), lambda x, y: x == y),
            lambda t: t,
        )
    )
    return (
        cands.join(a_meta, "a_id")
        .join(b_meta, "b_id")
        .withColumn("est_jaccard", matches / F.lit(float(n)))
        .filter(F.col("est_jaccard") >= cfg.jaccard_threshold)
        .select(
            "a_id", "b_id", "est_jaccard",
            F.lit(True).alias("a_is_new"), "b_is_new",
            "a_loaded", "b_loaded", "a_score", "b_score",
        )
    )


_CONTAIN_SCHEMA = "a_id long, b_id long, contained boolean"


def containment_check(
    candidate_pairs: DataFrame, prepared: DataFrame
) -> DataFrame:
    """Exact substring-containment verification for borderline pairs.

    For each candidate pair, checks whether one content is a substring
    of the other.  A per-pair scan (Python str.find is a C-implemented
    two-way/Boyer-Moore-class search — the pragmatic stand-in for a
    per-pair suffix array; the candidate set is small, so this runs as a
    vectorized batch over pairs, not over the corpus).
    Returns (a_id, b_id, contained=true) rows only.
    """
    contents = prepared.select("doc_id", "content")
    a = contents.select(
        F.col("doc_id").alias("a_id"), F.col("content").alias("a_content")
    )
    b = contents.select(
        F.col("doc_id").alias("b_id"), F.col("content").alias("b_content")
    )
    joined = candidate_pairs.select("a_id", "b_id").join(a, "a_id").join(b, "b_id")

    def _check(it):
        for pdf in it:
            a_vals = pdf["a_content"].to_numpy()
            b_vals = pdf["b_content"].to_numpy()
            # C-speed substring scan per pair over two ndarrays — no
            # pandas row objects in the loop (round-1 VERDICT item 9)
            contained = [
                (a in b) or (b in a) for a, b in zip(a_vals, b_vals)
            ]
            out = pdf[["a_id", "b_id"]].copy()
            out["contained"] = pd.Series(contained, index=pdf.index, dtype=bool)
            yield out[out["contained"]]

    return joined.mapInPandas(_check, schema=_CONTAIN_SCHEMA)
