"""Candidate generation + exact Hamming verification.

The load-bearing operator (SURVEY.md §2.3 J2).  Reference algorithm
(incload/DeDupMapper.java:169-232, MemTable.java:154-212): permute the
64-bit fingerprint into 4 layouts, bucket by the 16-bit prefix, scan the
bucket, verify popcount(xor) <= 3 on the 48-bit suffix.  "Exact 16-bit
prefix match AND suffix Hamming <= 3" is equivalent to "shares the band
AND whole-fingerprint Hamming <= 3", so we verify on the full 64 bits —
same pair set, simpler plan.

Spark-first design:
  * exact-duplicate groups are collapsed FIRST — the band self-join runs
    over DISTINCT fingerprints only, so identical-fingerprint floods
    (even below the spam threshold) contribute one row, not a quadratic
    bucket.  Group members are re-attached as star edges (rep -> member),
    which yields identical connected components with O(n) edges.
  * band explode is array+explode (4 rows/fp), keys are JVM-side bit ops.
  * the self-join emits each qualifying pair in ONLY its first matching
    band (a whole-stage-codegen predicate over both fingerprints) — no
    post-join dropDuplicates shuffle.
  * residual hot band buckets (> cfg.band_bucket_cap distinct
    fingerprints) are routed to a salted sub-join (default, lossless)
    or excluded outright (mode='drop' — lossy ONLY for pairs whose
    every shared band is hot; the first-COLD-match predicate keeps
    pairs that also share a cold band).  AQE skew-join handles
    moderate imbalance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simhash_text_dedup_spark.config import DedupConfig
from simhash_text_dedup_spark.functions.simhash import band_entries, band_key, hamming_col


def exact_groups(survivors: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(distinct_fps, exact_edges) from spam_pass survivors.

    survivors must carry fp_rep (min doc_id per fingerprint, produced by
    spam_pass's window — no additional shuffle happens here).
    exact_edges: (a_id=rep, b_id=member, hamming=0, kind='exact').
    """
    distinct_fps = (
        survivors.filter(F.col("doc_id") == F.col("fp_rep"))
        .select("doc_id", "fingerprint")
    )
    exact_edges = (
        survivors.filter(F.col("doc_id") != F.col("fp_rep"))
        .select(
            F.col("fp_rep").alias("a_id"),
            F.col("doc_id").alias("b_id"),
            F.lit(0).alias("hamming"),
            F.lit("exact").alias("kind"),
        )
    )
    return distinct_fps, exact_edges


def expand_pairs(near: DataFrame, survivors: DataFrame) -> DataFrame:
    """Expand rep-level 'near' pairs to DOC-level pairs (a_id < b_id),
    plus within-fingerprint-group all-pairs.

    The reference emits pairs between every pair of documents
    (DeDupMapper probes each row against every bucket member); the
    rep-level representation is equivalent for clustering but the
    reference-exact greedy selection (SelectLogicReducer.java:56-104)
    walks doc-level pairs.  Group sizes are bounded by the spam
    threshold, so the within-group quadratic expansion is capped.
    """
    members = survivors.select(
        F.col("fp_rep").alias("rep"), F.col("doc_id").alias("member")
    )

    # within-group all-pairs (Hamming 0)
    a = members.select("rep", F.col("member").alias("x"))
    b = members.select("rep", F.col("member").alias("y"))
    within = (
        a.join(b, "rep")
        .filter(F.col("x") < F.col("y"))
        .select(
            F.col("x").alias("a_id"),
            F.col("y").alias("b_id"),
            F.lit(0).alias("hamming"),
            F.lit("exact").alias("kind"),
        )
    )

    # rep-level near pairs -> member x member
    exp = (
        near.select(
            F.col("a_id").alias("rep_a"), F.col("b_id").alias("rep_b"),
            "hamming", "kind",
        )
        .join(members.select(F.col("rep").alias("rep_a"), F.col("member").alias("ma")), "rep_a")
        .join(members.select(F.col("rep").alias("rep_b"), F.col("member").alias("mb")), "rep_b")
        .select(
            F.least("ma", "mb").alias("a_id"),
            F.greatest("ma", "mb").alias("b_id"),
            "hamming",
            "kind",
        )
    )
    return within.unionByName(exp)


def banded(distinct_fps: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Explode each distinct fingerprint into (band, band_key) rows."""
    return distinct_fps.select(
        "doc_id",
        "fingerprint",
        F.explode(band_entries(F.col("fingerprint"), cfg.n_bands, cfg.band_bits)).alias("e"),
    ).select("doc_id", "fingerprint", "e.band", "e.band_key")


def hot_buckets(banded_df: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Band buckets holding more than band_bucket_cap DISTINCT fingerprints.
    Tiny by construction (it's a histogram tail)."""
    return (
        banded_df.groupBy("band", "band_key")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .filter(F.col("bucket_size") > cfg.band_bucket_cap)
    )


def _first_match_predicate(
    cfg: DedupConfig, hot_keys_by_band: dict[int, list[int]] | None = None
) -> F.Column:
    """Emit each pair only in its first matching band: for this row's
    band i, every earlier band j < i must have differing keys on the two
    fingerprints (pure bit arithmetic — no dedup shuffle needed).

    In drop mode the hot buckets are excluded from the join entirely, so
    an earlier band whose (band, key) bucket is hot must NOT suppress
    the pair (it never met there): the predicate becomes "first COLD
    matching band".  hot_keys_by_band[j] lists band j's hot keys."""
    pred = F.lit(True)
    for j in range(cfg.n_bands - 1):
        j_matches = band_key(F.col("a_fp"), j, cfg.n_bands, cfg.band_bits) == band_key(
            F.col("b_fp"), j, cfg.n_bands, cfg.band_bits
        )
        if hot_keys_by_band and hot_keys_by_band.get(j):
            j_hot = band_key(F.col("a_fp"), j, cfg.n_bands, cfg.band_bits).isin(
                hot_keys_by_band[j]
            )
            j_matches = j_matches & ~j_hot
        pred = pred & ((F.col("band") <= F.lit(j)) | ~j_matches)
    return pred


def _verify(
    joined: DataFrame,
    cfg: DedupConfig,
    hot_keys_by_band: dict[int, list[int]] | None = None,
) -> DataFrame:
    return (
        joined.filter(F.col("a_id") < F.col("b_id"))
        .withColumn("hamming", hamming_col(F.col("a_fp"), F.col("b_fp")))
        .filter((F.col("hamming") <= cfg.hamming_k) & (F.col("hamming") >= 1))
        .filter(_first_match_predicate(cfg, hot_keys_by_band))
        .select("a_id", "b_id", "hamming", F.lit("near").alias("kind"))
    )


def _sides(b: DataFrame) -> tuple[DataFrame, DataFrame]:
    left = b.select(
        "band", "band_key",
        F.col("doc_id").alias("a_id"),
        F.col("fingerprint").alias("a_fp"),
    )
    right = b.select(
        "band", "band_key",
        F.col("doc_id").alias("b_id"),
        F.col("fingerprint").alias("b_fp"),
    )
    return left, right


def near_pairs(distinct_fps: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Verified near-duplicate pairs between distinct fingerprints:
    (a_id, b_id, hamming, kind='near'), a_id < b_id, hamming in [1, k].

    Hot band buckets (> cfg.band_bucket_cap distinct fingerprints) are
    routed to a salted sub-join (north rule: "salted repartitioning for
    skewed buckets"): the probe side carries a deterministic salt in the
    join key, the build side is replicated once per salt value, so the
    bucket's quadratic comparison spreads across salt_partitions tasks
    instead of landing on one reducer. mode='drop' excludes hot bands
    outright — LOSSY for pairs whose only shared bands are hot; pairs
    that also share a cold band are kept (the first-match predicate
    skips hot earlier bands, so the first COLD matching band emits)."""
    b = banded(distinct_fps, cfg)
    # cut lineage on the (tiny) hot set: it feeds the cold anti-join AND
    # either the salted semi-join or the drop-mode driver collect — the
    # checkpoint makes the band histogram aggregation run once, not per
    # consumer
    hot = (
        hot_buckets(b, cfg).select("band", "band_key")
        .localCheckpoint(eager=False)
    )

    if cfg.hot_bucket_mode == "drop":
        cold = b.join(F.broadcast(hot), ["band", "band_key"], "left_anti")
        left, right = _sides(cold)
        # the hot set is a histogram tail (tiny by construction); one
        # bounded driver collect parameterizes the first-COLD-match
        # predicate so hot earlier bands don't suppress cold emissions.
        # The collect is CAPPED: an adversarial flood surviving the spam
        # pass must not bloat driver memory / the Catalyst plan with
        # unbounded isin literals (round-2 ADVICE).
        hot_rows = hot.limit(cfg.hot_drop_key_cap + 1).collect()
        hkb: dict[int, list[int]] | None
        if len(hot_rows) > cfg.hot_drop_key_cap:
            import warnings

            warnings.warn(
                f"near_pairs(drop): > {cfg.hot_drop_key_cap} hot band "
                "buckets; falling back to the plain first-match "
                "predicate (pairs whose earlier matching band is hot "
                "are suppressed — extra recall loss). Consider "
                "hot_bucket_mode='salt' or a higher band_bucket_cap.",
                RuntimeWarning,
                stacklevel=2,
            )
            hkb = None
        else:
            hkb = {}
            for r in hot_rows:
                hkb.setdefault(r["band"], []).append(r["band_key"])
        return _verify(left.join(right, ["band", "band_key"]), cfg, hkb)

    # salt mode (default): ONE join keyed (band, band_key, salt) routes
    # cold and hot buckets together — cold rows take salt 0 on both
    # sides (meet exactly once), hot probe rows take a deterministic
    # doc_id-derived salt and hot build rows replicate across all salt
    # values (each hot pair meets exactly at the probe row's salt).
    # Replaces the former cold-join + salted-sub-join + union: the
    # banded frame is evaluated twice (probe + build) instead of five
    # times (histogram feeds from the same scan either way), and the
    # pair stream needs one exchange pair instead of two (guide §2.4).
    # A (band, band_key) bucket is entirely hot or entirely cold, so
    # salt-0 cold rows can never meet a hot build replica.
    s = cfg.salt_partitions
    flagged = b.join(
        F.broadcast(hot.withColumn("_hot", F.lit(True))),
        ["band", "band_key"],
        "left",
    )
    probe = flagged.withColumn(
        "salt",
        F.when(
            F.col("_hot").isNotNull(),
            F.pmod(F.xxhash64("doc_id"), F.lit(s)),
        )
        .otherwise(F.lit(0))
        .cast("int"),
    )
    build = flagged.withColumn(
        "salt",
        F.explode(
            F.when(
                F.col("_hot").isNotNull(),
                F.array(*[F.lit(i) for i in range(s)]),
            ).otherwise(F.array(F.lit(0)))
        ),
    )
    left = probe.select(
        "band", "band_key", "salt",
        F.col("doc_id").alias("a_id"),
        F.col("fingerprint").alias("a_fp"),
    )
    right = build.select(
        "band", "band_key", "salt",
        F.col("doc_id").alias("b_id"),
        F.col("fingerprint").alias("b_fp"),
    )
    return _verify(
        left.join(right, ["band", "band_key", "salt"]), cfg
    )
