"""Data mixing: temperature-weighted stratified sampling per group.

The standard multi-source training-mix recipe (multilingual BERT /
XLM-R, Conneau et al. 2020 §3.1; also the per-domain mixture weighting
in GPT-3 §2.2): sample group g with probability proportional to
p_g^alpha, alpha < 1 flattening the natural distribution so head
groups stop dominating and tail groups are upsampled relative to
their share.

This implementation fixes alpha = 0.5 and computes the weights as
floor(sqrt(count)) — INTEGER square roots, so the quota arithmetic is
exact integer division in any engine (CLAUDE.md rule 4: cross-engine
float rounding disagrees at boundaries; IEEE sqrt is correctly rounded
and floor() of it is engine-portable for counts < 2^52).  Other
temperatures: pass a precomputed `weights` table.

Row selection inside a group is deterministic hash ordering —
row_number over (md5(doc_id), doc_id) — i.e. an unbiased, reproducible
pseudo-random sample that any engine replays bit-for-bit (the same
device as doc_fingerprint_md5's fp % k sampling).

Plan shape (the 100-TB consideration): the group-count aggregation is
a map-side-combined hash agg (one row per group); the quota table is
tiny and BROADCAST back onto the corpus; the only corpus-sized
exchange is the hash partition on the group key that the per-group
row_number window needs.  A skewed group costs one wide window
partition — at that point cap the group's quota and pre-filter with
fp-mod sampling (functions/text.py) so the window only ranks a
bounded candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from simhash_text_dedup_spark.functions.text import _idiv


def temperature_quotas(
    corpus: DataFrame,
    group_col: str,
    total: int,
    *,
    weights: DataFrame | None = None,
) -> DataFrame:
    """(group, n_docs, weight, quota): per-group target counts.
    quota_g = total * w_g // sum(w), w_g = floor(sqrt(n_docs)) unless a
    (group, weight) table overrides it (groups absent from the
    override table keep the default weight).  Floor shares: the quotas
    sum to <= total (the remainder is deliberately unassigned —
    determinism beats hitting `total` exactly)."""
    counts = corpus.groupBy(F.col(group_col).alias("group")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    default_w = F.floor(F.sqrt(F.col("n_docs"))).cast("bigint")
    if weights is not None:
        # left join + coalesce: a group missing from the override table
        # keeps its default weight (an inner join would silently drop
        # every document of an unlisted group from the sample)
        counts = counts.join(
            F.broadcast(
                weights.select(
                    F.col(group_col).alias("group"),
                    F.col("weight").cast("bigint").alias("_w_override"),
                )
            ),
            "group",
            "left",
        ).withColumn("weight", F.coalesce(F.col("_w_override"), default_w))
    else:
        counts = counts.withColumn("weight", default_w)
    # scalar weight total via a broadcast single-row aggregate (not an
    # unpartitioned window — same result, no single-partition stage)
    w_sum = counts.agg(F.sum("weight").alias("_w_sum"))
    return (
        counts.crossJoin(F.broadcast(w_sum))
        .withColumn(
            "quota",
            _idiv(
                (F.lit(int(total)) * F.col("weight")).cast("bigint"),
                F.col("_w_sum"),
            ),
        )
        .select("group", "n_docs", "weight", "quota")
    )


def temperature_sample(
    corpus: DataFrame,
    group_col: str,
    total: int,
    *,
    id_col: str = "doc_id",
    weights: DataFrame | None = None,
    scan_cap_factor: int | None = None,
) -> DataFrame:
    """(doc_id, group, sample_rank): a deterministic stratified sample
    of ~`total` rows with group shares flattened by the alpha=0.5
    temperature.  Within each group rows are ranked by
    (md5(id), id) — a reproducible unbiased order — and the first
    quota_g survive.

    `scan_cap_factor` is the scale lever for skewed groups: the
    per-group ranking window otherwise SORTS the whole group to keep
    quota rows.  With a factor c, rows are pre-filtered to those whose
    60-bit md5-prefix falls in the lowest ~c*quota/n_docs slice of the
    hash space — an order-monotone cut, so the ranked result is
    IDENTICAL whenever at least quota rows pass.  The shortfall event
    is a lower-tail binomial deviation by a factor c (Chernoff
    P < exp(-quota*(c-1)^2 / (2c)) — operationally zero for c >= 4 and
    real quotas); if it ever fired the group would be under-sampled,
    never mis-sampled.  The window then sorts ~c*quota rows per group
    instead of the group."""
    quotas = temperature_quotas(corpus, group_col, total, weights=weights)
    w = Window.partitionBy("group").orderBy("_hkey", "doc_id")
    # n_docs rides through the corpus-sized exchange only when the
    # scan-cap branch actually needs it
    quota_cols = (
        ["group", "n_docs", "quota"]
        if scan_cap_factor is not None
        else ["group", "quota"]
    )
    rows = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("group"),
        F.md5(F.col(id_col).cast("string")).alias("_hkey"),
    ).join(F.broadcast(quotas.select(*quota_cols)), "group")
    if scan_cap_factor is not None:
        c = int(scan_cap_factor)
        # integer threshold on the 60-bit hex prefix; ((2^60 // n) * cq)
        # stays below 2^63 because the branch only runs when cq < n
        hk60 = F.conv(F.substring("_hkey", 1, 15), 16, 10).cast("bigint")
        cq = (F.lit(c) * F.col("quota")).cast("bigint")
        thresh = _idiv(F.lit(1 << 60), F.col("n_docs")) * cq
        rows = rows.filter((cq >= F.col("n_docs")) | (hk60 < thresh))
    return (
        rows.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= F.col("quota"))
        .select(
            "doc_id",
            "group",
            F.col("sample_rank").cast("bigint").alias("sample_rank"),
        )
    )


def short_quota_groups(
    sample: DataFrame, quotas: DataFrame
) -> DataFrame:
    """(group, n_sampled, expected): groups whose sample came in under
    min(quota, n_docs) — the audit for `scan_cap_factor` (empty result
    == the capped run is bit-identical to the exact one)."""
    got = sample.groupBy("group").agg(F.count(F.lit(1)).alias("n_sampled"))
    return (
        quotas.join(got, "group", "left")
        .withColumn("n_sampled", F.coalesce(F.col("n_sampled"), F.lit(0)))
        .withColumn("expected", F.least(F.col("quota"), F.col("n_docs")))
        .filter(F.col("n_sampled") < F.col("expected"))
        .select("group", "n_sampled", "expected")
    )
