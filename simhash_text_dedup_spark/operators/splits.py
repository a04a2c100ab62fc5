"""Leakage-safe train/validation/test split assignment.

Near-duplicate documents that straddle a train/eval split leak training
content into evaluation — the contamination mechanism Lee et al. 2021
(§6.2) measure on C4, which doc-level random splits cannot prevent.
The standard fix: assign the split at the DUPLICATE-CLUSTER level, so
every member of a near-dup cluster lands on the same side of every cut.

``assign_splits`` keys each document on its cluster id (falling back to
the document's own id for singletons / unclustered docs) and hashes the
key through the engine-portable 60-bit MD5 fingerprint into permille
buckets.  Properties a production pipeline needs, all by construction:

- deterministic and engine-reproducible (MD5, integer thresholds — the
  same portability contract as ``doc_fingerprint_md5``);
- stable under corpus growth: a document's assignment depends only on
  its cluster key, so re-running after new docs arrive never reshuffles
  existing assignments (as long as the clustering keeps representatives
  stable, which min-id connected components does for grown clusters
  whose minimum survives);
- leakage-free w.r.t. the pair set that produced the clustering:
  both endpoints of every verified near-dup pair share a cluster,
  hence a split (``split_leakage`` audits this — the count is 0).

Plan shape (the 100-TB consideration): one left join docs -> clusters on
doc_id (the CC label table is corpus-sized but two slim columns; AQE
broadcasts it when small, shuffle-joins otherwise), then a pure
whole-stage-codegen projection — no window, no UDF, no extra exchange.
The audit is two slim joins of the pair table against the assignment
plus one tiny groupBy on the (split, split) matrix.

Reference anchor: the reference ships per-round keep/delete lists
(SelectAndSendJob.java) — this is the curation-side consumer of the same
clustering, restated for the train/eval-split contract.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import doc_fingerprint_md5


def assign_splits(
    docs: DataFrame,
    clusters: DataFrame | None = None,
    *,
    ratios_permille: Sequence[int] = (980, 10, 10),
    names: Sequence[str] = ("train", "valid", "test"),
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, split_key, split): deterministic cluster-keyed split.

    ``clusters`` is a (doc_id, cluster_id) labeling (e.g.
    ``connected_components`` output, or an exact-fingerprint grouping);
    docs absent from it are singletons keyed on their own id.  With
    ``clusters=None`` the split degenerates to plain doc-level hashing
    (valid only for a corpus already deduplicated)."""
    if len(ratios_permille) != len(names):
        raise ValueError("ratios_permille and names must align")
    if sum(ratios_permille) != 1000:
        raise ValueError("ratios_permille must sum to 1000")
    if clusters is not None:
        labels = clusters.select(
            F.col("doc_id").alias(id_col),
            F.col("cluster_id").alias("__cluster_id"),
        )
        d = docs.select(id_col).join(labels, id_col, "left")
        key = F.coalesce(F.col("__cluster_id"), F.col(id_col))
    else:
        d = docs.select(id_col)
        key = F.col(id_col)
    h = F.pmod(doc_fingerprint_md5(key.cast("string")), F.lit(1000))
    acc = 0
    expr = None
    for ratio, name in zip(ratios_permille, names):
        acc += ratio
        cond = h < F.lit(acc)
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    return d.select(
        F.col(id_col).alias("doc_id"),
        key.cast("long").alias("split_key"),
        expr.alias("split"),
    )


def split_leakage(
    pairs: DataFrame,
    assigned: DataFrame,
    *,
    a_col: str = "a_id",
    b_col: str = "b_id",
) -> DataFrame:
    """(split_a, split_b, n_pairs): how the pair set distributes across
    split boundaries; ordered so split_a <= split_b.  Off-diagonal rows
    are LEAKED pairs — zero when ``assigned`` was keyed on the
    clustering that produced ``pairs``."""
    slim = assigned.select("doc_id", "split")
    a = slim.select(
        F.col("doc_id").alias(a_col), F.col("split").alias("__sa")
    )
    b = slim.select(
        F.col("doc_id").alias(b_col), F.col("split").alias("__sb")
    )
    return (
        pairs.select(a_col, b_col)
        .join(a, a_col)
        .join(b, b_col)
        .select(
            F.least("__sa", "__sb").alias("split_a"),
            F.greatest("__sa", "__sb").alias("split_b"),
        )
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
