"""SemDeDup — semantic deduplication over an embedding column.

The published recipe (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication"): cluster the
corpus embeddings with k-means, then WITHIN each cluster mark groups of
examples whose pairwise cosine similarity exceeds a threshold and keep
one representative per group — the member with the LOWEST similarity to
its cluster centroid (keeping the least-prototypical copy preserves the
most diversity).

This implementation uses the screening variant of the within-cluster
rule (pairwise dominance, no chaining): a vector is `delete` iff some
OTHER member of its cluster is ≥ `threshold` cosine-similar AND ranks
ahead of it in keep-priority (lower centroid similarity; ties toward
the lower vec_id).  The rule is a pure pairwise predicate, so it is
expressible as one self-join + semi-join — no sequential pass, no
driver loop — and is deterministic for a fixed centroid set.

Spark plan shape (the 100-TB consideration):
  * clustering reuses the IVF machinery (operators/similarity.py):
    spherical k-means on a deterministic driver sample, assignment in
    one Arrow pandas-UDF pass — or caller-injected `centroids`
    (the oracle hook: with literal axis-aligned centroids every stage
    downstream of training is SQL-expressible, so the driver oracle
    hash-verifies the PRODUCTION operator end-to-end).
  * the pairwise screen is an equi-join on list_id: cost follows
    cluster sizes (bounded by n_lists sizing), never |corpus|².  A
    pathologically hot cluster has the same remedy as a hot band
    bucket (operators/pairs.py): raise n_lists so clusters shrink, or
    cap-and-salt the offending list.
  * the centroid table is tiny and broadcast; the only corpus-sized
    exchange is the hash partition on list_id that the self-join needs
    anyway.

Reference anchor: the keep-one-representative-per-duplicate-group
contract mirrors the reference's winner-selection stage
(incload/DeDupReduce.java greedy keep/delete actions) lifted from
fingerprint space to embedding space.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _cosine, _fit_centroids, _list_assign_udf


def assign_clusters(
    corpus: DataFrame,
    centroids: np.ndarray,
) -> DataFrame:
    """(vec_id, v, list_id, centroid_sim): every vector tagged with its
    nearest centroid (Arrow UDF argmax, ties toward the lower list_id)
    and its exact cosine similarity to that centroid (JVM-side fold, so
    the value the dominance rule compares is engine-portable)."""
    spark = corpus.sparkSession
    cent_rows = [
        (int(j), [float(x) for x in centroids[j]]) for j in range(len(centroids))
    ]
    cent_df = spark.createDataFrame(cent_rows, "list_id int, centroid array<double>")
    assign1 = _list_assign_udf(centroids, 1)
    c = corpus.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("list_id", assign1(F.col("v"))[0])
    # left join, not inner: an inner join pushes an IsNotNull(list_id)
    # filter below the projection, and Catalyst then evaluates the
    # assignment UDF TWICE (once for the filter, once for the project).
    # list_id is an argmax over the centroid table, always present, so
    # left == inner here — and the plan keeps ONE Arrow stage
    # (asserted in test_plans).
    return c.join(F.broadcast(cent_df), "list_id", "left").select(
        "vec_id",
        "v",
        "list_id",
        _cosine(F.col("v"), F.col("centroid")).alias("centroid_sim"),
    )


def _dominated_in(a: DataFrame, b: DataFrame, keys: list, threshold: float) -> DataFrame:
    """vec_ids on the a side dominated by a b-side member sharing the
    join keys: >= threshold cosine-similar with higher keep-priority
    (lower centroid_sim — the duplicate-group representative is the
    member LEAST similar to the centroid, SemDeDup §3; vec_id breaks
    exact ties deterministically)."""
    return (
        a.join(b, keys)
        .filter(F.col("a_id") != F.col("b_id"))
        .filter(
            (F.col("b_csim") < F.col("a_csim"))
            | ((F.col("b_csim") == F.col("a_csim")) & (F.col("b_id") < F.col("a_id")))
        )
        .filter(_cosine(F.col("a_v"), F.col("b_v")) >= F.lit(float(threshold)))
        .select(F.col("a_id").alias("vec_id"))
    )


def semdedup(
    corpus: DataFrame,
    *,
    threshold: float = 0.9,
    n_lists: int = 64,
    seed: int = 42,
    sample_mod: int = 1,
    sample_cap: int = 20_000,
    centroids: np.ndarray | None = None,
    list_size_cap: int = 10_000,
    salt_partitions: int = 16,
) -> DataFrame:
    """corpus(vec_id, embedding) -> (vec_id, list_id, action) with
    action in {'keep', 'delete'}.

    delete iff another same-cluster vector is >= threshold
    cosine-similar and has strictly higher keep-priority (lower
    centroid_sim; ties toward the lower vec_id).  Every cluster's
    least-prototypical member of each duplicate group survives.

    `centroids` (n_lists x dim) skips the k-means and pins the cluster
    geometry — the oracle / testing hook, same contract as
    similarity.ivf_topk.

    Hot clusters (> `list_size_cap` members) would serialize their
    |list|^2 cosine screen into one join task; they are routed to a
    salted sub-join instead (the probe side carries a deterministic
    salt, the build side is replicated once per salt value), spreading
    the quadratic block across `salt_partitions` tasks — the same
    remedy as the hot band buckets in operators/pairs.py.  Routing is
    correctness-independent: every cluster is entirely cold or
    entirely hot, and within a hot cluster each (a, b) pair meets in
    exactly one salt."""
    c = corpus.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    cent = (
        np.asarray(centroids, dtype=np.float64)
        if centroids is not None
        else _fit_centroids(c, n_lists, seed, sample_mod, sample_cap)
    )
    # cut lineage once: the assignment (scan + Arrow UDF) feeds both
    # self-join sides and the final action join — without it the UDF
    # stage would execute three times (same trick as ivf_probe)
    assigned = assign_clusters(corpus, cent).localCheckpoint(eager=False)

    from .skew import salt_build, salt_probe, split_hot_buckets

    cold, hot_rows = split_hot_buckets(assigned, ["list_id"], list_size_cap)

    def _side(df, prefix):
        return df.select(
            F.col("vec_id").alias(f"{prefix}_id"),
            F.col("v").alias(f"{prefix}_v"),
            "list_id",
            F.col("centroid_sim").alias(f"{prefix}_csim"),
        )

    dominated = _dominated_in(
        _side(cold, "a"), _side(cold, "b"), ["list_id"], threshold
    )
    dominated = dominated.unionByName(
        _dominated_in(
            salt_probe(_side(hot_rows, "a"), "a_id", salt_partitions),
            salt_build(_side(hot_rows, "b"), salt_partitions),
            ["list_id", "salt"],
            threshold,
        )
    )
    # one left join with a flag (not a semi + anti pair) so the
    # assignment stage — which carries the Arrow UDF pass — is scanned
    # once, not twice
    dom = dominated.distinct().withColumn("_dominated", F.lit(True))
    return assigned.join(dom, "vec_id", "left").select(
        "vec_id",
        "list_id",
        F.when(F.col("_dominated").isNotNull(), F.lit("delete"))
        .otherwise(F.lit("keep"))
        .alias("action"),
    )


def semdedup_survivors(corpus: DataFrame, **kwargs) -> DataFrame:
    """The corpus rows that survive semantic dedup (original schema) —
    the left_semi composition callers feed straight into training-set
    assembly.  Accepts every `semdedup` keyword."""
    actions = semdedup(corpus, **kwargs)
    return corpus.join(
        actions.filter(F.col("action") == "keep").select("vec_id"),
        "vec_id",
        "left_semi",
    )
