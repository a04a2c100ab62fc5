"""Connected components via iterative min-label propagation.

Replaces the reference's single-reducer global greedy scan
(incload/SelectLogic.java:54, SelectLogicReducer.java:56-104) with a
parallel equivalent: cluster_id = min doc_id reachable through verified
duplicate edges (SURVEY.md §7.1 item 6).  Dedup graphs are shallow
(near-clique families + star edges from exact groups), so the fixpoint
arrives in a handful of iterations; each iteration localCheckpoints to
cut lineage (SURVEY.md §7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, max_iter: int = 25) -> DataFrame:
    """edges(a_id, b_id) -> labels(doc_id, cluster_id).

    Only vertices that appear in an edge are returned; callers attach
    singletons with cluster_id = doc_id themselves (cheaper than running
    them through the loop).
    """
    # undirected: propagate both ways
    e = edges.select("a_id", "b_id").union(
        edges.select(F.col("b_id").alias("a_id"), F.col("a_id").alias("b_id"))
    )
    e = e.repartition("a_id").localCheckpoint()

    labels = (
        e.select(F.col("a_id").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        msgs = e.join(labels, e.b_id == labels.doc_id).select(
            e.a_id.alias("doc_id"), "label"
        )
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("doc_id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    return labels.select("doc_id", F.col("label").alias("cluster_id"))
