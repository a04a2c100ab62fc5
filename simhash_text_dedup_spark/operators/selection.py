"""Winner selection + delete/modify action assignment.

Reference semantics (incload/SelectLogicMapper.java:36-47,
SelectLogicReducer.java:56-104): orient every verified pair so the
higher-score side wins; walk pairs globally in score-descending order;
the loser is killed unless its winner was already killed; a killed loser
goes to the DELETE list if it is new/unloaded, to the MODIFY list if it
was already loaded into the index.

Two modes (cfg.selection):
  'cc'     (default, parallel): representative = max score (doc_id
           tie-break) per connected component; every non-representative
           is a loser.  This matches greedy on clique-shaped families
           and differs only on chain topologies (documented delta,
           SURVEY.md §7.1 item 6), pinned by fixture F-CHAIN tests.
  'greedy' (reference-exact): the greedy scan runs over hash
           partitions of components via mapInPandas — components are
           tiny and independent, so the sequential logic parallelizes
           across partitions instead of the reference's single reducer
           (SelectLogic.java:54); edge-free components skip the Python
           stage entirely.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_actions_cc(clusters_meta: DataFrame) -> DataFrame:
    """clusters_meta(doc_id, cluster_id, score, is_new) ->
    + is_representative, action in (keep | delete | modify)."""
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        clusters_meta.withColumn("rn", F.row_number().over(w))
        .withColumn("is_representative", F.col("rn") == 1)
        .withColumn(
            "action",
            F.when(F.col("is_representative"), F.lit("keep"))
            .when(F.col("is_new"), F.lit("delete"))
            .otherwise(F.lit("modify")),
        )
        .drop("rn")
    )


_GREEDY_SCHEMA = (
    "doc_id long, cluster_id long, score double, is_new boolean, "
    "is_representative boolean, action string"
)


def _greedy_component(
    pdf: pd.DataFrame, warn_pairs: int | None = None
) -> pd.DataFrame:
    """Reference-exact greedy walk over a frame of pair + doc rows.

    Input rows: one per pair occurrence (a_id,b_id,score_a,score_b,...)
    plus per-doc meta; see assign_actions_greedy for the packing.

    The frame may hold MANY components (one hash partition of them):
    components never share a document, so one global score-descending
    walk with a single dead set makes exactly the decisions the
    per-component walks would — a pair's outcome depends only on its
    own component's earlier decisions, and those appear in the same
    relative order in the global sort.

    The mega-component guard lives HERE, inside the pass that already
    holds the rows (round-3 ADVICE: the old driver-side check ran an
    extra eager Spark job per call): past `warn_pairs` pair rows in a
    single component the executor warns that that component's
    sequential walk is the bottleneck task.
    """
    if warn_pairs is not None:
        pair_cl = pdf.loc[pdf["b_doc"] != pdf["doc_id"], "cluster_id"]
        biggest = int(pair_cl.value_counts().iat[0]) if len(pair_cl) else 0
        if biggest > warn_pairs:
            import warnings

            warnings.warn(
                f"assign_actions_greedy: a component holds ~{biggest} "
                f"pair rows (> {warn_pairs}); its sequential greedy walk "
                "runs in a single task. Consider selection='cc' or a "
                "lower spam_threshold (bounds within-group expansion).",
                RuntimeWarning,
                stacklevel=2,
            )
    docs = pdf.drop_duplicates("doc_id").set_index("doc_id")
    # b_doc == doc_id marks a plain doc row (sentinel keeps the column
    # int64 end-to-end; a nullable long becomes float64 in pandas and
    # corrupts large ids in the low bits)
    pairs = pdf[pdf["b_doc"] != pdf["doc_id"]][["doc_id", "b_doc"]]

    # orient: winner = higher score, doc_id tie-break
    # (SelectLogicMapper.java:39-44) — vectorized: score lookup, swap
    # mask, lexsort.  Only the kill walk below is inherently sequential
    # (each decision depends on the running dead set).
    import numpy as np

    pa = pairs["doc_id"].to_numpy()
    pb = pairs["b_doc"].to_numpy()
    score = docs["score"]
    sa = score.loc[pa].to_numpy()
    sb = score.loc[pb].to_numpy()
    swap = (sb > sa) | ((sb == sa) & (pb < pa))
    winner = np.where(swap, pb, pa)
    loser = np.where(swap, pa, pb)
    ws = np.where(swap, sb, sa)
    # global order: score desc, then ids (SelectLogic.java:104-130)
    order = np.lexsort((loser, winner, -ws))

    dead: set[int] = set()
    for w, l in zip(winner[order].tolist(), loser[order].tolist()):
        if w in dead:
            continue  # winner already killed -> loser survives this pair
        dead.add(l)

    out = docs.reset_index()[["doc_id", "cluster_id", "score", "is_new"]].copy()
    out["is_representative"] = ~out["doc_id"].isin(dead)
    out["action"] = "keep"
    killed = out["doc_id"].isin(dead)
    out.loc[killed & out["is_new"], "action"] = "delete"
    out.loc[killed & ~out["is_new"], "action"] = "modify"
    return out


def assign_actions_greedy(
    clusters_meta: DataFrame,
    edges: DataFrame,
    warn_pairs_per_component: int | None = 2_000_000,
) -> DataFrame:
    """Reference-exact greedy selection, parallel across components.

    clusters_meta(doc_id, cluster_id, score, is_new); edges(a_id, b_id).

    The per-component walk is sequential by definition (the reference
    runs ONE global reducer, SelectLogic.java:54; per-partition-of-
    components is strictly more parallel), so a pathological chained
    mega-component serializes into a single task.
    `warn_pairs_per_component` arms a FREE executor-side check inside
    the mapInPandas pass itself
    (round-2 VERDICT #7 guard, relocated per round-3 ADVICE: the old
    driver-side aggregation ran an extra eager Spark job at
    DataFrame-construction time, doubling edge work and defeating
    Checkpointer resume laziness).  The call is fully lazy either way;
    pass None to silence the warning.
    """
    cl = clusters_meta.select("doc_id", "cluster_id", "score", "is_new")
    pair_rows = (
        edges.join(cl.withColumnRenamed("doc_id", "a_id"), "a_id")
        .select(
            F.col("a_id").alias("doc_id"),
            "cluster_id",
            "score",
            "is_new",
            F.col("b_id").alias("b_doc"),
        )
    )
    # pair_rows fans out (cluster-id distinct + the packed union) and
    # edge_clusters feeds two joins — cut both; each is bounded by the
    # duplicate mass, never the corpus
    pair_rows = pair_rows.localCheckpoint(eager=False)
    doc_rows = cl.withColumn("b_doc", F.col("doc_id"))
    # only components that HOLD a pair need the sequential walk; on a
    # deduplicated corpus that is a small fraction — routing the
    # edge-free majority (singletons + exact-group-only residue with no
    # edges) around the Python stage keeps the applyInPandas group
    # count proportional to the duplicate mass, not the corpus
    # (measured ~4x at sf0.1: thousands of per-group pandas calls that
    # each trivially returned "keep").  A component with no pairs gets
    # the walk's exact no-edge outcome (dead set empty -> everyone
    # keeps) as a codegen projection.
    edge_clusters = (
        pair_rows.select("cluster_id").distinct().localCheckpoint(eager=False)
    )
    walk_docs = doc_rows.join(edge_clusters, "cluster_id", "left_semi")
    no_edge = doc_rows.join(edge_clusters, "cluster_id", "left_anti").select(
        "doc_id",
        "cluster_id",
        "score",
        "is_new",
        F.lit(True).alias("is_representative"),
        F.lit("keep").alias("action"),
    )
    packed = walk_docs.unionByName(pair_rows)
    warn = warn_pairs_per_component

    # one pandas call per PARTITION, not per component: hash-partition
    # by cluster_id (each component lands whole in one partition) and
    # walk the partition's components in a single frame — identical
    # decisions (see _greedy_component), without the per-group
    # Arrow/pandas round trip that applyInPandas pays (~ms per group,
    # dominating when components are small and numerous)
    def _walk_partition(it):
        frames = list(it)
        if frames:
            yield _greedy_component(
                pd.concat(frames, ignore_index=True), warn
            )

    walked = packed.repartition("cluster_id").mapInPandas(
        _walk_partition, schema=_GREEDY_SCHEMA
    )
    return walked.unionByName(no_edge)
