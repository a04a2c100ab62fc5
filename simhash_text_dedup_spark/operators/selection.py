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
  'greedy' (reference-exact): the greedy scan is run per component via
           applyInPandas — components are tiny, so the sequential logic
           parallelizes across components instead of the reference's
           single reducer (SelectLogic.java:54).
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
    """Reference-exact greedy over one component's pairs.

    Input rows: one per pair occurrence (a_id,b_id,score_a,score_b,...)
    plus per-doc meta; see assign_actions_greedy for the packing.

    The mega-component guard lives HERE, inside the pass that already
    holds the component (round-3 ADVICE: the old driver-side check ran
    an extra eager Spark job per call): past `warn_pairs` pairs the
    executor warns that this component's sequential walk is the
    bottleneck task.
    """
    if warn_pairs is not None and len(pdf) > warn_pairs:
        import warnings

        warnings.warn(
            f"assign_actions_greedy: a component holds ~{len(pdf)} "
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
    runs ONE global reducer, SelectLogic.java:54; per-component is
    strictly more parallel), so a pathological chained mega-component
    serializes into a single task.  `warn_pairs_per_component` arms a
    FREE executor-side check inside the applyInPandas pass itself
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
    doc_rows = cl.withColumn("b_doc", F.col("doc_id"))
    packed = doc_rows.unionByName(pair_rows)
    warn = warn_pairs_per_component
    return packed.groupBy("cluster_id").applyInPandas(
        lambda pdf: _greedy_component(pdf, warn), schema=_GREEDY_SCHEMA
    )
