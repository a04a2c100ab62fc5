"""SemDeDup: within-cluster pairwise screen, keep-least-prototypical."""

import numpy as np
from pyspark.sql import functions as F

from simhash_text_dedup_spark.operators.semdedup import (
    semdedup,
    semdedup_survivors,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _axis_centroids(n_lists=8, dim=64):
    return np.eye(n_lists, dim)


def _numpy_semdedup(pdf, centroids, threshold):
    """Independent numpy replay of the screening rule."""
    ids = pdf.vec_id.values
    mat = np.vstack(pdf.embedding.map(lambda v: np.asarray(v, dtype=np.float64)))
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cent = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )
    sims = unit @ cent.T
    assign = np.argsort(-sims, axis=1, kind="stable")[:, 0]
    csim = sims[np.arange(len(ids)), assign]
    actions = {}
    for i in range(len(ids)):
        dominated = False
        for j in range(len(ids)):
            if i == j or assign[i] != assign[j]:
                continue
            outranks = csim[j] < csim[i] or (
                csim[j] == csim[i] and ids[j] < ids[i]
            )
            if outranks and float(unit[i] @ unit[j]) >= threshold:
                dominated = True
                break
        actions[int(ids[i])] = "delete" if dominated else "keep"
    return actions


def test_semdedup_matches_numpy_replay(spark):
    emb = _emb(spark)
    got = semdedup(emb, threshold=0.3, centroids=_axis_centroids()).collect()
    want = _numpy_semdedup(emb.toPandas(), _axis_centroids(), 0.3)
    assert len(got) == len(want)
    deletes = 0
    for r in got:
        assert want[r.vec_id] == r.action, r
        deletes += r.action == "delete"
    # threshold 0.3 on random 64-dim data: non-trivial mix of actions
    assert 0 < deletes < len(got)


def test_semdedup_identical_copy_deleted_original_kept(spark):
    emb = _emb(spark).select("vec_id", "embedding").limit(50)
    copies = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    got = {
        r.vec_id: r.action
        for r in semdedup(
            emb.unionByName(copies), threshold=0.99, centroids=_axis_centroids()
        ).collect()
    }
    for vid in range(50):
        if vid in got:
            # identical vectors: bit-equal centroid_sim, tie toward the
            # lower vec_id -> the original survives, the copy goes
            assert got[vid] == "keep"
            assert got[vid + 100000] == "delete"


def test_semdedup_trained_centroids_deterministic(spark):
    emb = _emb(spark)
    r1 = sorted(
        (r.vec_id, r.list_id, r.action)
        for r in semdedup(emb, threshold=0.3, n_lists=8, seed=7).collect()
    )
    r2 = sorted(
        (r.vec_id, r.list_id, r.action)
        for r in semdedup(emb, threshold=0.3, n_lists=8, seed=7).collect()
    )
    assert r1 == r2
    assert {a for _, _, a in r1} <= {"keep", "delete"}


def test_semdedup_survivors_composition(spark):
    emb = _emb(spark)
    actions = semdedup(emb, threshold=0.3, centroids=_axis_centroids()).collect()
    keep_ids = {r.vec_id for r in actions if r.action == "keep"}
    surv = semdedup_survivors(
        emb, threshold=0.3, centroids=_axis_centroids()
    ).collect()
    assert {r.vec_id for r in surv} == keep_ids
    # original schema preserved (incl. passenger columns like label)
    assert set(surv[0].asDict()) == set(emb.columns)


def test_hot_cluster_salt_routing_parity(spark):
    # every vector with a dominant dim-0 coordinate lands in list 0 ->
    # a planted hot cluster; a tiny cap forces it through the salted
    # sub-join, which must produce byte-identical actions vs the
    # plain path (cap high enough that nothing is hot)
    from pyspark.sql import functions as F  # noqa: F811

    emb = _emb(spark).select("vec_id", "embedding").limit(120)
    hot = emb.select(
        (F.col("vec_id") + 5000).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> CASE WHEN i = 0 "
            "THEN float(10.0 + pmod(vec_id, 7)) ELSE x END)"
        ).alias("embedding"),
    )
    docs = emb.unionByName(hot)
    kw = dict(threshold=0.3, centroids=_axis_centroids())
    plain = sorted(
        map(tuple, semdedup(docs, list_size_cap=10_000, **kw).collect())
    )
    salted = sorted(
        map(tuple, semdedup(docs, list_size_cap=50, salt_partitions=4, **kw).collect())
    )
    assert plain == salted
    # the planted rows really did form a hot list 0 larger than the cap
    n_list0 = sum(1 for _, lid, _ in plain if lid == 0)
    assert n_list0 > 50
