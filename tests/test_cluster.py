"""Both connected-components strategies must produce identical labels."""

import random

from simhash_text_dedup_spark.operators.cluster import connected_components


def _random_edges(n_verts=300, n_edges=400, seed=5):
    rng = random.Random(seed)
    return [
        (rng.randrange(n_verts) * 7 + 1, rng.randrange(n_verts) * 7 + 1)
        for _ in range(n_edges)
    ]


def test_driver_and_distributed_agree(spark):
    edges = spark.createDataFrame(_random_edges(), "a_id long, b_id long")
    drv = {
        (r.doc_id, r.cluster_id)
        for r in connected_components(edges, driver_threshold=10**9).collect()
    }
    dist = {
        (r.doc_id, r.cluster_id)
        for r in connected_components(edges, driver_threshold=0).collect()
    }
    assert drv == dist
    # labels are min doc_id per component
    by_cluster = {}
    for d, c in drv:
        by_cluster.setdefault(c, []).append(d)
    for c, members in by_cluster.items():
        assert c == min(members)


def test_chain_topology(spark):
    # long chain exercises multiple propagation iterations
    chain = [(i, i + 1) for i in range(1, 40)]
    edges = spark.createDataFrame(chain, "a_id long, b_id long")
    dist = connected_components(edges, driver_threshold=0).collect()
    assert {r.cluster_id for r in dist} == {1}
    assert len(dist) == 40


def test_empty_edges(spark):
    edges = spark.createDataFrame([], "a_id long, b_id long")
    assert connected_components(edges).count() == 0
