"""ANN similarity search: brute-force baseline + LSH-bucketed variant."""

from pyspark.sql import functions as F

from simhash_text_dedup_spark.operators.similarity import brute_force_topk, lsh_topk

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _queries(spark, n=5):
    return (
        _emb(spark).orderBy("vec_id").limit(n)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )


def test_brute_force_topk_is_exact(spark):
    import numpy as np

    emb = _emb(spark)
    got = brute_force_topk(emb, _queries(spark), k=5).collect()
    pdf = emb.toPandas()
    mat = np.vstack(pdf.embedding.map(lambda v: np.asarray(v, dtype=np.float64)))
    ids = pdf.vec_id.values
    norms = np.linalg.norm(mat, axis=1)
    by_query = {}
    for r in got:
        by_query.setdefault(r.query_id, []).append((r.rank, r.neighbor_id, r.cos_sim))
    for qid, rows in by_query.items():
        qv = mat[ids == qid][0]
        sims = (mat @ qv) / (norms * np.linalg.norm(qv))
        order = sorted(
            [(s, i) for s, i in zip(sims, ids) if i != qid],
            key=lambda t: (-t[0], t[1]),
        )[:5]
        rows.sort()
        for (rank, nid, cs), (s, i) in zip(rows, order):
            assert nid == i
            assert abs(cs - s) < 1e-9


def test_lsh_topk_recall_vs_brute_force(spark):
    emb = _emb(spark)
    q = _queries(spark, 10)
    bf = brute_force_topk(emb, q, k=10).collect()
    ap = lsh_topk(emb, q, k=10, n_planes=64, n_bands=16).collect()
    bf_set = {(r.query_id, r.neighbor_id) for r in bf}
    ap_set = {(r.query_id, r.neighbor_id) for r in ap}
    recall = len(bf_set & ap_set) / len(bf_set)
    # 16 bands x 4 bits is a generous multi-probe config; random data has
    # weak neighborhood structure so demand a moderate floor
    assert recall >= 0.5, recall


def test_lsh_deterministic(spark):
    emb = _emb(spark)
    q = _queries(spark, 3)
    a = {(r.query_id, r.neighbor_id, r.rank) for r in lsh_topk(emb, q, k=5).collect()}
    b = {(r.query_id, r.neighbor_id, r.rank) for r in lsh_topk(emb, q, k=5).collect()}
    assert a == b
