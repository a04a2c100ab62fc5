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


def test_ivf_topk_recall_on_clustered_data(spark):
    """IVF with n_probe covering the true cluster: high recall vs the
    exact baseline on cluster-structured embeddings (the realistic
    embedding geometry; uniform random vectors have no clusters for ANY
    ANN index)."""
    import numpy as np

    from simhash_text_dedup_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    rng = np.random.default_rng(5)
    centers = rng.standard_normal((10, 32)) * 5
    rows = []
    vid = 0
    for c in centers:
        for _ in range(40):
            rows.append((vid, (c + rng.standard_normal(32) * 0.3).tolist()))
            vid += 1
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(r[0], r[1]) for r in rows[::97]], "query_id long, embedding array<double>"
    )
    exact = brute_force_topk(corpus, queries, k=10).collect()
    approx = ivf_topk(corpus, queries, k=10, n_lists=16, n_probe=3, seed=1).collect()
    want = {}
    for r in exact:
        want.setdefault(r.query_id, set()).add(r.neighbor_id)
    got = {}
    for r in approx:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(want[q] & got.get(q, set())) / len(want[q]) for q in want]
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_ivf_topk_deterministic(spark):
    import numpy as np

    from simhash_text_dedup_spark.operators.similarity import ivf_topk

    rng = np.random.default_rng(9)
    rows = [(i, rng.standard_normal(16).tolist()) for i in range(200)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        rows[:3], "query_id long, embedding array<double>"
    )
    a = sorted((r.query_id, r.neighbor_id, r.rank)
               for r in ivf_topk(corpus, queries, k=5, n_lists=8, n_probe=8).collect())
    b = sorted((r.query_id, r.neighbor_id, r.rank)
               for r in ivf_topk(corpus, queries, k=5, n_lists=8, n_probe=8).collect())
    assert a == b


def test_ivf_empty_training_sample_raises_clearly(spark):
    import pytest

    from simhash_text_dedup_spark.operators.similarity import ivf_topk

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    q = spark.createDataFrame(
        [(1, [1.0, 0.0])], "query_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="training sample is empty"):
        ivf_topk(empty, q, k=3)


def _clustered(spark, seed=5, n_centers=10, per=40, dim=32):
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_centers, dim)) * 5
    rows = []
    vid = 0
    for c in centers:
        for _ in range(per):
            rows.append((vid, (c + rng.standard_normal(dim) * 0.3).tolist()))
            vid += 1
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(r[0], r[1]) for r in rows[::97]], "query_id long, embedding array<double>"
    )
    return corpus, queries


def test_ivf_written_index_matches_in_memory(spark, tmp_path):
    """write_ivf_index + ivf_probe must reproduce ivf_topk exactly
    (same centroids from the same deterministic sample + seed)."""
    from simhash_text_dedup_spark.operators.similarity import (
        ivf_probe,
        ivf_topk,
        write_ivf_index,
    )

    corpus, queries = _clustered(spark)
    path = str(tmp_path / "ivf")
    write_ivf_index(corpus, path, n_lists=16, seed=1)
    on_disk = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_probe(spark, path, queries, k=10, n_probe=3).collect()
    )
    in_mem = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_topk(corpus, queries, k=10, n_lists=16, n_probe=3, seed=1).collect()
    )
    assert on_disk == in_mem


def test_ivf_probe_scans_only_probed_partitions(spark, tmp_path):
    """The partition-pruned layout must be REAL: a probe's executed
    scan touches only list_id=<j> directories it probed, and the
    filter reaches the scan as a PartitionFilter."""
    import io
    from contextlib import redirect_stdout

    from simhash_text_dedup_spark.operators.similarity import (
        probe_list_ids,
        read_centroids,
        read_ivf_lists,
        write_ivf_index,
    )

    corpus, queries = _clustered(spark)
    path = str(tmp_path / "ivf")
    write_ivf_index(corpus, path, n_lists=16, seed=1)

    cent = read_centroids(spark, path)
    q = probe_list_ids(queries, cent, n_probe=2)
    probed = sorted(r.list_id for r in q.select("list_id").distinct().collect())
    all_lists = sorted(
        r.list_id
        for r in spark.read.parquet(f"{path}/lists")
        .select("list_id").distinct().collect()
    )
    assert len(probed) < len(all_lists), (probed, all_lists)

    scan = read_ivf_lists(spark, path, probed)
    buf = io.StringIO()
    with redirect_stdout(buf):
        scan.explain("formatted")
    plan = buf.getvalue()
    pf_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf_lines and "list_id" in pf_lines[0], plan

    # execution-level proof: every file actually read lives in a probed
    # list_id=<j> directory
    files = {
        r.f for r in scan.select(F.input_file_name().alias("f")).distinct().collect()
    }
    assert files
    import re

    for f in files:
        m = re.search(r"list_id=(\d+)/", f)
        assert m and int(m.group(1)) in probed, f


def test_lsh_candidates_have_no_dedup_shuffle(spark):
    """Round-3 VERDICT #6: each candidate pair is emitted only in its
    first shared band (codegen predicate over the rows' own key
    arrays) — the plan must contain NO aggregate/deduplicate node for
    candidate dedup, and results must still be duplicate-free."""
    import io
    from contextlib import redirect_stdout

    from simhash_text_dedup_spark.operators.similarity import lsh_topk

    corpus = _emb(spark)
    queries = _queries(spark)
    res = lsh_topk(corpus, queries, k=10, dim=32)
    buf = io.StringIO()
    with redirect_stdout(buf):
        res.explain("formatted")
    plan = buf.getvalue()
    assert "HashAggregate" not in plan, plan
    assert "Deduplicate" not in plan, plan
    rows = res.collect()
    assert len({(r.query_id, r.neighbor_id) for r in rows}) == len(rows)


def test_lsh_near_pairs_finds_planted_duplicates(spark):
    import numpy as np

    from simhash_text_dedup_spark.operators.similarity import lsh_near_pairs

    emb = _emb(spark).select("vec_id", "embedding").limit(80)
    copies = emb.select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.expr("transform(embedding, x -> x * float(1.5))").alias("embedding"),
    )
    pairs = lsh_near_pairs(
        emb.unionByName(copies), threshold=0.999, n_bands=16
    ).collect()
    got = {(r.a_id, r.b_id) for r in pairs}
    # scaled copies have cosine exactly 1: every (i, i+1000) pair found
    # (identical sign patterns share every band)
    for i in range(80):
        assert (i, i + 1000) in got, i
    # orientation + first-match dedup
    assert len(pairs) == len(got)
    for a, b in got:
        assert a < b


def test_lsh_near_pairs_verify_is_exact(spark):
    import numpy as np

    from simhash_text_dedup_spark.operators.similarity import lsh_near_pairs

    emb = _emb(spark)
    pairs = lsh_near_pairs(emb, threshold=0.3, n_bands=16).collect()
    pdf = emb.toPandas()
    mat = np.vstack(pdf.embedding.map(lambda v: np.asarray(v, dtype=np.float64)))
    ids = list(pdf.vec_id.values)
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for r in pairs:
        cs = float(unit[ids.index(r.a_id)] @ unit[ids.index(r.b_id)])
        assert cs >= 0.3 - 1e-9, (r, cs)


def test_lsh_near_pairs_hot_bucket_salt_parity(spark):
    from simhash_text_dedup_spark.operators.similarity import lsh_near_pairs

    emb = _emb(spark).select("vec_id", "embedding").limit(60)
    # 40 identical-direction vectors flood every band bucket they touch
    flood = (
        _emb(spark).select("vec_id", "embedding").limit(1)
        .crossJoin(spark.range(40).select((F.col("id") + 7000).alias("fid")))
        .select(F.col("fid").alias("vec_id"), "embedding")
    )
    docs = emb.unionByName(flood)
    plain = sorted(
        map(tuple, lsh_near_pairs(docs, threshold=0.3, bucket_cap=10_000).collect())
    )
    salted = sorted(
        map(
            tuple,
            lsh_near_pairs(
                docs, threshold=0.3, bucket_cap=20, salt_partitions=4
            ).collect(),
        )
    )
    assert plain == salted
    # the flood really does pair quadratically (all identical): 40*39/2
    flood_pairs = [(a, b) for a, b in plain if a >= 7000 and b >= 7000]
    assert len(flood_pairs) == 40 * 39 // 2
