"""Pair-counting clustering evaluation (operators/evaluate.py):
hand-computed contingency values, label invariance, degenerate cases."""

from simhash_text_dedup_spark.operators.evaluate import pair_counting_stats


def _labels(spark, mapping):
    rows = [(d, c) for d, c in mapping.items()]
    return spark.createDataFrame(rows, "doc_id long, cluster_id long")


def test_pair_counting_hand_example(spark):
    # pred: {1:[10,11,12], 2:[13,14]}   gold: {7:[10,11], 8:[12,13], 9:[14]}
    pred = _labels(spark, {10: 1, 11: 1, 12: 1, 13: 2, 14: 2})
    gold = _labels(spark, {10: 7, 11: 7, 12: 8, 13: 8, 14: 9})
    r = pair_counting_stats(pred, gold).collect()[0]
    # cells: (1,7)=2 (1,8)=1 (2,8)=1 (2,9)=1 -> tp = C(2,2) = 1
    assert r.tp_pairs == 1
    assert r.pred_pairs == 4   # C(3,2) + C(2,2)
    assert r.gold_pairs == 2   # C(2,2) + C(2,2)
    assert r.precision_permille == 250
    assert r.recall_permille == 500


def test_pair_counting_label_invariance(spark):
    """Identical partitions under different label values score 1000."""
    pred = _labels(spark, {i: i // 3 for i in range(30)})
    gold = _labels(spark, {i: 1000 + (i // 3) * 7 for i in range(30)})
    r = pair_counting_stats(pred, gold).collect()[0]
    assert r.tp_pairs == r.pred_pairs == r.gold_pairs == 30  # 10 * C(3,2)
    assert r.precision_permille == 1000
    assert r.recall_permille == 1000


def test_pair_counting_all_singletons(spark):
    """No pairs anywhere: counts zero, ratios null (not div-by-zero)."""
    pred = _labels(spark, {i: i for i in range(5)})
    gold = _labels(spark, {i: i + 100 for i in range(5)})
    r = pair_counting_stats(pred, gold).collect()[0]
    assert (r.tp_pairs, r.pred_pairs, r.gold_pairs) == (0, 0, 0)
    assert r.precision_permille is None
    assert r.recall_permille is None


def test_pair_counting_intersection_only(spark):
    """Docs labeled in only one side are excluded (inner join)."""
    pred = _labels(spark, {1: 1, 2: 1, 3: 1})          # pairs: 3
    gold = _labels(spark, {1: 5, 2: 5, 99: 5, 98: 5})  # shared docs: 1,2
    r = pair_counting_stats(pred, gold).collect()[0]
    # intersection {1,2}: pred cluster 1 -> C(2,2)=1; gold cluster 5 -> 1
    assert r.tp_pairs == 1
    assert r.pred_pairs == 1
    assert r.gold_pairs == 1
    assert r.precision_permille == 1000
    assert r.recall_permille == 1000


# ---------------------------------------------------------------------
# radius_sweep: per-Hamming-radius verification-budget table
# ---------------------------------------------------------------------
def _pairs(spark, hammings):
    return spark.createDataFrame(
        [(i, 1000 + i, h) for i, h in enumerate(hammings)],
        "a_id long, b_id long, hamming long",
    )


def test_radius_sweep_hand_computed(spark):
    from simhash_text_dedup_spark.operators.evaluate import radius_sweep

    # two exact pairs, one at radius 1, none at 2, three at 3; a
    # radius-5 pair must be excluded from counts AND the total
    rows = {r.radius: r for r in
            radius_sweep(_pairs(spark, [0, 0, 1, 3, 3, 3, 5])).collect()}
    assert sorted(rows) == [0, 1, 2, 3]
    assert [rows[r].n_pairs for r in range(4)] == [2, 1, 0, 3]
    assert [rows[r].cum_pairs for r in range(4)] == [2, 3, 3, 6]
    assert [rows[r].share_permille for r in range(4)] == [333, 500, 500, 1000]


def test_radius_sweep_empty(spark):
    from simhash_text_dedup_spark.operators.evaluate import radius_sweep

    rows = radius_sweep(_pairs(spark, [])).collect()
    assert len(rows) == 4
    assert all(r.n_pairs == 0 and r.cum_pairs == 0 and r.share_permille == 0
               for r in rows)


def test_radius_sweep_custom_radius(spark):
    from simhash_text_dedup_spark.operators.evaluate import radius_sweep

    rows = {r.radius: r for r in
            radius_sweep(_pairs(spark, [0, 4, 5]), max_radius=5).collect()}
    assert sorted(rows) == [0, 1, 2, 3, 4, 5]
    assert rows[5].cum_pairs == 3
    assert rows[0].share_permille == 333
