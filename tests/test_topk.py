"""Quota top-k (T1, TotalValueSort.java:279-316): split budget, spill
on shortfall."""

from pyspark.sql import functions as F

from simhash_text_dedup_spark.operators.topk import quota_topk


def _df(spark, n_old, n_new):
    # old docs: ids 0..n_old-1, scores 1000+id; new: ids 1000+, scores 500+id
    rows = [(i, 1000.0 + i, True) for i in range(n_old)]
    rows += [(1000 + i, 500.0 + i, False) for i in range(n_new)]
    return spark.createDataFrame(rows, "doc_id long, score double, is_old boolean")


def test_quotas_met_when_both_sides_plentiful(spark):
    out = quota_topk(_df(spark, 50, 50), k=20, old_ratio=0.5).collect()
    old = [r for r in out if r.is_old]
    new = [r for r in out if not r.is_old]
    assert len(old) == 10 and len(new) == 10
    # each side contributes its own score-descending top
    assert {r.doc_id for r in old} == set(range(40, 50))
    assert {r.doc_id for r in new} == {1000 + i for i in range(40, 50)}


def test_shortfall_spills_to_other_side(spark):
    # old side has only 3 records for a quota of 10 -> new side fills 17
    out = quota_topk(_df(spark, 3, 50), k=20, old_ratio=0.5).collect()
    old = [r for r in out if r.is_old]
    new = [r for r in out if not r.is_old]
    assert len(old) == 3 and len(new) == 17
    assert len(out) == 20


def test_both_sides_short_returns_everything(spark):
    out = quota_topk(_df(spark, 2, 3), k=20, old_ratio=0.5).collect()
    assert len(out) == 5


def test_zero_old_ratio(spark):
    out = quota_topk(_df(spark, 50, 50), k=10, old_ratio=0.0).collect()
    assert all(not r.is_old for r in out) and len(out) == 10


def test_quota_topk_null_flag_counts_as_new(spark):
    """A NULL is_old flag must count as 'new' everywhere (filter,
    counts, limit) — not silently vanish from both side filters."""
    from simhash_text_dedup_spark.operators.topk import quota_topk

    rows = [
        (1, 10.0, True), (2, 9.0, True),
        (3, 8.0, False), (4, 7.0, None),
        (5, 6.0, None), (6, 5.0, False),
    ]
    df = spark.createDataFrame(rows, "doc_id long, score double, is_old boolean")
    out = quota_topk(df, k=4, old_ratio=0.5).collect()
    got = {r.doc_id for r in out}
    # quotas 2/2: old side takes 1,2; new side (incl. NULLs) takes 3,4
    assert got == {1, 2, 3, 4}, got
