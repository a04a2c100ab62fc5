"""Temperature-weighted stratified sampling (data mixing)."""

from pyspark.sql import functions as F

from simhash_text_dedup_spark.operators.mixing import (
    temperature_quotas,
    temperature_sample,
)


def _corpus(spark, sizes):
    rows = []
    i = 0
    for g, n in sizes.items():
        for _ in range(n):
            rows.append((i, g))
            i += 1
    return spark.createDataFrame(rows, "doc_id bigint, lang string")


def test_quotas_exact_integer_shares(spark):
    # weights floor(sqrt(n)): 100->10, 25->5, 4->2; sum 17
    c = _corpus(spark, {"a": 100, "b": 25, "c": 4})
    got = {
        r.group: (r.n_docs, r.weight, r.quota)
        for r in temperature_quotas(c, "lang", 170).collect()
    }
    assert got == {"a": (100, 10, 100), "b": (25, 5, 50), "c": (4, 2, 20)}


def test_sampling_flattens_head_share(spark):
    c = _corpus(spark, {"head": 900, "tail": 100})
    s = temperature_sample(c, "lang", 200)
    by_group = {r.group: r.n for r in s.groupBy("group").agg(F.count(F.lit(1)).alias("n")).collect()}
    corpus_head_share = 900 / 1000
    sample_head_share = by_group["head"] / sum(by_group.values())
    # alpha=0.5: head 30/(30+10)=75% of the sample vs 90% of the corpus
    assert sample_head_share < corpus_head_share
    assert by_group["tail"] / sum(by_group.values()) > 100 / 1000


def test_sample_deterministic_and_within_quota(spark):
    c = _corpus(spark, {"a": 50, "b": 10})
    s1 = sorted(map(tuple, temperature_sample(c, "lang", 30).collect()))
    s2 = sorted(map(tuple, temperature_sample(c, "lang", 30).collect()))
    assert s1 == s2
    quotas = {
        r.group: r.quota for r in temperature_quotas(c, "lang", 30).collect()
    }
    per_group = {}
    for _, g, rank in s1:
        per_group[g] = max(per_group.get(g, 0), rank)
    for g, max_rank in per_group.items():
        assert max_rank <= quotas[g]


def test_quota_capped_by_group_size(spark):
    # quota can exceed a tiny group's size -> the whole group survives
    c = _corpus(spark, {"big": 400, "tiny": 2})
    s = temperature_sample(c, "lang", 300)
    n_tiny = s.filter(F.col("group") == "tiny").count()
    assert n_tiny == 2


def test_custom_weights_override(spark):
    c = _corpus(spark, {"a": 100, "b": 100})
    w = spark.createDataFrame([("a", 1), ("b", 3)], "lang string, weight bigint")
    got = {
        r.group: r.quota
        for r in temperature_quotas(c, "lang", 100, weights=w).collect()
    }
    assert got == {"a": 25, "b": 75}


def test_custom_weights_missing_group_falls_back(spark):
    c = _corpus(spark, {"a": 100, "b": 100, "c": 25})
    w = spark.createDataFrame([("a", 1), ("b", 3)], "lang string, weight bigint")
    got = {
        r.group: (r.weight, r.quota)
        for r in temperature_quotas(c, "lang", 90, weights=w).collect()
    }
    # c absent from the override table -> default floor(sqrt(25)) = 5
    assert got["c"][0] == 5
    assert set(got) == {"a", "b", "c"}  # nothing silently dropped
    assert got == {"a": (1, 10), "b": (3, 30), "c": (5, 50)}


def test_scan_cap_parity_and_filter_in_plan(spark):
    import io
    import re
    from contextlib import redirect_stdout

    c = _corpus(spark, {"head": 900, "tail": 100})
    plain = sorted(map(tuple, temperature_sample(c, "lang", 120).collect()))
    capped_df = temperature_sample(c, "lang", 120, scan_cap_factor=4)
    capped = sorted(map(tuple, capped_df.collect()))
    # order-monotone cut: identical sample whenever >= quota rows pass
    assert plain == capped
    buf = io.StringIO()
    with redirect_stdout(buf):
        capped_df.explain("formatted")
    # the hash-space cut is present ahead of the ranking window
    assert re.search(r"conv\(substring\(_hkey", buf.getvalue()), buf.getvalue()


def test_short_quota_groups_audit(spark):
    from simhash_text_dedup_spark.operators.mixing import short_quota_groups

    c = _corpus(spark, {"a": 400, "b": 50})
    q = temperature_quotas(c, "lang", 100)
    s = temperature_sample(c, "lang", 100, scan_cap_factor=4)
    assert short_quota_groups(s, q).count() == 0
    # a truncated sample is flagged
    assert short_quota_groups(s.limit(5), q).count() > 0
