"""Sequence-packing manifest (concat-and-chunk layout)."""

from collections import defaultdict

from simhash_text_dedup_spark.operators.packing import (
    pack_sequences,
    shard_stats,
)


def _docs(spark, n=60):
    rows = [(i, " ".join(f"t{j}" for j in range(1 + i % 7))) for i in range(n)]
    rows.append((n, ""))  # empty doc: zero tokens, zero-width interval
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_manifest_offsets_contiguous_and_seq_bounds(spark):
    docs = _docs(spark)
    got = pack_sequences(docs, seq_len=10, n_shards=4).collect()
    assert len(got) == 61
    by_shard = defaultdict(list)
    for r in got:
        by_shard[r.shard].append(r)
    assert set(by_shard) <= set(range(4))
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.token_offset)
        cum = 0
        for r in rows:
            # concat order leaves no gaps and no overlaps
            assert r.token_offset == cum, (shard, r)
            cum += r.n_tokens
            assert r.first_seq == r.token_offset // 10
            last_token = max(r.token_offset, r.token_offset + r.n_tokens - 1)
            assert r.last_seq == last_token // 10
            assert r.first_seq <= r.last_seq


def test_empty_doc_has_zero_width(spark):
    docs = _docs(spark)
    empty = [r for r in pack_sequences(docs, seq_len=10, n_shards=4).collect()
             if r.n_tokens == 0]
    assert len(empty) == 1
    r = empty[0]
    assert r.first_seq == r.last_seq == r.token_offset // 10


def test_shard_stats_totals(spark):
    docs = _docs(spark)
    manifest = pack_sequences(docs, seq_len=10, n_shards=4)
    stats = {r.shard: r for r in shard_stats(manifest, seq_len=10).collect()}
    agg = defaultdict(lambda: [0, 0])
    for r in manifest.collect():
        agg[r.shard][0] += 1
        agg[r.shard][1] += r.n_tokens
    for shard, (n_docs, n_tokens) in agg.items():
        s = stats[shard]
        assert (s.n_docs, s.n_tokens) == (n_docs, n_tokens)
        assert s.n_sequences == (n_tokens + 9) // 10


def test_manifest_deterministic(spark):
    docs = _docs(spark)
    a = sorted(map(tuple, pack_sequences(docs, seq_len=16, n_shards=3).collect()))
    b = sorted(map(tuple, pack_sequences(docs, seq_len=16, n_shards=3).collect()))
    assert a == b
