"""Broadcast Bloom pre-filter for exact-duplicate membership checks.

At corpus scale, the per-round "is this digest already loaded?" check
is a join that shuffles the new batch against the full corpus digest
table.  A Bloom filter built ONCE over the corpus digests and
broadcast to the executors turns that into a map-side reject: only
the maybe-duplicate sliver of the batch reaches the verification
join.  False positives are resolved by the exact join; false
negatives cannot occur, so the pre-filter is recall-lossless.

This is the digest analog of the reference's in-heap memtable probe
(incload/MemTable.java — every scanned row probes a loaded structure
before any data motion happens); Spark's own runtime bloom join
(spark.sql.optimizer.runtime.bloomFilter.enabled) does the same thing
opportunistically, but its hash family is engine-internal — this
operator's family is FROZEN so results are reproducible and
SQL-twin-verifiable.

Frozen spec:
  digest      : any 64-bit column (content sha256-prefix, md5-prefix
                fingerprint, xxhash64 docid), viewed as uint64.
  position i  : splitmix64(digest XOR seed_i) mod m,
                seed_i = splitmix64(BLOOM_SALT + i), i in [0, k).
  word layout : m/64 little-endian 64-bit words; bit p lives in
                word p >> 6 at bit p & 63.

Scale bounds (honest): the broadcast bitmap costs m/8 bytes on the
driver and each executor — at 10 bits/key that covers corpora up to
~10^9-10^10 digests (0.1-1 GiB more than comfortably).  At 10^12
keys a single bitmap does not fit; shard the corpus by digest range
and build one bloom per shard (the probe side routes each row to its
shard's filter), or fall back to the exact join and let AQE handle
it.  m must be a power of two.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simhash_text_dedup_spark.fingerprint_core import _splitmix64_np

BLOOM_SALT = 1000003


def _seeds(k: int) -> np.ndarray:
    return _splitmix64_np(np.arange(BLOOM_SALT, BLOOM_SALT + k, dtype=np.uint64))


def _positions_np(vals_u64: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) uint64 bit positions for each digest."""
    out = np.empty((len(vals_u64), k), dtype=np.uint64)
    for i, s in enumerate(_seeds(k)):
        out[:, i] = _splitmix64_np(vals_u64 ^ s) & np.uint64(m_bits - 1)
    return out


def bloom_positions_udf(m_bits: int, k: int):
    """Arrow-batched pandas UDF: signed-long digest -> array<long> of
    the k bit positions.  splitmix64 needs wrapping 64-bit multiplies,
    which Spark 4's ANSI longs refuse — the numpy uint64 kernel
    (_positions_np) is the single source of truth for BOTH the build
    and probe sides, so they cannot drift."""

    @F.pandas_udf("array<long>")
    def _pos(vals: pd.Series) -> pd.Series:
        u = vals.to_numpy(dtype=np.int64).view(np.uint64)
        pos = _positions_np(u, m_bits, k).view(np.int64)
        return pd.Series(list(pos))

    return _pos


def build_bloom_words(df: DataFrame, digest_col: str, m_bits: int, k: int) -> np.ndarray:
    """Distributed build: explode the k positions per digest, fold into
    m/64 words via a groupBy-bit_or (map-side combined), collect the
    sparse word list (<= m/64 rows — bounded by the FILTER size, not
    the corpus).  Returns the dense uint64 word array."""
    assert m_bits & (m_bits - 1) == 0, "m_bits must be a power of two"
    pos_udf = bloom_positions_udf(m_bits, k)
    words = (
        df.select(F.explode(pos_udf(F.col(digest_col))).alias("pos"))
        .distinct()
        .select(
            F.shiftrightunsigned("pos", 6).alias("word_idx"),
            F.expr("shiftleft(1L, CAST(pos & 63 AS INT))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(mask)").alias("word"))
        .collect()
    )
    out = np.zeros(m_bits // 64, dtype=np.uint64)
    for r in words:
        out[r.word_idx] = np.uint64(np.int64(r.word))
    return out


def bloom_maybe_contains(
    df: DataFrame, digest_col: str, words: np.ndarray, m_bits: int, k: int,
    flag_col: str = "maybe_dup",
) -> DataFrame:
    """Map-side membership probe: Arrow-batched pandas UDF testing all
    k bits against the broadcast word array — no shuffle, no join."""
    sc = df.sparkSession.sparkContext
    bwords = sc.broadcast(words)

    @F.pandas_udf("boolean")
    def _probe(vals: pd.Series) -> pd.Series:
        w = bwords.value
        u = vals.to_numpy(dtype=np.int64).view(np.uint64)
        pos = _positions_np(u, m_bits, k)
        hit = np.ones(len(u), dtype=bool)
        for i in range(k):
            p = pos[:, i]
            bits = (w[(p >> np.uint64(6)).astype(np.int64)]
                    >> (p & np.uint64(63))) & np.uint64(1)
            hit &= bits.astype(bool)
        return pd.Series(hit)

    return df.withColumn(flag_col, _probe(F.col(digest_col)))


def bloom_prefilter(
    new_df: DataFrame,
    corpus_df: DataFrame,
    digest_col: str,
    m_bits: int = 1 << 27,
    k: int = 4,
) -> DataFrame:
    """new_df + (maybe_dup, is_dup): maybe_dup from the broadcast bloom
    over corpus_df's digests (map-side, recall-lossless), is_dup from
    the exact verification join run ONLY over the maybe_dup sliver —
    the join's probe side shrinks from |batch| to |true dups| +
    |false positives| before any shuffle happens."""
    words = build_bloom_words(corpus_df, digest_col, m_bits, k)
    flagged = bloom_maybe_contains(new_df, digest_col, words, m_bits, k)
    # digest-level verification: only maybe_dup digests (true dups +
    # bloom false positives) reach the corpus join
    confirmed = (
        flagged.filter(F.col("maybe_dup")).select(digest_col).distinct()
        .join(corpus_df.select(digest_col).distinct(), digest_col, "left_semi")
        .withColumn("is_dup", F.lit(True))
    )
    return flagged.join(confirmed, digest_col, "left").withColumn(
        "is_dup", F.coalesce("is_dup", F.lit(False))
    )
