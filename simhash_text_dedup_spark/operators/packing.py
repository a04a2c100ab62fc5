"""Sequence-packing manifest: map documents into fixed-length training
sequences.

The standard LM pre-training layout (GPT-2/3 onward): the corpus is
concatenated in a deterministic order and cut into fixed ``seq_len``
token windows; a document therefore lands at a byte/token interval that
may span sequence boundaries.  This operator computes that mapping as a
MANIFEST — (doc, shard, token offset, first/last sequence index) —
without materializing a single token: the actual tokenization can then
run embarrassingly parallel per shard with every worker knowing exactly
where its documents land.

Spark-first shape (the 100-TB consideration): a single global
concatenation order would serialize into one window partition, so the
corpus is first split into ``n_shards`` deterministic hash shards
(portable MD5-prefix fingerprint — the same engine-exact key
doc_fingerprint_md5 uses); each shard is packed independently with a
per-shard running token sum (one window over the shard key the
exchange provides anyway).  Sequence indices are shard-local; a
training job reads shard s sequence t.  Everything is integer
arithmetic on token counts — engine-exact, DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from simhash_text_dedup_spark.functions.text import (
    _idiv,
    doc_fingerprint_md5,
    token_count,
)


def pack_sequences(
    docs: DataFrame,
    *,
    seq_len: int = 2048,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, shard, n_tokens, token_offset, first_seq, last_seq):
    the packing manifest.  Within its shard's deterministic
    concatenation order (fingerprint, doc_id), a document occupies
    tokens [token_offset, token_offset + n_tokens) and therefore
    sequences [first_seq, last_seq] (shard-local indices; empty
    documents carry first_seq == last_seq == the sequence their offset
    falls in)."""
    fp = doc_fingerprint_md5(F.col(text_col))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        token_count(F.col(text_col)).alias("n_tokens"),
        F.pmod(fp, F.lit(int(n_shards))).cast("bigint").alias("shard"),
        fp.alias("_fp"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("_fp", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sl = F.lit(int(seq_len))
    return (
        base.withColumn("_cum", F.sum("n_tokens").over(w))
        .withColumn("token_offset", (F.col("_cum") - F.col("n_tokens")))
        .select(
            "doc_id",
            "shard",
            "n_tokens",
            F.col("token_offset").cast("bigint").alias("token_offset"),
            # _idiv, not floor(/): double division drifts at 2^53 and
            # cross-engine; integer arithmetic is exact everywhere
            _idiv(F.col("token_offset").cast("bigint"), sl).alias("first_seq"),
            _idiv(
                F.greatest(
                    F.col("token_offset"), F.col("_cum") - F.lit(1)
                ).cast("bigint"),
                sl,
            ).alias("last_seq"),
        )
    )


def shard_stats(manifest: DataFrame, *, seq_len: int = 2048) -> DataFrame:
    """(shard, n_docs, n_tokens, n_sequences): per-shard packing
    summary; n_sequences = ceil(total tokens / seq_len) (exact integer
    arithmetic)."""
    return manifest.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        _idiv(
            (F.sum("n_tokens") + F.lit(int(seq_len) - 1)).cast("bigint"),
            F.lit(int(seq_len)),
        ).alias("n_sequences"),
    )
