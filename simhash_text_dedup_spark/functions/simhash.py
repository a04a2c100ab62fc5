"""Spark column functions for SimHash fingerprinting and banding.

The fingerprint is computed by an Arrow-vectorized pandas UDF over the
numpy kernel in fingerprint_core (no per-row Python in the hot path —
BASELINE input_hint requirement).  Band keys and Hamming distance stay
JVM-side as built-in expressions (whole-stage codegen):

  band key  = shiftrightunsigned(fp, 48 - 16*i) & 0xFFFF
              (reference byte-permutation layout,
               incload/DeDupMapper.java:169-184, MemTable.java:193-206)
  hamming   = bit_count(a ^ b)
              (reference Kernighan-loop popcount,
               incload/DeDupMapper.java:262-280)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from simhash_text_dedup_spark.fingerprint_core import simhash_batch


def simhash_udf(width: int = 3, chunk: int = 2048):
    """pandas UDF: content string -> int64 SimHash.

    Processes the Arrow batch in fixed-size chunks: bounding the live
    token/shingle working set keeps each worker cache-friendly — with
    32 concurrent workers, monolithic multi-thousand-doc batches degrade
    superlinearly from memory contention (measured 4-5x)."""
    import numpy as np

    @F.pandas_udf(T.LongType())
    def _simhash(content: pd.Series) -> pd.Series:
        # accepts string OR binary input (callers pass encode(content,
        # 'UTF-8') so utf-8 bytes ship through Arrow and the kernel
        # skips a per-doc Python encode copy)
        texts = content.fillna(b"" if len(content) and isinstance(
            content.iloc[0], (bytes, bytearray)) else "").tolist()
        outs = [
            simhash_batch(texts[i : i + chunk], width=width)
            for i in range(0, len(texts), chunk)
        ]
        vals = np.concatenate(outs) if outs else np.empty(0, dtype=np.int64)
        return pd.Series(vals)

    return _simhash


def simhash_col(content, width: int = 3) -> F.Column:
    """SimHash column over a string content column: encodes to utf-8
    JVM-side (binary through Arrow) and applies the vectorized UDF."""
    return simhash_udf(width)(F.encode(content, "UTF-8"))


def band_key(fp: Column, band: int, n_bands: int = 4, band_bits: int = 16) -> Column:
    """Band `band`'s key as an int column (JVM-side bit ops)."""
    shift = n_bands * band_bits - band_bits * (band + 1)
    mask = (1 << band_bits) - 1
    return F.shiftrightunsigned(fp, shift).bitwiseAND(F.lit(mask)).cast("int")


def band_entries(fp: Column, n_bands: int = 4, band_bits: int = 16) -> Column:
    """array<struct<band:int, band_key:int>> for explode()."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                band_key(fp, i, n_bands, band_bits).alias("band_key"),
            )
            for i in range(n_bands)
        ]
    )


def hamming_col(a: Column, b: Column) -> Column:
    """popcount(a XOR b) via the built-in bit_count (codegen'd)."""
    return F.bit_count(a.bitwiseXOR(b))
