"""MinHash signatures + banded LSH keys (vectorized).

The north_star extension path (SURVEY.md §7.2 M5): word-shingle MinHash
signatures, banded the same pigeonhole way as the SimHash path, catching
near-duplicate pairs whose SimHash Hamming distance exceeds the radius
(the F-BORDER fixture family).

Frozen spec:
  shingles   : same tokenizer + width as fingerprint_core (shared kernel
               shingle_hashes_batch — one tokenize pass serves both).
  perm hash i: splitmix64(shingle_hash XOR SEED_i), SEED_i =
               splitmix64(i + 1) — multiply-mix universal-ish family.
  signature  : elementwise min over the document's shingle hashes,
               n_perms values, stored as array<bigint> (uint64 view).
  band key j : splitmix64-fold of signature[j*r : (j+1)*r] XOR j
               (so identical row-slices in different bands collide only
               within the same band index).
  empty docs : signature of all maxuint -> identical for all empty docs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from simhash_text_dedup_spark.fingerprint_core import (
    _splitmix64_np,
    shingle_hashes_batch,
)


def _perm_seeds(n_perms: int) -> np.ndarray:
    return _splitmix64_np(np.arange(1, n_perms + 1, dtype=np.uint64))


MINHASH_CHUNK_DOCS = 1024


def minhash_batch(
    texts: list[str], n_perms: int = 128, width: int = 3
) -> np.ndarray:
    """(n_docs, n_perms) uint64 MinHash signature matrix.

    Processes the batch in doc chunks so the per-chunk shingle array
    stays cache-resident across the 128 permutation passes (same
    many-core contention fix as fingerprint_core.CHUNK_DOCS)."""
    n_docs = len(texts)
    sig = np.full((n_docs, n_perms), np.iinfo(np.uint64).max, dtype=np.uint64)
    seeds = _perm_seeds(n_perms)
    for c0 in range(0, n_docs, MINHASH_CHUNK_DOCS):
        chunk = texts[c0 : c0 + MINHASH_CHUNK_DOCS]
        hashes, docix, _ = shingle_hashes_batch(chunk, width)
        if len(hashes) == 0:
            continue
        # shingle_hashes_batch returns doc-sorted rows
        uniq, starts = np.unique(docix, return_index=True)
        for i in range(n_perms):
            v = _splitmix64_np(hashes ^ seeds[i])
            sig[uniq + c0, i] = np.minimum.reduceat(v, starts)
    return sig


def band_keys_from_sigs(
    sigs: np.ndarray, n_bands: int, n_rows: int
) -> np.ndarray:
    """(n_docs, n_bands) int64 band keys by folding each row-slice."""
    n_docs = sigs.shape[0]
    out = np.empty((n_docs, n_bands), dtype=np.uint64)
    for j in range(n_bands):
        acc = np.full(n_docs, np.uint64(j) + np.uint64(0x9E3779B97F4A7C15), dtype=np.uint64)
        for r in range(n_rows):
            acc = _splitmix64_np(acc ^ sigs[:, j * n_rows + r])
        out[:, j] = acc
    return out.view(np.int64)


def lsh_collision_prob(s: float, n_bands: int, n_rows: int) -> float:
    """P(candidate) for a pair with true signature-Jaccard s under
    (n_bands x n_rows) banding: 1 - (1 - s^r)^b — the classic LSH
    S-curve (Leskovec/Rajaraman/Ullman, MMDS ch.3)."""
    return 1.0 - (1.0 - s ** n_rows) ** n_bands


def plan_minhash_bands(
    threshold: float,
    n_perms: int = 128,
    fp_weight: float = 0.5,
    fn_weight: float = 0.5,
    _steps: int = 1000,
) -> tuple[int, int]:
    """Choose (n_bands, n_rows) for a target Jaccard `threshold`.

    Standard numerical-integration tuning (the method datasketch's
    MinHashLSH uses, public knowledge): over every factorization
    b*r <= n_perms, integrate the S-curve's false-positive area below
    the threshold and false-negative area above it, and take the
    weighted minimum.  Deterministic; midpoint rule with fixed steps.

    DedupConfig pins 32x4 (the reference-parity default); use this to
    re-plan when running at a different `jaccard_threshold`:

        b, r = plan_minhash_bands(cfg.jaccard_threshold, cfg.minhash_perms)
        cfg = dataclasses.replace(cfg, minhash_bands=b, minhash_rows=r)
    """
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    best: tuple[float, int, int] | None = None
    for n_rows in range(1, n_perms + 1):
        # n_bands = n_perms // n_rows >= 1 for every n_rows <= n_perms
        n_bands = n_perms // n_rows
        fp = 0.0
        dx = threshold / _steps
        for k in range(_steps):
            fp += lsh_collision_prob((k + 0.5) * dx, n_bands, n_rows)
        fp *= dx
        fn = 0.0
        dx = (1.0 - threshold) / _steps
        for k in range(_steps):
            s = threshold + (k + 0.5) * dx
            fn += 1.0 - lsh_collision_prob(s, n_bands, n_rows)
        fn *= dx
        err = fp_weight * fp + fn_weight * fn
        if best is None or err < best[0]:
            best = (err, n_bands, n_rows)
    assert best is not None
    return best[1], best[2]


def minhash_udf(n_perms: int = 128, n_bands: int = 32, width: int = 3):
    """pandas UDF: content -> struct(sig array<bigint>, bands array<bigint>)."""
    n_rows = n_perms // n_bands
    schema = T.StructType(
        [
            T.StructField("sig", T.ArrayType(T.LongType()), False),
            T.StructField("bands", T.ArrayType(T.LongType()), False),
        ]
    )

    @F.pandas_udf(schema)
    def _minhash(content: pd.Series) -> pd.DataFrame:
        sigs = minhash_batch(content.fillna("").tolist(), n_perms, width)
        bands = band_keys_from_sigs(sigs, n_bands, n_rows)
        s64 = sigs.view(np.int64)
        return pd.DataFrame(
            {"sig": list(s64), "bands": list(bands)}
        )

    return _minhash
