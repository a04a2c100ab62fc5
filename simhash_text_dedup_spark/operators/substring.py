"""Suffix-array substring check for borderline candidate pairs.

The north rule's third verifier family (next to SimHash Hamming and
MinHash Jaccard): for a candidate pair, how much literal text do the
two documents share?  `pair_lcs` computes the LONGEST COMMON SUBSTRING
via a generalized suffix array over the concatenation a·SEP·b, and
`contained` (LCS == min length) subsumes the doc-inside-doc check.

Vectorized construction (no per-character Python):
  * suffix array by prefix doubling — each round ranks suffixes by the
    (rank[i], rank[i+2^k]) pair with `np.lexsort`, O(n log n) total,
    all numpy;
  * the doubling rounds' rank tables double as a sparse table: LCP of
    any two suffixes resolves by descending powers of two (compare
    rank level k, advance both by 2^k on match) — vectorized over ALL
    adjacent suffix-array pairs at once, O(n log n) instead of
    Kasai's sequential O(n) Python walk;
  * LCS(a, b) = max LCP over adjacent SA entries whose suffixes start
    in different documents (classic generalized-SA argument: the
    maximizing cross pair must be SA-adjacent after restricting to
    cross-document neighbors — we take adjacent pairs in the full SA
    and a separator below every real character keeps matches from
    crossing document boundaries).

This is deliberately an EXACT verifier run per candidate pair on the
(small) candidate set — the corpus-scale pruning is the banded joins'
job; a per-pair O((|a|+|b|) log) scan of the pair set is the same
shape as the reference's per-bucket probe loops.

Reference analog: the borderline "is one page contained in the other"
re-check the reference performs after fingerprint match
(incload/DeDupMapper.java:200-232 verify stage); the reference's C++
fingerprint binary is external, so the substring check here is our
frozen-spec implementation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SEP = 0  # sentinel strictly below every real byte (bytes are 1..256)


def _suffix_array_ranks(s: np.ndarray) -> list[np.ndarray]:
    """Prefix-doubling rank tables for int array `s` (values >= 1).

    Returns [rank_1, rank_2, rank_4, ...]: rank_L[i] is the rank of
    substring s[i:i+L] among all length-L substrings (suffixes padded
    with -1 below everything).  The last level is the full suffix
    ranking (all distinct).  Pure numpy; O(n log n)."""
    n = len(s)
    # initial ranks: by single element (dense)
    rank = np.unique(s, return_inverse=True)[1].astype(np.int64)
    levels = [rank]
    k = 1
    while k < n:
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        pair_prev = np.empty(n, dtype=bool)
        pair_prev[0] = False
        pair_prev[1:] = (rank[order[1:]] == rank[order[:-1]]) & (
            second[order[1:]] == second[order[:-1]]
        )
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[order] = np.cumsum(~pair_prev) - 1
        rank = new_rank
        levels.append(rank)
        if rank.max() == n - 1:
            break  # all suffixes distinct — fully ranked
        k <<= 1
    return levels


def _adjacent_lcp(levels: list[np.ndarray], i: np.ndarray, j: np.ndarray,
                  n: int) -> np.ndarray:
    """LCP(suffix i, suffix j) for index VECTORS i, j, via the rank
    sparse table (descending powers of two)."""
    i = i.copy()
    j = j.copy()
    lcp = np.zeros(len(i), dtype=np.int64)
    for k in range(len(levels) - 1, -1, -1):
        step = 1 << k
        rank = levels[k]
        ok = (
            (i + step <= n)
            & (j + step <= n)
            & (i < n)
            & (j < n)
        )
        # compare rank of length-step blocks at i and j
        ri = np.where(i < n, rank[np.minimum(i, n - 1)], -2)
        rj = np.where(j < n, rank[np.minimum(j, n - 1)], -3)
        match = ok & (ri == rj)
        lcp[match] += step
        i[match] += step
        j[match] += step
    return lcp


def lcs_bytes(a: bytes, b: bytes) -> int:
    """Longest common substring length of two byte strings, by
    generalized suffix array over a·SEP·b (SEP below every byte)."""
    if not a or not b:
        return 0
    la = len(a)
    s = np.empty(la + 1 + len(b), dtype=np.int64)
    s[:la] = np.frombuffer(a, dtype=np.uint8).astype(np.int64) + 1
    s[la] = _SEP
    s[la + 1:] = np.frombuffer(b, dtype=np.uint8).astype(np.int64) + 1
    n = len(s)
    levels = _suffix_array_ranks(s)
    rank = levels[-1]
    sa = np.empty(n, dtype=np.int64)
    sa[rank] = np.arange(n)
    # adjacent pairs whose suffixes start on opposite sides of SEP
    left = sa[:-1]
    right = sa[1:]
    cross = ((left < la) & (right > la)) | ((left > la) & (right < la))
    if not cross.any():
        return 0
    lcp = _adjacent_lcp(levels, left[cross], right[cross], n)
    # the separator (below every byte) guarantees no common substring
    # spans it, so the LCP of a cross pair is a true common substring
    return int(lcp.max())


def edit_distance_pairs(
    candidate_pairs: DataFrame,
    prepared: DataFrame,
    max_dist: int | None = None,
) -> DataFrame:
    """Edit-distance verification for borderline candidate pairs —
    entirely JVM-side (`F.levenshtein` is a built-in codegen
    expression; no Python anywhere).  Returns (a_id, b_id, edit_dist),
    optionally filtered to edit_dist <= max_dist.

    Complements the containment / LCS checks: near-identical documents
    with scattered small edits (high Hamming, high Jaccard, low LCS
    fraction) are exactly the reference's borderline band
    (SURVEY §3.1 verify stage)."""
    contents = prepared.select("doc_id", "content")
    a = contents.select(
        F.col("doc_id").alias("a_id"), F.col("content").alias("a_content")
    )
    b = contents.select(
        F.col("doc_id").alias("b_id"), F.col("content").alias("b_content")
    )
    out = (
        candidate_pairs.select("a_id", "b_id")
        .join(a, "a_id")
        .join(b, "b_id")
        .withColumn(
            "edit_dist",
            F.levenshtein(F.col("a_content"), F.col("b_content")).cast("long"),
        )
        .select("a_id", "b_id", "edit_dist")
    )
    if max_dist is not None:
        out = out.filter(F.col("edit_dist") <= max_dist)
    return out


_LCS_SCHEMA = (
    "a_id long, b_id long, lcs_len long, contained boolean, min_len long"
)


def pair_lcs(candidate_pairs: DataFrame, prepared: DataFrame) -> DataFrame:
    """(a_id, b_id) candidates + (doc_id, content) ->
    (a_id, b_id, lcs_len, contained, min_len): longest common substring
    length per pair, the doc-inside-doc flag (LCS == min length), and
    the shorter document's byte length (denominator for coverage
    thresholds: lcs_len / min_len is the fraction of the smaller doc
    covered by the longest shared block).

    Runs as one Arrow batch pass over the candidate set (mapInPandas);
    the per-pair suffix-array construction is numpy prefix doubling —
    no per-character Python."""
    contents = prepared.select("doc_id", "content")
    a = contents.select(
        F.col("doc_id").alias("a_id"), F.col("content").alias("a_content")
    )
    b = contents.select(
        F.col("doc_id").alias("b_id"), F.col("content").alias("b_content")
    )
    joined = candidate_pairs.select("a_id", "b_id").join(a, "a_id").join(b, "b_id")

    def _scan(it):
        for pdf in it:
            av = pdf["a_content"].to_numpy()
            bv = pdf["b_content"].to_numpy()
            lcs = np.empty(len(pdf), dtype=np.int64)
            contained = np.empty(len(pdf), dtype=bool)
            min_len = np.empty(len(pdf), dtype=np.int64)
            for idx in range(len(pdf)):
                ab = av[idx].encode("utf-8", "surrogatepass")
                bb = bv[idx].encode("utf-8", "surrogatepass")
                m = lcs_bytes(ab, bb)
                lcs[idx] = m
                min_len[idx] = min(len(ab), len(bb))
                contained[idx] = m == min_len[idx] and m > 0
            out = pdf[["a_id", "b_id"]].copy()
            out["lcs_len"] = lcs
            out["contained"] = contained
            out["min_len"] = min_len
            yield out

    return joined.mapInPandas(_scan, schema=_LCS_SCHEMA)


def substring_verified_pairs(
    candidate_pairs: DataFrame,
    prepared: DataFrame,
    lcs_ratio: float,
) -> DataFrame:
    """The pipeline-facing substring verifier (SURVEY §7 M5: the
    suffix-array check "feeds the same pair-verification stage" as the
    Hamming and MinHash verifiers): keep a candidate pair when the
    longest common substring covers >= lcs_ratio of the shorter
    document.  contained (ratio 1.0) is the strictest special case.
    Returns (a_id, b_id, lcs_fraction, kind='substring')."""
    scanned = pair_lcs(candidate_pairs, prepared)
    frac = F.col("lcs_len") / F.greatest(F.col("min_len"), F.lit(1))
    return (
        scanned.withColumn("lcs_fraction", frac)
        .filter(
            (F.col("lcs_len") > 0) & (F.col("lcs_fraction") >= F.lit(lcs_ratio))
        )
        .select("a_id", "b_id", "lcs_fraction", F.lit("substring").alias("kind"))
    )
