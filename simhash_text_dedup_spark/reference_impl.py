"""Faithful single-process re-implementation of the reference dedup
algorithm — the golden oracle for recall/parity tests (BASELINE.md:
"pair set vs golden pairs computed by a faithful single-process
re-implementation of the reference algorithm").

Mirrors the Java reference structurally (pure Python, no Spark):

  * 4 permuted prefix tables, 2^16 buckets each, keyed by a 16-bit
    prefix of the permuted fingerprint
        (incload/MemTable.java:30-36,154-212)
  * permutation i = move byte pair [2i, 2i+2) of the big-endian 8-byte
    fingerprint to the front; prefix = that pair, suffix = the remaining
    48 bits in original order
        (incload/DeDupMapper.java:169-184, MemTable.java:193-206)
  * probe: exact prefix match, then popcount(suffix XOR) <= 3
        (incload/DeDupMapper.java:186-232,262-280)
  * spam kill first: fingerprints occurring more than `threshold` times
    keep only their first occurrence (scan order = doc_id asc)
        (incload/SpamPageGenerate.java:61-95, threshold :78)
  * candidate-set dedupe per probing row and pair-direction rule
        (incload/DeDupMapper.java:185,212-226)
  * selection: global greedy by score desc — winner kills loser unless
    the winner is already dead; loser -> delete if new, modify if loaded
        (incload/SelectLogicMapper.java:36-47,
         incload/SelectLogicReducer.java:56-104, SelectLogic.java:104-130)
  * clustering golden: connected components over the verified pair set,
    cluster id = min doc_id (the rebuild's documented semantics).

This module intentionally favors clarity over speed; it is test-only.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field


def _popcount(x: int) -> int:
    return bin(x).count("1")


def _bands(fp_u64: int, n_bands: int = 4, band_bits: int = 16) -> list[int]:
    total = n_bands * band_bits
    return [
        (fp_u64 >> (total - band_bits * (i + 1))) & ((1 << band_bits) - 1)
        for i in range(n_bands)
    ]


@dataclass
class Doc:
    doc_id: int
    fingerprint: int  # signed or unsigned; normalized internally
    score: float = 0.0
    is_new: bool = True

    @property
    def fp_u64(self) -> int:
        return self.fingerprint & 0xFFFFFFFFFFFFFFFF


@dataclass
class RefResult:
    spam_kills: list[tuple[int, int]] = field(default_factory=list)  # (doc, ref)
    pairs: set[tuple[int, int]] = field(default_factory=set)  # a < b
    clusters: dict[int, int] = field(default_factory=dict)  # doc -> cluster
    actions: dict[int, str] = field(default_factory=dict)  # doc -> action


def reference_dedup(
    docs: list[Doc],
    hamming_k: int = 3,
    n_bands: int = 4,
    band_bits: int = 16,
    spam_threshold: int = 1000,
    selection: str = "cc",
) -> RefResult:
    res = RefResult()
    docs = sorted(docs, key=lambda d: d.doc_id)

    # --- spam kill (SpamPageGenerate.java:61-95)
    by_fp: dict[int, list[Doc]] = defaultdict(list)
    for d in docs:
        by_fp[d.fp_u64].append(d)
    survivors: list[Doc] = []
    for fp, group in by_fp.items():
        if len(group) > spam_threshold:
            keep = group[0]  # first occurrence always kept
            survivors.append(keep)
            res.spam_kills.extend((g.doc_id, keep.doc_id) for g in group[1:])
        else:
            survivors.extend(group)
    survivors.sort(key=lambda d: d.doc_id)

    # --- prefix tables over ALL survivors (full self-dedup mode; the
    # incremental new-vs-old variant restricts the probe side)
    tables: list[dict[int, list[Doc]]] = [defaultdict(list) for _ in range(n_bands)]
    for d in survivors:
        for i, key in enumerate(_bands(d.fp_u64, n_bands, band_bits)):
            tables[i][key].append(d)

    # --- probe (DeDupMapper.java:186-232): per row, per table, bucket
    # scan with suffix-Hamming check; per-row candidate set dedupe
    for d in survivors:
        seen: set[int] = set()
        for i, key in enumerate(_bands(d.fp_u64, n_bands, band_bits)):
            for cand in tables[i].get(key, ()):
                if cand.doc_id == d.doc_id or cand.doc_id in seen:
                    continue
                # prefix already equal; full-fp popcount == suffix popcount
                if _popcount(d.fp_u64 ^ cand.fp_u64) <= hamming_k:
                    seen.add(cand.doc_id)
                    a, b = sorted((d.doc_id, cand.doc_id))
                    res.pairs.add((a, b))

    # --- connected components (min-id label)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo

    for a, b in res.pairs:
        union(a, b)
    by_id = {d.doc_id: d for d in survivors}
    for d in survivors:
        res.clusters[d.doc_id] = find(d.doc_id)

    # --- selection
    comp_members: dict[int, list[int]] = defaultdict(list)
    for doc, c in res.clusters.items():
        comp_members[c].append(doc)

    if selection == "cc":
        for c, members in comp_members.items():
            rep = max(members, key=lambda m: (by_id[m].score, -m))
            for m in members:
                if m == rep:
                    res.actions[m] = "keep"
                else:
                    res.actions[m] = "delete" if by_id[m].is_new else "modify"
    else:  # greedy (SelectLogicReducer.java:56-104)
        oriented = []
        for a, b in res.pairs:
            da, db = by_id[a], by_id[b]
            if (db.score, -b) > (da.score, -a):
                da, db = db, da
            oriented.append((da.score, da.doc_id, db.doc_id))
        oriented.sort(key=lambda r: (-r[0], r[1], r[2]))
        dead: set[int] = set()
        for _, winner, loser in oriented:
            if winner in dead:
                continue
            dead.add(loser)
        for d in survivors:
            if d.doc_id in dead:
                res.actions[d.doc_id] = "delete" if d.is_new else "modify"
            else:
                res.actions[d.doc_id] = "keep"

    return res
