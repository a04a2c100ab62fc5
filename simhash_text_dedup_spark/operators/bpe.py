"""Distributed BPE merge learning (Sennrich et al. 2016, arXiv:1508.07909).

The tokenizer-training step a training-data pipeline runs after
curation: learn the byte-pair-encoding merge table from the corpus.
`operators/vocab.py top_ngrams` is the counting pass; this is the
iterative merge learner on top of it.

Scale design (the part that matters at 100 TB):

* ONE corpus-sized aggregation reduces the corpus to a ``(word, cnt)``
  table — the only shuffle whose cost scales with corpus bytes.  The
  merge loop then runs entirely on that word table, bounded by the
  number of DISTINCT words (10^7-10^8 at web scale), independent of
  corpus size — the same two-phase shape industrial trainers use
  (HuggingFace tokenizers, SentencePiece both aggregate word counts
  first).
* The merge loop itself runs on the DRIVER whenever the word table
  fits (it essentially always does: unique words are 10^7-10^8 even at
  web scale, orders of magnitude below the corpus).  ``_driver_bpe``
  is an incremental learner — pair counts are maintained under a lazy
  max-heap and only the words containing the merged pair are touched
  per iteration — the same two-phase collect-then-loop shape
  HF-tokenizers/SentencePiece use, so a 30k-100k-merge production
  vocabulary costs ONE Spark job (the word-count shuffle) plus an
  in-process loop, not 2 scheduler round-trips per merge.
* Above ``driver_max_words`` the distributed loop takes over: weighted
  adjacent-pair count (map-side-combinable groupBy over exploded
  symbol pairs), a ONE-row argmax collect, and an Arrow-batched merge
  application over the symbol arrays, localCheckpoint-ed every few
  iterations so the plan stays shallow.
* Both paths break ties (pair_count DESC, left_sym ASC, right_sym ASC)
  so the merge sequence is total-ordered and engine/partition-portable
  — pinned equal to each other and to ``spec_bpe`` in tests.

The merge-application walk is per-word Python inside the Arrow batch —
vocabulary-bounded, not corpus-bounded, which is why it is acceptable
here and nowhere else in the repo's hot paths.

Verification: the iteration-0 pair counter is DuckDB-expressible and
hash-verified (`bpe_pair_counts`); the loop itself is pinned against a
pure-Python executable spec (`spec_bpe`, exact merge-sequence equality)
— the production-twin methodology from ARCHITECTURE.md.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# GPT-2-family pre-tokenizer restricted to a dialect Java regex and RE2
# agree on: letter runs / digit runs / single non-space punctuation
# (the same pattern as __spark_entry__'s token_count_bpe twin).
PRETOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0b\f\r]"

EOW = "</w>"

MERGES_SCHEMA = (
    "rank bigint, left_sym string, right_sym string, "
    "merged string, pair_count bigint"
)


def word_counts(
    docs: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """(word, cnt): corpus-wide occurrence counts of pre-tokens — the
    single corpus-sized aggregation."""
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all(
                    F.col(text_col), F.lit(PRETOKEN_RE), F.lit(0)
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _init_syms_udf():
    # built lazily: decorating at import time parses the DDL return
    # type, which needs an active SparkSession
    @F.pandas_udf("array<string>")
    def init_syms(words: pd.Series) -> pd.Series:
        return words.map(lambda w: list(w) + [EOW])

    return init_syms


def initial_symbols(words: DataFrame) -> DataFrame:
    """(symbols, cnt): each word split into characters + the
    end-of-word marker."""
    return words.select(
        _init_syms_udf()(F.col("word")).alias("symbols"), "cnt"
    )


def pair_counts(syms: DataFrame) -> DataFrame:
    """(left_sym, right_sym, pair_count): weighted adjacent-symbol pair
    counts over the word table — the per-iteration workhorse."""
    n = F.size(F.col("symbols"))
    pairs = syms.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("symbols"), F.lit(1), n - 1),
                F.slice(F.col("symbols"), F.lit(2), n - 1),
                lambda l, r: F.struct(
                    l.alias("left_sym"), r.alias("right_sym")
                ),
            )
        ).alias("p"),
        "cnt",
    )
    return pairs.groupBy("p.left_sym", "p.right_sym").agg(
        F.sum("cnt").alias("pair_count")
    )


def _merge_applier(left: str, right: str):
    """Factory (NOT an inline closure in a transform — CLAUDE.md rule
    10) for the greedy left-to-right merge walk over one Arrow batch."""
    merged = left + right

    @F.pandas_udf("array<string>")
    def apply_merge(col: pd.Series) -> pd.Series:
        def walk(syms):
            out = []
            i, n = 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            return out

        return col.map(walk)

    return apply_merge


def _walk_merge(syms: list, left: str, right: str, merged: str) -> list:
    """Greedy left-to-right application of one merge to one word."""
    out, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _driver_bpe(
    word_cnt: dict, n_merges: int, min_pair_count: int = 2
) -> list[tuple]:
    """In-process incremental merge loop over a collected (word, cnt)
    table — semantically identical to ``spec_bpe`` (same counts, same
    tie-break, same greedy walk; pinned equal in tests) but O(affected
    words) per merge instead of O(vocabulary):

    * ``cur`` holds live pair counts; a lazy max-heap keyed
      (-count, left, right) realises the (DESC, ASC, ASC) argmax —
      stale entries (count changed since push) are discarded on pop.
    * ``where`` maps pair -> word indices that have EVER contained it;
      a word that since lost the pair contributes a zero delta and is
      skipped, so staleness costs a scan, never correctness.
    * Applying a merge re-diffs only the touched words' adjacent-pair
      multisets; every changed count is re-pushed.
    """
    import heapq

    syms_of: list[list] = []
    cnt_of: list[int] = []
    cur: Counter = Counter()
    where: dict = {}
    for w, c in word_cnt.items():
        syms = list(w) + [EOW]
        i = len(syms_of)
        syms_of.append(syms)
        cnt_of.append(int(c))
        for p in zip(syms, syms[1:]):
            cur[p] += c
            where.setdefault(p, set()).add(i)
    heap = [(-c, p[0], p[1]) for p, c in cur.items()]
    heapq.heapify(heap)
    merges: list[tuple] = []
    for rank in range(n_merges):
        best = None
        while heap:
            negc, l, r = heap[0]
            if cur.get((l, r), 0) == -negc:
                best = (l, r, -negc)
                break
            heapq.heappop(heap)  # stale
        if best is None or best[2] < min_pair_count:
            break
        l, r, c = best
        heapq.heappop(heap)
        merged = l + r
        merges.append((rank, l, r, merged, c))
        for i in where.pop((l, r), ()):
            syms = syms_of[i]
            if not any(
                a == l and b == r for a, b in zip(syms, syms[1:])
            ):
                continue  # stale index entry: pair since merged away
            cw = cnt_of[i]
            old = Counter(zip(syms, syms[1:]))
            new_syms = _walk_merge(syms, l, r, merged)
            new = Counter(zip(new_syms, new_syms[1:]))
            syms_of[i] = new_syms
            for p in old.keys() | new.keys():
                d = new.get(p, 0) - old.get(p, 0)
                if d == 0:
                    continue
                nc = cur.get(p, 0) + d * cw
                if nc <= 0:
                    cur.pop(p, None)
                    continue
                cur[p] = nc
                if d > 0:
                    where.setdefault(p, set()).add(i)
                heapq.heappush(heap, (-nc, p[0], p[1]))
        cur.pop((l, r), None)
    return merges


def learn_bpe(
    docs: DataFrame,
    *,
    n_merges: int = 50,
    min_pair_count: int = 2,
    text_col: str = "text",
    checkpoint_every: int = 4,
    driver_max_words: int = 2_000_000,
) -> DataFrame:
    """(rank, left_sym, right_sym, merged, pair_count): the learned
    merge table, rank = learning order.  Stops early when no pair
    reaches ``min_pair_count``.

    Path selection: after the single corpus-sized word-count shuffle,
    if the distinct-word table has at most ``driver_max_words`` rows
    it is collected once (Arrow) and the merge loop runs in-process
    (``_driver_bpe``) — one Spark job total regardless of n_merges.
    Pass ``driver_max_words=0`` to force the distributed loop (used by
    the parity tests; otherwise only an oversized vocabulary routes
    there).

    Distributed-path lineage/storage discipline: the symbol table is
    eagerly localCheckpoint-ed every ``checkpoint_every`` iterations,
    so the live plan never grows beyond that many pandas stages and at
    most ONE superseded checkpoint copy exists at a time — the
    previous copy's py4j reference is dropped and gc.collect() runs so
    Spark's ContextCleaner unpersists its blocks promptly instead of
    whenever Python GC happens to fire (a 10^4-merge run would
    otherwise pile up thousands of vocabulary-sized block sets)."""
    import gc

    spark = docs.sparkSession
    wc = word_counts(docs, text_col=text_col)
    if driver_max_words:
        # limit(N+1) bounds the transfer: N+1 rows back means the
        # vocabulary exceeds the driver budget -> distributed loop
        head = wc.limit(driver_max_words + 1).toPandas()
        if len(head) <= driver_max_words:
            word_cnt = dict(
                zip(head["word"].tolist(), head["cnt"].tolist())
            )
            return spark.createDataFrame(
                _driver_bpe(word_cnt, n_merges, min_pair_count),
                MERGES_SCHEMA,
            )
    syms = initial_symbols(wc)
    syms = syms.localCheckpoint(eager=True)
    records: list[tuple] = []
    for rank in range(n_merges):
        top = (
            pair_counts(syms)
            .orderBy(
                F.col("pair_count").desc(), "left_sym", "right_sym"
            )
            .limit(1)
            .collect()
        )
        if not top or top[0]["pair_count"] < min_pair_count:
            break
        l, r, c = (
            top[0]["left_sym"],
            top[0]["right_sym"],
            int(top[0]["pair_count"]),
        )
        records.append((rank, l, r, l + r, c))
        syms = syms.select(
            _merge_applier(l, r)(F.col("symbols")).alias("symbols"),
            "cnt",
        )
        if (rank + 1) % checkpoint_every == 0:
            syms = syms.localCheckpoint(eager=True)
            gc.collect()  # release the superseded checkpoint's blocks
    return spark.createDataFrame(records, MERGES_SCHEMA)


def bpe_tokenize(
    docs: DataFrame,
    merges: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_bpe_tokens): token count of each document under a
    learned merge table — the REAL token count a sequence-packing or
    data-mixing step should budget with (whitespace counts over-count
    code 2-4x).

    The merge table is collected to the driver (n_merges rows, tiny by
    construction) and shipped in the UDF closure; segmentation is
    memoized PER WORD inside each Arrow batch, so the per-doc cost is
    a dict lookup for all but the first occurrence of a word — the
    same word-level memoization HF's fast tokenizers use."""
    rows = [
        (r["left_sym"], r["right_sym"], r["merged"])
        for r in merges.orderBy("rank").collect()
    ]

    @F.pandas_udf("bigint")
    def count_tokens(texts: pd.Series) -> pd.Series:
        pat = __import__("re").compile(PRETOKEN_RE)
        memo: dict[str, int] = {}

        def word_len(w: str) -> int:
            n = memo.get(w)
            if n is None:
                syms = list(w) + [EOW]
                for l, r, m in rows:
                    out, i, k = [], 0, len(syms)
                    while i < k:
                        if (
                            i + 1 < k
                            and syms[i] == l
                            and syms[i + 1] == r
                        ):
                            out.append(m)
                            i += 2
                        else:
                            out.append(syms[i])
                            i += 1
                    syms = out
                n = memo[w] = len(syms)
            return n

        return texts.map(
            lambda t: sum(word_len(w) for w in pat.findall(t or ""))
        )

    return docs.select(
        F.col(id_col).alias("doc_id"),
        count_tokens(F.col(text_col)).alias("n_bpe_tokens"),
    )


# ---------------------------------------------------------------- spec


def spec_bpe(
    word_cnt: dict[str, int], n_merges: int, min_pair_count: int = 2
) -> list[tuple[int, str, str, str, int]]:
    """Pure-Python executable spec of learn_bpe (single-process golden
    twin for tests): identical counting, tie-break, and greedy
    left-to-right application semantics."""
    vocab = {w: list(w) + [EOW] for w in word_cnt}
    merges = []
    for rank in range(n_merges):
        counts: Counter = Counter()
        for w, syms in vocab.items():
            c = word_cnt[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), c = best
        if c < min_pair_count:
            break
        merges.append((rank, l, r, l + r, c))
        for w, syms in vocab.items():
            out, i, n = [], 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def spec_segment(word: str, merges: list[tuple]) -> list[str]:
    """Apply a learned merge table to one word (spec-side segmenter)."""
    syms = list(word) + [EOW]
    for _, l, r, m, _ in merges:
        out, i, n = [], 0, len(syms)
        while i < n:
            if i + 1 < n and syms[i] == l and syms[i + 1] == r:
                out.append(m)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms
