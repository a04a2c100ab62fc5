"""Pre-banded, bucketed corpus fingerprint layout — the write-once
join accelerator for incremental rounds, with INCREMENTAL MAINTENANCE.

At 10^12 files the dominant RECURRING cost of an incremental round is
the corpus side of the band join (plans/incremental.candidate_pairs):
every round re-explodes the full fingerprint table into band rows and
re-SHUFFLES them on the band key, even though both are write-once
computations — a fingerprint's band rows never change, and the
shuffle layout can be baked into storage.

Layout for a corpus table `T` (all Spark saved tables):

  T               cold banded rows, bucketBy(bkey) + sortBy — the
                  co-located join side (zero Exchange per round)
  T__hot          banded rows of HOT band buckets (> band_bucket_cap
                  rows at classification time), plain parquet: these
                  leave the co-located read and go through a salted
                  exchange sub-join (one hot bucket would otherwise
                  serialize into a single co-located task)
  T__stats        per-bkey row counts (bounded by the key space,
                  n_bands << band_bits rows): drives hot/cold
                  classification, the newly-hot warning, and the
                  cheap row-count drift check against `base`
  T__tombstones   doc_ids of superseded (re-crawled) corpus rows:
                  bucketed parquet cannot delete in place, so stale
                  rows are masked with a broadcast anti-join and
                  physically dropped at the next full rewrite
                  ("compaction" = write_banded_corpus again).  Real
                  Iceberg swaps this for MERGE row deletes.

  * `write_banded_corpus` explodes (doc_id, entity_id, fingerprint,
    score) into rows keyed by the FUSED band key
    (bkey = band << band_bits | band_key — one join column, so the
    bucket spec matches the join key exactly).  Runs once per corpus
    bootstrap or compaction, not once per round.
  * `append_banded_corpus` maintains the layout per committed batch:
    only the NEW batch's rows are exploded, classified against the
    current stats, and appended (bucketed append shuffles the batch,
    never the corpus); superseded rows become tombstones.  This is
    the write-once analog of the per-round MemTable rebuild the
    reference performs from scratch every round
    (incload/MemTable.java:80-212).
  * `candidate_pairs_banded` reproduces candidate_pairs' exact pair
    domain — new x new emitted once, new x live-old always, old x old
    never, each pair only in its first matching band — with the cold
    corpus side read co-located (NO Exchange; the only shuffle moves
    the small NEW batch) and hot buckets routed through the salted
    sub-join (same recipe as operators/pairs.near_pairs).

Hot/cold routing is a pure PERFORMANCE split: each corpus row lives in
exactly one of T / T__hot, the join unions both sides, and the
first-matching-band predicate is routing-independent fingerprint
arithmetic — so a bucket drifting hot after appends (warned via
T__stats) degrades one task's balance, never correctness.

Storage cost: n_bands rows of ~40 bytes per document — ~160 B/doc at
the frozen 4-band spec, negligible next to content.
"""

from __future__ import annotations

import warnings

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from simhash_text_dedup_spark.config import DedupConfig
from simhash_text_dedup_spark.functions.simhash import band_key, hamming_col
from simhash_text_dedup_spark.sources.io import write_bucketed_table

_BANDED_SCHEMA = (
    "doc_id long, entity_id long, fingerprint long, score double, bkey int"
)


def fused_band_keys(fp: Column, cfg: DedupConfig) -> Column:
    """array<int> of band << band_bits | band_key — one fused join
    column per band (bucket spec == join key)."""
    return F.array(
        *[
            (
                F.lit(i << cfg.band_bits)
                + band_key(fp, i, cfg.n_bands, cfg.band_bits)
            ).cast("int")
            for i in range(cfg.n_bands)
        ]
    )


def _explode_banded(base_fps: DataFrame, cfg: DedupConfig) -> DataFrame:
    return base_fps.select(
        "doc_id",
        "entity_id",
        "fingerprint",
        "score",
        F.explode(fused_band_keys(F.col("fingerprint"), cfg)).alias("bkey"),
    )


def _hot_keys(spark: SparkSession, table: str, cfg: DedupConfig) -> DataFrame:
    """(bkey) frame of currently-hot band buckets — bounded by the key
    space (n_bands << band_bits), read from the tiny stats table."""
    return (
        spark.table(f"{table}__stats")
        .filter(F.col("n") > cfg.band_bucket_cap)
        .select("bkey")
    )


def write_banded_corpus(
    base_fps: DataFrame,
    table: str,
    cfg: DedupConfig = DedupConfig(),
    n_buckets: int = 64,
) -> None:
    """Bootstrap (or compact) the banded layout: explode the corpus
    fingerprint table (doc_id, entity_id, fingerprint, score) into
    fused-band-key rows, split hot buckets out of the bucketed table,
    reset stats and tombstones.  Every subsequent round's band join
    reads it shuffle-free; per-batch upkeep is append_banded_corpus."""
    spark = base_fps.sparkSession
    banded = _explode_banded(base_fps, cfg)

    stats = banded.groupBy("bkey").agg(F.count(F.lit(1)).alias("n"))
    stats.write.mode("overwrite").format("parquet").saveAsTable(
        f"{table}__stats"
    )
    hot = (
        spark.table(f"{table}__stats")
        .filter(F.col("n") > cfg.band_bucket_cap)
        .select("bkey")
    )
    cold_rows = banded.join(F.broadcast(hot), "bkey", "left_anti")
    hot_rows = banded.join(F.broadcast(hot), "bkey", "left_semi")

    write_bucketed_table(cold_rows, table, "bkey", n_buckets=n_buckets)
    hot_rows.write.mode("overwrite").format("parquet").saveAsTable(
        f"{table}__hot"
    )
    spark.createDataFrame([], "doc_id long").write.mode("overwrite").format(
        "parquet"
    ).saveAsTable(f"{table}__tombstones")


def _table_num_buckets(spark: SparkSession, table: str) -> int:
    for row in spark.sql(f"DESCRIBE FORMATTED {table}").collect():
        if row.col_name.strip() == "Num Buckets":
            return int(row.data_type.strip())
    raise ValueError(f"{table} is not a bucketed table")


def append_banded_corpus(
    new_fps: DataFrame,
    table: str,
    cfg: DedupConfig = DedupConfig(),
    stale_doc_ids: DataFrame | None = None,
) -> None:
    """Maintain the banded layout after a round commits `new_fps`
    (doc_id, entity_id, fingerprint, score): explode and append ONLY
    the batch (the bucketed append shuffles the batch's rows into
    their buckets — the existing corpus files are untouched, asserted
    in tests/test_banded_corpus.py), tombstone superseded rows,
    refresh stats, and warn about buckets that drifted hot.

    stale_doc_ids: (doc_id) frame of corpus rows this batch supersedes
    (re-crawled entities' previous versions) — typically
    `base.join(broadcast(new_entities), 'entity_id', 'left_semi')`
    computed by the caller, which already holds `base`.  When None it
    is derived from the layout itself via the band-0 slice (one row
    per live doc).

    Multi-table note: the cold/hot/stats/tombstones writes are not one
    atomic transaction (real Iceberg's single-commit MERGE is the swap
    point, sources/snapshots.py); a crash mid-append leaves the layout
    out of sync with the corpus, which assert_banded_sync detects and
    a write_banded_corpus rewrite repairs.
    """
    spark = new_fps.sparkSession
    n_buckets = _table_num_buckets(spark, table)
    batch = _explode_banded(new_fps, cfg).localCheckpoint(eager=False)

    # --- tombstone superseded rows (mask-on-read; dropped at compaction)
    if stale_doc_ids is None:
        new_entities = new_fps.select("entity_id").distinct()
        new_ids = new_fps.select("doc_id").distinct()
        band0 = F.col("bkey") < F.lit(1 << cfg.band_bits)
        live0 = (
            spark.table(table).filter(band0)
            .unionByName(spark.table(f"{table}__hot").filter(band0))
        )
        stale_doc_ids = (
            live0.join(F.broadcast(new_entities), "entity_id", "left_semi")
            .join(F.broadcast(new_ids), "doc_id", "left_anti")
            # rows superseded by an EARLIER batch are already masked —
            # re-tombstoning them would double-count in live_doc_count
            .join(
                F.broadcast(spark.table(f"{table}__tombstones")),
                "doc_id",
                "left_anti",
            )
            .select("doc_id")
        )
    stale_doc_ids.select("doc_id").distinct().write.mode("append").format(
        "parquet"
    ).saveAsTable(f"{table}__tombstones")

    # --- refresh stats: old stats are bounded by the key space
    # (n_bands << band_bits rows), so the driver round-trip that breaks
    # the read-overwrite cycle on the stats table is O(key space)
    old_stats = spark.table(f"{table}__stats").collect()
    batch_counts = batch.groupBy("bkey").agg(F.count(F.lit(1)).alias("n"))
    merged = (
        spark.createDataFrame(old_stats, "bkey int, n long")
        .unionByName(batch_counts)
        .groupBy("bkey")
        .agg(F.sum("n").alias("n"))
    ).localCheckpoint(eager=False)

    # classification uses POST-append totals: batch rows of a
    # newly-hot bucket go straight to the salted side; the bucket's
    # pre-existing cold rows stay put (bounded by the cap — balance
    # degrades gracefully, correctness is routing-independent)
    was_hot = {
        r.bkey for r in old_stats if r.n > cfg.band_bucket_cap
    }
    hot_now = merged.filter(F.col("n") > cfg.band_bucket_cap).select("bkey")
    newly_hot = [
        r.bkey
        for r in hot_now.limit(10_000).collect()
        if r.bkey not in was_hot
    ]
    if newly_hot:
        warnings.warn(
            f"append_banded_corpus: {len(newly_hot)} band bucket(s) "
            f"crossed band_bucket_cap={cfg.band_bucket_cap} (e.g. "
            f"{newly_hot[:5]}); their pre-existing rows remain in the "
            "co-located table (bounded by the cap) until the next "
            "write_banded_corpus compaction.",
            RuntimeWarning,
            stacklevel=2,
        )

    cold_rows = batch.join(F.broadcast(hot_now), "bkey", "left_anti")
    hot_rows = batch.join(F.broadcast(hot_now), "bkey", "left_semi")
    (
        cold_rows.write.mode("append")
        .bucketBy(n_buckets, "bkey")
        .sortBy("bkey")
        .format("parquet")
        .saveAsTable(table)
    )
    hot_rows.write.mode("append").format("parquet").saveAsTable(
        f"{table}__hot"
    )
    merged.write.mode("overwrite").format("parquet").saveAsTable(
        f"{table}__stats"
    )


def live_doc_count(spark: SparkSession, table: str, cfg: DedupConfig) -> int:
    """Number of live (non-tombstoned) documents in the layout, from
    two metadata-cheap counts: sum(stats)/n_bands - |tombstones|."""
    total = spark.table(f"{table}__stats").agg(F.sum("n")).collect()[0][0] or 0
    # distinct: a doc tombstoned twice (overlapping caller-provided
    # stale sets) must still subtract once
    tombs = (
        spark.table(f"{table}__tombstones").select("doc_id").distinct().count()
    )
    return int(total) // cfg.n_bands - tombs


def assert_banded_sync(
    spark: SparkSession,
    table: str,
    base: DataFrame,
    cfg: DedupConfig = DedupConfig(),
) -> None:
    """Cheap drift guard (round-3 ADVICE): the saved layout silently
    trusting that it was written from exactly `base`'s rows would make
    a stale layout produce a WRONG pair set; compare live row counts
    (parquet metadata reads, no shuffle) and fail loudly instead.
    Count equality is necessary, not sufficient — real Iceberg pins
    the snapshot id; rebuild with write_banded_corpus on mismatch."""
    live = live_doc_count(spark, table, cfg)
    n_base = base.count()
    if live != n_base:
        raise ValueError(
            f"banded corpus '{table}' is out of sync with the round's "
            f"base ({live} live docs vs {n_base} in base); rebuild it "
            "with write_banded_corpus or append the missing batches"
        )


def maintain_banded_corpus(
    spark: SparkSession,
    table: str,
    base: DataFrame | None,
    n_base: int | None,
    to_commit: DataFrame,
    post: DataFrame,
    cfg: DedupConfig = DedupConfig(),
) -> str:
    """Post-commit upkeep shared by the batch job
    (jobs/run_incremental.py) and the streaming round
    (streaming/dedup.py).  `base`/`n_base` are the PRE-merge corpus
    and its row count (None on the first round), `to_commit` the
    batch's committed fingerprints, `post` the post-merge corpus.

    Returns which action ran, decided by the live-count invariant:
      'bootstrap'  no pre-merge corpus -> write the layout fresh
      'noop'       live count already matches post (replayed batch
                   under at-least-once delivery — maintenance is
                   idempotent)
      'append'     live count matches pre-merge base -> append the
                   batch, tombstone superseded re-crawl rows
      'rebuild'    anything else (crash mid-append / out-of-band
                   commit) -> compaction rewrite from `post`
    """
    if base is None:
        write_banded_corpus(post, table, cfg)
        return "bootstrap"
    n_post = post.count()
    live = live_doc_count(spark, table, cfg)
    if live == n_post:
        return "noop"
    if live == n_base:
        stale = base.join(
            F.broadcast(to_commit.select("entity_id").distinct()),
            "entity_id",
            "left_semi",
        ).select("doc_id")
        append_banded_corpus(to_commit, table, cfg, stale_doc_ids=stale)
        return "append"
    write_banded_corpus(post, table, cfg)
    return "rebuild"


def _first_match(cfg: DedupConfig) -> Column:
    """Emit each pair only in its first matching band: this row's band
    (bkey >> band_bits) must be the smallest j where the two
    fingerprints agree — same zero-shuffle predicate as
    candidate_pairs, independent of hot/cold routing (pure fingerprint
    arithmetic, so the split can never double-emit or drop a pair)."""
    band = F.shiftrightunsigned(F.col("bkey"), cfg.band_bits)
    pred = F.lit(True)
    for j in range(cfg.n_bands - 1):
        j_matches = band_key(F.col("a_fp"), j, cfg.n_bands, cfg.band_bits) == band_key(
            F.col("b_fp"), j, cfg.n_bands, cfg.band_bits
        )
        pred = pred & ((band <= F.lit(j)) | ~j_matches)
    return pred


def _pair_select(joined: DataFrame, cfg: DedupConfig) -> DataFrame:
    return (
        joined.withColumn("hamming", hamming_col(F.col("a_fp"), F.col("b_fp")))
        .filter((F.col("hamming") <= cfg.hamming_k) & (F.col("a_id") != F.col("b_id")))
        .filter(_first_match(cfg))
        .select(
            "a_id",
            "b_id",
            "hamming",
            F.lit(True).alias("a_is_new"),
            F.lit(False).alias("b_is_new"),
            "a_loaded",
            F.lit(True).alias("b_loaded"),
            "a_score",
            "b_score",
        )
    )


def candidate_pairs_banded(
    spark: SparkSession,
    new_side: DataFrame,
    banded_corpus_table: str,
    cfg: DedupConfig = DedupConfig(),
) -> DataFrame:
    """Incremental candidate generation against the SAVED banded
    corpus: identical pair set and schema to
    plans/incremental.candidate_pairs(new_side, new_side ∪ live-old)
    — parity pinned by tests — but the cold corpus side is read
    co-located (no Exchange) and hot buckets go through the salted
    exchange sub-join (a hot bucket inside the co-located read would
    serialize into one task with no AQE escape hatch — round-3
    VERDICT).

    new_side carries (doc_id, fingerprint, is_new=true, is_loaded,
    score).  Stale rows are masked twice: the layout's tombstones
    (superseded by PREVIOUS batches, broadcast anti-join) and this
    batch's re-crawled entities (broadcast anti-join on entity_id;
    pass entity_id inside new_side when re-crawls are possible).
    """
    from simhash_text_dedup_spark.plans.incremental import candidate_pairs

    # --- new x new: the batch is small; the plain in-memory join
    nn = candidate_pairs(new_side, new_side, cfg)

    # --- new x corpus: bucketed co-located join on the fused key
    tombs = spark.table(f"{banded_corpus_table}__tombstones")

    def _mask(rows: DataFrame) -> DataFrame:
        rows = rows.join(F.broadcast(tombs), "doc_id", "left_anti")
        if "entity_id" in new_side.columns:
            rows = rows.join(
                F.broadcast(new_side.select("entity_id").distinct()),
                "entity_id",
                "left_anti",
            )
        return rows

    left = new_side.select(
        F.col("doc_id").alias("a_id"),
        F.col("fingerprint").alias("a_fp"),
        F.col("is_loaded").alias("a_loaded"),
        F.col("score").alias("a_score"),
        F.explode(fused_band_keys(F.col("fingerprint"), cfg)).alias("bkey"),
    )

    def _right(rows: DataFrame) -> DataFrame:
        return _mask(rows).select(
            "bkey",
            F.col("doc_id").alias("b_id"),
            F.col("fingerprint").alias("b_fp"),
            F.col("score").alias("b_score"),
        )

    cold = _pair_select(
        left.join(_right(spark.table(banded_corpus_table)), "bkey"), cfg
    )

    # --- hot buckets: salted exchange sub-join (operators/pairs.py
    # recipe): corpus rows spread across salt_partitions by b_id, the
    # (tiny: new-side rows with a hot bkey) probe side replicated per
    # salt value — the bucket's quadratic comparison fans out instead
    # of landing on one task
    hot_rows = _right(spark.table(f"{banded_corpus_table}__hot"))
    s = cfg.salt_partitions
    hot_keys = _hot_keys(spark, banded_corpus_table, cfg)
    lh = (
        left.join(F.broadcast(hot_keys), "bkey", "left_semi")
        .withColumn("salt", F.explode(F.array(*[F.lit(i) for i in range(s)])))
    )
    rh = hot_rows.withColumn(
        "salt", F.pmod(F.xxhash64("b_id"), F.lit(s)).cast("int")
    )
    hot = _pair_select(lh.join(rh, ["bkey", "salt"]), cfg)

    return nn.unionByName(cold).unionByName(hot)
