"""Exact-duplicate flood ("spam") kill — the reference's skew guard.

Reference semantics (incload/SpamPageGenerate.java:36-95, threshold at
:78): count exactly-equal fingerprints within the batch; the FIRST
occurrence is always kept; every later docid of a fingerprint whose
count exceeds the threshold goes to the kill list.  "First" is defined
here as the minimum doc_id (the reference used file scan order; doc_id
order is the deterministic analog).

This runs BEFORE candidate generation, so million-row identical-
fingerprint floods never reach the band join — at 10^12-file scale this
is what keeps band buckets from going quadratic (SURVEY.md §4 "skew
kill").  One shuffle (window over fingerprint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def spam_tag(fps: DataFrame) -> DataFrame:
    """One window over fingerprint adds fp_count + fp_first.  Callers
    that need BOTH outputs (survivors and kills) should checkpoint THIS
    DataFrame once and derive each side with `split_spam` — otherwise
    the window shuffle runs once per materialized output."""
    w = Window.partitionBy("fingerprint")
    return fps.withColumn("fp_count", F.count(F.lit(1)).over(w)).withColumn(
        "fp_first", F.min("doc_id").over(w)
    )


def split_spam(tagged: DataFrame, threshold: int) -> tuple[DataFrame, DataFrame]:
    """(survivors, spam_kills) from a spam_tag output — filters only,
    no additional shuffle or recompute."""
    is_kill = (F.col("fp_count") > threshold) & (F.col("doc_id") != F.col("fp_first"))
    # fp_rep (= min doc_id of the fingerprint group, always a survivor) is
    # kept so the exact-group stage reuses this shuffle instead of adding one.
    survivors = (
        tagged.filter(~is_kill)
        .drop("fp_count")
        .withColumnRenamed("fp_first", "fp_rep")
    )
    kills = (
        tagged.filter(is_kill)
        .select("doc_id", F.col("fp_first").alias("ref_doc_id"))
    )
    return survivors, kills


def spam_pass(fps: DataFrame, threshold: int) -> tuple[DataFrame, DataFrame]:
    """Split fingerprinted docs into (survivors, spam_kills).

    fps must have columns doc_id, fingerprint (others pass through).
    spam_kills has (doc_id, ref_doc_id) where ref_doc_id is the kept
    first occurrence.
    """
    return split_spam(spam_tag(fps), threshold)
