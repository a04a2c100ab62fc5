"""PySpark-native near-duplicate detection engine.

A from-scratch rebuild of the query semantics of the
``realfirst/simhash-text-dedup`` reference (a Java/Hadoop crawler's
``com.zhongsou.incload`` SimHash dedup core) as an idiomatic
DataFrame/Catalyst pipeline.  See SURVEY.md for the full blueprint and
per-operator reference citations.
"""

from simhash_text_dedup_spark.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
