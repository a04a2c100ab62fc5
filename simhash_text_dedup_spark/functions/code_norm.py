"""Source-code normalization for dedup (code-payload analog of the
reference's URL normalizer chain, spider/common/url/
RegexURLNormalizer.java + URLNormalizers.java — chained regex rewrites
applied before identity comparison).

Two code variants that SHOULD dedup as near-identical often differ only
in comments and whitespace; normalizing before fingerprinting folds
them into the same (or Hamming-adjacent) fingerprint.  Pure JVM-side
regexp_replace chain (whole-stage codegen, no UDF); heuristic by
design — string literals containing comment markers are also stripped,
which is acceptable for similarity fingerprints (both sides of a pair
get the same treatment), documented like the reference's lossy URL
normalizations.

Every pattern is valid in both Java regex (Spark) and RE2 (DuckDB), so
the transformation has an exact SQL twin for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BLOCK_COMMENT = r"(?s)/\*.*?\*/"
LINE_COMMENT = r"(//|#)[^\n]*"
WS_RUN = r"\s+"


def normalize_code(content: Column) -> Column:
    """Strip block + line comments, collapse whitespace runs, trim."""
    out = F.regexp_replace(content, BLOCK_COMMENT, "")
    out = F.regexp_replace(out, LINE_COMMENT, "")
    out = F.regexp_replace(out, WS_RUN, " ")
    return F.trim(out)


def normalize_code_sql(col: str) -> str:
    """DuckDB twin of normalize_code (same patterns, RE2 dialect)."""
    return (
        f"trim(regexp_replace(regexp_replace(regexp_replace({col}, "
        f"'(?s)/\\*.*?\\*/', '', 'g'), '(//|#)[^\\n]*', '', 'g'), "
        f"'\\s+', ' ', 'g'))"
    )
