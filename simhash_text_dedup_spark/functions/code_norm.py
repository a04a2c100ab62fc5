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

Every pattern means the same thing in Java regex (Spark) and RE2
(DuckDB): whitespace is spelled as an explicit character class because
the engines' `\\s` shorthands disagree on vertical tab (Java includes
\\x0B, RE2 does not).  The SQL twin is DERIVED from the same pattern
constants, so the two sides cannot drift apart.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# explicit class == Java \s; RE2's \s omits \x0B
_WS = r" \t\n\x0b\f\r"
BLOCK_COMMENT = r"(?s)/\*.*?\*/"
LINE_COMMENT = r"(//|#)[^\n]*"
WS_RUN = rf"[{_WS}]+"


def normalize_code(content: Column) -> Column:
    """Strip block + line comments, collapse whitespace runs, trim."""
    out = F.regexp_replace(content, BLOCK_COMMENT, "")
    out = F.regexp_replace(out, LINE_COMMENT, "")
    out = F.regexp_replace(out, WS_RUN, " ")
    return F.trim(out)


def _sql_lit(pattern: str) -> str:
    """Render a regex pattern as a DuckDB string literal (standard
    strings keep backslashes verbatim; only quotes need doubling)."""
    return "'" + pattern.replace("'", "''") + "'"


def normalize_code_sql(col: str) -> str:
    """DuckDB twin of normalize_code — built from the SAME pattern
    constants, so editing a pattern updates both engines."""
    return (
        f"trim(regexp_replace(regexp_replace(regexp_replace({col}, "
        f"{_sql_lit(BLOCK_COMMENT)}, '', 'g'), "
        f"{_sql_lit(LINE_COMMENT)}, '', 'g'), "
        f"{_sql_lit(WS_RUN)}, ' ', 'g'))"
    )
