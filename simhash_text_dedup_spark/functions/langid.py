"""Heuristic language identification (stopword n-gram profile).

The reference bundles the cybozu langdetect n-gram classifier with 53
language profiles (com/cybozu/labs/langdetect/Detector.java, SURVEY.md
§2.8 F10).  This is the JVM-side, oracle-checkable analog: score each
language by frozen stopword hits over whitespace tokens; argmax with
fixed priority order on ties; 'und' when nothing matches.  Pure built-in
expressions (no UDF), with an exact ANSI-SQL twin in __spark_entry__.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

LANG_PROFILES: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "auf"],
    "en": ["the", "of", "and", "to", "in", "is", "for", "that", "with", "a"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "los", "con"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "est", "dans"],
}
LANG_ORDER = sorted(LANG_PROFILES)  # tie-break priority: alphabetical


def lang_hits(text: Column, lang: str) -> Column:
    toks = F.split(F.lower(text), " ")
    return F.size(F.filter(toks, lambda t: t.isin(LANG_PROFILES[lang]))).cast("bigint")


def detect_lang(text: Column) -> Column:
    """Best-scoring language code, 'und' if all scores are zero. Ties go
    to the alphabetically-first language."""
    hits = {lang: lang_hits(text, lang) for lang in LANG_ORDER}
    expr = F.lit("und")
    # build the CASE from lowest to highest priority: later whens win,
    # so iterate reversed priority; a language wins when its score is
    # strictly greater than every earlier (higher-priority) language and
    # >= every later one — equivalently, process in reverse order with
    # ">=" so the first-in-order language takes ties.
    for lang in reversed(LANG_ORDER):
        cond = hits[lang] > 0
        for other in LANG_ORDER:
            if other == lang:
                continue
            if other < lang:
                cond = cond & (hits[lang] > hits[other])
            else:
                cond = cond & (hits[lang] >= hits[other])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def detect_lang_sql(text_col: str = "text") -> str:
    """The exact DuckDB/ANSI twin of detect_lang for oracle checks."""
    def hits(lang: str) -> str:
        lst = "[" + ",".join(f"'{w}'" for w in LANG_PROFILES[lang]) + "]"
        return (
            f"len(list_filter(string_split(lower({text_col}), ' '), "
            f"w -> list_contains({lst}, w)))"
        )

    branches = []
    for lang in LANG_ORDER:
        conds = [f"{hits(lang)} > 0"]
        for other in LANG_ORDER:
            if other == lang:
                continue
            op = ">" if other < lang else ">="
            conds.append(f"{hits(lang)} {op} {hits(other)}")
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(branches) + " ELSE 'und' END"
