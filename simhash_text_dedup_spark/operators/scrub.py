"""PII / secret scrubbing for training corpora.

The redaction pass public pipelines run before training (e.g. the
email/IP/secret removal described for The Pile / BigCode's
StarCoder pipeline): pattern classes are replaced with stable
placeholder tokens so the text stays parseable while the sensitive
literal is gone.

All patterns are deliberately conservative regexes that mean the same
thing in Java regex (Spark) and RE2 (DuckDB) — character classes,
bounded repetition, no backreferences, no lookaround — so the operator
is oracle-checkable bit-for-bit.  The whole pass is whole-stage-codegen
`regexp_replace` / `regexp_extract_all` column expressions: zero UDFs,
zero shuffles — a pure map over the corpus scan, which is exactly what
a 100-TB redaction sweep must be.

Pattern classes (name -> placeholder):
  email  -> <EMAIL>    user@host.tld mailbox literals
  ipv4   -> <IP>       dotted-quad address literals
  secret -> <SECRET>   long (32+) lowercase-hex runs: API keys, tokens,
                       password hashes
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ordered: replacements run in this sequence (email before ipv4 so a
# mailbox host is consumed as part of the email, not re-matched)
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
    ("secret", r"[0-9a-f]{32,}", "<SECRET>"),
]


def scrub_text(text: Column) -> Column:
    """The text with every pattern class replaced by its placeholder,
    applied in PII_PATTERNS order."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_scrub(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_email, n_ipv4, n_secret, scrubbed_text): per-class
    match counts (counted on the ORIGINAL text, before any replacement
    interacts) plus the redacted text."""
    t = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0)))
        .cast("bigint")
        .alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *counts,
        scrub_text(t).alias("scrubbed_text"),
    )
