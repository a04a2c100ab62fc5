"""License identification for source-code files (SPDX tag + phrase scan).

A code-corpus curation step the Java reference does not need (its corpus
is crawled web pages) but any Stack/StarCoder-style source-code pipeline
runs before training: classify each file's license from its header and
keep only permissively-licensed files.  Public practice reference: The
Stack v1/v2 data cards (permissive-license filtering via license
detection over repository files).

Detection is two-tier, all JVM-side built-ins (codegen, no UDF):

  1. An explicit ``SPDX-License-Identifier: <id>`` tag in the first
     ``HEAD_CHARS`` characters wins outright.  A tag whose id is not in
     ``KNOWN_LICENSES`` classifies as ``'other'`` (present but
     unrecognized beats guessing from phrases).
  2. Otherwise the lower-cased header is scanned for distinctive license
     phrases in ``PHRASE_RULES`` priority order (most-specific first:
     BSD-3 before BSD-2); a rule matches when ALL its phrases occur.
  3. ``'none'`` when nothing matches.

``detect_license_sql`` emits the exact DuckDB/ANSI twin, generated from
the SAME constants, so oracle checks are bit-for-bit (the langid.py
pattern).  At 100 TB this is a single narrow projection over the scan —
no shuffle, whole-stage codegen end-to-end.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

HEAD_CHARS = 2048

SPDX_RE = r"SPDX-License-Identifier:\s*([A-Za-z0-9.+-]+)"

# (license_id, [phrases that must ALL appear in the lowered header]),
# in priority order — first matching rule wins.
PHRASE_RULES: list[tuple[str, list[str]]] = [
    ("Apache-2.0", ["apache license", "version 2.0"]),
    ("MIT", ["permission is hereby granted, free of charge"]),
    (
        "BSD-3-Clause",
        ["redistribution and use in source and binary forms", "neither the name"],
    ),
    ("BSD-2-Clause", ["redistribution and use in source and binary forms"]),
    ("AGPL-3.0-only", ["gnu affero general public license"]),
    ("LGPL-2.1-only", ["gnu lesser general public license"]),
    ("GPL-3.0-only", ["gnu general public license", "version 3"]),
    ("GPL-2.0-only", ["gnu general public license", "version 2"]),
    # require the canonical header phrase, not a bare "2.0" (which any
    # "@version 1.2.0" in the header would satisfy); an MPL-2.0 file
    # with a nonstandard header classifies 'none' — a false negative
    # is safe, a wrong-permissive id is not
    ("MPL-2.0", ["mozilla public license, v. 2.0"]),
    (
        "ISC",
        ["permission to use, copy, modify, and/or distribute this software"],
    ),
    ("Unlicense", ["free and unencumbered software"]),
]

KNOWN_LICENSES: list[str] = [lic for lic, _ in PHRASE_RULES]

PERMISSIVE: list[str] = [
    "Apache-2.0",
    "MIT",
    "BSD-3-Clause",
    "BSD-2-Clause",
    "MPL-2.0",
    "ISC",
    "Unlicense",
]


def detect_license(text: Column, head_chars: int = HEAD_CHARS) -> Column:
    """SPDX-or-phrase license id for one document; 'other' for an
    unrecognized SPDX tag, 'none' when nothing matches."""
    head = F.substring(text, 1, head_chars)
    low = F.lower(head)
    spdx = F.regexp_extract(head, SPDX_RE, 1)
    phrase = F.lit("none")
    # build lowest-priority-first so earlier rules override (langid.py)
    for lic, phrases in reversed(PHRASE_RULES):
        cond = reduce(lambda a, b: a & b, [low.contains(p) for p in phrases])
        phrase = F.when(cond, F.lit(lic)).otherwise(phrase)
    return F.when(
        spdx != "",
        F.when(spdx.isin(KNOWN_LICENSES), spdx).otherwise(F.lit("other")),
    ).otherwise(phrase)


def is_permissive(license_col: Column) -> Column:
    return license_col.isin(PERMISSIVE)


def detect_license_sql(text_col: str = "text", head_chars: int = HEAD_CHARS) -> str:
    """Exact DuckDB twin of detect_license, from the same constants."""
    head = f"substr({text_col}, 1, {head_chars})"
    # SPDX_RE contains no single quotes, so it embeds verbatim; using
    # the constant keeps the twin generated from the SAME pattern
    spdx = f"regexp_extract({head}, '{SPDX_RE}', 1)"
    known = ", ".join(f"'{lic}'" for lic in KNOWN_LICENSES)
    branches = []
    for lic, phrases in PHRASE_RULES:
        conds = " AND ".join(
            f"contains(lower({head}), '{p}')" for p in phrases
        )
        branches.append(f"WHEN {conds} THEN '{lic}'")
    phrase_case = "CASE " + " ".join(branches) + " ELSE 'none' END"
    return (
        f"CASE WHEN {spdx} <> '' THEN "
        f"(CASE WHEN {spdx} IN ({known}) THEN {spdx} ELSE 'other' END) "
        f"ELSE {phrase_case} END"
    )


def is_permissive_sql(license_expr: str) -> str:
    lst = ", ".join(f"'{lic}'" for lic in PERMISSIVE)
    return f"({license_expr} IN ({lst}))"
