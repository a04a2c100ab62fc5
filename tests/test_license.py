"""License identification (functions/license_id.py).

Covers: every phrase rule, SPDX tag priority over a conflicting phrase,
unrecognized SPDX -> 'other', no match -> 'none', the HEAD_CHARS window,
permissive classification, and bit-for-bit parity of the DuckDB SQL twin
on the same crafted rows.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from simhash_text_dedup_spark.functions.license_id import (
    HEAD_CHARS,
    PERMISSIVE,
    PHRASE_RULES,
    detect_license,
    detect_license_sql,
    is_permissive,
    is_permissive_sql,
)

CASES = [
    # (doc_id, text, expected license)
    (1, "// SPDX-License-Identifier: MIT\ncode here", "MIT"),
    (2, "/* SPDX-License-Identifier: GPL-3.0-only */\nx", "GPL-3.0-only"),
    # unknown tag -> other, even though an MIT phrase follows
    (
        3,
        "# SPDX-License-Identifier: Zlib\n"
        "# permission is hereby granted, free of charge\n",
        "other",
    ),
    # tag beats a conflicting phrase
    (
        4,
        "// SPDX-License-Identifier: Apache-2.0\n"
        "// permission is hereby granted, free of charge\n",
        "Apache-2.0",
    ),
    (
        5,
        "Licensed under the Apache License, Version 2.0 (the License);",
        "Apache-2.0",
    ),
    (
        6,
        "Permission is hereby granted, free of charge, to any person",
        "MIT",
    ),
    (
        7,
        "Redistribution and use in source and binary forms, with or "
        "without modification, are permitted provided that ... Neither "
        "the name of the copyright holder ...",
        "BSD-3-Clause",
    ),
    (
        8,
        "Redistribution and use in source and binary forms are permitted.",
        "BSD-2-Clause",
    ),
    (9, "under the GNU Affero General Public License v3", "AGPL-3.0-only"),
    (10, "under the GNU Lesser General Public License 2.1", "LGPL-2.1-only"),
    (
        11,
        "under the terms of the GNU General Public License, version 3",
        "GPL-3.0-only",
    ),
    (
        12,
        "under the terms of the GNU General Public License, version 2",
        "GPL-2.0-only",
    ),
    (
        13,
        "subject to the terms of the Mozilla Public License, v. 2.0",
        "MPL-2.0",
    ),
    (
        14,
        "Permission to use, copy, modify, and/or distribute this "
        "software for any purpose",
        "ISC",
    ),
    (15, "This is free and unencumbered software released into", "Unlicense"),
    (16, "def main():\n    return 42\n", "none"),
    (17, "", "none"),
    # phrase past the HEAD_CHARS window is not seen
    (
        18,
        "x" * (HEAD_CHARS + 10)
        + " permission is hereby granted, free of charge",
        "none",
    ),
    # tag inside the window of a long file IS seen
    (
        19,
        "// SPDX-License-Identifier: ISC\n" + "y" * (HEAD_CHARS * 2),
        "ISC",
    ),
]

NOT_PERMISSIVE = {
    "AGPL-3.0-only",
    "LGPL-2.1-only",
    "GPL-3.0-only",
    "GPL-2.0-only",
    "other",
    "none",
}


def test_phrase_rules_cover_known_set():
    ids = [lic for lic, _ in PHRASE_RULES]
    assert len(ids) == len(set(ids))
    for lic in PERMISSIVE:
        assert lic in ids


def test_detect_license_spark(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in CASES], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["license"], r["permissive"])
        for r in df.select(
            "doc_id",
            detect_license(F.col("text")).alias("license"),
            is_permissive(detect_license(F.col("text"))).alias("permissive"),
        ).collect()
    }
    for doc_id, _, want in CASES:
        lic, perm = got[doc_id]
        assert lic == want, f"doc {doc_id}: {lic} != {want}"
        assert perm == (want not in NOT_PERMISSIVE), f"doc {doc_id} permissive"


def test_detect_license_sql_twin_parity():
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", [(i, t) for i, t, _ in CASES]
    )
    lic = detect_license_sql("text")
    rows = con.execute(
        f"SELECT doc_id, {lic} AS license, "
        f"{is_permissive_sql(lic)} AS permissive FROM documents"
    ).fetchall()
    got = {doc_id: (l, p) for doc_id, l, p in rows}
    for doc_id, _, want in CASES:
        l, p = got[doc_id]
        assert l == want, f"duckdb doc {doc_id}: {l} != {want}"
        assert p == (want not in NOT_PERMISSIVE)


def test_null_text_is_none(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    row = df.select(detect_license(F.col("text")).alias("license")).first()
    assert row["license"] == "none"
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {detect_license_sql('text')} FROM "
        "(SELECT CAST(NULL AS VARCHAR) AS text)"
    ).fetchone()[0]
    assert got == "none"
