"""Edge-case pinning for the DuckDB twins of the production hash
families (__spark_entry__._true_fp_cte / _minhash_true_sql).

test_entry_oracle exercises the twins against the real sf0.01 corpus;
this file covers inputs the corpus does not contain (empty text,
whitespace-only, sub-width token counts, multi-byte UTF-8, repeated
tokens) against the executable spec kernels — no Spark session needed,
so it runs in seconds and survives corpus regeneration.
"""

import duckdb
import numpy as np
import pytest

import __spark_entry__ as entry_mod
from simhash_text_dedup_spark.fingerprint_core import simhash_one
from simhash_text_dedup_spark.functions.minhash import (
    band_keys_from_sigs,
    minhash_batch,
)

EDGE_DOCS = [
    (1, ""),
    (2, "   !!! --- ~~~"),
    (3, "one"),
    (4, "one two"),
    (5, "one two three"),
    (6, "one two three four five six"),
    (7, "héllo wörld ünïcode tëxt"),
    (8, "日本語のテキスト 中文 mixed ascii 123"),
    (9, "tab\tsep\nnew line\r\nwindows"),
    (10, "Case CASE case cAsE"),
    (11, "under_score _lead trail_ __dunder__"),
    (12, "repeat repeat repeat repeat repeat"),
    (13, "a b c " * 40),
    (14, "x" * 500),
]


@pytest.fixture(scope="module")
def edge_con():
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", EDGE_DOCS)
    return con


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def test_simhash_twin_edges(edge_con):
    got = dict(
        edge_con.execute(
            f"WITH {entry_mod._true_fp_cte()} "
            "SELECT doc_id, fp FROM sfp_fps"
        ).fetchall()
    )
    for doc_id, text in EDGE_DOCS:
        assert got[doc_id] == _signed(simhash_one(text, 3)), (doc_id, text)


def test_minhash_twin_edges(edge_con):
    sql = entry_mod._minhash_true_sql()
    head = sql[: sql.index("mh_cand AS")]
    rows = edge_con.execute(
        head
        + """mh_out AS (
          SELECT s.doc_id, s.sig, list(b.bkey ORDER BY b.band_idx) AS bands
          FROM mh_sig s JOIN mh_bands b USING (doc_id)
          GROUP BY s.doc_id, s.sig
        ) SELECT doc_id, sig, bands FROM mh_out"""
    ).fetchall()
    got = {r[0]: (list(map(int, r[1])), list(map(int, r[2]))) for r in rows}
    texts = [t for _, t in EDGE_DOCS]
    sigs = minhash_batch(texts, 128, 3)
    bands = band_keys_from_sigs(sigs, 32, 4).view(np.uint64)
    for k, (doc_id, text) in enumerate(EDGE_DOCS):
        assert got[doc_id][0] == sigs[k].tolist(), ("sig", doc_id, text)
        assert got[doc_id][1] == bands[k].tolist(), ("bands", doc_id, text)
