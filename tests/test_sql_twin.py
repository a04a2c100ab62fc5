"""Edge-case pinning for the DuckDB twins of the production hash
families (__spark_entry__._true_fp_cte / _minhash_true_sql).

test_entry_oracle exercises the twins against the real sf0.01 corpus;
this file covers what that corpus cannot:

* Spark-free spec checks (seconds): the twins vs the executable spec
  kernels on inputs the corpus lacks — empty text, whitespace-only,
  sub-width token counts, multi-byte UTF-8, repeated tokens.
* Adversarial pipeline parity (needs the Spark fixture): the five
  production entries vs their oracles over a planted corpus whose
  spam-kill / exact-edge / tie-break / near-pair branches the sf gate
  corpus leaves vacuous.
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
    # XXH64 stride boundaries: exact 8-byte word, 31/32/33 around the
    # block size, 36 = block + 4-byte tail, 44 = block + word + 4
    (15, "w" * 8),
    (16, "y" * 31),
    (17, "z" * 32),
    (18, "q" * 33),
    (19, "m" * 36),
    (20, "n" * 44),
]


@pytest.fixture(scope="module")
def edge_con():
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", EDGE_DOCS)
    return con


def test_simhash_twin_edges(edge_con):
    got = dict(
        edge_con.execute(
            f"WITH {entry_mod._true_fp_cte()} "
            "SELECT doc_id, fp FROM sfp_fps"
        ).fetchall()
    )
    for doc_id, text in EDGE_DOCS:
        # simhash_one returns the signed-int64 view per the frozen spec
        assert got[doc_id] == simhash_one(text, 3), (doc_id, text)


# ---------------------------------------------------------------------
# XXH64 twin (_xxhash64_fp_sql): independent pure-python XXH64 per the
# public spec (Collet), seed 42 = Spark's xxhash64 over UTF-8 bytes.
# The edge list crosses every stride boundary: empty, <8, exact word,
# 31/32/33 around the block size, block+4-byte tail, multi-byte UTF-8.
# ---------------------------------------------------------------------
_XM = (1 << 64) - 1
_XXP = (11400714785074694791, 14029467366897019727, 1609587929392839161,
        9650029242287828579, 2870177450012600261)


def _xrotl(x, r):
    return ((x << r) | (x >> (64 - r))) & _XM


def _xround(acc, inp):
    return (_xrotl((acc + inp * _XXP[1]) & _XM, 31) * _XXP[0]) & _XM


def _xxh64_ref(data: bytes, seed: int = 42) -> int:
    p1, p2, p3, p4, p5 = _XXP
    n, i = len(data), 0
    if n >= 32:
        v = [(seed + p1 + p2) & _XM, (seed + p2) & _XM, seed, (seed - p1) & _XM]
        while i + 32 <= n:
            for j in range(4):
                v[j] = _xround(v[j], int.from_bytes(data[i:i + 8], "little"))
                i += 8
        h = (_xrotl(v[0], 1) + _xrotl(v[1], 7) + _xrotl(v[2], 12)
             + _xrotl(v[3], 18)) & _XM
        for vj in v:
            h = ((h ^ _xround(0, vj)) * p1 + p4) & _XM
    else:
        h = (seed + p5) & _XM
    h = (h + n) & _XM
    while i + 8 <= n:
        h ^= _xround(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_xrotl(h, 27) * p1 + p4) & _XM
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * p1) & _XM
        h = (_xrotl(h, 23) * p2 + p3) & _XM
        i += 4
    while i < n:
        h ^= (data[i] * p5) & _XM
        h = (_xrotl(h, 11) * p1) & _XM
        i += 1
    h ^= h >> 33
    h = (h * p2) & _XM
    h ^= h >> 29
    h = (h * p3) & _XM
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def test_xxhash64_twin_edges(edge_con):
    got = dict(edge_con.execute(entry_mod._xxhash64_fp_sql()).fetchall())
    for doc_id, text in EDGE_DOCS:
        assert got[doc_id] == _xxh64_ref(text.encode("utf-8")), (doc_id, text)


# ---------------------------------------------------------------------
# Adversarial pipeline parity: the sf0.01 gate corpus has 500 unique
# texts (no duplicate fingerprints, no %1000 score ties), so the
# spam-kill, exact-edge, within-group-expansion, tie-break, and
# empty-doc branches of the pipeline oracles are vacuous there.  This
# corpus plants all of them and re-runs the production entries vs
# their DuckDB twins.
# ---------------------------------------------------------------------
_ADV_BASE = " ".join(f"tok{i:03d}" for i in range(120))


def _variant(j: int) -> str:
    toks = _ADV_BASE.split()
    toks[j] = f"alt{j:03d}"
    return " ".join(toks)


def _adv_rows():
    rows = []
    # exact-dup flood above the spam threshold (100) — ids span the
    # %5/%10 classes so the incremental entry sees novel docs,
    # unchanged re-crawls, and modified re-crawls of flood members
    for i in range(120):
        rows.append((100000 + i, "flood body shared by every spam copy"))
    # exact group below threshold with a %1000 score TIE (all three
    # ids collide after the injected (doc_id % 1000)/1000.0 score)
    for i in (42, 2042, 3042):
        rows.append((i, "exact family kept below the kill threshold"))
    # near-dup family: single-token variants at Hamming 1 and 3 from
    # the 120-token base (verified against simhash_one)
    rows.append((7, _ADV_BASE))
    rows.append((8, _variant(1)))
    rows.append((13, _variant(9)))
    # token-less docs -> fingerprint 0 exact group
    rows.append((21, ""))
    rows.append((22, "   "))
    rows.append((23, "!!! --- ~~~"))
    # unique filler across the %5/%10 classes
    for i in (3, 5, 9, 10, 11, 15, 31, 33, 55, 61, 63):
        rows.append((i, f"unique filler document number {i} with words "
                        f"{'x' * (i % 7)} {'y' * (i % 5)}"))
    return rows


_ADV_ENTRIES = [
    "simhash_fingerprints",
    "simhash_clusters",
    "simhash_clusters_greedy",
    "minhash_pairs",
    "incremental_round",
]


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("adv_sf")
    rows = _adv_rows()
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["adv"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def test_adversarial_fp_branches_present():
    # the corpus actually plants what it claims: a >threshold flood,
    # a sub-threshold exact group, a Hamming-1..3 pair, an fp-0 group
    rows = _adv_rows()
    fps = {i: simhash_one(t, 3) for i, t in rows}
    from collections import Counter

    counts = Counter(fps.values())
    assert max(counts.values()) > 100
    assert counts[fps[42]] == 3 and fps[42] == fps[2042]
    assert counts[fps[21]] == 3 and fps[21] == 0
    # both planted near pairs stay in radius AND at distinct distances
    # (1 and 3) so the Hamming verify's boundary is really exercised
    ham18 = bin((fps[7] ^ fps[8]) & ((1 << 64) - 1)).count("1")
    ham113 = bin((fps[7] ^ fps[13]) & ((1 << 64) - 1)).count("1")
    assert ham18 == 1 and ham113 == 3


@pytest.mark.parametrize("name", _ADV_ENTRIES)
def test_adversarial_pipeline_oracles(spark, adv_dir, name):
    from test_entry_oracle import _rowset

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{adv_dir}/documents.parquet')"
    )
    sdf = entry_mod.queries()[name](spark, adv_dir)
    spark_rows = sdf.collect()
    res = con.execute(entry_mod.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(sdf.columns) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: {len(spark_rows)} vs {len(duck_rows)}"
    )
    assert _rowset(sdf.columns, [tuple(r) for r in spark_rows]) == _rowset(
        duck_cols, duck_rows
    ), name


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


def test_xxhash64_twin_fuzz():
    """Seeded fuzz across block counts and byte diversity: 200 random
    strings (ascii + latin-1 + CJK mix, lengths 0..300) through the
    DuckDB twin vs the independent python reference, one batch."""
    import random

    rng = random.Random(20260818)
    pool = (
        [chr(c) for c in range(32, 127)]
        + ["é", "ü", "ß", "中", "文", "日", "本", "€", "\t", "\n"]
    )
    docs = [
        (i, "".join(rng.choice(pool) for _ in range(rng.randrange(0, 301))))
        for i in range(200)
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    got = dict(con.execute(entry_mod._xxhash64_fp_sql()).fetchall())
    for doc_id, text in docs:
        assert got[doc_id] == _xxh64_ref(text.encode("utf-8")), (doc_id, text)
