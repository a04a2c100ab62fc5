"""Fingerprint spec: vectorized kernel == executable spec; banding is
pigeonhole-complete for Hamming <= 3."""

import random

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from simhash_text_dedup_spark.fingerprint_core import (
    band_keys,
    hamming,
    simhash_batch,
    simhash_one,
)

WORDS = ["alpha", "beta", "gamma", "delta", "x", "y1", "_z", "42", "foo_bar"]


@st.composite
def texts(draw):
    n = draw(st.integers(0, 120))
    rng = random.Random(draw(st.integers(0, 2**32)))
    return " ".join(rng.choices(WORDS, k=n)) + draw(
        st.text(alphabet="abc .,\n\t(){};", max_size=30)
    )


@given(st.lists(texts(), min_size=0, max_size=20))
@settings(max_examples=60, deadline=None)
def test_batch_matches_spec(batch):
    got = simhash_batch(batch)
    assert len(got) == len(batch)
    for t, f in zip(batch, got):
        assert int(f) == simhash_one(t)


def test_empty_and_short():
    assert simhash_one("") == 0
    assert simhash_one("   \n") == 0
    assert simhash_one("one") == int(simhash_batch(["one"])[0])
    assert simhash_one("a b") == int(simhash_batch(["a b"])[0])


def test_deterministic_across_batching():
    rng = random.Random(7)
    docs = [" ".join(rng.choices(WORDS, k=rng.randint(0, 50))) for _ in range(100)]
    whole = simhash_batch(docs)
    halves = np.concatenate([simhash_batch(docs[:37]), simhash_batch(docs[37:])])
    assert (whole == halves).all()


@given(st.integers(0, 2**64 - 1), st.lists(st.integers(0, 63), min_size=0, max_size=3))
@settings(max_examples=200, deadline=None)
def test_pigeonhole_completeness(fp, flips):
    """Flipping <= 3 bits always leaves at least one of the 4 16-bit
    bands untouched (the banding scheme's correctness property)."""
    other = fp
    for b in flips:
        other ^= 1 << b
    assert hamming(fp, other) <= 3
    shared = sum(x == y for x, y in zip(band_keys(fp), band_keys(other)))
    assert shared >= 1


def test_band_layout_msb_first():
    fp = 0xAABBCCDDEEFF0011
    assert band_keys(fp) == [0xAABB, 0xCCDD, 0xEEFF, 0x0011]
    # negative int64 (MSB set) must work identically
    neg = fp - (1 << 64)
    assert band_keys(neg) == band_keys(fp)


def test_normalize_code_folds_comment_variants(spark):
    """Two sources differing only in comments/whitespace fingerprint
    IDENTICALLY with cfg.normalize_code, and differently without."""
    from pyspark.sql import functions as F

    from simhash_text_dedup_spark.config import DedupConfig
    from simhash_text_dedup_spark.plans.pipeline import (
        fingerprint_stage,
        prepare_documents,
    )

    a = "int load(int x) {\n    return x + 1;\n}\nint y = load(2);\n"
    b = ("/* rewritten\n * header */\nint load(int x) {  // entry\n"
         "\treturn x + 1;\n}\n\n\nint y = load(2);  # note\n")
    docs = spark.createDataFrame(
        [("r", "a.c", "c1", "c", a), ("r", "b.c", "c2", "c", b)],
        "repo string, path string, commit string, lang string, content string",
    )
    prep = prepare_documents(docs)
    raw = fingerprint_stage(prep, DedupConfig()).select("fingerprint").collect()
    norm = fingerprint_stage(
        prep, DedupConfig(normalize_code=True)
    ).select("fingerprint").collect()
    assert norm[0].fingerprint == norm[1].fingerprint
    assert raw[0].fingerprint != raw[1].fingerprint
    # sha256 invariant stays over the RAW bytes (distinct)
    shas = prep.select("content_sha256").distinct().count()
    assert shas == 2
