"""Multimodal binary columns: REAL pure-python PPM/WAV decoders +
Arrow-batched plumbing (S5 analog)."""

import numpy as np
import pytest

from simhash_text_dedup_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_ppm,
    decode_wav,
    extract_features,
    make_fake_media,
    sample_frames,
    split_ppm_frames,
    _make_ppm,
    _make_wav,
)


def test_ppm_roundtrip():
    import random

    rng = random.Random(7)
    payload = _make_ppm(rng, w=5, h=4)
    img = decode_ppm(payload)
    assert img.shape == (4, 5, 3)
    assert img.tobytes() == payload[payload.index(b"255\n") + 4:]


def test_wav_roundtrip():
    import random

    rng = random.Random(7)
    payload = _make_wav(rng, n_samples=100, rate=8000)
    rate, samples = decode_wav(payload)
    assert rate == 8000
    assert len(samples) == 100
    assert samples.dtype == np.int16


def test_split_ppm_frames():
    import random

    rng = random.Random(7)
    frames = [_make_ppm(rng, 8, 6) for _ in range(3)]
    out = split_ppm_frames(b"".join(frames))
    assert out == frames


def test_extract_features_shape_and_determinism(spark):
    media = make_fake_media(spark, n=30, seed=42)
    out = extract_features(media).collect()
    assert len(out) == 30
    for r in out:
        assert len(r.feature) == FEATURE_DIM
        assert r.n_bytes > 0
    again = extract_features(make_fake_media(spark, n=30, seed=42)).collect()
    a = {r.doc_id: tuple(r.feature) for r in out}
    b = {r.doc_id: tuple(r.feature) for r in again}
    assert a == b


def test_known_formats_decode_even_in_strict_mode(spark):
    # PPM/WAV/concatenated-PPM video all have REAL decoders now
    media = make_fake_media(spark, n=9, seed=1)
    out = extract_features(media, strict=True).collect()
    assert len(out) == 9


def test_strict_mode_marks_missing_decoder(spark):
    from simhash_text_dedup_spark.operators.multimodal import MEDIA_SCHEMA

    unknown = spark.createDataFrame(
        [(1, "image", bytearray(b"\x89PNG\r\n unknown codec"),
          ("image/png", 1, 1, None, None))],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception) as ei:
        extract_features(unknown, strict=True).collect()
    assert "NotImplementedError" in str(ei.value) or "decoder" in str(ei.value)
    # non-strict: deterministic fallback, no raise
    assert len(extract_features(unknown).collect()) == 1


def test_frame_sampling_expands_rows(spark):
    media = make_fake_media(spark, n=30, seed=42)
    frames = sample_frames(media, every_ms=1000).collect()
    n_videos = media.filter("kind = 'video'").count()
    # video fixtures carry 3 real PPM frames each
    assert len(frames) == n_videos * 3
    assert {r.frame_idx for r in frames} == {0, 1, 2}
    # frame features are real image features of distinct frames
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(tuple(r.frame_feature))
    for feats in by_doc.values():
        assert len(set(feats)) == len(feats)


def test_riff_but_not_wav_falls_back_not_crashes(spark):
    """WebP/AVI are RIFF containers: a RIFF payload that is not PCM16
    WAV must use the deterministic fallback in non-strict mode (and
    raise only in strict mode), never abort the stage."""
    from simhash_text_dedup_spark.operators.multimodal import MEDIA_SCHEMA

    webp_ish = bytearray(b"RIFF\x10\x00\x00\x00WEBPVP8 fakebody")
    p6_ish = bytearray(b"P6 garbage not a header")
    df = spark.createDataFrame(
        [
            (1, "image", webp_ish, ("image/webp", 1, 1, None, None)),
            (2, "image", p6_ish, ("image/x-ppm", 1, 1, None, None)),
        ],
        MEDIA_SCHEMA,
    )
    out = extract_features(df).collect()
    assert len(out) == 2 and all(len(r.feature) == FEATURE_DIM for r in out)
    with pytest.raises(Exception):
        extract_features(df, strict=True).collect()


def test_frame_sampling_denser_and_sparser_rates(spark):
    """every_ms below/above the per-frame duration changes the sample
    count for PPM video (was silently ignored below 1000ms)."""
    media = make_fake_media(spark, n=3, seed=42)  # 1 video, 3 frames/3000ms
    dense = sample_frames(media, every_ms=500).collect()
    sparse = sample_frames(media, every_ms=3000).collect()
    assert len(dense) == 3   # 6 instants dedup to the 3 distinct frames
    assert len(sparse) == 1  # one instant -> first frame only


def test_degenerate_ppm_dimensions_fall_back_not_nan():
    """w=0 / h=0 headers must raise in decode_ppm (routing the payload
    to the deterministic digest fallback) instead of producing NaN
    features from a mean over an empty slice."""
    from simhash_text_dedup_spark.operators.multimodal import decode_ppm

    with pytest.raises(ValueError, match="degenerate"):
        decode_ppm(b"P6\n0 4\n255\n")
    with pytest.raises(ValueError, match="degenerate"):
        decode_ppm(b"P6\n4 0\n255\n")


def test_media_near_dups_finds_copies_within_kind(spark):
    from pyspark.sql import functions as F  # noqa: F811

    from simhash_text_dedup_spark.operators.multimodal import (
        make_fake_media,
        media_near_dups,
    )

    media = make_fake_media(spark, n=30, seed=42)
    copies = media.withColumn("doc_id", F.col("doc_id") + 1000)
    pairs = media_near_dups(
        media.unionByName(copies), threshold=0.999
    ).collect()
    got = {(r.kind, r.a_id, r.b_id) for r in pairs}
    kinds = {r.doc_id: r.kind for r in media.select("doc_id", "kind").collect()}
    # every identical copy pair found, tagged with its own kind
    for i in range(30):
        assert (kinds[i], i, i + 1000) in got, i
    # no cross-kind pair can exist by construction
    for k, a, b in got:
        assert kinds.get(a % 1000, k) == k
