"""Multimodal binary-column plumbing (decode stubbed, Spark side real)."""

import pytest

from simhash_text_dedup_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    make_fake_media,
    sample_frames,
)


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


def test_strict_mode_marks_missing_decoder(spark):
    media = make_fake_media(spark, n=3, seed=1)
    with pytest.raises(Exception) as ei:
        extract_features(media, strict=True).collect()
    assert "NotImplementedError" in str(ei.value) or "codec" in str(ei.value)


def test_frame_sampling_expands_rows(spark):
    media = make_fake_media(spark, n=30, seed=42)
    frames = sample_frames(media, every_ms=1000).collect()
    n_videos = media.filter("kind = 'video'").count()
    # 3000ms duration / 1000ms -> 3 frames per video
    assert len(frames) == n_videos * 3
    assert {r.frame_idx for r in frames} == {0, 1, 2}
