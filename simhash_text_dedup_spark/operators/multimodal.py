"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The container has no image/audio codec libraries, so the DECODE step is
stubbed (deterministic fake features derived from the bytes, or
NotImplementedError when `strict=True`); everything Spark-side — schema,
partition sizing, UDF signatures, batch shapes — is real and tested.

Schema convention:
  media(doc_id long, kind string, payload binary,
        meta struct<mime:string, width:int, height:int,
                    duration_ms:int, sample_rate:int>)
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 64

_FEATURES_SCHEMA = (
    "doc_id long, kind string, n_bytes long, feature array<float>"
)


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder+embedder: expands a
    blake2b digest of the payload into FEATURE_DIM floats in [-1, 1).
    Replace with a real codec (PIL/torchaudio/ffmpeg) in production —
    only this function changes; the Spark plumbing stays identical."""
    need = FEATURE_DIM * 2
    raw = b""
    counter = 0
    while len(raw) < need:
        raw += hashlib.blake2b(payload + counter.to_bytes(4, "big"),
                               digest_size=32).digest()
        counter += 1
    u16 = np.frombuffer(raw[:need], dtype=np.uint16).astype(np.float32)
    return (u16 / 32768.0) - 1.0


def extract_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """media -> (doc_id, kind, n_bytes, feature array<float>[FEATURE_DIM]).

    Arrow-batched mapInPandas; one output row per input row. strict=True
    raises NotImplementedError (the real-decoder contract marker)."""

    def _proc(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "real media decoding requires codec libraries not present "
                "in this environment; deterministic fake used when "
                "strict=False"
            )
        for pdf in it:
            payloads = pdf["payload"]
            feats = [
                _fake_decode(bytes(p)) if p is not None else
                np.zeros(FEATURE_DIM, dtype=np.float32)
                for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda p: len(p) if p is not None else 0),
                    "feature": feats,
                }
            )

    return media.mapInPandas(_proc, schema=_FEATURES_SCHEMA)


_FRAME_SCHEMA = "doc_id long, frame_idx int, frame_feature array<float>"


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling stub: one output row per sampled frame
    (1..n per input row — demonstrates the row-expanding batch shape).
    Frame count derives from meta.duration_ms; features are fake-decoded
    per frame index."""

    def _proc(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows_id, rows_ix, rows_ft = [], [], []
            for _, r in pdf.iterrows():
                dur = r["meta"]["duration_ms"] if r["meta"] is not None else 0
                n_frames = max(1, int((dur or 0) // every_ms))
                payload = bytes(r["payload"]) if r["payload"] is not None else b""
                for i in range(n_frames):
                    rows_id.append(r["doc_id"])
                    rows_ix.append(i)
                    rows_ft.append(_fake_decode(payload + i.to_bytes(4, "big")))
            yield pd.DataFrame(
                {"doc_id": rows_id, "frame_idx": rows_ix, "frame_feature": rows_ft}
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        _proc, schema=_FRAME_SCHEMA
    )


def make_fake_media(spark, n: int = 50, seed: int = 42) -> DataFrame:
    """Deterministic fixture media table (binary payloads + metadata)."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes(rng.getrandbits(8) for _ in range(rng.randint(64, 512)))
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                (
                    f"{kind}/x-fake",
                    640 if kind == "image" else None,
                    480 if kind == "image" else None,
                    3000 if kind == "video" else None,
                    16000 if kind == "audio" else None,
                ),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
