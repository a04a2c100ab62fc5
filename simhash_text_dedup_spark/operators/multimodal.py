"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

REAL pure-python decoders are used for container-friendly formats —
binary PPM (P6) images and RIFF/WAV PCM16 audio are parsed with numpy
(no codec libraries needed); "video" is modeled as concatenated PPM
frames.  Payloads in any other format fall back to a deterministic
digest-derived feature (or NotImplementedError when `strict=True`) —
swapping in PIL/ffmpeg later changes only the `_decode_*` functions;
the Spark plumbing (schema, partitioning, UDF signature, batch shape)
is identical either way.

Reference analog: the crawler's binary page decode path
(spider/common/util page stores; SURVEY.md §2.1 S5).

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


# ----------------------------------------------------------------------
# real decoders (pure python + numpy)
# ----------------------------------------------------------------------
def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval 255) -> (h, w, 3) uint8 array."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header: P6 <ws> width <ws> height <ws> 255 <single ws> raster
    parts, i, tok = [], 2, b""
    while len(parts) < 3:
        c = payload[i : i + 1]
        if not c:
            raise ValueError("truncated PPM header")
        if c.isspace():
            if tok:
                parts.append(int(tok))
                tok = b""
        else:
            tok += c
        i += 1
    w, h, maxval = parts
    if maxval != 255:
        raise ValueError("only maxval 255 supported")
    if w <= 0 or h <= 0:
        # degenerate headers would make image_features mean over an
        # empty slice (NaN features + numpy RuntimeWarning); route them
        # to the deterministic fallback like other undecodable bodies
        raise ValueError(f"degenerate PPM dimensions {w}x{h}")
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
    return raster.reshape(h, w, 3)


def _ppm_size(payload: bytes, offset: int) -> int:
    """Byte length of the P6 frame starting at `offset` (for splitting
    concatenated-PPM 'video' payloads)."""
    parts, i, tok = [], offset + 2, b""
    while len(parts) < 3:
        c = payload[i : i + 1]
        if not c:
            raise ValueError("truncated PPM header")
        if c.isspace():
            if tok:
                parts.append(int(tok))
                tok = b""
        else:
            tok += c
        i += 1
    w, h, _ = parts
    return (i - offset) + w * h * 3


def split_ppm_frames(payload: bytes) -> list[bytes]:
    """Split a concatenated-P6 'video' payload into per-frame bytes."""
    frames, off = [], 0
    while off < len(payload):
        size = _ppm_size(payload, off)
        frames.append(payload[off : off + size])
        off += size
    return frames


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM16 mono -> (sample_rate, int16 samples)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sample_rate, data = None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = int.from_bytes(body[0:2], "little")
            bits = int.from_bytes(body[14:16], "little")
            if fmt != 1 or bits != 16:
                raise ValueError("only PCM16 supported")
            sample_rate = int.from_bytes(body[4:8], "little")
        elif cid == b"data":
            data = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)
    if sample_rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return sample_rate, data


# ----------------------------------------------------------------------
# feature extractors (deterministic, FEATURE_DIM floats)
# ----------------------------------------------------------------------
def image_features(img: np.ndarray) -> np.ndarray:
    """4x4 grid RGB means (48) + 16-bin luminance histogram = 64."""
    h, w, _ = img.shape
    gy = np.linspace(0, h, 5, dtype=int)
    gx = np.linspace(0, w, 5, dtype=int)
    cells = np.empty((4, 4, 3), dtype=np.float32)
    fimg = img.astype(np.float32)
    for yi in range(4):
        for xi in range(4):
            cell = fimg[gy[yi]:max(gy[yi + 1], gy[yi] + 1),
                        gx[xi]:max(gx[xi + 1], gx[xi] + 1)]
            cells[yi, xi] = cell.reshape(-1, 3).mean(axis=0)
    lum = fimg @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
    hist, _ = np.histogram(lum, bins=16, range=(0.0, 256.0))
    hist = hist.astype(np.float32) / max(lum.size, 1)
    return np.concatenate([cells.reshape(-1) / 255.0, hist])


def audio_features(samples: np.ndarray) -> np.ndarray:
    """32 windowed RMS values + 32-bin amplitude histogram = 64."""
    x = samples.astype(np.float32) / 32768.0
    n = max(len(x), 1)
    edges = np.linspace(0, n, 33, dtype=int)
    rms = np.array(
        [np.sqrt(np.mean(np.square(x[a:max(b, a + 1)]))) if len(x) else 0.0
         for a, b in zip(edges[:-1], edges[1:])],
        dtype=np.float32,
    )
    hist, _ = np.histogram(x, bins=32, range=(-1.0, 1.0))
    return np.concatenate([rms, hist.astype(np.float32) / n])


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic fallback for formats without a pure-python decoder:
    expands a blake2b digest of the payload into FEATURE_DIM floats."""
    need = FEATURE_DIM * 2
    raw = b""
    counter = 0
    while len(raw) < need:
        raw += hashlib.blake2b(payload + counter.to_bytes(4, "big"),
                               digest_size=32).digest()
        counter += 1
    u16 = np.frombuffer(raw[:need], dtype=np.uint16).astype(np.float32)
    return (u16 / 32768.0) - 1.0


def _decode_one(payload: bytes, strict: bool) -> np.ndarray:
    """Magic-sniff + decode.  A payload that LOOKS like P6/RIFF but
    fails to parse (WebP and AVI are RIFF containers too; 'P6' can open
    arbitrary binaries) is treated like any other foreign format:
    deterministic fallback when strict=False, NotImplementedError when
    strict=True — a bad byte must never abort the whole Spark stage."""
    try:
        if payload.startswith(b"P6"):
            frames = split_ppm_frames(payload)
            feats = np.stack([image_features(decode_ppm(f)) for f in frames])
            return feats.mean(axis=0)  # multi-frame video: mean-pool frames
        if payload[:4] == b"RIFF":
            _, samples = decode_wav(payload)
            return audio_features(samples)
    except ValueError:
        pass  # sniffed magic, undecodable body -> foreign-format path
    if strict:
        raise NotImplementedError(
            "no decoder for this payload format (PPM P6 / RIFF-WAV PCM16 "
            "are decoded natively; other codecs need external libraries)"
        )
    return _fake_decode(payload)


def extract_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """media -> (doc_id, kind, n_bytes, feature array<float>[FEATURE_DIM]).

    Arrow-batched mapInPandas; one output row per input row.  PPM/WAV
    payloads are REALLY decoded (numpy); unknown formats use the
    deterministic fallback, or raise when strict=True."""

    def _proc(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [bytes(p) if p is not None else b"" for p in pdf["payload"]]
            feats = [
                _decode_one(p, strict) if p else
                np.zeros(FEATURE_DIM, dtype=np.float32)
                for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "n_bytes": np.array([len(p) for p in payloads], dtype=np.int64),
                    "feature": feats,
                }
            )

    return media.mapInPandas(_proc, schema=_FEATURES_SCHEMA)


_FRAME_SCHEMA = "doc_id long, frame_idx int, frame_feature array<float>"


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (1..n per
    input row — the row-expanding batch shape).  Concatenated-PPM video
    payloads are split and REALLY decoded per frame; other payloads get
    the deterministic fallback per frame index.  Frame count = real
    frame count for PPM video, else meta.duration_ms // every_ms."""

    def _proc(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, feats = [], [], []
            doc_ids = pdf["doc_id"].to_numpy()
            metas = pdf["meta"].tolist()
            payloads = [bytes(p) if p is not None else b"" for p in pdf["payload"]]
            for r in range(len(pdf)):
                p = payloads[r]
                m = metas[r]
                dur = (m["duration_ms"] or 0) if m is not None else 0
                frames = None
                if p.startswith(b"P6"):
                    try:
                        frames = split_ppm_frames(p)
                    except ValueError:
                        frames = None  # P6-looking but undecodable body
                if frames:
                    # ms-per-frame from metadata (default 1 fps); sample
                    # one frame at each every_ms instant
                    ms_per_frame = (dur / len(frames)) if dur else 1000.0
                    total = dur if dur else len(frames) * ms_per_frame
                    t, emitted = 0.0, set()
                    while t < total:
                        i = min(len(frames) - 1, int(t // ms_per_frame))
                        if i not in emitted:
                            emitted.add(i)
                            ids.append(doc_ids[r])
                            idxs.append(i)
                            feats.append(image_features(decode_ppm(frames[i])))
                        t += every_ms
                else:
                    for i in range(max(1, int(dur) // every_ms)):
                        ids.append(doc_ids[r])
                        idxs.append(i)
                        feats.append(_fake_decode(p + i.to_bytes(4, "big")))
            yield pd.DataFrame(
                {
                    "doc_id": np.array(ids, dtype=np.int64),
                    "frame_idx": np.array(idxs, dtype=np.int32),
                    "frame_feature": feats,
                }
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        _proc, schema=_FRAME_SCHEMA
    )


# ----------------------------------------------------------------------
# deterministic fixtures (REAL PPM / WAV / concatenated-PPM payloads)
# ----------------------------------------------------------------------
def _make_ppm(rng, w: int = 16, h: int = 12) -> bytes:
    raster = bytes(rng.getrandbits(8) for _ in range(w * h * 3))
    return f"P6\n{w} {h}\n255\n".encode() + raster


def _make_wav(rng, n_samples: int = 800, rate: int = 16000) -> bytes:
    t = np.arange(n_samples, dtype=np.float64)
    freq = 100 + rng.randrange(400)
    sig = (np.sin(2 * np.pi * freq * t / rate) * 12000).astype("<i2")
    data = sig.tobytes()
    fmt = (
        (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + rate.to_bytes(4, "little") + (rate * 2).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    body = (
        b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(data).to_bytes(4, "little") + data
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def make_fake_media(spark, n: int = 50, seed: int = 42) -> DataFrame:
    """Deterministic fixture media table with REAL payloads: P6 images,
    PCM16 WAV audio, and video as 3 concatenated P6 frames."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            payload = _make_ppm(rng)
            meta = ("image/x-portable-pixmap", 16, 12, None, None)
        elif kind == "audio":
            payload = _make_wav(rng)
            meta = ("audio/wav", None, None, None, 16000)
        else:
            payload = b"".join(_make_ppm(rng, 8, 6) for _ in range(3))
            meta = ("video/x-ppm-frames", 8, 6, 3000, None)
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def media_near_dups(
    media: DataFrame,
    *,
    threshold: float = 0.95,
    n_bands: int = 16,
    seed: int = 42,
    strict: bool = False,
) -> DataFrame:
    """(kind, a_id, b_id): near-duplicate media pairs — decoded feature
    vectors (extract_features) fed through the embedding near-dup band
    join (similarity.lsh_near_pairs), per kind so image/audio/video
    never cross-pair.  The multimodal analog of the SimHash text pair
    join: perceptual similarity = cosine over decode features.

    The per-kind loop collects only the distinct kind values (bounded
    by the format count, not the corpus); the feature extraction is
    lineage-cut so the decode UDF runs once, not once per kind."""
    from .similarity import lsh_near_pairs

    feats = (
        extract_features(media, strict=strict)
        .select("doc_id", "kind", "feature")
        .localCheckpoint(eager=False)
    )
    kinds = sorted(r.kind for r in feats.select("kind").distinct().collect())
    spark = media.sparkSession
    out = spark.createDataFrame([], "kind string, a_id long, b_id long")
    for k in kinds:
        emb = feats.filter(F.col("kind") == k).select(
            F.col("doc_id").alias("vec_id"),
            F.col("feature").alias("embedding"),
        )
        pairs = lsh_near_pairs(
            emb, threshold=threshold, n_bands=n_bands, seed=seed
        ).select(F.lit(k).alias("kind"), "a_id", "b_id")
        out = out.unionByName(pairs)
    return out
