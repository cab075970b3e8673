"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference moves exactly one payload type (text, pkg/types/entity.go:7);
a training-data engine additionally needs media columns. Design:

* media is an opaque ``binary`` column + a typed metadata struct
  (mime, width/height or sample_rate/duration, byte length);
* decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages — same physical shape as text extraction (X2), so
  partitioning, batch sizing, and quarantine semantics carry over;
* the actual codec calls are STUBBED behind ``_decode_image`` /
  ``_decode_audio`` (no PIL/ffmpeg in this container): a clearly-marked
  deterministic fake parses our own header format so the Spark-side
  plumbing — schemas, UDF signatures, batch shapes, error routing — is real
  and tested. Swapping in a real codec changes only those two functions.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --- deterministic fake media format (generator + parser pair) -----------

_IMG_MAGIC = b"FIMG"
_AUD_MAGIC = b"FAUD"


def fake_image(seed: int, width: int, height: int) -> bytes:
    """Deterministic stand-in for an encoded image: header + seeded bytes."""
    rng = np.random.default_rng(seed)
    body = rng.integers(0, 256, size=min(width * height, 4096), dtype=np.uint8)
    return _IMG_MAGIC + struct.pack("<HH", width, height) + body.tobytes()


def fake_audio(seed: int, sample_rate: int, n_samples: int) -> bytes:
    rng = np.random.default_rng(seed)
    body = rng.integers(0, 256, size=min(n_samples, 4096), dtype=np.uint8)
    return _AUD_MAGIC + struct.pack("<II", sample_rate, n_samples) + body.tobytes()


def _decode_image(blob: bytes) -> tuple[int, int, np.ndarray]:
    """STUB decode. A real implementation would call PIL/turbojpeg here;
    the container has no image libs, so this parses the fake format.
    Raises ValueError on undecodable input (-> quarantine), like a real
    codec would."""
    if blob is None or len(blob) < 8 or blob[:4] != _IMG_MAGIC:
        raise ValueError("undecodable image")
    w, h = struct.unpack("<HH", blob[4:8])
    px = np.frombuffer(blob[8:], dtype=np.uint8)
    return w, h, px


def _decode_audio(blob: bytes) -> tuple[int, int, np.ndarray]:
    if blob is None or len(blob) < 12 or blob[:4] != _AUD_MAGIC:
        raise ValueError("undecodable audio")
    sr, n = struct.unpack("<II", blob[4:12])
    samples = np.frombuffer(blob[12:], dtype=np.uint8)
    return sr, n, samples


# --- operators -------------------------------------------------------------

IMAGE_META_SCHEMA = (
    "media_id long, width int, height int, n_bytes long, "
    "feature array<float>, error string"
)


def image_features(media: DataFrame, feat_dim: int = 64) -> DataFrame:
    """(media_id, content: binary) -> metadata + deterministic feature
    vector. Feature = byte-histogram projection (stand-in for a CNN
    embedding); undecodable rows carry an error column instead of being
    dropped silently (same quarantine contract as X3)."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "width": np.zeros(len(pdf), dtype=np.int32),
                "height": np.zeros(len(pdf), dtype=np.int32),
                "n_bytes": np.zeros(len(pdf), dtype=np.int64),
                "feature": [None] * len(pdf),
                "error": [None] * len(pdf),
            }
            for i, blob in enumerate(pdf["content"]):
                try:
                    w, h, px = _decode_image(blob)
                except ValueError as e:
                    out["error"][i] = str(e)
                    continue
                out["width"][i] = w
                out["height"][i] = h
                out["n_bytes"][i] = len(blob)
                hist = np.bincount(px % 64, minlength=feat_dim)[:feat_dim].astype(
                    np.float64
                )
                n = np.linalg.norm(hist)
                out["feature"][i] = (hist / n if n else hist).astype(np.float32).tolist()
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(
        _run, schema=IMAGE_META_SCHEMA
    )


AUDIO_META_SCHEMA = (
    "media_id long, sample_rate int, n_samples long, n_bytes long, "
    "frames array<long>, error string"
)


def audio_frame_sample(media: DataFrame, n_frames: int = 8) -> DataFrame:
    """Frame-sample an audio column: n_frames evenly spaced frame offsets +
    a coarse energy value per frame (sum of the byte window). The decode is
    the stub; the sampling arithmetic and Spark plumbing are real."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "sample_rate": np.zeros(len(pdf), dtype=np.int32),
                "n_samples": np.zeros(len(pdf), dtype=np.int64),
                "n_bytes": np.zeros(len(pdf), dtype=np.int64),
                "frames": [None] * len(pdf),
                "error": [None] * len(pdf),
            }
            for i, blob in enumerate(pdf["content"]):
                try:
                    sr, n, samples = _decode_audio(blob)
                except ValueError as e:
                    out["error"][i] = str(e)
                    continue
                out["sample_rate"][i] = sr
                out["n_samples"][i] = n
                out["n_bytes"][i] = len(blob)
                if len(samples):
                    idx = np.linspace(0, len(samples) - 1, n_frames, dtype=np.int64)
                    window = max(1, len(samples) // n_frames)
                    frames = [
                        int(samples[j : j + window].sum(dtype=np.int64)) for j in idx
                    ]
                else:
                    frames = [0] * n_frames
                out["frames"][i] = frames
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(
        _run, schema=AUDIO_META_SCHEMA
    )


def media_dims(k: int, kind: str = "image") -> tuple[int, int]:
    """Deterministic media dimensions as PURE ARITHMETIC in the id — this is
    what lets the DuckDB oracle reconstruct the expected decoded metadata
    (width/height/n_bytes) without parsing binary: the gate checks that the
    Spark decode path recovers exactly these values from the actual bytes."""
    if kind == "image":
        return 16 + (k * 7919) % 496, 16 + (k * 104729) % 496
    return 16000, 1000 + (k * 7919) % 99000


def media_blob(k: int, kind: str = "image") -> bytes:
    """One media row's bytes; every 13th row is corrupt (quarantine path)."""
    if k % 13 == 5:
        return b"\x00corrupt"
    a, b = media_dims(k, kind)
    return fake_image(k, a, b) if kind == "image" else fake_audio(k, a, b)


def _gen_factory(kind: str):
    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[pdf.columns[0]]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "content": [media_blob(int(k), kind) for k in ids],
                }
            )

    return _gen


def gen_media(spark, n: int, kind: str = "image") -> DataFrame:
    """Deterministic media fixture, generated distributed (one Arrow pass)."""
    return spark.range(n).mapInPandas(
        _gen_factory(kind), schema="media_id long, content binary"
    )


def media_from_docs(docs: DataFrame, kind: str = "image") -> DataFrame:
    """One media blob per documents row (media_id = doc_id) — keys the
    media fixture to a driver table so the oracle's expected metadata is a
    plain SELECT over ``documents``."""
    return docs.select(F.col("doc_id")).mapInPandas(
        _gen_factory(kind), schema="media_id long, content binary"
    )
