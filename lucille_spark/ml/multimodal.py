"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by Arrow-batched ``mapInPandas`` kernels.

The container has no image/audio codecs, so the actual byte decoding is
STUBBED exactly as the task brief requires: ``codec="real"`` raises
``NotImplementedError`` (drop-in point for PIL/ffmpeg/torchaudio), while
``codec="fake"`` decodes this module's deterministic synthetic format so the
Spark-side plumbing — schema, partitioning, UDF signature, Arrow batch
shape — is real and tested end-to-end.

Fake media format (deterministic, seedable):
    bytes = b"FAKE" + media_type(1B: I/A/V) + width(4B) + height(4B)
            + n_frames(4B) + payload (splitmix64 stream)
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("doc_id long, media_type string, width int, height int, "
                "n_frames int, content binary")

_MAGIC = b"FAKE"
_TYPES = {"image": b"I", "audio": b"A", "video": b"V"}
_TYPES_REV = {v: k for k, v in _TYPES.items()}


def fake_media_bytes(doc_id: int, media_type: str = "image",
                     width: int = 32, height: int = 32,
                     n_frames: int = 1) -> bytes:
    rng = np.random.default_rng(doc_id)
    payload = rng.integers(0, 256, width * height * n_frames,
                           dtype=np.uint8).tobytes()
    return (_MAGIC + _TYPES[media_type]
            + struct.pack("<iii", width, height, n_frames) + payload)


def synthetic_media_df(spark, n: int, media_type: str = "image",
                       partitions: int | None = None) -> DataFrame:
    """Deterministic corpus of fake media rows (distributed generation)."""
    base = spark.range(0, n, 1, partitions or 8)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            yield pd.DataFrame({
                "doc_id": ids,
                "media_type": media_type,
                "width": 32, "height": 32,
                "n_frames": 4 if media_type == "video" else 1,
                "content": [fake_media_bytes(
                    int(i), media_type, 32, 32,
                    4 if media_type == "video" else 1) for i in ids],
            })

    return base.mapInPandas(gen, schema=MEDIA_SCHEMA)


def _decode(raw: bytes, codec: str) -> np.ndarray:
    if codec == "real":
        raise NotImplementedError(
            "real decoders (PIL/ffmpeg) are not available in this "
            "container; plug them in here — the Spark plumbing is "
            "codec-agnostic")
    if raw[:4] != _MAGIC:
        raise ValueError("not a fake-media payload")
    w, h, nf = struct.unpack("<iii", raw[5:17])
    arr = np.frombuffer(raw[17:17 + w * h * nf], dtype=np.uint8)
    return arr.reshape(nf, h, w)


DECODED_FEATURES_SCHEMA = ("doc_id long, media_type string, n_frames int, "
                           "mean_intensity double, histogram array<int>, "
                           "feature array<float>")


def decode_and_featurize(df: DataFrame, codec: str = "fake",
                         feature_dim: int = 16) -> DataFrame:
    """binary media -> per-doc features, Arrow-batched (no per-row Python
    outside the vectorized kernel). At scale this is the standard
    decode-heavy stage: CPU-bound, embarrassingly parallel — repartition to
    cores, no shuffle."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, mt, raw in zip(pdf["doc_id"], pdf["media_type"],
                                       pdf["content"]):
                frames = _decode(bytes(raw), codec)
                flat = frames.ravel()
                hist = np.bincount(flat >> 5, minlength=8).astype(np.int32)
                # deterministic pseudo-embedding: bucketed byte means
                pad = (-flat.size) % feature_dim
                padded = np.pad(flat, (0, pad)).reshape(feature_dim, -1)
                feat = (padded.mean(axis=1) / 255.0).astype(np.float32)
                rows.append((int(doc_id), mt, int(frames.shape[0]),
                             float(flat.mean()), hist.tolist(),
                             feat.tolist()))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "media_type", "n_frames", "mean_intensity",
                "histogram", "feature"])

    return df.mapInPandas(kernel, schema=DECODED_FEATURES_SCHEMA)


def frame_sample(df: DataFrame, every_k: int = 2,
                 codec: str = "fake") -> DataFrame:
    """Video frame sampling: one output row per kept frame
    (doc_id, frame_idx, frame bytes) — the explode-shaped media op."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame": []}
            for doc_id, raw in zip(pdf["doc_id"], pdf["content"]):
                frames = _decode(bytes(raw), codec)
                for i in range(0, frames.shape[0], every_k):
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(i)
                    out["frame"].append(frames[i].tobytes())
            yield pd.DataFrame(out)

    return df.mapInPandas(kernel,
                          schema="doc_id long, frame_idx int, frame binary")


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize is pure codec work — stubbed, but the plan shape is real:
    binary in, binary out, narrow, Arrow-batched."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raise NotImplementedError(
                "image resize requires PIL/opencv; not in this container")
            yield pdf  # pragma: no cover

    return df.mapInPandas(kernel, schema=MEDIA_SCHEMA)
