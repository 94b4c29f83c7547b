"""Multimodal column handling: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side plumbing — schemas, Arrow batch shapes, mapInPandas
signatures, partitioning — is real and tested. The codec step itself
is STUBBED: this container has no image/audio libraries, so decoding
routes to either a clearly-marked NotImplementedError (strict mode)
or a deterministic fake decoder (a pure function of the payload
bytes) that keeps every downstream contract testable.

Swap `_decode_image_real` in when PIL/ffmpeg exist; nothing else
changes — that function is the only seam.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator

import numpy as np
import pandas as pd

MEDIA_SCHEMA = (
    "media_id long, media_type string, payload binary, "
    "meta map<string,string>"
)
IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, n_bytes long, "
    "phash long, features array<float>"
)
FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_phash long"


class DecoderUnavailable(NotImplementedError):
    """Raised in strict mode: no real codec library in this image."""


def _decode_image_real(payload: bytes):  # pragma: no cover - no codec libs here
    raise DecoderUnavailable(
        "real image decoding requires PIL/libvips; not present in this "
        "container. Use fake=True (deterministic fake decoder) or install "
        "a codec and replace this seam."
    )


def _decode_image_fake(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Deterministic fake decoder: pure function of the payload bytes.
    Emits plausible (width, height, phash, feature[8]) so downstream
    plumbing (schemas, joins, partitioning) is exercised for real."""
    crc = zlib.crc32(payload)
    width = 64 + (crc & 0x3FF)
    height = 64 + ((crc >> 10) & 0x3FF)
    digest = hashlib.sha256(payload).digest()
    phash = int.from_bytes(digest[:8], "big", signed=True)
    feats = (
        np.frombuffer(digest, dtype=np.uint8)[:8].astype(np.float32) / 255.0
    )
    return width, height, phash, feats


def decode_image_features(media_df, fake: bool = True):
    """media(media_id, media_type, payload, meta) →
    (media_id, width, height, n_bytes, phash, features).

    mapInPandas: Arrow batches of binary payloads in, fixed-width
    feature rows out. Non-image rows are filtered JVM-side BEFORE the
    Python boundary so only image bytes cross it."""
    from pyspark.sql import functions as F

    decode = _decode_image_fake if fake else _decode_image_real
    images = media_df.where(F.col("media_type") == "image")

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "media_id": [], "width": [], "height": [],
                "n_bytes": [], "phash": [], "features": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                w, h, ph, fe = decode(payload)
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(len(payload))
                out["phash"].append(ph)
                out["features"].append(fe)
            yield pd.DataFrame(out)

    return images.select("media_id", "payload").mapInPandas(
        _batch, schema=IMAGE_FEATURES_SCHEMA
    )


def sample_video_frames(media_df, every_n: int = 10, max_frames: int = 5, fake: bool = True):
    """video rows → (media_id, frame_idx, frame_phash): one output row
    per sampled frame (one→many mapInPandas). Fake decoder derives
    per-frame hashes from (payload, frame_idx) deterministically."""
    from pyspark.sql import functions as F

    if not fake:  # pragma: no cover
        raise DecoderUnavailable("video decoding requires ffmpeg; use fake=True")

    videos = media_df.where(F.col("media_type") == "video")

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"media_id": [], "frame_idx": [], "frame_phash": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                n_frames = min(max_frames, 1 + zlib.crc32(payload) % max_frames)
                for j in range(n_frames):
                    d = hashlib.sha256(payload + str(j * every_n).encode()).digest()
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(j * every_n)
                    rows["frame_phash"].append(int.from_bytes(d[:8], "big", signed=True))
            yield pd.DataFrame(rows)

    return videos.select("media_id", "payload").mapInPandas(_batch, schema=FRAME_SAMPLE_SCHEMA)


def gen_media_fixture(n: int = 50) -> pd.DataFrame:
    """Deterministic media table: alternating image/video/audio rows
    with payload bytes derived from the row index."""
    rows = {"media_id": [], "media_type": [], "payload": [], "meta": []}
    kinds = ["image", "video", "audio"]
    for i in range(n):
        kind = kinds[i % 3]
        rows["media_id"].append(i)
        rows["media_type"].append(kind)
        rows["payload"].append(hashlib.sha256(f"media-{i}".encode()).digest() * (1 + i % 7))
        rows["meta"].append({"src": f"s3://corpus/{kind}/{i}", "codec": "fake"})
    return pd.DataFrame(rows)
