"""Multimodal column handling: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side plumbing — schemas, Arrow batch shapes, mapInPandas
signatures, partitioning — is real and tested. Decoding has three
tiers:

  * REAL for uncompressed raster formats: PPM (P6) and BMP (24bpp
    BI_RGB) decode in pure numpy — no codec library needed — and feed
    a real average-hash (8×8 block-mean aHash) plus per-channel
    moment features.
  * UNAVAILABLE for compressed formats (JPEG/PNG/video): this
    container has no PIL/ffmpeg, so those raise DecoderUnavailable —
    `_decode_compressed` is the one seam to swap when codecs exist.
  * FAKE (fake=True): a deterministic pure function of the payload
    bytes, for exercising downstream plumbing with arbitrary binary.
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
    """Raised for formats that need a codec library absent here."""


def _decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → HxWx3 uint8. Header: 'P6' <w> <h> <maxval>,
    whitespace/comment separated, then raw RGB rows."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to end of line
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise DecoderUnavailable("16-bit PPM not supported")
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
    return data.reshape(h, w, 3)


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24bpp BMP (BI_RGB) → HxWx3 uint8 (RGB order,
    top-down). Rows are 4-byte aligned and stored bottom-up when the
    header height is positive."""
    if not payload.startswith(b"BM"):
        raise ValueError("not a BMP")

    def u32(off):
        return int.from_bytes(payload[off : off + 4], "little")

    def s32(off):
        return int.from_bytes(payload[off : off + 4], "little", signed=True)

    data_off = u32(10)
    w, h_signed = s32(18), s32(22)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = u32(30)
    if bpp != 24 or compression != 0:
        raise DecoderUnavailable(f"BMP bpp={bpp} compression={compression} needs a codec lib")
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_off)
    img = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if h_signed > 0:
        img = img[::-1]  # bottom-up storage
    return img[:, :, ::-1].copy()  # BGR → RGB


def _ahash64(img: np.ndarray) -> int:
    """Real perceptual average-hash: gray → 8×8 block means →
    sign-vs-mean bit per block, packed MSB-first into a signed i64."""
    gray = img.astype(np.float32).mean(axis=2)
    h, w = gray.shape
    if h < 8:
        gray = np.repeat(gray, -(-8 // h), axis=0)
    if w < 8:
        gray = np.repeat(gray, -(-8 // w), axis=1)
    blocks = np.array(
        [[b.mean() for b in np.array_split(row_band, 8, axis=1)]
         for row_band in np.array_split(gray, 8, axis=0)]
    )
    bits = (blocks >= blocks.mean()).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def _features(img: np.ndarray) -> np.ndarray:
    """8 floats: per-channel mean and std (normalized to [0,1]),
    aspect ratio, and gray dynamic range."""
    f = img.astype(np.float32) / 255.0
    gray = f.mean(axis=2)
    return np.array(
        [*f.mean(axis=(0, 1)), *f.std(axis=(0, 1)),
         img.shape[1] / img.shape[0], float(gray.max() - gray.min())],
        dtype=np.float32,
    )


_PIL_IMAGE = "unchecked"


def _pil_image():
    """Optional-codec detection, once per process (mirrors the
    Iceberg skip-if-no-jar seam): PIL is not shipped in this
    container, but a cluster image that has it gets real JPEG/PNG/
    WebP decoding with zero config. Returns PIL.Image or None."""
    global _PIL_IMAGE
    if _PIL_IMAGE == "unchecked":
        try:  # pragma: no cover - depends on environment
            from PIL import Image

            _PIL_IMAGE = Image
        except Exception:
            _PIL_IMAGE = None
    return _PIL_IMAGE


def _decode_compressed(payload: bytes) -> np.ndarray:
    """Compressed-raster seam: routed through PIL when the library is
    importable, DecoderUnavailable otherwise. The codec-free tier
    (PPM/BMP) never reaches here."""
    image_mod = _pil_image()
    if image_mod is None:
        raise DecoderUnavailable(
            "JPEG/PNG decoding requires PIL/libvips; not present in this "
            "container. Supported codec-free: PPM (P6), BMP (24bpp). "
            "Install pillow to enable this tier."
        )
    import io  # pragma: no cover - exercised only where PIL exists

    img = image_mod.open(io.BytesIO(payload)).convert("RGB")
    return np.asarray(img, dtype=np.uint8)


def _decode_image_real(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Codec-free decode for uncompressed rasters; compressed formats
    go through the optional-PIL seam."""
    if payload.startswith(b"P6"):
        img = _decode_ppm(payload)
    elif payload.startswith(b"BM"):
        img = _decode_bmp(payload)
    else:
        img = _decode_compressed(payload)
    return img.shape[1], img.shape[0], _ahash64(img), _features(img)


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

    fake=False decodes REAL rasters (PPM/BMP codec-free; compressed
    formats raise DecoderUnavailable until a codec lib exists);
    fake=True runs the deterministic fake over arbitrary binary.

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


def _ffmpeg_path():
    """Optional-codec detection for video (same seam pattern as
    _pil_image): an ffmpeg binary on PATH enables real frame
    sampling; this container ships none."""
    import shutil

    return shutil.which("ffmpeg")


def _ffmpeg_sample_frames(
    payload: bytes, every_n: int, max_frames: int
) -> list[tuple[int, int]]:  # pragma: no cover - needs ffmpeg binary
    """Real frame sampler: ffmpeg decodes stdin, keeps every
    every_n-th frame scaled to 64×64 RGB rawvideo on stdout; each
    frame is aHashed with the same _ahash64 as still images.
    → [(frame_idx, phash), ...]"""
    import subprocess

    ffmpeg = _ffmpeg_path()
    if ffmpeg is None:
        # re-check on the EXECUTOR: the driver having ffmpeg does not
        # mean worker images do
        raise DecoderUnavailable("no ffmpeg binary on this worker's PATH")
    cmd = [
        ffmpeg, "-v", "error", "-i", "pipe:0",
        "-vf", f"select=not(mod(n\\,{every_n})),scale=64:64",
        "-vsync", "vfr", "-frames:v", str(max_frames),
        "-f", "rawvideo", "-pix_fmt", "rgb24", "pipe:1",
    ]
    res = subprocess.run(cmd, input=payload, capture_output=True, timeout=120)
    if res.returncode != 0:
        raise DecoderUnavailable(f"ffmpeg failed: {res.stderr[-500:]!r}")
    frame_bytes = 64 * 64 * 3
    out = []
    for j in range(len(res.stdout) // frame_bytes):
        arr = np.frombuffer(
            res.stdout[j * frame_bytes : (j + 1) * frame_bytes], dtype=np.uint8
        ).reshape(64, 64, 3)
        out.append((j * every_n, _ahash64(arr)))
    return out


def sample_video_frames(media_df, every_n: int = 10, max_frames: int = 5, fake: bool = True):
    """video rows → (media_id, frame_idx, frame_phash): one output row
    per sampled frame (one→many mapInPandas). Fake decoder derives
    per-frame hashes from (payload, frame_idx) deterministically;
    fake=False samples REAL frames through ffmpeg when a binary is on
    PATH (DecoderUnavailable otherwise — this container has none)."""
    from pyspark.sql import functions as F

    if not fake and _ffmpeg_path() is None:
        raise DecoderUnavailable(
            "video decoding requires an ffmpeg binary on PATH; use fake=True"
        )

    videos = media_df.where(F.col("media_type") == "video")

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"media_id": [], "frame_idx": [], "frame_phash": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                if fake:
                    n_frames = min(max_frames, 1 + zlib.crc32(payload) % max_frames)
                    frames = [
                        (
                            j * every_n,
                            int.from_bytes(
                                hashlib.sha256(
                                    payload + str(j * every_n).encode()
                                ).digest()[:8],
                                "big",
                                signed=True,
                            ),
                        )
                        for j in range(n_frames)
                    ]
                else:  # pragma: no cover - needs ffmpeg binary
                    frames = _ffmpeg_sample_frames(payload, every_n, max_frames)
                for idx, ph in frames:
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(idx)
                    rows["frame_phash"].append(ph)
            yield pd.DataFrame(rows)

    return videos.select("media_id", "payload").mapInPandas(_batch, schema=FRAME_SAMPLE_SCHEMA)


def block_resize(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic area-style resize by block averaging: pixel
    (i, j) of the output is the mean of its source rectangle. Pure
    numpy, exact on integer-ratio downscales, sensible on any ratio."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    out = np.empty((out_h, out_w, img.shape[2]), dtype=np.uint8)
    f = img.astype(np.float32)
    for i in range(out_h):
        y0, y1 = ys[i], max(ys[i + 1], ys[i] + 1)
        for j in range(out_w):
            x0, x1 = xs[j], max(xs[j + 1], xs[j] + 1)
            out[i, j] = f[y0:y1, x0:x1].mean(axis=(0, 1)).round()
    return out


RESIZED_SCHEMA = "media_id long, width int, height int, ppm binary"


def resize_images(media_df, out_w: int = 32, out_h: int = 32):
    """Real image resize over binary media columns: decode (codec-free
    PPM/BMP), block-average to (out_w, out_h), re-encode as PPM.
    → (media_id, width, height, ppm). mapInPandas; non-image rows are
    filtered JVM-side. Rows whose format needs an absent codec are
    dropped (same contract as a quarantine — count via anti-join)."""
    from pyspark.sql import functions as F

    images = media_df.where(F.col("media_type") == "image")

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"media_id": [], "width": [], "height": [], "ppm": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                try:
                    if payload.startswith(b"P6"):
                        img = _decode_ppm(payload)
                    elif payload.startswith(b"BM"):
                        img = _decode_bmp(payload)
                    else:
                        continue  # compressed: codec seam absent
                except (ValueError, DecoderUnavailable):
                    continue
                small = block_resize(img, out_w, out_h)
                rows["media_id"].append(mid)
                rows["width"].append(out_w)
                rows["height"].append(out_h)
                rows["ppm"].append(encode_ppm(small))
            yield pd.DataFrame(rows)

    return images.select("media_id", "payload").mapInPandas(_batch, schema=RESIZED_SCHEMA)


# --- audio: codec-free WAV (RIFF PCM) ---------------------------------
AUDIO_FEATURES_SCHEMA = (
    "media_id long, sample_rate int, n_channels int, n_samples long, "
    "duration_s double, rms double, zero_crossings long"
)


def _decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/WAVE with 16-bit PCM → (sample_rate, n_channels,
    samples[int16, interleaved]). Pure struct parsing — no codec lib.
    Compressed/float formats raise DecoderUnavailable."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits != 16:
        raise DecoderUnavailable(
            f"WAV format={audio_format} bits={bits}: only 16-bit PCM decodes codec-free"
        )
    samples = np.frombuffer(data, dtype="<i2", count=len(data) // 2)
    return sample_rate, n_channels, samples


def encode_wav(samples: np.ndarray, sample_rate: int, n_channels: int = 1) -> bytes:
    """int16 samples → minimal RIFF/WAVE PCM bytes (the exact layout
    _decode_wav reads back)."""
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * n_channels * 2
    fmt = (
        (1).to_bytes(2, "little") + n_channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little") + byte_rate.to_bytes(4, "little")
        + (n_channels * 2).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    body = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    body += b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def audio_features(media_df):
    """audio rows → (media_id, sample_rate, n_channels, n_samples,
    duration_s, rms, zero_crossings). Real decode for 16-bit PCM WAV
    (codec-free); other audio payloads are dropped (codec seam)."""
    from pyspark.sql import functions as F

    audio = media_df.where(F.col("media_type") == "audio")

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in (
                "media_id", "sample_rate", "n_channels", "n_samples",
                "duration_s", "rms", "zero_crossings",
            )}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                try:
                    sr, nc, samples = _decode_wav(payload)
                except (ValueError, DecoderUnavailable, IndexError):
                    continue
                x = samples.astype(np.float64)
                n = len(samples) // max(nc, 1)
                rows["media_id"].append(mid)
                rows["sample_rate"].append(sr)
                rows["n_channels"].append(nc)
                rows["n_samples"].append(n)
                rows["duration_s"].append(n / sr if sr else 0.0)
                rows["rms"].append(float(np.sqrt((x ** 2).mean())) if len(x) else 0.0)
                rows["zero_crossings"].append(
                    int(((x[:-1] * x[1:]) < 0).sum()) if len(x) > 1 else 0
                )
            yield pd.DataFrame(rows)

    return audio.select("media_id", "payload").mapInPandas(_batch, schema=AUDIO_FEATURES_SCHEMA)


def encode_ppm(img: np.ndarray) -> bytes:
    """HxWx3 uint8 → binary PPM (P6) bytes."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def encode_bmp(img: np.ndarray) -> bytes:
    """HxWx3 uint8 (RGB) → 24bpp BI_RGB BMP bytes (bottom-up rows,
    4-byte aligned), the exact layout _decode_bmp reads back."""
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    bgr = img[:, :, ::-1].astype(np.uint8)
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    pixel_data = rows[::-1].tobytes()  # bottom-up
    data_off = 14 + 40
    size = data_off + len(pixel_data)
    header = (
        b"BM" + size.to_bytes(4, "little") + b"\0\0\0\0" + data_off.to_bytes(4, "little")
        + (40).to_bytes(4, "little") + w.to_bytes(4, "little") + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little") + (0).to_bytes(4, "little")
        + len(pixel_data).to_bytes(4, "little") + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return header + pixel_data


def gen_image_fixture(n: int = 30) -> pd.DataFrame:
    """Media table whose image payloads are REAL encoded rasters
    (alternating PPM/BMP), deterministic per row: a gradient tinted
    by the row index. Exercises the codec-free real decoder
    end-to-end."""
    rows = {"media_id": [], "media_type": [], "payload": [], "meta": []}
    for i in range(n):
        w, h = 16 + (i % 5) * 8, 12 + (i % 3) * 8
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [
                (xx * 255 // max(w - 1, 1)).astype(np.uint8),
                (yy * 255 // max(h - 1, 1)).astype(np.uint8),
                np.full((h, w), (i * 37) % 256, dtype=np.uint8),
            ],
            axis=2,
        )
        codec = "ppm" if i % 2 == 0 else "bmp"
        payload = encode_ppm(img) if codec == "ppm" else encode_bmp(img)
        rows["media_id"].append(i)
        rows["media_type"].append("image")
        rows["payload"].append(payload)
        rows["meta"].append({"src": f"corpus/image/{i}", "codec": codec})
    return pd.DataFrame(rows)


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
