"""Multimodal: real Spark schemas/batch shapes; REAL codec-free
decode for PPM/BMP (pure numpy) with a real average-hash; the
compressed-format seam raises; fake decoder for arbitrary binary."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kgpipe.operators.multimodal import (
    MEDIA_SCHEMA,
    DecoderUnavailable,
    _ahash64,
    _decode_bmp,
    _decode_image_real,
    _decode_ppm,
    decode_image_features,
    encode_bmp,
    encode_ppm,
    gen_image_fixture,
    gen_media_fixture,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    return spark.createDataFrame(gen_media_fixture(60), schema=MEDIA_SCHEMA)


def test_image_features_schema_and_determinism(spark, media):
    feats = decode_image_features(media, fake=True)
    rows = feats.collect()
    n_images = media.where(F.col("media_type") == "image").count()
    assert len(rows) == n_images
    r0 = rows[0]
    assert isinstance(r0.features, list) and len(r0.features) == 8
    assert r0.width >= 64 and r0.height >= 64 and r0.n_bytes > 0
    # determinism across parallelism
    rows2 = decode_image_features(media.repartition(7), fake=True).collect()
    assert sorted((r.media_id, r.phash) for r in rows2) == sorted(
        (r.media_id, r.phash) for r in rows
    )


def test_video_frame_sampling_one_to_many(spark, media):
    frames = sample_video_frames(media, every_n=10, max_frames=5).collect()
    n_videos = media.where(F.col("media_type") == "video").count()
    by_vid = {}
    for r in frames:
        by_vid.setdefault(r.media_id, []).append(r.frame_idx)
    assert len(by_vid) == n_videos
    for vid, idxs in by_vid.items():
        assert idxs == sorted(idxs) or sorted(idxs) == list(idxs)  # multiset ok
        assert all(i % 10 == 0 for i in idxs)
        assert 1 <= len(idxs) <= 5


def test_audio_rows_never_cross_python_boundary(spark, media):
    feats = decode_image_features(media, fake=True)
    ids = {r.media_id for r in feats.collect()}
    audio_ids = {r.media_id for r in media.where(F.col("media_type") == "audio").collect()}
    assert ids.isdisjoint(audio_ids)


def test_compressed_formats_raise():
    with pytest.raises(DecoderUnavailable):
        _decode_image_real(b"\x89PNG\r\n\x1a\n....")


def _gradient(h, w, tint=0):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 255 // max(w - 1, 1)).astype(np.uint8),
         (yy * 255 // max(h - 1, 1)).astype(np.uint8),
         np.full((h, w), tint, dtype=np.uint8)],
        axis=2,
    )


def test_ppm_and_bmp_roundtrip_pixels():
    img = _gradient(13, 21, tint=99)  # odd width exercises BMP row padding
    assert np.array_equal(_decode_ppm(encode_ppm(img)), img)
    assert np.array_equal(_decode_bmp(encode_bmp(img)), img)


def test_real_decode_dimensions_and_phash_semantics():
    img = _gradient(32, 48, tint=10)
    w, h, ph, feats = _decode_image_real(encode_ppm(img))
    assert (w, h) == (48, 32)
    # identical pixels through a DIFFERENT container → identical hash
    w2, h2, ph2, _ = _decode_image_real(encode_bmp(img))
    assert (w2, h2, ph2) == (w, h, ph)
    # a uniform brightness shift barely moves the average-hash...
    ph3 = _ahash64(np.clip(img.astype(int) + 8, 0, 255).astype(np.uint8))
    assert bin((ph ^ ph3) & ((1 << 64) - 1)).count("1") <= 8
    # ...while an unrelated image is far away
    ph4 = _ahash64(_gradient(32, 48, tint=10)[::-1, ::-1].copy())
    assert bin((ph ^ ph4) & ((1 << 64) - 1)).count("1") > 8
    assert len(feats) == 8 and 0.0 <= feats[0] <= 1.0


def test_real_decoder_through_spark(spark):
    media = spark.createDataFrame(gen_image_fixture(30), schema=MEDIA_SCHEMA)
    rows = decode_image_features(media, fake=False).collect()
    assert len(rows) == 30
    for r in rows:
        assert r.width >= 16 and r.height >= 12 and len(r.features) == 8
    # determinism across parallelism, same contract as the fake path
    rows2 = decode_image_features(media.repartition(5), fake=False).collect()
    assert sorted((r.media_id, r.phash) for r in rows2) == sorted(
        (r.media_id, r.phash) for r in rows
    )


def test_block_resize_exact_on_integer_ratio():
    from kgpipe.operators.multimodal import block_resize

    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[:2, :2] = 100
    img[:2, 2:] = 200
    img[2:, :2] = 40
    img[2:, 2:] = 8
    small = block_resize(img, 2, 2)
    assert small[0, 0, 0] == 100 and small[0, 1, 0] == 200
    assert small[1, 0, 0] == 40 and small[1, 1, 0] == 8


def test_resize_images_through_spark(spark):
    from kgpipe.operators.multimodal import (
        MEDIA_SCHEMA, _decode_ppm, gen_image_fixture, resize_images,
    )

    media = spark.createDataFrame(gen_image_fixture(12), schema=MEDIA_SCHEMA)
    rows = resize_images(media, out_w=8, out_h=8).collect()
    assert len(rows) == 12
    for r in rows:
        img = _decode_ppm(bytes(r.ppm))
        assert img.shape == (8, 8, 3)


def test_wav_roundtrip_and_features(spark):
    from kgpipe.operators.multimodal import (
        MEDIA_SCHEMA, _decode_wav, audio_features, encode_wav,
    )

    # 443 Hz: doesn't divide 8 kHz, so no sample lands exactly on a
    # zero (a zero-valued sample is neither + nor − and would be
    # skipped by the sign-product crossing count)
    sr, dur, freq, amp = 8000, 2.0, 443.0, 10000
    t = np.arange(int(sr * dur)) / sr
    samples = (amp * np.sin(2 * np.pi * freq * t)).astype("<i2")
    payload = encode_wav(samples, sr)
    got_sr, got_nc, got = _decode_wav(payload)
    assert (got_sr, got_nc) == (sr, 1) and np.array_equal(got, samples)

    rows = {"media_id": [1, 2], "media_type": ["audio", "audio"],
            "payload": [payload, b"not a wav"], "meta": [{}, {}]}
    import pandas as pd

    media = spark.createDataFrame(pd.DataFrame(rows), schema=MEDIA_SCHEMA)
    feats = audio_features(media).collect()
    assert len(feats) == 1, "non-WAV audio drops at the codec seam"
    f = feats[0]
    assert f.media_id == 1 and f.sample_rate == sr and f.n_channels == 1
    assert abs(f.duration_s - dur) < 1e-9
    # sine RMS = amp/sqrt(2); zero crossings = 2 per cycle
    assert abs(f.rms - amp / np.sqrt(2)) / (amp / np.sqrt(2)) < 0.01
    assert abs(f.zero_crossings - 2 * freq * dur) <= 4


# ---- optional-codec tier (skip-if-absent, like the Iceberg seam) ----

def _pil_present():
    try:
        import PIL  # noqa: F401
        return True
    except Exception:
        return False


def test_compressed_seam_raises_without_pil(monkeypatch):
    import kgpipe.operators.multimodal as mm

    if _pil_present():
        monkeypatch.setattr(mm, "_PIL_IMAGE", None)  # simulate absence
    else:
        monkeypatch.setattr(mm, "_PIL_IMAGE", "unchecked")  # real probe
    with pytest.raises(mm.DecoderUnavailable):
        mm._decode_compressed(b"\x89PNG\r\n\x1a\nnot-really-a-png")


@pytest.mark.skipif(not _pil_present(), reason="PIL not installed in this container")
def test_compressed_decode_via_pil_roundtrip():
    """When pillow exists, the seam decodes real compressed rasters
    and the result feeds the same ahash/feature path as PPM/BMP."""
    import io

    from PIL import Image

    import kgpipe.operators.multimodal as mm

    img = Image.new("RGB", (10, 6), (200, 30, 60))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    w, h, ph, feats = mm._decode_image_real(buf.getvalue())
    assert (w, h) == (10, 6)
    assert isinstance(ph, int) and len(feats) == 8


def test_video_real_path_requires_ffmpeg(monkeypatch):
    import kgpipe.operators.multimodal as mm

    if mm._ffmpeg_path() is not None:
        monkeypatch.setattr(mm, "_ffmpeg_path", lambda: None)
    with pytest.raises(mm.DecoderUnavailable):
        mm.sample_video_frames(object(), fake=False)


@pytest.mark.skipif(__import__("shutil").which("ffmpeg") is None,
                    reason="ffmpeg not installed in this container")
def test_video_real_path_via_ffmpeg(spark):
    import kgpipe.operators.multimodal as mm

    media = spark.createDataFrame(
        [("v1", "video", b"\x00\x00\x00 ftypisom fake", None)],
        "media_id string, media_type string, payload binary, meta string",
    )
    # a fake payload will fail ffmpeg decode — the point is the seam
    # routes through the binary; real clusters feed real containers
    with pytest.raises(Exception):
        mm.sample_video_frames(media, fake=False).collect()
