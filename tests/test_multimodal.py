"""Multimodal plumbing: real Spark schemas/batch shapes, stubbed
codecs (deterministic fake)."""

import pytest
from pyspark.sql import functions as F

from kgpipe.operators.multimodal import (
    MEDIA_SCHEMA,
    DecoderUnavailable,
    decode_image_features,
    gen_media_fixture,
    sample_video_frames,
    _decode_image_real,
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


def test_strict_mode_raises():
    with pytest.raises(DecoderUnavailable):
        _decode_image_real(b"\x89PNG")
