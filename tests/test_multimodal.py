"""Multimodal plumbing: binary columns + Arrow-batched kernels.
Decode is a deterministic fake; schema/partition/batch shapes real."""

import pytest
from pyspark.sql import functions as F

from mr_lda_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark, documents):
    df = mm.synthesize_media_from_documents(documents)
    df.persist().count()
    return df


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == [
        f.name for f in mm.MEDIA_SCHEMA.fields
    ]


def test_image_features_deterministic(spark, media):
    a = {r["media_id"]: r["feature"] for r in mm.extract_image_features(media).collect()}
    b = {r["media_id"]: r["feature"] for r in mm.extract_image_features(media).collect()}
    assert a == b
    assert all(len(v) == 64 for v in a.values())
    n_images = media.filter(F.col("kind") == "image").count()
    assert len(a) == n_images


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"abc", fake=False)
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"abc", fake=False)


def test_resize_images(spark, media):
    out = mm.resize_images(media, 8, 8).collect()
    assert out
    for r in out:
        assert r["width"] == 8 and r["height"] == 8
        assert len(r["payload"]) == 8 * 8 * 3


def test_sample_video_frames(spark, media):
    frames = mm.sample_video_frames(media, every_ms=1000)
    rows = frames.collect()
    assert rows
    per_media = {}
    for r in rows:
        per_media.setdefault(r["media_id"], []).append(r["frame_index"])
    durations = {
        r["media_id"]: r["duration_ms"]
        for r in media.filter(F.col("kind") == "video").collect()
    }
    for mid, idxs in per_media.items():
        assert sorted(idxs) == list(range(len(idxs)))
        assert len(idxs) == max(1, durations[mid] // 1000)


def test_extract_audio_features(spark, media):
    from pyspark.sql import functions as F

    out = mm.extract_audio_features(media).collect()
    assert out and all(len(r["feature"]) == 32 for r in out)
    n_audio = media.filter(F.col("kind") == "audio").count()
    assert len(out) == n_audio
    # Deterministic: same payload → same features.
    again = mm.extract_audio_features(media).collect()
    assert {r["media_id"]: r["feature"] for r in out} == {
        r["media_id"]: r["feature"] for r in again
    }
