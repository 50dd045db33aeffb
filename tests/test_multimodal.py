"""Multimodal plumbing tests: schema/batch shape are real, decode is a
deterministic fake (container has no codecs); the NotImplementedError
plug-point is asserted explicitly.
"""

import pytest
from pyspark.sql import functions as F

from joern_spark.analytics.multimodal import (
    _decode_image,
    audio_features,
    image_features,
    image_resize_meta,
    media_refs_from_docs,
    video_frame_sample,
)


@pytest.fixture(scope="module")
def media(spark):
    return spark.createDataFrame(
        [(f"bin://m{i}",) for i in range(10)], "media_ref string"
    )


def test_image_features_deterministic(media):
    a = {r["media_ref"]: (r["width"], r["height"], r["phash"]) for r in image_features(media).collect()}
    b = {r["media_ref"]: (r["width"], r["height"], r["phash"]) for r in image_features(media).collect()}
    assert a == b
    assert len(a) == 10
    assert all(len(v[2]) == 64 for v in a.values())


def test_resize_changes_dims_not_identity(media):
    out = {r["media_ref"]: (r["width"], r["height"]) for r in image_resize_meta(media, target=16).collect()}
    assert all(v == (16, 16) for v in out.values())


def test_audio_features(media):
    rows = audio_features(media).collect()
    assert len(rows) == 10
    assert all(r["sample_rate"] == 16000 and r["n_samples"] >= 1000 for r in rows)


def test_frame_sample_shape(media):
    rows = video_frame_sample(media, every_n=4, n_frames=16).collect()
    assert len(rows) == 10 * 4
    assert {r["frame_index"] for r in rows} == {0, 4, 8, 12}


def test_codec_plug_point_raises():
    with pytest.raises(NotImplementedError):
        _decode_image("bin://x", None, deterministic_fake=False)


def test_media_universe_from_spans(cpg):
    refs = {r["media_ref"] for r in media_refs_from_docs(cpg.spans).collect()}
    assert "bin://blob-1" in refs and "bin://blob-2" in refs
