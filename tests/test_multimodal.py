"""Multimodal binary-column plumbing (stubbed decode, real Spark
machinery)."""

from __future__ import annotations

import pytest

from lsdm_motogp_data_integration_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    frame_sample,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNG fake bytes", ("image/png", 64, 64, None)),
        (2, "image", b"\x89PNG fake bytes", ("image/png", 64, 64, None)),
        (3, "audio", b"RIFF fake", ("audio/wav", None, None, 2500)),
        (4, "video", b"\x00\x00ftyp fake", ("video/mp4", 640, 480, 3500)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_contract(media):
    out = extract_features(media, dim=16).collect()
    assert len(out) == 4
    by_id = {r["media_id"]: r for r in out}
    # deterministic: identical bytes -> identical digest and features
    assert by_id[1]["digest"] == by_id[2]["digest"]
    assert list(by_id[1]["features"]) == list(by_id[2]["features"])
    assert by_id[1]["digest"] != by_id[3]["digest"]
    for r in out:
        assert len(r["features"]) == 16
        assert r["n_bytes"] > 0


def test_frame_sample_explodes_video_only(media):
    frames = frame_sample(media, every_ms=1000).collect()
    # one video of 3500 ms -> frames at 0, 1000, 2000, 3000
    assert len(frames) == 4
    assert {f["media_id"] for f in frames} == {4}
    assert sorted(f["frame_ms"] for f in frames) == [0, 1000, 2000, 3000]
    assert len({f["frame_digest"] for f in frames}) == 4


def test_real_decode_is_gated(media):
    with pytest.raises(Exception) as exc_info:
        extract_features(media, fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_resize_images_contract(media, spark):
    from lsdm_motogp_data_integration_spark.operators.multimodal import (
        resize_images,
    )

    out = resize_images(media, 4, 3).collect()
    imgs = {r["media_id"] for r in media.filter("kind = 'image'").collect()}
    assert {r["media_id"] for r in out} == imgs
    for r in out:
        assert (r["width"], r["height"]) == (4, 3)
        assert r["content"] is None or len(r["content"]) == 4 * 3 * 3
    # deterministic: same inputs, same bytes
    again = resize_images(media, 4, 3).collect()
    assert {(r["media_id"], r["digest"]) for r in out} == {
        (r["media_id"], r["digest"]) for r in again
    }


def test_resize_real_path_is_gated(media):
    from lsdm_motogp_data_integration_spark.operators.multimodal import (
        resize_images,
    )

    import pytest as _pytest

    with _pytest.raises(Exception):
        resize_images(media, 4, 3, fake=False).collect()
