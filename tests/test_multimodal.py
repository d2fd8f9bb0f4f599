"""Multimodal plumbing tests: the Spark-side schema/batching/fan-out is
real; the codec is a deterministic fake (no media libs in container)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from data_engineer_challenge_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    media_profile,
    sample_frames,
)


def fake_decode(payload: bytes, kind: str) -> list[float]:
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:16]]


@pytest.fixture()
def media(spark):
    rows = [
        (1, "image", b"\x89PNGfake1", ("image/png", 64, 64, None)),
        (2, "image", b"\x89PNGfake2", ("image/png", 32, 32, None)),
        (3, "audio", b"RIFFfake", ("audio/wav", None, None, 2500)),
        (4, "video", b"\x00\x00ftypfake", ("video/mp4", 1920, 1080, 3500)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(2)


def test_extract_features_shape_and_determinism(media):
    out = {r["media_id"]: r for r in extract_features(media, fake_decode).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert all(len(r["features"]) == 16 for r in out.values())
    assert out[1]["features"] != out[2]["features"]
    again = {r["media_id"]: r for r in extract_features(media, fake_decode).collect()}
    assert out[1]["features"] == again[1]["features"]


def test_extract_features_without_codec_raises(media):
    with pytest.raises(Exception, match="NotImplementedError|no media codec"):
        extract_features(media).collect()


def test_sample_frames_fanout(media):
    frames = sample_frames(media, every_ms=1000).collect()
    # 3500ms video, 1000ms step → ts 0,1000,2000,3000
    assert [(r["media_id"], r["frame_ms"]) for r in sorted(frames, key=lambda r: r["frame_ms"])] == [
        (4, 0), (4, 1000), (4, 2000), (4, 3000)
    ]


def test_sample_frames_with_decoder(media):
    def grab(payload: bytes, ms: int) -> bytes:
        return hashlib.sha256(payload + ms.to_bytes(4, "big")).digest()[:8]

    frames = sample_frames(media, every_ms=2000, decode_frame=grab).collect()
    assert len(frames) == 2  # 0, 2000
    assert all(len(r["frame"]) == 8 for r in frames)


def test_media_profile_prunes_payload(media):
    prof = media_profile(media)
    rows = {(r["kind"], r["mime"]): r for r in prof.collect()}
    assert rows[("image", "image/png")]["n_items"] == 2
    assert rows[("audio", "audio/wav")]["total_bytes"] == len(b"RIFFfake")
