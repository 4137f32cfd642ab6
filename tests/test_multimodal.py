"""Multimodal plumbing: schema shape, deterministic decode, feature
vectors, frame fan-out, resize stub gating."""

import pytest
from pyspark.sql import functions as F

from customkb_spark.operators import multimodal as M


def _media(spark, documents):
    return M.attach_media(documents.limit(9))


def test_attach_media_schema(spark, documents):
    media = _media(spark, documents)
    assert [f.name for f in media.schema.fields] == ["media_id", "kind", "content", "meta"]
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds <= set(M.MEDIA_KINDS)
    row = media.first()
    assert isinstance(row["content"], (bytes, bytearray))
    assert row["meta"]["byte_len"] == len(row["content"])


def test_media_metadata_matches_content(spark, documents):
    media = _media(spark, documents)
    out = M.media_metadata(media).collect()
    for r in out:
        assert r["byte_len"] > 0 and len(r["content_hash"]) == 32
        assert r["format"] in {"png", "wav", "mp4"}


def test_decode_deterministic_and_bounded(spark, documents):
    media = _media(spark, documents)
    a = {r["media_id"]: r for r in M.decode_media(media).collect()}
    b = {r["media_id"]: r for r in M.decode_media(media).collect()}
    for mid, r in a.items():
        assert (r["width"], r["height"]) == (b[mid]["width"], b[mid]["height"])
        assert 16 <= r["width"] < 80 and 16 <= r["height"] < 80
        assert 1 <= r["n_channels"] <= 3
        if r["kind"] == "image":
            assert r["duration_ms"] == 0
        else:
            assert r["duration_ms"] >= 0


def test_features_normalized(spark, documents):
    media = _media(spark, documents)
    out = M.media_features(media, n_bins=16).collect()
    for r in out:
        assert len(r["features"]) == 16
        assert abs(sum(r["features"]) - 1.0) < 1e-3


def test_resize_is_explicit_stub(spark, documents):
    media = _media(spark, documents)
    with pytest.raises(Exception, match="(?i)codec|NotImplemented"):
        M.resize_images(media).collect()


def test_sample_frames_fanout(spark, documents):
    media = _media(spark, documents)
    frames = M.sample_frames(media, every_ms=5000)
    rows = frames.collect()
    vids = {r["media_id"] for r in media.filter(F.col("kind") == "video").collect()}
    assert {r["media_id"] for r in rows} == vids
    per_vid = {}
    for r in rows:
        per_vid.setdefault(r["media_id"], []).append(r["frame_idx"])
    for mid, idxs in per_vid.items():
        assert sorted(idxs) == list(range(len(idxs)))  # dense 0..n-1
