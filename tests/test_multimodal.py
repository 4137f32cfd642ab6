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


def test_resize_non_ppm_yields_null_content(spark, documents):
    """Payloads in formats needing an external codec (the text-derived
    fixtures) resize to NULL content — dead-letter rows, not a killed
    stage (r8: the NotImplementedError stub is retired)."""
    media = _media(spark, documents)
    rows = M.resize_images(media).collect()
    assert rows  # image-kind rows exist
    assert all(r["content"] is None for r in rows)


def test_ppm_codec_roundtrip():
    import numpy as np

    img = (np.arange(6 * 4 * 3) % 256).reshape(4, 6, 3).astype(np.uint8)
    payload = M._ppm_encode(img)
    assert payload.startswith(b"P6\n6 4\n255\n")
    back = M._ppm_decode(payload)
    assert back.shape == (4, 6, 3)
    assert (back == img).all()
    # malformed inputs decode to None, never raise
    assert M._ppm_decode(None) is None
    assert M._ppm_decode(b"plain text") is None
    assert M._ppm_decode(b"P6\n6 4\n255\nshort") is None  # truncated pixels
    assert M._ppm_decode(b"P6\n6 4\n65535\n" + bytes(6 * 4 * 3)) is None  # maxval
    # comments in the header are legal PPM
    assert M._ppm_decode(
        b"P6\n# a comment\n2 2\n255\n" + bytes(12)
    ).shape == (2, 2, 3)


def test_resize_nearest_neighbor_exact():
    """Pixel-exact nearest-neighbor semantics: out[r][c] =
    in[(r*H_in)//H_out][(c*W_in)//W_out]."""
    import numpy as np

    img = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    out = M._resize_nn(img, width=3, height=5)
    assert out.shape == (5, 3, 3)
    for r in range(5):
        for c in range(3):
            assert (out[r, c] == img[(r * 8) // 5, (c * 8) // 3]).all()


def test_resize_images_real_ppm(spark, documents):
    """End-to-end through the Spark stage: synthesize real P6 → resize
    → decode dims == target, bytes == header + pixels; dims of the
    source match the synthesize_ppm formulas."""
    ppm = M.synthesize_ppm(documents)
    src = {r["media_id"]: r for r in M.decode_media(ppm).collect()}
    for mid, r in src.items():
        assert r["width"] == 8 + mid % 16
        assert r["height"] == 8 + (mid // 16) % 16
        assert r["n_channels"] == 3
    resized = M.resize_images(ppm, width=24, height=16).collect()
    assert len(resized) == len(src)
    header = len(b"P6\n24 16\n255\n")
    for r in resized:
        assert len(r["content"]) == header + 24 * 16 * 3
    from pyspark.sql import Row

    dec = M.decode_media(
        documents.sparkSession.createDataFrame(
            [Row(media_id=r["media_id"], kind="image", content=r["content"])
             for r in resized]
        )
    ).collect()
    assert all(r["width"] == 24 and r["height"] == 16 for r in dec)


def test_resize_pixels_match_numpy(spark):
    """The distributed stage's PIXELS equal local decode→resample→encode
    (not just the shape)."""
    import numpy as np
    from pyspark.sql import Row

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(10, 14, 3), dtype=np.uint8)
    payload = M._ppm_encode(img)
    media = None
    from pyspark.sql import SparkSession

    spark_ = spark
    media = spark_.createDataFrame(
        [Row(media_id=1, kind="image", content=bytearray(payload))]
    )
    out = M.resize_images(media, width=5, height=7).collect()[0]["content"]
    expected = M._ppm_encode(M._resize_nn(img, 5, 7))
    assert bytes(out) == expected


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


# ------------------------------------------ perceptual-hash dedup


def _media_rows(spark, rows):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_media_phash_matches_pure_python_reference(spark):
    import numpy as np

    from customkb_spark.operators.multimodal import media_phash

    payload = bytes(range(256)) * 8
    got = media_phash(_media_rows(spark, [(1, "image", payload)])).collect()[0]

    # independent reference computation
    side = 32
    k = np.arange(side)[:, None]
    n = np.arange(side)[None, :]
    D = np.sqrt(2.0 / side) * np.cos(np.pi * (2 * n + 1) * k / (2 * side))
    D[0] /= np.sqrt(2.0)
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    idx = (np.arange(side * side) * len(arr)) // (side * side)
    img = arr[np.minimum(idx, len(arr) - 1)].reshape(side, side)
    block = (D @ img @ D.T)[:8, :8].flatten()[1:]
    med = np.median(block)
    ref = 0
    for i, v in enumerate(block):
        if v > med:
            ref |= 1 << i
    assert got.phash == ref
    assert 0 <= got.phash < (1 << 63)  # 63 bits, sign-safe


def test_phash_near_duplicates_finds_near_and_skips_far(spark):
    import random

    from customkb_spark.operators.multimodal import phash_near_duplicates

    random.seed(9)
    base = bytes(random.randrange(256) for _ in range(4096))
    tweaked = bytearray(base)
    tweaked[100] ^= 0xFF  # one byte of 4096: perceptually identical
    other = bytes(random.randrange(256) for _ in range(4096))
    media = _media_rows(
        spark,
        [
            (1, "image", base),
            (2, "image", bytes(tweaked)),
            (3, "image", base),  # exact copy of 1
            (4, "image", other),
        ],
    )
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in phash_near_duplicates(media, max_hamming=8).collect()
    }
    assert pairs[(1, 3)] == 0  # identical payloads: hamming 0
    assert (1, 2) in pairs and pairs[(1, 2)] <= 8  # near-identical found
    assert not any(4 in p for p in pairs)  # unrelated content not paired


def test_phash_banding_is_pigeonhole_lossless(spark):
    """Any pair within max_hamming shares >= one untouched bit band:
    flip exactly max_hamming bits spread adversarially and the pair
    must still be emitted."""
    import random

    from pyspark.sql import functions as F

    from customkb_spark.operators import multimodal as MM

    random.seed(4)
    payload = bytes(random.randrange(256) for _ in range(2048))
    media = _media_rows(spark, [(1, "image", payload), (2, "image", payload)])
    h = MM.media_phash(media).collect()[0].phash
    # craft a second hash at exactly hamming=4 by flipping one bit in
    # four different bands (the adversarial spread), then verify the
    # band keys still collide somewhere
    max_h = 4
    n_bands = max_h + 1
    width = 63 // n_bands
    flipped = h
    for b in range(max_h):  # touch 4 of the 5 bands
        flipped ^= 1 << (b * width)
    shared = 0
    start = 0
    for i in range(n_bands):
        w = width if i < n_bands - 1 else 63 - start
        mask = (1 << w) - 1
        if (h >> start) & mask == (flipped >> start) & mask:
            shared += 1
        start += w
    assert shared >= 1  # pigeonhole: the untouched band collides
