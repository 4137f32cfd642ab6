"""Multimodal columns — image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / resize / frame-sample stages.

The training-data-pipeline extension from the build brief: media
travels as a ``binary`` column with a typed metadata struct; per-item
processing runs as Arrow-batched ``mapInPandas`` stages. The actual
codec work (PIL/ffmpeg/soundfile) is NOT available in this container,
so the decode step is a DETERMINISTIC FAKE (clearly marked below):
byte-derived pseudo-dimensions and histogram features. The Spark-side
contract — schema, partitioning, UDF signature, Arrow batch shape — is
real and is what these functions pin down; swapping the fake for a real
codec changes only the inner per-row function.

Scale notes: media rows are large (MBs) — keep
``spark.sql.files.maxPartitionBytes`` low enough that a partition of
payloads fits executor memory, and repartition by a hash of the id
before decode so one straggler file can't skew a partition. Feature
vectors (small) should be written to a separate narrow table so
downstream similarity joins never drag payload bytes through a shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_KINDS = ["image", "audio", "video"]

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("byte_len", T.LongType(), True),
                    T.StructField("content_hash", T.StringType(), True),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)

_FORMATS = {"image": "png", "audio": "wav", "video": "mp4"}


def attach_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic media table from the documents table (testdata has
    no real binaries): payload = utf-8 bytes of the text, kind cycles by
    id. Gives every downstream stage a reproducible binary input."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in MEDIA_KINDS]), (F.col(id_col) % 3 + 1).cast("int")
    )
    content = F.encode(F.col(text_col), "utf-8")
    fmt = F.element_at(
        F.array(*[F.lit(_FORMATS[k]) for k in MEDIA_KINDS]),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        content.alias("content"),
        F.struct(
            F.octet_length(F.encode(F.col(text_col), "utf-8")).cast("long").alias("byte_len"),
            F.md5(F.encode(F.col(text_col), "utf-8")).alias("content_hash"),
            fmt.alias("format"),
        ).alias("meta"),
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """Typed metadata projection — pure JVM exprs over the binary
    column (byte length, content hash, format). The cheap pass that
    runs BEFORE any decode fan-out at scale."""
    return media.select(
        "media_id",
        "kind",
        F.octet_length("content").cast("long").alias("byte_len"),
        F.md5("content").alias("content_hash"),
        F.col("meta.format").alias("format"),
    )


# ------------------------------------------------------- real P6 codec
#
# The container has no image libraries, but binary PPM (P6) is a
# self-describing uncompressed format a 20-line codec covers — so the
# decode/resize stages are REAL for payloads in a format we control
# (VERDICT r7 #5), and the deterministic fake below remains only the
# fallback for payloads in formats that would need PIL/ffmpeg.


def _ppm_encode(img) -> bytes:
    """(h, w, 3) uint8 array → binary P6 bytes."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype("uint8").tobytes()


def _ppm_decode(payload: bytes | None):
    """Binary P6 → (h, w, 3) uint8 array, or None when the payload is
    not a well-formed P6 (wrong magic, malformed header, maxval ≠ 255,
    truncated pixel data) — callers fall back rather than raise, the
    tolerant posture a 100 TB decode stage needs for corrupt files."""
    import re

    import numpy as np

    if not payload or not payload.startswith(b"P6"):
        return None
    m = re.match(rb"P6\s+(?:#[^\n]*\s+)*(\d+)\s+(\d+)\s+(\d+)[ \t\r\n]", payload)
    if not m:
        return None
    w, h, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if maxval != 255 or not (0 < w <= 1 << 16 and 0 < h <= 1 << 16):
        return None
    start, need = m.end(), w * h * 3
    if len(payload) - start < need:
        return None
    return np.frombuffer(payload, dtype=np.uint8, count=need, offset=start).reshape(
        h, w, 3
    )


def _resize_nn(img, width: int, height: int):
    """Nearest-neighbor resample to (height, width) — two integer index
    gathers, no interpolation dependencies."""
    import numpy as np

    h, w = img.shape[:2]
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return img[rows][:, cols]


def synthesize_ppm(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic real-P6 fixtures from the documents table: width
    ``8 + id % 16``, height ``8 + (id // 16) % 16``, pixel(r, c, ch) =
    ``(id·31 + r·7 + c·3 + ch) % 256`` — integer formulas an oracle can
    mirror without touching bytes. These payloads exercise the REAL
    codec path of decode_media/resize_images end to end."""
    import numpy as np

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("format", T.StringType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for i in pdf[id_col]:
                i = int(i)
                w, h = 8 + i % 16, 8 + (i // 16) % 16
                r = np.arange(h)[:, None, None]
                c = np.arange(w)[None, :, None]
                ch = np.arange(3)[None, None, :]
                img = ((i * 31 + r * 7 + c * 3 + ch) % 256).astype(np.uint8)
                payloads.append(_ppm_encode(img))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "kind": "image",
                    # declared format — decode_media's real-codec gate
                    # keys off this, never off content sniffing
                    "format": "ppm",
                    "content": payloads,
                }
            )

    return docs.select(id_col).mapInPandas(batches, schema)


def _fake_dims(payload: bytes, kind: str) -> tuple[int, int, int, int]:
    """DETERMINISTIC FAKE decode (no codecs in container): pseudo
    width/height/channels/duration derived from hex digits of the
    content digest (hex-digit math so the DuckDB oracle can mirror it
    exactly). Swap this single function for PIL/ffmpeg in production."""
    h = hashlib.md5(payload or b"").hexdigest()
    width = 16 + int(h[0:2], 16) % 64
    height = 16 + int(h[2:4], 16) % 64
    channels = 1 + int(h[4:6], 16) % 3
    duration = int(h[6:10], 16) if kind in ("audio", "video") else 0
    return width, height, channels, duration


def _format_col(media: DataFrame):
    """Declared media format, wherever the frame carries it: a flat
    ``format`` column, the ``meta.format`` field, or NULL when the
    frame declares nothing."""
    if "format" in media.columns:
        return F.col("format")
    if "meta" in media.columns:
        mt = media.schema["meta"].dataType
        if hasattr(mt, "fields") and any(f.name == "format" for f in mt.fields):
            return F.col("meta.format")
    return F.lit(None).cast("string")


def decode_media(media: DataFrame) -> DataFrame:
    """Decode stage: binary → typed dimensions via mapInPandas.

    Arrow-batched; one output row per input row. Payloads DECLARED as
    P6 PPM (``format``/``meta.format`` == 'ppm') decode for REAL
    (header-parsed width/height, 3 channels); every other declared
    format falls to the deterministic ``_fake_dims`` stand-in
    (PIL/ffmpeg not in this container). The real-codec branch is gated
    on the declared format, NOT content sniffing (ADVICE r8): a text
    payload that happens to parse as well-formed PPM must not diverge
    from the format-blind oracle twin. Frames with no format metadata
    keep the legacy sniff-then-fake behavior. Audio/video get
    duration_ms."""

    def _dims(payload, kind, fmt):
        if fmt == "ppm" or fmt is None:
            img = _ppm_decode(payload)
            if img is not None and (fmt == "ppm" or kind == "image"):
                return img.shape[1], img.shape[0], 3, 0
        return _fake_dims(payload, kind)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            fmts = [
                None if f is None or (isinstance(f, float) and pd.isna(f)) else f
                for f in pdf["_fmt"]
            ]
            dims = [
                _dims(c, k, f)
                for c, k, f in zip(pdf["content"], pdf["kind"], fmts)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_channels": [d[2] for d in dims],
                    "duration_ms": [d[3] for d in dims],
                }
            )

    return media.select(
        "media_id", "kind", "content", _format_col(media).alias("_fmt")
    ).mapInPandas(batches, DECODED_SCHEMA)


def media_features(media: DataFrame, n_bins: int = 16) -> DataFrame:
    """Feature-extract stage: byte-histogram feature vector (L1
    normalized) per item via mapInPandas — the deterministic stand-in
    for an image/audio embedding model; identical plumbing."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            feats = []
            for payload in pdf["content"]:
                arr = np.frombuffer(payload or b"\x00", dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=n_bins, range=(0, 256))
                total = hist.sum() or 1
                feats.append((hist / total).astype("float32").tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return media.select("media_id", "content").mapInPandas(batches, FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Resize stage (images only): binary in → binary out, one row per
    image. REAL for P6 PPM payloads (decode → nearest-neighbor resample
    → re-encode, all numpy index math); payloads in formats needing an
    external codec yield NULL content instead of failing the stage —
    at 100 TB one corrupt/unsupported file must not kill the job (count
    the nulls downstream, the usual dead-letter pattern)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for payload in pdf["content"]:
                img = _ppm_decode(payload)
                out.append(
                    _ppm_encode(_resize_nn(img, width, height))
                    if img is not None
                    else None
                )
            yield pd.DataFrame({"media_id": pdf["media_id"], "content": out})

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )
    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "content")
        .mapInPandas(batches, out_schema)
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sample stage (video): one row per sampled frame index.

    Frame count = duration/every_ms (from the decode stage); frame
    payload is a deterministic byte slice stand-in. The fan-out shape
    (1 video → N frame rows, explode AFTER the cheap duration probe,
    payload never duplicated N times in the plan until the slice) is
    the part that matters at scale."""
    decoded = decode_media(media).select("media_id", "duration_ms")
    vids = (
        media.filter(F.col("kind") == "video")
        .join(decoded, "media_id")
        .withColumn(
            "n_frames",
            F.greatest((F.col("duration_ms") / every_ms).cast("int"), F.lit(1)),
        )
    )
    frames = vids.select(
        "media_id",
        "content",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
    )
    # deterministic stand-in for an ffmpeg frame grab: a 16-byte slice
    # at the frame's proportional offset
    offset = (F.col("frame_idx") * 16) % F.greatest(F.octet_length("content") - 16, F.lit(1))
    return frames.select(
        "media_id",
        "frame_idx",
        F.substring(F.col("content"), offset.cast("int") + 1, 16).alias("frame"),
    )


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)


def media_phash(media: DataFrame, side: int = 32) -> DataFrame:
    """Perceptual hash per media item — the pHash algorithm for real
    (resample → 2-D DCT-II → top-left 8×8 coefficients sans DC →
    median threshold → 63-bit fingerprint); ONLY the pixel source is
    the deterministic byte-resample stand-in, the same codec boundary
    as ``decode_media`` (a real decoder changes one line). Arrow-
    batched ``mapInPandas``; the DCT is one numpy matmul per item.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        n_side = side
        k = np.arange(n_side)[:, None]
        n = np.arange(n_side)[None, :]
        dct = np.sqrt(2.0 / n_side) * np.cos(
            np.pi * (2 * n + 1) * k / (2 * n_side)
        )
        dct[0] /= np.sqrt(2.0)
        for pdf in it:
            hashes = []
            for payload in pdf["content"]:
                arr = np.frombuffer(payload or b"\x00", dtype=np.uint8).astype(
                    np.float64
                )
                # FAKE pixel source: point-sample the byte stream into a
                # side x side grid (replace with the decoded, resized
                # grayscale image when a codec is available)
                idx = (np.arange(n_side * n_side) * len(arr)) // (n_side * n_side)
                img = arr[np.minimum(idx, len(arr) - 1)].reshape(n_side, n_side)
                coef = dct @ img @ dct.T
                block = coef[:8, :8].flatten()[1:]  # drop the DC term
                med = np.median(block)
                bits = 0
                for i, v in enumerate(block):
                    if v > med:
                        bits |= 1 << i
                hashes.append(bits)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash": pd.array(hashes, dtype="int64"),
                }
            )

    return media.select("media_id", "content").mapInPandas(batches, PHASH_SCHEMA)


def phash_band_frame(hashed: DataFrame, max_hamming: int) -> DataFrame:
    """(id, band, band_key) bit-band buckets of a ``(media_id, phash)``
    frame: ``max_hamming + 1`` bands — by pigeonhole, any pair within
    ``max_hamming`` shares at least one UNTOUCHED band, so banding is
    recall-lossless. Pure JVM bit arithmetic."""
    n_bands = max_hamming + 1
    width = 63 // n_bands
    band_exprs = []
    start = 0
    for i in range(n_bands):
        w = width if i < n_bands - 1 else 63 - start
        key = F.shiftright(F.col("phash"), start).bitwiseAND(
            F.lit((1 << w) - 1)
        )
        band_exprs.append(
            F.struct(
                F.lit(i).alias("band"),
                key.cast("string").alias("band_key"),
            )
        )
        start += w
    return hashed.select(
        F.col("media_id").alias("id"), F.explode(F.array(*band_exprs)).alias("b")
    ).select("id", "b.band", "b.band_key")


def phash_hamming(a: Column, b: Column) -> Column:
    """Exact Hamming distance between two phash columns — one JVM xor +
    popcount, no Python."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.bit_count(a.bitwiseXOR(b)).cast("int")


def phash_pairs(
    hashed: DataFrame,
    max_hamming: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup pairs from a ``(media_id, phash)`` frame: pigeonhole
    band bucketing (one groupBy; ``max_bucket_size`` caps mega-buckets,
    e.g. solid-color thumbnails) + exact Hamming verify."""
    from customkb_spark.operators.dedup import minhash_candidate_pairs

    pairs = minhash_candidate_pairs(
        phash_band_frame(hashed, max_hamming), max_bucket_size
    )
    ha = hashed.select(
        F.col("media_id").alias("id_a"), F.col("phash").alias("_ha")
    )
    hb = hashed.select(
        F.col("media_id").alias("id_b"), F.col("phash").alias("_hb")
    )
    return (
        pairs.join(ha, "id_a")
        .join(hb, "id_b")
        .withColumn("hamming", phash_hamming("_ha", "_hb"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def phash_near_duplicates(
    media: DataFrame,
    max_hamming: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate media pairs by perceptual hash — image dedup for
    the training-data pipeline. Returns ``id_a, id_b, hamming`` for
    pairs with Hamming distance ≤ ``max_hamming``.

    Scale shape (the MinHash discipline, bit-level): hash map-side
    (``media_phash``), band + bucket + verify via ``phash_pairs`` —
    payload bytes are touched exactly once (the hash stage) and never
    shuffle.
    """
    return phash_pairs(
        media_phash(media).localCheckpoint(eager=False),
        max_hamming,
        max_bucket_size,
    )
