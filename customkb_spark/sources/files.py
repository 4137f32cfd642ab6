"""File sources — reference ingest scan surface (SURVEY.md §2.1).

S1 glob scan       → ``binaryFile`` reader (path/length/modTime/content
                     columns; recursive glob handled by the source).
S2 encoding read   → detection-first decode (_detect_encoding: BOM /
                     utf-16 NUL parity / strict utf-8 / cp1252 C1
                     scoring / guarded charset-normalizer), then the
                     reference's fallback chain (text_utils.py:370-422):
                     utf-8 → windows-1252 → latin-1, errors='replace'
                     last resort. Runs as an Arrow-batched mapInPandas
                     (Spark's ``text`` source assumes utf-8 and would
                     corrupt legacy files).
S3 file-type       → ingest/filetype.detect_file_type (CASE expr).
S5 sanitize        → ingest/filetype.sanitize_filename (regexp expr).
P7 size guard      → filter on the source's ``length`` column — happens
                     BEFORE content is materialized, so oversized files
                     are never read.

At 100 TB the scan parallelizes per file; oversize skip and path-level
incremental anti-join (ingest/pipeline.incremental_filter) run on
metadata only. Decoding auto-detects with charset-normalizer when
available (the reference's detector, text_utils.py:339-367), falling
back to the deterministic try-chain — a cp1252 file that HAPPENS to be
valid latin-1 mojibake is caught by detection, not by the chain.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from customkb_spark.ingest.filetype import detect_file_type, sanitize_filename

ENCODING_CHAIN = ["utf-8", "windows-1252", "latin-1"]

FILE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("file_type", T.StringType(), False),
        T.StructField("length", T.LongType(), False),
        T.StructField("modification_time", T.TimestampType(), True),
        T.StructField("content", T.BinaryType(), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("file_type", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("encoding", T.StringType(), True),
        T.StructField("encoding_confidence", T.DoubleType(), True),
    ]
)

# BOM signatures, checked before any detector (unambiguous evidence).
# Mapped to the BOM-consuming codec names so the marker never leaks
# into the decoded text. utf-32-le MUST precede utf-16-le (prefix).
_BOMS: list[tuple[bytes, str]] = [
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe\x00\x00", "utf-32"),
    (b"\x00\x00\xfe\xff", "utf-32"),
    (b"\xff\xfe", "utf-16"),
    (b"\xfe\xff", "utf-16"),
]


def scan_files(
    spark: SparkSession,
    pattern: str,
    max_file_size_mb: float = 100.0,
    recursive: bool = True,
) -> DataFrame:
    """S1+S3+S5+P7: glob → (path, file_type, length, mtime, content).

    The size guard uses the reader's metadata column, so rejected files
    (db_manager.py:492-506 semantics) cost a stat call, not a read.
    """
    df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", str(recursive).lower())
        .load(pattern)
    )
    return (
        df.filter(F.col("length") <= int(max_file_size_mb * 1024 * 1024))
        .select(
            # the REAL path — downstream IO (convert_files_to_utf8)
            # must address the actual file; the sanitized form is a
            # separate display/storage column
            F.col("path"),
            sanitize_filename(F.col("path")).alias("safe_path"),
            detect_file_type(F.col("path")).alias("file_type"),
            F.col("length"),
            F.col("modificationTime").alias("modification_time"),
            F.col("content"),
        )
    )


# cp1252 bytes in the C1 range (0x80-0x9F) that are real typography —
# smart quotes, dashes, ellipsis, dagger, permille, guillemets, €, ™.
# Their presence is strong evidence FOR cp1252 over latin-1 (where the
# same bytes are meaningless control characters).
_CP1252_PUNCT = frozenset(
    b"\x80\x82\x84\x85\x86\x87\x89\x8b\x91\x92\x93\x94\x95\x96\x97\x99\x9b"
)
# bytes UNDEFINED in cp1252 — their presence rules cp1252 out
_CP1252_UNDEFINED = frozenset(b"\x81\x8d\x8f\x90\x9d")


def _detect_encoding(raw: bytes, sample_size: int = 65536) -> tuple[str, float] | None:
    """Byte-heuristic encoding detector (stands in for the reference's
    charset-normalizer call, text_utils.py:339-367), in evidence order:

    1. BOM — unambiguous.
    2. utf-16 zero-byte parity — BOM-less utf-16 Latin text is ~50%
       NUL bytes on one parity; it must run before utf-8 validation
       because ASCII+NULs *validates* as utf-8, and the fallback chain
       would decode it as NUL-riddled cp1252 mojibake.
    3. strict utf-8 validation — multi-byte utf-8 is self-validating;
       legacy single-byte text essentially never validates by accident
       (ascii is a utf-8 subset → named utf-8, which also keeps the S9
       converter from "converting" plain-ascii files).
    4. cp1252-vs-latin-1 C1 scoring: C1-range typography bytes ⇒
       cp1252; cp1252-undefined bytes ⇒ latin-1.
    5. charset-normalizer (if importable) for non-Latin single-byte
       scripts (koi8/cyrillic/CJK) — accepted only for non-utf-16/32
       guesses (without a BOM or NUL pattern those are noise) that
       strictly decode.

    None ⇒ no confident detection; the caller uses the fallback chain.
    Confidence is 0-1, 1.0 = structural proof.
    """
    for bom, enc in _BOMS:
        if raw.startswith(bom):
            return enc, 1.0
    s = raw[:sample_size]
    # utf-16 parity BEFORE utf-8 validation: BOM-less utf-16 Latin text
    # is ASCII+NULs, which VALIDATES as utf-8 — NUL density is the
    # stronger signal (real text never contains NULs)
    if len(s) >= 8 and len(raw) % 2 == 0:
        odd_zeros = s[1::2].count(0) / len(s[1::2])
        even_zeros = s[0::2].count(0) / len(s[0::2])
        if max(odd_zeros, even_zeros) > 0.3 and min(odd_zeros, even_zeros) < 0.05:
            enc = "utf-16-le" if odd_zeros > even_zeros else "utf-16-be"
            return enc, round(min(1.0, 2 * max(odd_zeros, even_zeros)), 4)
    try:
        s.decode("utf-8")
        return "utf-8", 1.0
    except UnicodeDecodeError as e:
        if e.start >= sample_size - 4 and len(raw) > sample_size:
            # the sample boundary split a multi-byte sequence — the
            # prefix is valid utf-8, that's evidence enough
            return "utf-8", 1.0
    c1 = [b for b in s if 0x80 <= b <= 0x9F]
    if c1:
        n_punct = sum(b in _CP1252_PUNCT for b in c1)
        n_undef = sum(b in _CP1252_UNDEFINED for b in c1)
        if n_punct and not n_undef:
            return "windows-1252", round(n_punct / len(c1), 4)
        if n_undef and not n_punct:
            return "latin-1", round(n_undef / len(c1), 4)
    # dense high bytes ⇒ a non-Latin single-byte script (cyrillic/greek/
    # CJK, where nearly every letter is >=0x80): hand off to
    # charset-normalizer. Sparser high bytes are Western accents where
    # cp1252 ≡ latin-1 glyph-for-glyph in 0xA0-0xFF — the fallback
    # chain already lands there, and the statistical detector is NOISE
    # at that density (it confidently mislabels short samples).
    high_ratio = sum(b >= 0x80 for b in s) / max(len(s), 1)
    if high_ratio >= 0.5:
        try:
            from charset_normalizer import from_bytes

            best = from_bytes(s).best()
            if best is not None and best.encoding:
                enc = best.encoding.lower().replace("_", "-")
                if not enc.startswith(("utf-16", "utf-32")):
                    raw.decode(best.encoding)  # must strictly decode
                    return enc, round(1.0 - getattr(best, "chaos", 0.0), 4)
        except (ImportError, UnicodeDecodeError, LookupError):
            pass
    return None


def _decode_bytes(raw: bytes | None) -> tuple[str | None, str | None, float | None]:
    """Detection-first decode (reference read_text_file,
    text_utils.py:370-422): BOM/charset-normalizer detection, then the
    fallback chain for undetected or mis-detected content; final
    fallback replaces errors."""
    if raw is None:
        return None, None, None
    det = _detect_encoding(raw)
    if det is not None:
        enc, conf = det
        try:
            return raw.decode(enc), enc, conf
        except (UnicodeDecodeError, LookupError):
            pass  # detector was wrong — fall through to the chain
    for enc in ENCODING_CHAIN:
        try:
            return raw.decode(enc), enc, None
        except (UnicodeDecodeError, LookupError):
            continue
    return raw.decode("utf-8", errors="replace"), "utf-8+replace", None


def decode_text(files: DataFrame) -> DataFrame:
    """S2: binary content → text with detected encoding, Arrow-batched.

    One row in, one row out; the UDF touches only (path, file_type,
    content) so column pruning keeps other metadata out of the Arrow
    transfer."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [_decode_bytes(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "file_type": pdf["file_type"],
                    "text": [d[0] for d in decoded],
                    "encoding": [d[1] for d in decoded],
                    "encoding_confidence": [d[2] for d in decoded],
                }
            )

    return files.select("path", "file_type", "content").mapInPandas(
        batches, DECODED_SCHEMA
    )


def read_text_files(
    spark: SparkSession, pattern: str, max_file_size_mb: float = 100.0
) -> DataFrame:
    """Scan + decode in one call — the ingest pipeline's file front end."""
    return decode_text(scan_files(spark, pattern, max_file_size_mb))


def convert_files_to_utf8(
    spark: SparkSession,
    pattern: str,
    dry_run: bool = True,
    backup_suffix: str | None = ".bak",
    recursive: bool = False,
) -> DataFrame:
    """S9 encoding converter (utils/encoding_converter.py:88-148):
    rewrite non-utf-8 text files in place as utf-8 (with backup;
    ``backup_suffix=None`` mirrors the reference's ``--no-backup``).

    Returns a report DataFrame (path, encoding, converted). With
    ``dry_run`` nothing is written — the report shows what would
    change. The rewrite runs in ``foreachPartition`` (each executor
    writes its partition's files); only files whose detected encoding
    isn't utf-8 are touched.
    """
    # unlike ingest (always recursive), in-place conversion defaults to
    # NON-recursive: the reference's -r is an explicit opt-in before
    # files get mutated in nested directories
    decoded = decode_text(scan_files(spark, pattern, recursive=recursive))
    report = decoded.select(
        "path",
        "encoding",
        (F.col("encoding") != "utf-8").alias("converted"),
    )
    if dry_run:
        return report

    # materialize the report BEFORE rewriting — the plan is lazy and
    # would otherwise re-scan the already-converted files
    report_rows = report.collect()

    def rewrite(rows) -> None:
        import shutil

        for r in rows:
            if r["encoding"] in (None, "utf-8") or r["text"] is None:
                continue
            path = r["path"].replace("file:", "", 1)
            if backup_suffix:
                shutil.copy2(path, path + backup_suffix)
            with open(path, "w", encoding="utf-8") as f:
                f.write(r["text"])

    decoded.foreachPartition(rewrite)
    return spark.createDataFrame(report_rows, report.schema)
