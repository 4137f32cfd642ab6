"""File sources — reference ingest scan surface (SURVEY.md §2.1).

S1 glob scan       → ``binaryFile`` reader (path/length/modTime/content
                     columns; recursive glob handled by the source).
S2 encoding read   → decode with the reference's fallback chain
                     (text_utils.py:370-422): utf-8 → windows-1252 →
                     latin-1, errors='replace' last resort. Runs as an
                     Arrow-batched mapInPandas (Spark's ``text`` source
                     assumes utf-8 and would corrupt legacy files).
S3 file-type       → ingest/filetype.detect_file_type (CASE expr).
S5 sanitize        → ingest/filetype.sanitize_filename (regexp expr).
P7 size guard      → filter on the source's ``length`` column — happens
                     BEFORE content is materialized, so oversized files
                     are never read.

At 100 TB the scan parallelizes per file; oversize skip and path-level
incremental anti-join (ingest/pipeline.incremental_filter) run on
metadata only. charset-normalizer (the reference's detector) is not in
this container — the try-chain covers the same inputs deterministically.
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
    ]
)


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


def _decode_bytes(raw: bytes | None) -> tuple[str | None, str | None]:
    """The reference's fallback chain (text_utils.py:370-422): first
    encoding that round-trips wins; final fallback replaces errors."""
    if raw is None:
        return None, None
    for enc in ENCODING_CHAIN:
        try:
            return raw.decode(enc), enc
        except (UnicodeDecodeError, LookupError):
            continue
    return raw.decode("utf-8", errors="replace"), "utf-8+replace"


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
    backup_suffix: str = ".bak",
) -> DataFrame:
    """S9 encoding converter (utils/encoding_converter.py:88-148):
    rewrite non-utf-8 text files in place as utf-8 (with backup).

    Returns a report DataFrame (path, encoding, converted). With
    ``dry_run`` nothing is written — the report shows what would
    change. The rewrite runs in ``foreachPartition`` (each executor
    writes its partition's files); only files whose detected encoding
    isn't utf-8 are touched.
    """
    decoded = decode_text(scan_files(spark, pattern))
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
            shutil.copy2(path, path + backup_suffix)
            with open(path, "w", encoding="utf-8") as f:
                f.write(r["text"])

    decoded.foreachPartition(rewrite)
    return spark.createDataFrame(report_rows, report.schema)
