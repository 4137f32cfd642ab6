"""Reference formatters (XML/JSON/MD/plain, query/formatters.py:18-523)
re-expressed as a window-grouped DataFrame stage + driver-side render.

Consecutive context rows from the same document are merged into one
section (W3: lag + running-sum group ids), then each format renders the
grouped sections. The grouping runs distributed; only the final
top-k·scope rows (bounded) reach the driver for string assembly.
"""

from __future__ import annotations

import json
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_consecutive_sections(context_rows: DataFrame) -> DataFrame:
    """(sourcedoc, group_id, sids, texts): merge rows where sid is
    consecutive within a document (reference formatters.py:414-519).
    Overlapping hit windows are first deduplicated per (doc, sid)."""
    rows = context_rows.dropDuplicates(["sourcedoc", "sid"])
    w = Window.partitionBy("sourcedoc").orderBy("sid")
    is_new = F.when(
        F.lag("sid").over(w).isNull() | (F.lag("sid").over(w) != F.col("sid") - 1), 1
    ).otherwise(0)
    grouped = rows.withColumn("_new", is_new).withColumn(
        "group_id", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    # collect_list order is NOT guaranteed after a shuffle — collect
    # (sid, text) structs and sort before joining, so section text is
    # always in sid order regardless of plan changes
    ordered_texts = F.transform(
        F.array_sort(F.collect_list(F.struct(F.col("sid"), F.col("text")))),
        lambda s: s["text"],
    )
    return (
        grouped.groupBy("sourcedoc", "group_id")
        .agg(
            F.min("sid").alias("start_sid"),
            F.max("sid").alias("end_sid"),
            F.array_join(ordered_texts, "\n").alias("section_text"),
        )
        .orderBy("sourcedoc", "start_sid")
    )


def format_references(context_rows: DataFrame, fmt: str = "plain") -> str:
    sections = group_consecutive_sections(context_rows).collect()
    if fmt == "xml":
        parts = ["<references>"]
        for s in sections:
            parts.append(
                f'  <reference source="{escape(s.sourcedoc)}" '
                f'start="{s.start_sid}" end="{s.end_sid}">'
                f"{escape(s.section_text)}</reference>"
            )
        parts.append("</references>")
        return "\n".join(parts)
    if fmt == "json":
        return json.dumps(
            [
                {
                    "source": s.sourcedoc,
                    "start_sid": s.start_sid,
                    "end_sid": s.end_sid,
                    "text": s.section_text,
                }
                for s in sections
            ],
            indent=2,
        )
    if fmt == "markdown":
        return "\n\n".join(
            f"### {s.sourcedoc} [{s.start_sid}-{s.end_sid}]\n{s.section_text}"
            for s in sections
        )
    return "\n\n".join(
        f"{s.sourcedoc} [{s.start_sid}-{s.end_sid}]\n{s.section_text}" for s in sections
    )
