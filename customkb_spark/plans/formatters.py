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


def _doc_keys(context_rows) -> list[str]:
    """The document identity of a context-rows frame: sids restart per
    ingested document, so when the retrieval path carries ``doc_id``
    (several documents can share one source path) sections must
    dedupe/merge per (sourcedoc, doc_id), never per sourcedoc alone —
    two documents' unrelated sid-3 chunks are not the same section.
    Accepts a DataFrame or a collected row list (the interactive path
    hands rows it already holds — VERDICT r8 #4)."""
    cols = (
        context_rows.columns
        if isinstance(context_rows, DataFrame)
        else (list(context_rows[0].__fields__) if context_rows else [])
    )
    return [c for c in ("sourcedoc", "doc_id") if c in cols]


def group_consecutive_sections(context_rows: DataFrame) -> DataFrame:
    """(sourcedoc[, doc_id], group_id, sids, texts): merge rows where
    sid is consecutive within a document (reference
    formatters.py:414-519). Overlapping hit windows are first
    deduplicated per (doc, sid)."""
    keys = _doc_keys(context_rows)
    rows = context_rows.dropDuplicates([*keys, "sid"])
    w = Window.partitionBy(*keys).orderBy("sid")
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
        grouped.groupBy(*keys, "group_id")
        .agg(
            F.min("sid").alias("start_sid"),
            F.max("sid").alias("end_sid"),
            F.array_join(ordered_texts, "\n").alias("section_text"),
        )
        .orderBy(*keys, "start_sid")
    )


def _xml_escape(c: "F.Column") -> "F.Column":
    """xml.sax.saxutils.escape as column algebra (& first, then < >)."""
    c = F.regexp_replace(c, "&", "&amp;")
    c = F.regexp_replace(c, "<", "&lt;")
    return F.regexp_replace(c, ">", "&gt;")


def format_references_batch(
    context_rows: DataFrame, fmt: str = "plain", qid_col: str = "qid"
) -> DataFrame:
    """(qid, reference_string): the batch twin of ``format_references``
    — grouping, section rendering, escaping, and string assembly all
    run as column algebra, so a million queries format in one shuffle
    with nothing on the driver. Feeds ``answer_batch`` directly (the
    full batch RAG pipeline stays distributed end to end).

    ``fmt='json'`` produces compact JSON (``to_json``) with the same
    fields as the driver formatter's indented output — parse-equal, not
    byte-equal.
    """
    keys = _doc_keys(context_rows)
    rows = context_rows.dropDuplicates([qid_col, *keys, "sid"])
    w = Window.partitionBy(qid_col, *keys).orderBy("sid")
    is_new = F.when(
        F.lag("sid").over(w).isNull() | (F.lag("sid").over(w) != F.col("sid") - 1), 1
    ).otherwise(0)
    grouped = rows.withColumn("_new", is_new).withColumn(
        "group_id", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    ordered_texts = F.transform(
        F.array_sort(F.collect_list(F.struct(F.col("sid"), F.col("text")))),
        lambda s: s["text"],
    )
    sections = grouped.groupBy(qid_col, *keys, "group_id").agg(
        F.min("sid").alias("start_sid"),
        F.max("sid").alias("end_sid"),
        F.array_join(ordered_texts, "\n").alias("section_text"),
    )
    doc, s, e, txt = (
        F.col("sourcedoc"), F.col("start_sid"), F.col("end_sid"), F.col("section_text"),
    )
    if fmt == "xml":
        rendered = F.concat(
            F.lit('  <reference source="'), _xml_escape(doc),
            F.lit('" start="'), s.cast("string"),
            F.lit('" end="'), e.cast("string"), F.lit('">'),
            _xml_escape(txt), F.lit("</reference>"),
        )
        sep, prefix, suffix = "\n", "<references>\n", "\n</references>"
    elif fmt == "json":
        rendered = F.to_json(
            F.struct(
                doc.alias("source"), s.alias("start_sid"),
                e.alias("end_sid"), txt.alias("text"),
            )
        )
        sep, prefix, suffix = ",", "[", "]"
    elif fmt == "markdown":
        rendered = F.format_string("### %s [%d-%d]\n%s", doc, s, e, txt)
        sep, prefix, suffix = "\n\n", "", ""
    else:
        rendered = F.format_string("%s [%d-%d]\n%s", doc, s, e, txt)
        sep, prefix, suffix = "\n\n", "", ""
    ordered_sections = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(*[F.col(k) for k in keys], F.col("start_sid"), rendered.alias("r"))
            )
        ),
        lambda x: x["r"],
    )
    assembled = F.concat(
        F.lit(prefix), F.array_join(ordered_sections, sep), F.lit(suffix)
    )
    return sections.groupBy(qid_col).agg(assembled.alias("reference_string"))


class _Section:
    __slots__ = ("sourcedoc", "start_sid", "end_sid", "section_text")

    def __init__(self, sourcedoc, start_sid, end_sid, section_text):
        self.sourcedoc = sourcedoc
        self.start_sid = start_sid
        self.end_sid = end_sid
        self.section_text = section_text


def _sections_local(context_rows) -> list:
    """Driver-side twin of :func:`group_consecutive_sections` for the
    single-query path: the input is bounded by k·(scope+1) rows, and
    running the dedup + two windows + agg as a Spark plan costs ~7 AQE
    scheduler rounds (measured as the dominant share of interactive KB
    latency, VERDICT r7 #3b) to group fewer than a hundred rows. One
    collect, then pure python with IDENTICAL semantics: dedupe per
    (doc keys, sid) — text per (doc, sid) is unique, so which duplicate
    survives is value-irrelevant — merge consecutive sids per document,
    order sections by (doc keys, start_sid). The batch path keeps the
    distributed form (format_references_batch)."""
    keys = _doc_keys(context_rows)
    rows = (
        context_rows.select(*keys, "sid", "text").collect()
        if isinstance(context_rows, DataFrame)
        else context_rows
    )
    dedup: dict = {}
    for r in rows:
        kk = tuple(r[k] for k in keys) + (r["sid"],)
        dedup.setdefault(kk, r["text"])
    sections: list[_Section] = []
    prev_doc, prev_sid = None, None
    texts: list[str] = []
    # null-safe ordering (ADVICE r8): a NULL sourcedoc/doc_id/sid must
    # sort first (Spark's asc-nulls-first default) instead of raising
    # TypeError in Python tuple comparison. Non-null strings compare by
    # code point, which equals Spark's UTF8-binary collation exactly
    # (UTF-8 byte order preserves code-point order at every plane).
    for kk in sorted(dedup, key=lambda kk: tuple((v is not None, v) for v in kk)):
        doc, sid = kk[:-1], kk[-1]
        if doc == prev_doc and sid is not None and prev_sid is not None \
                and sid == prev_sid + 1:
            sections[-1].end_sid = sid
            texts.append(dedup[kk])
            sections[-1].section_text = "\n".join(texts)
        else:
            texts = [dedup[kk]]
            sections.append(_Section(doc[0], sid, sid, dedup[kk]))
        prev_doc, prev_sid = doc, sid
    return sections


def format_references(context_rows, fmt: str = "plain") -> str:
    """Reference string from context rows — a DataFrame (collected
    here) or an already-collected row list (zero extra jobs)."""
    sections = _sections_local(context_rows)
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
