"""Document chunking — the one fan-out operator in ingest (SURVEY.md §2.10).

Two implementations:

- ``chunk_fixed``: fixed-width character windows with overlap, pure
  column algebra (sequence → transform → explode). Deterministic,
  oracle-expressible, runs at codegen speed. This is the default and
  the scale path — chunk boundaries need no cross-row state, so the
  operator is embarrassingly parallel.

- ``chunk_recursive_pandas``: separator-aware recursive splitting
  (the reference's RecursiveCharacterTextSplitter semantics,
  database/chunking.py:140-205) via ``mapInPandas`` for when boundary
  quality matters more than raw throughput. Still parallel per
  partition; Python cost is amortized over Arrow batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def chunk_fixed(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 80,
    overlap: int = 0,
) -> DataFrame:
    """(doc_id, sid, chunk_text): substring windows of ``chunk_size``
    chars stepping by ``chunk_size - overlap``. Empty docs yield one
    empty chunk (parity with the reference's min-one-chunk behavior)."""
    step = chunk_size - overlap
    if step <= 0:
        raise ValueError("overlap must be < chunk_size")
    n_chunks = F.greatest(
        F.ceil((F.length(F.col(text_col)).cast("double")) / step).cast("int"), F.lit(1)
    )
    sids = F.sequence(F.lit(0), n_chunks - 1)
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("_t"),
            F.explode(sids).alias("sid"),
        )
        .select(
            "doc_id",
            "sid",
            F.substring(F.col("_t"), F.col("sid") * step + 1, chunk_size).alias(
                "chunk_text"
            ),
        )
    )


_CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sid", T.IntegerType()),
        T.StructField("chunk_text", T.StringType()),
    ]
)

# Per-file-type separator chains, mirroring the reference's splitter
# selection (database/chunking.py:140-244).
SEPARATORS: dict[str, list[str]] = {
    "markdown": ["\n## ", "\n### ", "\n\n", "\n", " "],
    "code": ["\nclass ", "\ndef ", "\n\n", "\n", " "],
    "text": ["\n\n", "\n", ". ", " "],
}


def _recursive_split(text: str, seps: list[str], size: int) -> list[str]:
    if len(text) <= size:
        return [text] if text else []
    if not seps:
        return [text[i : i + size] for i in range(0, len(text), size)]
    sep, rest = seps[0], seps[1:]
    parts = text.split(sep) if sep else [text]
    out: list[str] = []
    buf = ""
    for p in parts:
        candidate = (buf + sep + p) if buf else p
        if len(candidate) <= size:
            buf = candidate
        else:
            if buf:
                out.append(buf)
            if len(p) > size:
                out.extend(_recursive_split(p, rest, size))
                buf = ""
            else:
                buf = p
    if buf:
        out.append(buf)
    return out


def chunk_recursive_pandas(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    file_type: str = "text",
    chunk_size: int = 400,
) -> DataFrame:
    """Separator-aware chunking via mapInPandas (Arrow-batched)."""
    seps = SEPARATORS.get(file_type, SEPARATORS["text"])
    src = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                pieces = _recursive_split(text or "", seps, chunk_size) or [""]
                rows.extend(
                    {"doc_id": doc_id, "sid": i, "chunk_text": c}
                    for i, c in enumerate(pieces)
                )
            yield pd.DataFrame(rows, columns=["doc_id", "sid", "chunk_text"])

    return src.mapInPandas(gen, schema=_CHUNK_SCHEMA)
