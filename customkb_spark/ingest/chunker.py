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

# Per-FILE-TYPE separator chains — parity with the reference's
# init_text_splitter selection (database/chunking.py:140-205): generic
# code gets plain paragraph splitting, json/yaml add ',', text adds
# sentence boundaries.
SEPARATORS: dict[str, list[str]] = {
    "markdown": ["\n# ", "\n## ", "\n### ", "\n#### ", "\n```", "\n---", "\n\n", "\n", " "],
    "code": ["\n\n", "\n", " "],
    "json": ["\n\n", "\n", ",", " "],
    "yaml": ["\n\n", "\n", ",", " "],
    "html": ["<body", "<div", "<p", "<br", "<li", "<h1", "<h2", "<h3", "<table", "\n\n", "\n", " "],
    "text": ["\n\n", "\n", ". ", " "],
}

# Per-LANGUAGE separator chains by file extension — parity with the
# reference's get_language_specific_splitter + LANGUAGE_MAP
# (database/chunking.py:95-113,208-244), which delegates to LangChain's
# public per-language separator lists. Literal separators only (the
# markdown/html regex forms above are literal approximations).
LANGUAGE_SEPARATORS: dict[str, list[str]] = {
    ".py": ["\nclass ", "\ndef ", "\n\tdef ", "\n\n", "\n", " "],
    ".js": ["\nfunction ", "\nconst ", "\nlet ", "\nvar ", "\nclass ", "\nif ", "\nfor ",
            "\nwhile ", "\nswitch ", "\ncase ", "\ndefault ", "\n\n", "\n", " "],
    ".ts": ["\nenum ", "\ninterface ", "\nnamespace ", "\ntype ", "\nclass ", "\nfunction ",
            "\nconst ", "\nlet ", "\nvar ", "\nif ", "\nfor ", "\nwhile ", "\nswitch ",
            "\ncase ", "\ndefault ", "\n\n", "\n", " "],
    ".java": ["\nclass ", "\npublic ", "\nprotected ", "\nprivate ", "\nstatic ", "\nif ",
              "\nfor ", "\nwhile ", "\nswitch ", "\ncase ", "\n\n", "\n", " "],
    ".cpp": ["\nclass ", "\nvoid ", "\nint ", "\nfloat ", "\ndouble ", "\nif ", "\nfor ",
             "\nwhile ", "\nswitch ", "\ncase ", "\n\n", "\n", " "],
    ".c": ["\nvoid ", "\nint ", "\nfloat ", "\ndouble ", "\nif ", "\nfor ", "\nwhile ",
           "\nswitch ", "\ncase ", "\n\n", "\n", " "],
    ".cs": ["\ninterface ", "\nenum ", "\ndelegate ", "\nevent ", "\nclass ", "\nabstract ",
            "\npublic ", "\nprotected ", "\nprivate ", "\nstatic ", "\nif ", "\nfor ",
            "\nforeach ", "\nwhile ", "\nswitch ", "\ncase ", "\nelse ", "\ntry ",
            "\ncatch ", "\n\n", "\n", " "],
    ".go": ["\nfunc ", "\nvar ", "\nconst ", "\ntype ", "\nif ", "\nfor ", "\nswitch ",
            "\ncase ", "\n\n", "\n", " "],
    ".rs": ["\nfn ", "\nconst ", "\nlet ", "\nif ", "\nwhile ", "\nfor ", "\nloop ",
            "\nmatch ", "\n\n", "\n", " "],
    ".rb": ["\ndef ", "\nclass ", "\nif ", "\nunless ", "\nwhile ", "\nfor ", "\ndo ",
            "\nbegin ", "\nrescue ", "\n\n", "\n", " "],
    ".php": ["\nfunction ", "\nclass ", "\nif ", "\nforeach ", "\nwhile ", "\ndo ",
             "\nswitch ", "\ncase ", "\n\n", "\n", " "],
    ".swift": ["\nfunc ", "\nclass ", "\nstruct ", "\nenum ", "\nif ", "\nfor ", "\nwhile ",
               "\ndo ", "\nswitch ", "\ncase ", "\n\n", "\n", " "],
    ".kt": ["\nclass ", "\nfun ", "\nval ", "\nvar ", "\nif ", "\nfor ", "\nwhile ",
            "\nwhen ", "\nelse ", "\n\n", "\n", " "],
    ".scala": ["\nclass ", "\nobject ", "\ndef ", "\nval ", "\nvar ", "\nif ", "\nfor ",
               "\nwhile ", "\nmatch ", "\ncase ", "\n\n", "\n", " "],
    ".html": SEPARATORS["html"],
    ".md": SEPARATORS["markdown"],
    ".xml": SEPARATORS["html"],  # reference maps XML → HTML splitter
}


def separators_for(file_type: str = "text", extension: str | None = None) -> list[str]:
    """Separator chain for a document: extension-specific language
    chain when known (reference get_language_specific_splitter), else
    the file-type chain (reference init_text_splitter)."""
    if extension and extension.lower() in LANGUAGE_SEPARATORS:
        return LANGUAGE_SEPARATORS[extension.lower()]
    return SEPARATORS.get(file_type, SEPARATORS["text"])


def token_len_estimate(text: str) -> int:
    """The reference's no-tiktoken token-count fallback, exactly:
    int(words × 1.3) (database/chunking.py:54-60). With tiktoken
    installed use ``tiktoken_len`` instead — the reference's primary
    path — so chunk boundaries match it byte-for-byte."""
    return int(len(text.split()) * 1.3)


_TIKTOKEN_ENCODER = None  # per-process singleton (reference caches it too)


def tiktoken_len(text: str) -> int:
    """The reference's PRIMARY length function: tiktoken cl100k_base
    token count with a cached encoder (database/chunking.py:24-53).
    Import-gated — raises ImportError when tiktoken is absent; callers
    select it via ``length='tiktoken'`` and fall back to the estimate."""
    global _TIKTOKEN_ENCODER
    if _TIKTOKEN_ENCODER is None:
        import tiktoken  # dep-gated

        _TIKTOKEN_ENCODER = tiktoken.get_encoding("cl100k_base")
    return len(_TIKTOKEN_ENCODER.encode(text))


def pick_length_fn(length: str):
    """'chars' → len; 'tokens' → words×1.3 estimate; 'tiktoken' →
    cl100k_base when importable, else the estimate (the reference's own
    fallback order, database/chunking.py:24-60)."""
    if length == "tiktoken":
        try:
            tiktoken_len("")  # force the gated import once
            return tiktoken_len
        except ImportError:
            return token_len_estimate
    return token_len_estimate if length == "tokens" else len


def _recursive_split(text: str, seps: list[str], size: int, length_fn=len) -> list[str]:
    if length_fn(text) <= size:
        return [text] if text else []
    if not seps:
        # character fallback even under a token length_fn: guarantees
        # progress (a token-based slice could loop on pathological input)
        return [text[i : i + size] for i in range(0, len(text), size)]
    sep, rest = seps[0], seps[1:]
    parts = text.split(sep) if sep else [text]
    out: list[str] = []
    buf = ""
    for p in parts:
        candidate = (buf + sep + p) if buf else p
        if length_fn(candidate) <= size:
            buf = candidate
        else:
            if buf:
                out.append(buf)
            if length_fn(p) > size:
                out.extend(_recursive_split(p, rest, size, length_fn))
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
    extension: str | None = None,
    length: str = "chars",
    min_merge_size: int | None = None,
) -> DataFrame:
    """Separator-aware chunking via mapInPandas (Arrow-batched).

    ``extension`` picks the reference's language-specific separator
    chain (get_language_specific_splitter); ``length='tokens'`` sizes
    chunks by the reference's fallback token estimate (words × 1.3),
    ``length='tiktoken'`` by cl100k_base when the package is importable
    (the reference's primary path, database/chunking.py:24-60);
    ``min_merge_size`` applies the reference's merge_small_chunks
    post-pass (database/chunking.py:342-389) in the same Arrow batch —
    per-doc and in-memory, so it adds no shuffle.
    """
    seps = separators_for(file_type, extension)
    length_fn = pick_length_fn(length)
    src = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                pieces = _recursive_split(text or "", seps, chunk_size, length_fn) or [""]
                if min_merge_size is not None:
                    pieces = _merge_small(pieces, min_merge_size)
                rows.extend(
                    {"doc_id": doc_id, "sid": i, "chunk_text": c}
                    for i, c in enumerate(pieces)
                )
            yield pd.DataFrame(rows, columns=["doc_id", "sid", "chunk_text"])

    return src.mapInPandas(gen, schema=_CHUNK_SCHEMA)


def _merge_small(pieces: list[str], min_size: int) -> list[str]:
    """Reference merge_small_chunks fold (database/chunking.py:342-389):
    merge a chunk into the accumulating current chunk iff BOTH are under
    ``min_size``; '\\n' joiner; last chunk always flushed."""
    out: list[str] = []
    cur: str | None = None
    for p in pieces:
        if cur is None:
            cur = p
        elif len(cur) < min_size and len(p) < min_size:
            cur = cur + "\n" + p
        else:
            out.append(cur)
            cur = p
    if cur is not None:
        out.append(cur)
    return out


def merge_small_chunks(
    chunks: DataFrame,
    min_size: int = 100,
    id_col: str = "doc_id",
    sid_col: str = "sid",
    text_col: str = "chunk_text",
) -> DataFrame:
    """Distributed merge_small_chunks over an exploded chunks table
    (reference database/chunking.py:342-389).

    The merge is a per-document sequential fold, so it runs as ONE
    groupBy(doc_id) shuffle + a JVM-side ``F.aggregate`` fold over the
    per-doc chunk array — no Python, no window, no second shuffle. The
    accumulator is (done chunks, current chunk); a chunk merges into
    current iff both are under ``min_size``. Re-emits (doc_id, sid,
    chunk_text, char_count, total_chunks) with renumbered sids, exactly
    the reference's re-indexing (chunking.py:381-386).

    Scale: per-doc arrays are bounded by document size (documents are
    bounded by ingest's file-size guard), so the fold state is small;
    the shuffle is the same key distribution as any per-doc agg.
    Prefer ``chunk_recursive_pandas(min_merge_size=...)`` when chunking
    anyway — it merges in-batch with zero extra shuffle.
    """
    arr = F.array_sort(
        F.collect_list(F.struct(F.col(sid_col).alias("sid"), F.col(text_col).alias("t")))
    )
    texts = F.transform(arr, lambda s: s["t"])
    init = F.struct(
        F.array().cast("array<string>").alias("done"),
        F.lit(None).cast("string").alias("cur"),
    )
    small = lambda acc, x: (F.length(acc["cur"]) < min_size) & (F.length(x) < min_size)  # noqa: E731
    merged = F.aggregate(
        texts,
        init,
        lambda acc, x: F.struct(
            F.when(acc["cur"].isNull() | small(acc, x), acc["done"])
            .otherwise(F.concat(acc["done"], F.array(acc["cur"])))
            .alias("done"),
            F.when(acc["cur"].isNull(), x)
            .when(small(acc, x), F.concat(acc["cur"], F.lit("\n"), x))
            .otherwise(x)
            .alias("cur"),
        ),
        lambda acc: F.when(acc["cur"].isNull(), acc["done"]).otherwise(
            F.concat(acc["done"], F.array(acc["cur"]))
        ),
    )
    per_doc = chunks.groupBy(F.col(id_col).alias("doc_id")).agg(merged.alias("_m"))
    # total_chunks comes from the array size — no window needed
    out = per_doc.select(
        "doc_id",
        F.size("_m").alias("total_chunks"),
        F.posexplode("_m").alias("sid", "chunk_text"),
    )
    return out.select(
        "doc_id",
        "sid",
        "chunk_text",
        F.length("chunk_text").alias("char_count"),
        "total_chunks",
    )


def validate_chunks(
    chunks: DataFrame,
    max_chunk_size: int = 2000,
    min_chunk_size: int = 50,
    id_col: str = "doc_id",
    sid_col: str = "sid",
    text_col: str = "chunk_text",
    strict: bool = True,
) -> DataFrame:
    """Reference validate_chunks (database/chunking.py:392-425) as a
    distributed check: returns the violation rows (doc_id, sid, reason)
    — empty text or text over ``max_chunk_size`` are errors; under
    ``min_chunk_size`` is a warning UNLESS it's the doc's last chunk
    (the reference allows a small tail). ``strict=True`` raises
    ValueError when any error-severity violation exists (the
    reference's ProcessingError)."""
    from pyspark.sql import Window

    last_sid = F.max(sid_col).over(Window.partitionBy(id_col))
    flagged = chunks.select(
        F.col(id_col).alias("doc_id"),
        F.col(sid_col).alias("sid"),
        F.when(F.col(text_col).isNull() | (F.length(text_col) == 0), F.lit("empty"))
        .when(F.length(text_col) > max_chunk_size, F.lit("oversize"))
        .when(
            (F.length(text_col) < min_chunk_size) & (F.col(sid_col) < last_sid),
            F.lit("undersize"),
        )
        .alias("reason"),
    ).filter(F.col("reason").isNotNull())
    if strict:
        n_errors = flagged.filter(F.col("reason").isin("empty", "oversize")).count()
        if n_errors:
            raise ValueError(f"{n_errors} chunk(s) failed validation (empty/oversize)")
    return flagged
