"""Per-chunk metadata extraction — reference F4/F2
(database/db_manager.py:168-237, utils/text_utils.py:105-186).

Everything regex-shaped runs as JVM column expressions (heading,
section type, document section, entity heuristic). The reference's
spaCy NER and NLTK lemmatization are NOT in this container; their
stand-ins are:

- entities: a capitalized-span heuristic (consecutive TitleCase words)
  — deterministic, JVM-side, same output shape
  (map section → entity list).
- enhanced_clean_text: the reference's placeholder-preserve pipeline
  (URLs/emails survive cleaning) as a pandas UDF with pure-Python
  string ops — lemmatization intentionally omitted (a model-version
  dependency the reference itself mocks in tests, SURVEY.md §5).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from customkb_spark.functions.text import ESSENTIAL_STOPWORDS

# reference regexes (db_manager.py:88-94), anchored variants
_URL_RE = r"https?://[^\s<>\"]+"
_EMAIL_RE = r"[\w.+-]+@[\w-]+\.[\w.-]+"


def extract_heading(text_col: Column | str) -> Column:
    """First markdown heading or first line (≤200 chars) — the
    reference probes only the first 200 chars."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    head = F.substring(c, 1, 200)
    md = F.regexp_extract(head, r"(?m)^#{1,6}\s+(.+)$", 1)
    first_line = F.trim(F.regexp_extract(head, r"^([^\n]{1,120})", 1))
    return F.when(md != "", md).otherwise(first_line)


def section_type(text_col: Column | str) -> Column:
    """Reference section classification (db_manager.py:185-205):
    code block / table / html / bullet list / numbered list / text."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return (
        F.when(c.rlike("```|(?m)^ {4,}\\S"), "code_block")
        .when(c.rlike("(?m)^\\s*\\|.*\\|"), "table")
        .when(c.rlike("<[a-zA-Z][^>]*>"), "html")
        .when(c.rlike("(?m)^\\s*[-*+]\\s+"), "bullet_list")
        .when(c.rlike("(?m)^\\s*\\d+[.)]\\s+"), "numbered_list")
        .otherwise("text")
    )


def document_section(text_col: Column | str) -> Column:
    """Keyword-based document section (intro/conclusion/references/body)."""
    c = F.lower(F.col(text_col) if isinstance(text_col, str) else text_col)
    return (
        F.when(c.rlike("introduction|overview|abstract"), "introduction")
        .when(c.rlike("conclusion|summary|final"), "conclusion")
        .when(c.rlike("references|bibliography|citations"), "references")
        .otherwise("body")
    )


def extract_entities(text_col: Column | str, max_chars: int = 500) -> Column:
    """NER stand-in: TitleCase spans of 1-3 words in the first
    ``max_chars`` chars → deduped, sorted array. Output shape matches
    the reference's entities list; spaCy would slot in as a pandas UDF
    with the same signature."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    spans = F.regexp_extract_all(
        F.substring(c, 1, max_chars),
        F.lit(r"\b[A-Z][a-z]+(?: [A-Z][a-z]+){0,2}\b"),
        0,
    )
    return F.array_sort(F.array_distinct(spans))


def chunk_metadata(text_col: Column | str) -> Column:
    """The F4 metadata struct (native nested types instead of the
    reference's JSON-in-TEXT, SURVEY.md §1.2)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.struct(
        extract_heading(c).alias("heading"),
        section_type(c).alias("section_type"),
        document_section(c).alias("document_section"),
        F.length(c).alias("char_length"),
        # explicit class — Java \S and RE2 \S disagree on \x0B
        F.size(F.regexp_extract_all(c, F.lit("[^ \\t\\n\\x0B\\f\\r]+"), 0)).alias("word_count"),
        extract_entities(c).alias("entities"),
    )


def with_chunk_metadata(
    chunks: DataFrame, text_col: str = "originaltext", out_col: str = "metadata"
) -> DataFrame:
    return chunks.withColumn(out_col, chunk_metadata(text_col))


_STOPWORDS = set(ESSENTIAL_STOPWORDS)
_url_email = re.compile(f"({_URL_RE}|{_EMAIL_RE})")
_html = re.compile(r"<[^>]+>")
_keep = re.compile(r"[^\w\s.!?:;-]")
_ws = re.compile(r"\s+")


def _enhanced_clean_one(text: str, lemmatizer=None) -> str:
    """F2 (text_utils.py:105-186): preserve URLs/emails via
    placeholders, strip HTML, lowercase, keep sentence punctuation,
    drop essential stopwords (and pure-punctuation tokens), optionally
    lemmatize each surviving token (the reference's WordNet step,
    text_utils.py:160-170 — pass a lemmatizer with a ``.lemmatize``
    method), restore placeholders."""
    if not text:
        return ""
    preserved: list[str] = []

    def stash(m: re.Match) -> str:
        preserved.append(m.group(0))
        return f" xplaceholderx{len(preserved) - 1}x "

    out = _url_email.sub(stash, text)
    out = _html.sub(" ", out)
    out = out.lower()
    out = _keep.sub(" ", out)
    toks = [t for t in _ws.split(out) if t and t not in _STOPWORDS]
    if lemmatizer is not None:
        toks = [
            lemmatizer.lemmatize(t)
            for t in toks
            if not all(c in ".,!?:;-" for c in t)
        ]
    out = " ".join(toks)
    for i, p in enumerate(preserved):
        out = out.replace(f"xplaceholderx{i}x", p)
    return out.strip()


def enhanced_clean_text(
    df: DataFrame, text_col: str, out_col: str = "embedtext", lemmatize: bool = False
) -> DataFrame:
    """F2 as an Arrow-batched pandas UDF (regexes compiled once per
    process at module import). ``lemmatize=True`` enables the
    reference's WordNet step when NLTK is importable on the workers
    (dep-gated, functions/nlp.get_lemmatizer — loaded once per worker
    process); absent NLTK it degrades to the no-lemmatizer pipeline,
    exactly the reference's lemmatizer=None path."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _clean(col: pd.Series) -> pd.Series:
        lem = None
        if lemmatize:
            try:
                from customkb_spark.functions.nlp import get_lemmatizer

                lem = get_lemmatizer()
            except ImportError:
                lem = None
        return col.map(
            lambda t: _enhanced_clean_one(t, lem) if t is not None else None
        )

    return df.withColumn(out_col, _clean(F.col(text_col)))
