"""Citations subsystem — Spark-native analogue of the reference's
citation extraction pipeline (utils/citations/README.md:1-15,
gen-citations.sh, append-citations.sh): extract (title, author, year)
from document heads, store them in a citations table, apply them back
to the documents as YAML frontmatter, incrementally.

Two extraction tiers, same split as categorize (M5):

- ``extract_citations``: deterministic heuristics as pure column
  expressions (markdown heading / by-line / first plausible year out
  of the first ``head_chars`` chars). JVM regex only — this is the
  oracle/CI path and the map-side cheap pass at 100 TB.
- ``llm_citations``: provider-backed extraction through the chat
  interface + the F19 robust JSON parse, Arrow-batched via
  mapInPandas with the reference's file-title hint. The deterministic
  stub provider reuses the heuristics; a real model slots in behind
  the same interface (gen-citations.sh SYSTEM_PROMPT semantics:
  JSON {"title","author","year"}, NF → empty).

The reference's incremental skip (process only files without stored
citations, unless --force) is ``citations_pending`` — the same
LeftAnti shape as ingest (S4). Frontmatter application preserves the
reference's rules: skip documents that already have frontmatter unless
``force``; emit no frontmatter when every field is blank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HEAD_CHARS = 2000  # reference CHUNK_SIZE: citations come from the file head

# RE2-safe (shared by Spark/Java and DuckDB) patterns
_RX_HEADING = r"(?m)^#{1,6} +([^\n]+)"
_RX_FIRST_LINE = r"^([^\n]+)"
_RX_AUTHOR = r"(?m)^(?:[Bb]y|[Aa]uthor):? +([A-Z][A-Za-z .'-]+) *$"
_RX_YEAR = r"\b(1[5-9][0-9]{2}|20[0-9]{2})\b"


def _nullif_empty(col):
    return F.nullif(F.trim(col), F.lit(""))


def citation_columns(
    text_col: str = "text",
    head_chars: int = HEAD_CHARS,
    title_max: int = 80,
) -> dict:
    """The extraction rules as reusable column expressions (also the
    stateless streaming form — ``streaming.curation.curate_stream``
    rides them through its gate):

    - title: first markdown heading, else the first line truncated to
      ``title_max``; an all-numeric title is dropped (the reference's
      'single numeric value → NF' rule);
    - author: a ``By …`` / ``Author: …`` line;
    - year: first plausible publication year (1500-2099).
    """
    head = F.substring(F.col(text_col), 1, head_chars)
    heading = _nullif_empty(F.regexp_extract(head, _RX_HEADING, 1))
    first_line = _nullif_empty(
        F.substring(F.regexp_extract(head, _RX_FIRST_LINE, 1), 1, title_max)
    )
    title = F.coalesce(heading, first_line)
    title = F.when(title.rlike(r"^[0-9]+$"), F.lit(None)).otherwise(title)
    author = _nullif_empty(F.regexp_extract(head, _RX_AUTHOR, 1))
    year = _nullif_empty(F.regexp_extract(head, _RX_YEAR, 1)).cast("long")
    return {"title": title, "author": author, "year": year}


def extract_citations(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    head_chars: int = HEAD_CHARS,
    title_max: int = 80,
) -> DataFrame:
    """Deterministic head-of-document extraction (see
    :func:`citation_columns` for the rules)."""
    cols = citation_columns(text_col, head_chars, title_max)
    return docs.select(
        F.col(id_col),
        cols["title"].alias("title"),
        cols["author"].alias("author"),
        cols["year"].alias("year"),
    )


# DuckDB twin of extract_citations for the oracle gate — textually
# mirrored expressions (nullif-empty, same RE2 patterns, same
# truncation) over the pre-registered ``documents`` view.
def sql_extract_citations(
    id_col: str = "doc_id",
    text_col: str = "text",
    head_chars: int = HEAD_CHARS,
    title_max: int = 80,
) -> str:
    head = f"substr({text_col}, 1, {head_chars})"
    heading = f"nullif(trim(regexp_extract({head}, '(?m)^#{{1,6}} +([^\\n]+)', 1)), '')"
    first_line = (
        f"nullif(trim(substr(regexp_extract({head}, '^([^\\n]+)', 1), 1, {title_max})), '')"
    )
    title = f"coalesce({heading}, {first_line})"
    title = f"CASE WHEN regexp_matches({title}, '^[0-9]+$') THEN NULL ELSE {title} END"
    author = (
        f"nullif(trim(regexp_extract({head}, "
        f"'(?m)^(?:[Bb]y|[Aa]uthor):? +([A-Z][A-Za-z .''-]+) *$', 1)), '')"
    )
    year = (
        f"CAST(nullif(regexp_extract({head}, "
        f"'\\b(1[5-9][0-9]{{2}}|20[0-9]{{2}})\\b', 1), '') AS BIGINT)"
    )
    return f"""
SELECT {id_col},
       {title} AS title,
       {author} AS author,
       {year} AS year
FROM documents
"""


# ----------------------------------------------------- provider-backed tier


class CitationProvider:
    """LLM bibliographic extraction interface (gen-citations.sh's
    OpenAI call). ``extract`` returns {"title","author","year"} with
    empty strings for NF — parsed from the model's JSON via F19."""

    name = "base"

    def extract(self, head: str, file_hint: str) -> dict:
        raise NotImplementedError


class HeuristicStubCitations(CitationProvider):
    """Deterministic stand-in: the same head-of-document heuristics as
    the column path, so tests/CI need no model."""

    name = "stub-heuristic"

    def extract(self, head: str, file_hint: str) -> dict:
        import re

        head = head or ""
        m = re.search(r"^#{1,6} +([^\n]+)", head, re.M)
        title = (m.group(1) if m else head.split("\n", 1)[0][:80]).strip()
        if re.fullmatch(r"[0-9]+", title):
            title = ""
        a = re.search(r"^(?:[Bb]y|[Aa]uthor):? +([A-Z][A-Za-z .'-]+?) *$", head, re.M)
        y = re.search(r"\b(1[5-9][0-9]{2}|20[0-9]{2})\b", head)
        return {
            "title": title,
            "author": a.group(1).strip() if a else "",
            "year": y.group(1) if y else "",
        }


class ChatJSONCitations(CitationProvider):
    """Chat-provider extraction with the reference's prompt contract
    (JSON-only, file-title hint as a strong signal, NF → empty) and
    the F19 fence/repair parse on the way back."""

    name = "chat-json"

    def __init__(self, llm=None, model: str | None = None):
        import os

        if llm is None:
            from customkb_spark.plans.answer import get_llm

            llm = get_llm(
                model or os.environ.get("CUSTOMKB_CHAT_MODEL", "stub-extractive"),
                temperature=0.0,
            )
        self._llm = llm

    def extract(self, head: str, file_hint: str) -> dict:
        from customkb_spark.functions.llm_json import parse_llm_json

        system = (
            "Extract bibliographic information from the provided text. "
            "Pay attention to the file-title hint, which often contains "
            "the actual title. Return ONLY a JSON object with keys "
            '"title", "author", "year"; use "" when a field cannot be '
            "determined. Never invent values."
        )
        user = f"file-title: {file_hint}\n\n{(head or '')[:HEAD_CHARS]}"
        resp = self._llm.complete(system, user, max_tokens=200)
        data = parse_llm_json(resp, fallback={})
        if not isinstance(data, dict):
            data = {}
        return {
            "title": str(data.get("title") or ""),
            "author": str(data.get("author") or ""),
            "year": str(data.get("year") or ""),
        }


_CITATION_PROVIDERS: dict[str, type[CitationProvider]] = {
    "stub-heuristic": HeuristicStubCitations,
    "chat-json": ChatJSONCitations,
}


def llm_citations(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    model: str = "stub-heuristic",
    head_chars: int = HEAD_CHARS,
) -> DataFrame:
    """Provider-backed extraction over the corpus: one Arrow-batched
    mapInPandas pass, one provider instance per partition (the
    reference's worker-pool parallelism becomes partition-level
    parallelism). Returns (id, title, author, year) with NULLs for
    blank fields."""
    from collections.abc import Iterator

    import pandas as pd

    id_type = dict(docs.dtypes)[id_col]
    schema = f"{id_col} {id_type}, title string, author string, year long"
    src = docs.select(
        id_col,
        F.substring(F.col(text_col), 1, head_chars).alias("_head"),
        F.col(source_col).cast("string").alias("_src"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        provider = _CITATION_PROVIDERS[model]()
        for pdf in batches:
            out = {"title": [], "author": [], "year": []}
            for head, srcpath in zip(pdf["_head"], pdf["_src"]):
                # file-title hint: basename without extension (the
                # reference passes the slugified filename to the model)
                hint = (srcpath or "").rsplit("/", 1)[-1].rsplit(".", 1)[0]
                got = provider.extract(head, hint)
                out["title"].append(got.get("title") or None)
                out["author"].append(got.get("author") or None)
                ytxt = str(got.get("year") or "")
                out["year"].append(int(ytxt) if ytxt.isdigit() else None)
            yield pd.DataFrame({id_col: pdf[id_col], **out})

    return src.mapInPandas(run, schema)


def citations_pending(
    docs: DataFrame, existing: DataFrame | None, id_col: str = "doc_id"
) -> DataFrame:
    """Incremental skip (gen-citations.sh's already-processed check):
    documents with no stored citation row — LeftAnti, the same shape
    the ingest pipeline uses (S4)."""
    if existing is None:
        return docs
    return docs.join(existing.select(id_col), id_col, "left_anti")


# ------------------------------------------------------------- frontmatter


def render_frontmatter(title, author, year) -> str:
    """YAML frontmatter block for one citation, or '' when every field
    is blank (append-citations.sh: 'Removes empty frontmatter when all
    citation fields are blank'). Values are quoted; embedded quotes
    YAML-escaped."""
    fields = []
    for key, val in (("title", title), ("author", author), ("year", year)):
        if val is None or val == "":
            continue
        sval = str(val).replace('"', '\\"')
        fields.append(f'{key}: "{sval}"')
    if not fields:
        return ""
    return "---\n" + "\n".join(fields) + "\n---\n"


def apply_frontmatter_text(text: str, title, author, year, force: bool = False) -> str:
    """Prepend frontmatter to one document body, preserving content.
    Existing frontmatter (first line '---') is left alone unless
    ``force``, in which case it is replaced."""
    text = text or ""
    fm = render_frontmatter(title, author, year)
    if text.startswith("---\n"):
        if not force:
            return text
        end = text.find("\n---\n", 4)
        body = text[end + 5 :] if end != -1 else text
        return fm + body
    return fm + text if fm else text


def apply_frontmatter(
    docs: DataFrame,
    citations: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    force: bool = False,
) -> DataFrame:
    """Join citations onto documents and rewrite ``text_col`` with the
    frontmatter applied. The citations side is one row per document
    (corpus-sized), so no broadcast hint is forced — AQE picks
    broadcast only when the side is actually under the threshold; a
    sort-merge join on ``id_col`` is correct at any scale. String
    surgery runs in one Arrow-batched pandas UDF."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no annotations: under `from __future__ import annotations` the
    # stringified hints break pandas_udf signature inference
    @pandas_udf("string")
    def _apply(text, title, author, year):
        return pd.Series(
            [
                apply_frontmatter_text(t, ti, au, (int(y) if pd.notna(y) else None), force)
                for t, ti, au, y in zip(text, title, author, year)
            ]
        )

    cits = citations.select(
        F.col(id_col),
        F.col("title").alias("_fm_title"),
        F.col("author").alias("_fm_author"),
        F.col("year").alias("_fm_year"),
    )
    joined = docs.join(cits, id_col, "left")
    out = joined.withColumn(
        text_col,
        _apply(
            F.col(text_col), F.col("_fm_title"), F.col("_fm_author"), F.col("_fm_year")
        ),
    )
    return out.drop("_fm_title", "_fm_author", "_fm_year")
