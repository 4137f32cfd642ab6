"""Query enhancement — normalize / spell-fix / synonym expansion
(reference query/enhancement.py, SURVEY.md F6-F8).

The reference uses WordNet synsets and TextBlob spelling — neither is
in this container, and both are non-deterministic across versions. Both
primaries are dep-gated through functions/nlp.py (WordNet synsets via
``wordnet_synonyms_py``, TextBlob via ``correct_spelling_py``) and
auto-dispatch when the packages are importable; the CI/oracle path is
the reference's own DOCUMENTED FALLBACKS, which are deterministic
string algebra:

- F7 fallback: morphological suffix variants (enhancement.py:178-264) —
  plural/verb-form variants of words ≥ 4 chars, joined as
  ``(word OR variant …)``.
- F8 fallback: the double-letter heuristic (enhancement.py:267-319) —
  collapse letter runs of ≥ 3 (never produced by English morphology) to
  doubles.

These run driver-side for the single-query path (one string — no reason
to involve executors) and as a pandas UDF for batch query workloads
(`enhance_queries`), where each partition enhances thousands of queries
per Arrow batch.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WORD_RE = re.compile(r"[a-z]+", re.IGNORECASE)


def normalize_query_text(q: str) -> str:
    """F6 driver-side twin of functions/text.normalize_query."""
    q = re.sub(r"[‘’]", "'", q)
    q = re.sub(r"[“”]", '"', q)
    q = re.sub(r"([.!?]){2,}", r"\1", q)
    q = re.sub(r"\s+", " ", q)
    return q.strip()


def correct_spelling(q: str) -> str:
    """F8 fallback heuristic: collapse ≥3 repeated letters to 2
    ("realllly" → "really"). Deterministic, never breaks valid words."""
    return re.sub(r"([a-z])\1{2,}", r"\1\1", q, flags=re.IGNORECASE)


def _suffix_variants(word: str, max_variants: int = 3) -> list[str]:
    """Morphological variants (the reference's WordNet-free fallback).
    One rule family per word shape — never stacks plural onto verb
    forms ("running" must not yield "runnings")."""
    w = word.lower()
    variants: list[str] = []
    if w.endswith("ing") and len(w) > 5:
        stem = w[:-3]
        if len(stem) > 2 and stem[-1] == stem[-2]:
            variants.append(stem[:-1])  # running → run
        variants.append(stem)
        variants.append(stem + "e")  # making → make
    elif w.endswith("ed") and len(w) > 4:
        stem = w[:-2]
        if len(stem) > 2 and stem[-1] == stem[-2]:
            variants.append(stem[:-1])  # stopped → stop
        variants.append(stem)
        variants.append(w[:-1])  # saved → save
    elif w.endswith("ies") and len(w) > 4:
        variants.append(w[:-3] + "y")  # queries → query
    elif w.endswith(("xes", "ses", "zes", "ches", "shes")):
        variants.append(w[:-2])  # boxes → box
    elif w.endswith("s") and not w.endswith("ss") and len(w) > 3:
        variants.append(w[:-1])  # tables → table
    else:
        variants.append(w + "s")
        variants.append(w + "ing")
    seen = [v for v in dict.fromkeys(variants) if v != w]
    return seen[:max_variants]


def _synonym_variants(w: str, max_variants: int) -> list[str]:
    """F7 dispatch: WordNet synsets when NLTK+corpus are importable
    (reference enhancement.py:59-126, ≤3 synsets per word), else — or
    when WordNet knows no synonyms for the word — the morphological
    fallback, exactly the reference's own ladder."""
    from customkb_spark.functions import nlp as N

    # wordnet_available memoizes the corpus probe (incl. the download
    # attempt) once per process — per-word re-probing would pay a
    # network timeout per word on offline clusters with NLTK installed
    if N.has_module("nltk") and N.wordnet_available():
        try:
            syns = N.wordnet_synonyms_py(w, max_synonyms=max_variants)
            if syns:
                return syns
        except (ImportError, AttributeError, LookupError, OSError):
            pass
    return _suffix_variants(w, max_variants)


def expand_synonyms(
    q: str,
    min_word_len: int = 4,
    max_variants: int = 3,
    synonym_fn=None,
) -> str:
    """F7: wrap each qualifying word as ``(word OR v1 OR v2)`` —
    the reference's OR-group query syntax (enhancement.py:59-126).
    ``max_variants`` is the reference's ``max_synonyms_per_word``
    knob; ``synonym_fn(word, max_variants)`` overrides the resolver
    (tests inject a fake WordNet through it)."""
    resolver = synonym_fn or _synonym_variants

    def repl(m: re.Match) -> str:
        w = m.group(0)
        if len(w) < min_word_len:
            return w
        vs = resolver(w, max_variants)
        if not vs:
            return w
        return "(" + " OR ".join([w] + vs) + ")"

    return _WORD_RE.sub(repl, q)


def enhance_query(
    q: str, spell: bool = True, synonyms: bool = True, max_variants: int = 3
) -> str:
    """F6+F8+F7 in the reference's order (enhancement.py:404-444):
    normalize → correct → expand. The spell step auto-upgrades to
    TextBlob word-wise correction when the package is importable
    (reference enhancement.py:146-160, dep-gated via functions/nlp);
    without it — the CI path — the double-letter heuristic runs."""
    out = normalize_query_text(q)
    if spell:
        from customkb_spark.functions.nlp import correct_spelling_py, has_module

        if has_module("textblob"):
            out = _WORD_RE.sub(lambda m: correct_spelling_py(m.group(0)), out)
        else:
            out = correct_spelling(out)
    if synonyms:
        out = expand_synonyms(out, max_variants=max_variants)
    return out


def enhance_queries(
    queries: DataFrame,
    query_col: str = "query",
    out_col: str = "enhanced",
    spell: bool = True,
    synonyms: bool = True,
) -> DataFrame:
    """Batch enhancement for query-set workloads: one pandas UDF,
    Arrow-batched — the per-partition cost is pure Python string ops."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _enhance(col: pd.Series) -> pd.Series:
        return col.map(
            lambda q: enhance_query(q, spell=spell, synonyms=synonyms)
            if q is not None
            else None
        )

    return queries.withColumn(out_col, _enhance(F.col(query_col)))


ENHANCE_CACHE_SCHEMA = "cache_key string, enhanced string, created_at double"


def enhance_query_cached(
    spark,
    path: str,
    q: str,
    ttl_days: float = 7,
    now: float | None = None,
    **kwargs,
) -> str:
    """Reference enhancement cache (query/enhancement.py:335, the same
    TTL-file pattern as the query-embedding cache): probe the keyed
    table before enhancing, append on miss. The stub enhancer is cheap;
    the cache matters when the spell/synonym path calls real
    WordNet/TextBlob-class dependencies."""
    import hashlib
    import os
    import time as _time

    now = _time.time() if now is None else now
    key = hashlib.sha256(q.encode()).hexdigest()
    if os.path.isdir(path):
        rows = (
            spark.read.parquet(path)
            .filter(
                (F.col("cache_key") == key)
                & (F.col("created_at") > F.lit(now - ttl_days * 86400.0))
            )
            .orderBy(F.desc("created_at"))
            .limit(1)
            .collect()
        )
        if rows:
            return rows[0]["enhanced"]
    out = enhance_query(q, **kwargs)
    spark.createDataFrame(
        [(key, out, float(now))], ENHANCE_CACHE_SCHEMA
    ).write.mode("append").parquet(path)
    return out


def expanded_terms(q: str) -> list[str]:
    """Flat unique term list from an enhanced query — what the BM25
    scorer consumes (OR-groups flatten to their members)."""
    return list(dict.fromkeys(t.lower() for t in _WORD_RE.findall(q) if t.lower() != "or"))
