"""Dep-gated real-NLP integrations — langdetect, spaCy NER, NLTK
lemmatization, TextBlob spelling.

The reference calls these libraries directly (langdetect:
utils/language_detector.py:36-118; spaCy: database/db_manager.py:78-84,
218-237; NLTK WordNet: utils/text_utils.py:160-186; TextBlob:
query/enhancement.py:146-160) and falls back to deterministic
heuristics when they're absent. This container ships none of them, so
every function here follows the same gate pattern as tiktoken/LiteLLM
(ingest/chunker.py:144, embedding/embedder.py):

- the REAL path imports lazily and raises ImportError when the package
  is missing;
- the DataFrame-level entry points choose at plan time: real library →
  Arrow-batched pandas UDF (the import happens per worker process, once,
  module-cached); absent → the repo's JVM-side heuristic column, which
  is also the CI/oracle path.

Tests inject fake modules via sys.modules and exercise the per-row
cores directly (a sys.modules fake can't reach executor workers), plus
assert the driver-side dispatch — mirroring tests/test_providers.py.
"""

from __future__ import annotations

import importlib.util
from functools import lru_cache

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@lru_cache(maxsize=None)
def has_module(name: str) -> bool:
    """Driver-side availability probe (cached; find_spec doesn't import)."""
    try:
        return importlib.util.find_spec(name) is not None
    except (ImportError, ValueError):
        return False


# --------------------------------------------------------------- langdetect

# langdetect's codes vs ISO 639-1 (reference language_detector.py:29-33)
LANGDETECT_TO_ISO = {"zh-cn": "zh", "zh-tw": "zh"}

# the reference's supported set (utils/text_utils.py:20-37 language_codes)
SUPPORTED_ISO = frozenset(
    "zh da nl en fi fr de id it pt es sv tr ko ja vi th ar ru".split()
)


def detect_language_py(
    text: str | None,
    min_confidence: float = 0.95,
    fallback: str = "en",
) -> tuple[str, float]:
    """Reference detect_file_language core (language_detector.py:36-118)
    on an in-memory string: langdetect's top candidate, zh-code mapping,
    supported-set check, and the confidence gate — below threshold the
    FALLBACK language is returned with the measured confidence.
    Raises ImportError when langdetect is absent (gated)."""
    from langdetect import detect_langs  # dep-gated
    from langdetect.lang_detect_exception import LangDetectException

    if text is None or len(text.strip()) < 20:  # too short to be reliable
        return fallback, 0.0
    try:
        cands = detect_langs(text)
    except LangDetectException:
        return fallback, 0.0
    if not cands:
        return fallback, 0.0
    top = cands[0]
    code = LANGDETECT_TO_ISO.get(top.lang, top.lang)
    if code not in SUPPORTED_ISO:
        return fallback, 0.0
    if top.prob < min_confidence:
        return fallback, float(top.prob)
    return code, float(top.prob)


def detect_language(
    df: DataFrame,
    text_col: str,
    out_col: str = "language",
    min_confidence: float = 0.95,
    fallback: str = "en",
) -> DataFrame:
    """Language ID over a corpus. With langdetect importable: an
    Arrow-batched pandas UDF running the reference's exact pipeline
    (each worker imports langdetect once). Without: the JVM stopword
    heuristic (functions/text.detect_language_heuristic) — zero Python,
    and the path the DuckDB oracle mirrors."""
    if has_module("langdetect"):
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def _detect(col: pd.Series) -> pd.Series:
            return col.map(
                lambda t: detect_language_py(t, min_confidence, fallback)[0]
            )

        return df.withColumn(out_col, _detect(F.col(text_col)))
    from customkb_spark.functions.text import detect_language_heuristic

    return df.withColumn(out_col, detect_language_heuristic(text_col))


# -------------------------------------------------------------------- NLTK

_LEMMATIZER = None


def get_lemmatizer():
    """Reference db_manager.py:70-76: a process-cached
    ``nltk.stem.WordNetLemmatizer``. Raises ImportError when NLTK is
    absent; callers treat that as 'lemmatization off' (the reference
    passes lemmatizer=None through enhanced_clean_text)."""
    global _LEMMATIZER
    if _LEMMATIZER is None:
        from nltk.stem import WordNetLemmatizer  # dep-gated

        _LEMMATIZER = WordNetLemmatizer()
    return _LEMMATIZER


def lemmatize_tokens(tokens: list[str], lemmatizer=None) -> list[str]:
    """The reference's token loop (text_utils.py:160-170): lemmatize
    every token, dropping pure-punctuation tokens."""
    lem = lemmatizer if lemmatizer is not None else get_lemmatizer()
    return [
        lem.lemmatize(w)
        for w in tokens
        if not all(c in ".,!?:;-" for c in w)
    ]


# ------------------------------------------------------------------- spaCy

_SPACY_NLP = None
SPACY_LABELS = ("PERSON", "ORG", "GPE", "LOC", "PRODUCT", "WORK_OF_ART")


def get_spacy():
    """Reference db_manager.py:78-84: process-cached
    ``spacy.load('en_core_web_sm')``. ImportError/OSError when the
    package or model is absent (gated)."""
    global _SPACY_NLP
    if _SPACY_NLP is None:
        import spacy  # dep-gated

        _SPACY_NLP = spacy.load("en_core_web_sm")
    return _SPACY_NLP


def spacy_entities_py(
    text: str | None,
    max_chars: int = 500,
    labels: tuple[str, ...] = SPACY_LABELS,
    nlp=None,
) -> list[str]:
    """Reference NER loop (db_manager.py:218-231): run the pipeline on
    the first ``max_chars`` chars (entity_extraction_limit), keep the
    semantic labels, dedupe, sort (the repo's canonical-order contract
    — the reference keeps first-seen order in a dict)."""
    if not text:
        return []
    model = nlp if nlp is not None else get_spacy()
    doc = model(text[:max_chars])
    seen: dict[str, None] = {}
    for ent in doc.ents:
        if ent.label_ in labels:
            seen.setdefault(ent.text, None)
    return sorted(seen)


def extract_entities(
    df: DataFrame,
    text_col: str,
    out_col: str = "entities",
    max_chars: int = 500,
) -> DataFrame:
    """Entity extraction over a corpus: spaCy pandas UDF when the
    package is importable (model loads once per worker process), else
    the TitleCase-span JVM heuristic (ingest/metadata.extract_entities)
    — identical output shape (sorted distinct array<string>)."""
    if has_module("spacy"):
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("array<string>")
        def _ner(col: pd.Series) -> pd.Series:
            return col.map(lambda t: spacy_entities_py(t, max_chars))

        return df.withColumn(out_col, _ner(F.col(text_col)))
    from customkb_spark.ingest.metadata import extract_entities as _heur

    return df.withColumn(out_col, _heur(text_col, max_chars=max_chars))


# ---------------------------------------------------------------- TextBlob


def correct_spelling_py(word: str, vocabulary: set[str] | None = None) -> str:
    """Reference correct_spelling (query/enhancement.py:130-177):
    vocabulary short-circuit → TextBlob ``.correct()`` when importable
    → the deterministic double-letter fallback. Unlike the pure
    heuristic (functions/enhance.correct_spelling) this follows the
    reference's 'significantly different' acceptance rule."""
    if not word or len(word) < 2:
        return word
    if vocabulary and word.lower() in vocabulary:
        return word
    try:
        from textblob import TextBlob  # dep-gated

        corrected = str(TextBlob(word).correct())
        if corrected.lower() != word.lower() and len(corrected) > 1:
            return corrected
    except (ImportError, AttributeError, LookupError, OSError):
        pass
    from customkb_spark.functions.enhance import correct_spelling

    return correct_spelling(word)


# ----------------------------------------------------------- NLTK WordNet


def ensure_wordnet() -> None:
    """Reference enhancement.py:81-87: probe the corpus, attempt a
    quiet download when missing. Raises ImportError without NLTK;
    LookupError when the corpus stays unavailable (offline)."""
    import nltk  # dep-gated

    try:
        nltk.data.find("corpora/wordnet")
    except LookupError:
        nltk.download("wordnet", quiet=True)
        nltk.data.find("corpora/wordnet")


@lru_cache(maxsize=1)
def wordnet_available() -> bool:
    """Memoized corpus probe — the dispatch path must pay the
    (possibly network-bound) ensure_wordnet attempt ONCE per process,
    not once per word per row (an offline cluster with NLTK installed
    would otherwise attempt a download per query word)."""
    try:
        ensure_wordnet()
        return True
    except (ImportError, AttributeError, LookupError, OSError):
        return False


def wordnet_synonyms_py(
    word: str, max_synonyms: int = 2, max_synsets: int = 3
) -> list[str]:
    """F7 primary path — reference get_synonyms_for_word
    (query/enhancement.py:59-126): lemma names of the word's first
    ``max_synsets`` synsets, underscores as spaces, skipping the word
    itself / duplicates / single characters, capped at
    ``max_synonyms``. Raises ImportError when NLTK is absent; callers
    fall back to the morphological variants (the reference's own
    WordNet-free path, functions/enhance._suffix_variants)."""
    if not word or len(word) < 2:
        return []
    ensure_wordnet()
    from nltk.corpus import wordnet  # dep-gated

    lower = word.lower()
    found: list[str] = []
    for synset in wordnet.synsets(lower)[:max_synsets]:
        for lemma in synset.lemmas():
            name = lemma.name().replace("_", " ")
            if len(name) > 1 and name.lower() != lower and name not in found:
                found.append(name)
            if len(found) >= max_synonyms:
                return found
    return found
