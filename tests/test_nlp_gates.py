"""Dep-gated real-NLP paths (functions/nlp.py): langdetect, spaCy NER,
NLTK lemmatization, TextBlob spelling.

None of these packages exist in the container, so — like
test_providers.py — the tests inject fake modules via sys.modules and
exercise the per-row cores directly, plus assert the driver-side
dispatch (real lib absent → JVM heuristic path, the oracle/CI path).
"""

from __future__ import annotations

import sys
import types

import pytest

import customkb_spark.functions.nlp as N


def _fake_langdetect(cands):
    """A langdetect stand-in: detect_langs returns the given candidate
    list of (lang, prob) namespaces."""
    mod = types.ModuleType("langdetect")
    mod.detect_langs = lambda text: [
        types.SimpleNamespace(lang=lang, prob=prob) for lang, prob in cands
    ]
    exc_mod = types.ModuleType("langdetect.lang_detect_exception")

    class LangDetectException(Exception):
        pass

    exc_mod.LangDetectException = LangDetectException
    mod.lang_detect_exception = exc_mod
    return mod, exc_mod


LONG = "this is a sufficiently long sample of text for detection to run"


def test_langdetect_core_mapping_and_confidence(monkeypatch):
    mod, exc = _fake_langdetect([("zh-cn", 0.99)])
    monkeypatch.setitem(sys.modules, "langdetect", mod)
    monkeypatch.setitem(sys.modules, "langdetect.lang_detect_exception", exc)
    # zh-cn maps to zh (reference LANGDETECT_TO_ISO)
    assert N.detect_language_py(LONG) == ("zh", 0.99)

    # below the confidence gate: fallback language, measured confidence
    mod, exc = _fake_langdetect([("de", 0.5)])
    monkeypatch.setitem(sys.modules, "langdetect", mod)
    monkeypatch.setitem(sys.modules, "langdetect.lang_detect_exception", exc)
    assert N.detect_language_py(LONG, min_confidence=0.95) == ("en", 0.5)

    # unsupported language code: fallback, 0.0 (reference get_iso_code path)
    mod, exc = _fake_langdetect([("xx", 0.99)])
    monkeypatch.setitem(sys.modules, "langdetect", mod)
    monkeypatch.setitem(sys.modules, "langdetect.lang_detect_exception", exc)
    assert N.detect_language_py(LONG) == ("en", 0.0)


def test_langdetect_short_text_and_exception(monkeypatch):
    mod, exc = _fake_langdetect([("fr", 0.99)])
    monkeypatch.setitem(sys.modules, "langdetect", mod)
    monkeypatch.setitem(sys.modules, "langdetect.lang_detect_exception", exc)
    # <20 chars stripped: too short for reliable detection
    assert N.detect_language_py("  short  ") == ("en", 0.0)
    assert N.detect_language_py(None, fallback="de") == ("de", 0.0)

    def boom(text):
        raise exc.LangDetectException("no features")

    mod.detect_langs = boom
    assert N.detect_language_py(LONG) == ("en", 0.0)


def test_detect_language_dispatch_heuristic_without_package(spark):
    # real environment: langdetect absent → JVM heuristic column
    assert not N.has_module("langdetect")
    df = spark.createDataFrame(
        [("the cat and the dog went to the house of the king",)], "text string"
    )
    out = N.detect_language(df, "text").select("language").first()[0]
    assert out == "en"


# ---------------------------------------------------------------- NLTK


class _FakeLemmatizer:
    def lemmatize(self, w):
        return w[:-1] if w.endswith("s") else w


def test_lemmatize_tokens_drops_punct_and_lemmatizes():
    out = N.lemmatize_tokens(["cats", "run", "...", ";-", "dogs"], _FakeLemmatizer())
    assert out == ["cat", "run", "dog"]


def test_get_lemmatizer_gate_raises_without_nltk(monkeypatch):
    monkeypatch.setattr(N, "_LEMMATIZER", None)
    if "nltk" in sys.modules:
        pytest.skip("nltk installed")
    with pytest.raises(ImportError):
        N.get_lemmatizer()


def test_enhanced_clean_one_with_lemmatizer():
    from customkb_spark.ingest.metadata import _enhanced_clean_one

    text = "The cats at https://ex.com/a chase dogs !!"
    out = _enhanced_clean_one(text, _FakeLemmatizer())
    # stopwords dropped, tokens lemmatized, URL preserved verbatim
    assert "cat" in out.split() and "dog" in out.split()
    assert "https://ex.com/a" in out
    assert "the" not in out.split()
    # without a lemmatizer the plural survives (reference lemmatizer=None path)
    assert "cats" in _enhanced_clean_one(text, None).split()


def test_enhanced_clean_text_lemmatize_degrades_without_nltk(spark):
    # lemmatize=True with no NLTK on workers: identical to the plain path
    from customkb_spark.ingest.metadata import enhanced_clean_text

    df = spark.createDataFrame([("The cats chase dogs",)], "t string")
    plain = enhanced_clean_text(df, "t").select("embedtext").first()[0]
    gated = enhanced_clean_text(df, "t", lemmatize=True).select("embedtext").first()[0]
    assert plain == gated == "cats chase dogs"


# --------------------------------------------------------------- spaCy


def _fake_spacy_doc(ents):
    return types.SimpleNamespace(
        ents=[types.SimpleNamespace(text=t, label_=lb) for t, lb in ents]
    )


def test_spacy_entities_core_filter_dedupe_sort():
    captured = {}

    def nlp(text):
        captured["text"] = text
        return _fake_spacy_doc(
            [
                ("Alice", "PERSON"),
                ("Acme Corp", "ORG"),
                ("Alice", "PERSON"),  # dup
                ("yesterday", "DATE"),  # filtered label
            ]
        )

    out = N.spacy_entities_py("x" * 900, max_chars=500, nlp=nlp)
    assert out == ["Acme Corp", "Alice"]
    # entity_extraction_limit honored (reference db_manager.py:221)
    assert len(captured["text"]) == 500
    assert N.spacy_entities_py("", nlp=nlp) == []


def test_extract_entities_dispatch_heuristic_without_spacy(spark):
    assert not N.has_module("spacy")
    df = spark.createDataFrame([("Alice Smith visited Acme Corp today",)], "t string")
    out = N.extract_entities(df, "t").select("entities").first()[0]
    assert "Alice Smith" in out and "Acme Corp" in out


# ------------------------------------------------------------- TextBlob


def _fake_textblob(mapping):
    mod = types.ModuleType("textblob")

    class TextBlob:
        def __init__(self, word):
            self.word = word

        def correct(self):
            return mapping.get(self.word, self.word)

    mod.TextBlob = TextBlob
    return mod


def test_correct_spelling_py_textblob_path(monkeypatch):
    monkeypatch.setitem(sys.modules, "textblob", _fake_textblob({"speling": "spelling"}))
    assert N.correct_spelling_py("speling") == "spelling"
    # unchanged correction falls through to the double-letter heuristic
    assert N.correct_spelling_py("realllly") == "really"
    # vocabulary short-circuit (reference enhancement.py:143-145)
    assert N.correct_spelling_py("speling", vocabulary={"speling"}) == "speling"
    assert N.correct_spelling_py("a") == "a"


def test_correct_spelling_py_fallback_without_textblob():
    if N.has_module("textblob"):
        pytest.skip("textblob installed")
    assert N.correct_spelling_py("realllly") == "really"
    assert N.correct_spelling_py("table") == "table"


def test_enhance_query_spell_dispatch(monkeypatch):
    from customkb_spark.functions.enhance import enhance_query

    monkeypatch.setitem(sys.modules, "textblob", _fake_textblob({"teh": "the"}))
    monkeypatch.setattr(N, "has_module", lambda name: name == "textblob")
    out = enhance_query("teh queries", synonyms=False)
    assert out.startswith("the ")
    # and the heuristic path still runs when textblob is absent
    monkeypatch.setattr(N, "has_module", lambda name: False)
    assert enhance_query("realllly good", synonyms=False) == "really good"


# ------------------------------------------------------------- WordNet F7


def _fake_wordnet(monkeypatch, synset_lemmas):
    """Install a fake nltk + nltk.corpus.wordnet in sys.modules.
    ``synset_lemmas`` is a list of lists of lemma-name strings."""

    def _lemma(name):
        return types.SimpleNamespace(name=lambda n=name: n)

    def _synset(names):
        return types.SimpleNamespace(lemmas=lambda ns=names: [_lemma(n) for n in ns])

    wordnet = types.SimpleNamespace(
        synsets=lambda w: [_synset(ns) for ns in synset_lemmas]
    )
    nltk = types.ModuleType("nltk")
    nltk.data = types.SimpleNamespace(find=lambda p: True)
    nltk.download = lambda *a, **k: None
    corpus = types.ModuleType("nltk.corpus")
    corpus.wordnet = wordnet
    nltk.corpus = corpus
    monkeypatch.setitem(sys.modules, "nltk", nltk)
    monkeypatch.setitem(sys.modules, "nltk.corpus", corpus)
    return wordnet


def test_wordnet_synonyms_reference_shape(monkeypatch):
    _fake_wordnet(
        monkeypatch,
        [
            ["fast", "speedy", "quick_as_lightning"],  # self + dup rules
            ["rapid", "fleet"],
            ["swift"],
            ["never_reached"],  # 4th synset must not be consulted
        ],
    )
    # skips the word itself, maps _ to space, caps at max_synonyms
    assert N.wordnet_synonyms_py("fast", max_synonyms=2) == [
        "speedy",
        "quick as lightning",
    ]
    # wider cap walks later synsets but never past max_synsets=3
    assert N.wordnet_synonyms_py("fast", max_synonyms=10) == [
        "speedy",
        "quick as lightning",
        "rapid",
        "fleet",
        "swift",
    ]
    # short/empty words short-circuit before any NLTK import
    assert N.wordnet_synonyms_py("a") == []
    assert N.wordnet_synonyms_py("") == []


def test_wordnet_corpus_lookup_error_propagates(monkeypatch):
    nltk = types.ModuleType("nltk")

    def _find(p):
        raise LookupError("wordnet corpus missing")

    nltk.data = types.SimpleNamespace(find=_find)
    nltk.download = lambda *a, **k: None
    monkeypatch.setitem(sys.modules, "nltk", nltk)
    with pytest.raises(LookupError):
        N.wordnet_synonyms_py("fast")


def test_expand_synonyms_wordnet_dispatch(monkeypatch):
    """expand_synonyms uses WordNet OR-groups when the gate is open
    (injected resolver mirrors the dispatch contract)."""
    from customkb_spark.functions.enhance import expand_synonyms

    _fake_wordnet(monkeypatch, [["speedy", "rapid"]])
    out = expand_synonyms(
        "fast query", synonym_fn=lambda w, k: N.wordnet_synonyms_py(w, k)
    )
    assert out == "(fast OR speedy OR rapid) (query OR speedy OR rapid)"


def test_expand_synonyms_gate_closed_uses_morphological():
    """Real environment (no NLTK): the morphological fallback is the
    live path — the reference's own WordNet-free ladder."""
    from customkb_spark.functions.enhance import expand_synonyms

    assert not N.has_module("nltk")
    assert expand_synonyms("tables") == "(tables OR table)"


def test_expand_synonyms_wordnet_empty_falls_through(monkeypatch):
    """WordNet importable but knows no synonyms → morphological
    variants still fire (reference: 'if not synonyms' fallback)."""
    from customkb_spark.functions import enhance as E

    _fake_wordnet(monkeypatch, [])
    monkeypatch.setattr(
        "customkb_spark.functions.nlp.has_module", lambda name: name == "nltk"
    )
    # the availability probe is lru_cached per process; pin it open so
    # an earlier real-environment False doesn't mask the fake module
    monkeypatch.setattr(
        "customkb_spark.functions.nlp.wordnet_available", lambda: True
    )
    assert E._synonym_variants("tables", 3) == ["table"]
    monkeypatch.setattr(
        "customkb_spark.functions.nlp.wordnet_synonyms_py",
        lambda w, max_synonyms: ["speedy"],
    )
    assert E._synonym_variants("fast", 3) == ["speedy"]
