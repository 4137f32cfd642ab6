"""Text expressions — cleaning, tokenization, analysis.

All hot-path functions are built-in column expressions (JVM-side,
whole-stage-codegen) — no Python UDFs. The reference implements these
as per-row Python (utils/text_utils.py); at 100 TB the regex/array
forms here run inside Tungsten.

Tokenization contracts:
- General (shingles, dedup, language ID, quality):
  ``tokens(col) = regexp_extract_all(lower(col), '[a-z0-9]+')``.
- BM25 (``bm25_token_set``): the reference's tokenize_for_bm25
  pipeline (utils/text_utils.py:255-314) — keeps ``- . _`` inside
  tokens, en-gated stopword removal, and DEDUPLICATES tokens per
  document (BM25 term frequency is 0/1); that quirk is load-bearing
  for score parity (SURVEY.md §2.7 F3).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"

# The reference's exact "essential" BM25 stopword set — 14 words
# (utils/text_utils.py:300: {'the','a','an','and','or','but','in','on',
# 'at','to','for','of','with','by'}); dropped only in the BM25 path.
BM25_STOPWORDS = "the a an and or but in on at to for of with by".split()

# Broader English stopword list used by the QUALITY/language heuristics
# (not by BM25 — the reference keeps its BM25 filtering light).
ESSENTIAL_STOPWORDS = (
    "a an and are as at be by for from has he in is it its of on that the to was were will with"
).split()


def tokens(col: Column | str) -> Column:
    """Lowercased alphanumeric tokens, in document order."""
    return F.regexp_extract_all(F.lower(F.col(col) if isinstance(col, str) else col), F.lit(TOKEN_RE), 0)


def unique_tokens(col: Column | str, ordered: bool = True) -> Column:
    """Distinct tokens, sorted.

    The reference preserves first-seen order; we sort instead so the
    result is canonical under Spark's unordered shuffles. Scores depend
    only on set membership, so parity is unaffected. Pass
    ``ordered=False`` when the array feeds an order-insensitive
    consumer (explode, size, array_intersect) — skipping the per-row
    sort is ~25% off a corpus tokenization pass (measured sf0.1)."""
    out = F.array_distinct(tokens(col))
    return F.array_sort(out) if ordered else out


def bm25_token_set(col: Column | str, language: str = "en", ordered: bool = True) -> Column:
    """The F3 BM25 token set (tf ∈ {0,1}), reference tokenize_for_bm25
    (utils/text_utils.py:255-314), mirroring its deterministic fallback
    path exactly:

      lowercase → strip ``[^\\w\\s\\-.]`` to spaces (hyphens, periods
      and underscores survive inside tokens: ``state-of-the-art``,
      ``3.14``, ``foo_bar``) → whitespace split → drop single chars
      unless digits → drop the 14 essential stopwords ONLY for
      ``language='en'`` → dedupe.

    We sort the set (the reference keeps first-seen order) so results
    are canonical under Spark's unordered shuffles; BM25 scores depend
    only on membership. ``ordered=False`` skips the per-row sort for
    order-insensitive consumers (explode/size — every BM25 build/score
    path), ~25% off a corpus tokenization pass (measured sf0.1).
    ``\\w`` here is ASCII (Java/RE2) vs the reference's unicode-aware
    Python ``\\w`` — divergent only on non-ASCII word chars.
    ``doc_length`` = size of this set."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    # single-pass form of the reference's replace-then-split: replacing
    # [^\w\s.-] with spaces and splitting on whitespace yields exactly
    # the maximal runs of [\w.-] — one regex pass instead of two
    # (measured ~2x on BM25-heavy plans)
    toks = F.regexp_extract_all(c, F.lit("[\\w.-]+"), 0)
    if language == "en":
        stops = F.array(*[F.lit(s) for s in BM25_STOPWORDS])
        keep = lambda t: ((F.length(t) > 1) | t.rlike("^[0-9]+$")) & ~F.array_contains(stops, t)  # noqa: E731
    else:
        keep = lambda t: (F.length(t) > 1) | t.rlike("^[0-9]+$")  # noqa: E731
    out = F.array_distinct(F.filter(toks, keep))
    return F.array_sort(out) if ordered else out


def bm25_tokenize_py(text: str, language: str = "en") -> list[str]:
    """Driver-side Python twin of ``bm25_token_set`` — same pipeline,
    used for single-query tokenization so query terms always agree with
    the postings index. Keeps the reference's first-seen order
    (utils/text_utils.py:306-313); order is irrelevant to scoring."""
    import re

    toks = re.findall(r"[\w.-]+", text.lower(), flags=re.ASCII)
    toks = [x for x in toks if len(x) > 1 or x.isdigit()]
    if language == "en":
        stops = set(BM25_STOPWORDS)
        toks = [x for x in toks if x not in stops]
    return list(dict.fromkeys(toks))


def clean_text(col: Column | str) -> Column:
    """Reference clean_text (utils/text_utils.py:77-102): lowercase,
    strip HTML tags, collapse non-word runs to single spaces."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, "<[^>]+>", " ")
    c = F.regexp_replace(c, "[^\\w\\s]", " ")
    c = F.regexp_replace(c, "\\s+", " ")
    return F.trim(c)


def normalize_query(col: Column | str) -> Column:
    """Reference normalize_query (query/enhancement.py:26-56):
    whitespace collapse, smart-quote standardization, punctuation dedup."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, "[‘’]", "'")
    c = F.regexp_replace(c, "[“”]", '"')
    c = F.regexp_replace(c, "([.!?]){2,}", "$1")
    c = F.regexp_replace(c, "\\s+", " ")
    return F.trim(c)


def word_count(col: Column | str, toks: Column | None = None) -> Column:
    return F.size(tokens(col) if toks is None else toks)


def char_length(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


def stopword_ratio(
    col: Column | str,
    stopwords: list[str] | None = None,
    toks: Column | None = None,
) -> Column:
    """Fraction of tokens that are (English) stopwords — a cheap
    quality / language signal computed fully JVM-side.

    Hot paths should pass ``toks`` — a token array MATERIALIZED in its
    own projection: the filter lambda below bypasses codegen CSE, so an
    inlined tokenizer re-evaluates its regex per reference (measured 2×
    on the sf10 quality scan; see curation.ngrams_from_tokens)."""
    sw = F.array(*[F.lit(s) for s in (stopwords or ESSENTIAL_STOPWORDS)])
    toks = tokens(col) if toks is None else toks
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0, n_sw / F.size(toks)).otherwise(F.lit(0.0))


def readability_scores(
    col: Column | str, toks: Column | None = None
) -> dict[str, Column]:
    """Flesch reading ease + Flesch-Kincaid grade level as pure column
    expressions — the classic readability pair in web-corpus quality
    stacks (too-low ease flags word-salad, too-low grade flags trivial
    boilerplate). Syllables are approximated as vowel-group runs (the
    standard heuristic; exact hyphenation needs a dictionary):

        ease  = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)
        grade = 0.39·(words/sentences) + 11.8·(syllables/words) − 15.59

    Sentence count = runs of ``.!?`` followed by whitespace or
    end-of-text (min 1) — the trailing context keeps decimal points and
    dotted tokens ('3.14', 'example.com') from inflating the count;
    the pattern avoids lookahead so the DuckDB (RE2) oracle evaluates
    it identically. All counts floor at 1 so empty docs score
    deterministically instead of NULL. Fully SQL-expressible
    (oracle-checkable). Pass a staged ``toks`` on hot paths (see
    stopword_ratio)."""
    c = F.col(col) if isinstance(col, str) else col
    nw = F.greatest(word_count(col, toks=toks), F.lit(1))
    ns = F.greatest(
        F.size(F.regexp_extract_all(c, F.lit(r"[.!?]+(\s+|$)"), 0)), F.lit(1)
    )
    sy = F.greatest(
        F.size(F.regexp_extract_all(F.lower(c), F.lit("[aeiouy]+"), 0)), F.lit(1)
    )
    wps = nw / ns
    spw = sy / nw
    return {
        "flesch_ease": F.round(F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 6),
        "fk_grade": F.round(F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), 6),
    }


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(F.regexp_replace(c, "[^.,;:!?]", ""))
    return F.when(F.length(c) > 0, n_punct / F.length(c)).otherwise(F.lit(0.0))


def quality_score(col: Column | str, toks: Column | None = None) -> Column:
    """Composite document-quality heuristic for training-data filtering:
    rewards mid-length docs, penalizes punctuation soup and stopword
    deserts. Deterministic + SQL-expressible (oracle-checkable).
    Pass a staged ``toks`` on hot paths (see stopword_ratio)."""
    wc = word_count(col, toks=toks).cast("double")
    length_term = F.least(wc / F.lit(100.0), F.lit(1.0))
    sw_term = F.least(stopword_ratio(col, toks=toks) * 4, F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(col) * 10, F.lit(1.0))
    return F.round((length_term + sw_term + punct_term) / 3, 6)


# Marker stopwords per language, in PRIORITY order: ties resolve to the
# earlier language (en > es > de > fr), matching the oracle CASE chain.
LANG_MARKERS: list[tuple[str, list[str]]] = [
    ("en", ["the", "and", "of", "to", "is", "that", "with"]),
    ("es", ["el", "la", "de", "que", "los", "una", "por"]),
    ("de", ["der", "die", "und", "das", "ist", "nicht", "mit"]),
    ("fr", ["le", "les", "des", "est", "une", "dans", "pour"]),
]


def detect_language_heuristic(col: Column | str, toks: Column | None = None) -> Column:
    """N-gram/stopword language-ID heuristic (stand-in for the
    reference's langdetect call, utils/language_detector.py:36-118):
    scores per-language stopword hit-rates and picks the argmax with a
    fixed priority order for ties. Pure column algebra — runs at scan
    speed, no Python. Pass a staged ``toks`` on hot paths: the 4
    per-language filter lambdas below each re-evaluate an inlined
    tokenizer (codegen CSE does not cross lambdas)."""
    toks = tokens(col) if toks is None else toks
    n = F.greatest(F.size(toks), F.lit(1)).cast("double")
    scores = []
    for _, markers in LANG_MARKERS:
        arr = F.array(*[F.lit(m) for m in markers])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        scores.append(hits / n)
    best = F.greatest(*scores) if len(scores) > 1 else scores[0]
    out = F.lit("und")
    # build the CASE in reverse so earlier languages win ties
    for (lang, _), score in reversed(list(zip(LANG_MARKERS, scores))):
        out = F.when((best >= 0.05) & (score == best), F.lit(lang)).otherwise(out)
    return out


def token_count_bpe_ish(col: Column | str) -> Column:
    """Approximate LLM token count without tiktoken (reference falls
    back to words × 1.3, database/chunking.py:24-60): count word pieces
    by splitting on whitespace and adding ceil(chars/4) for long words."""
    c = F.col(col) if isinstance(col, str) else col
    # explicit class — Java \S and RE2 \S disagree on \x0B
    pieces = F.regexp_extract_all(c, F.lit("[^ \\t\\n\\x0B\\f\\r]+"), 0)
    per_word = F.transform(
        pieces, lambda w: F.greatest(F.ceil(F.length(w) / F.lit(4.0)), F.lit(1))
    )
    return F.coalesce(
        F.aggregate(per_word, F.lit(0).cast("long"), lambda acc, x: acc + x),
        F.lit(0).cast("long"),
    )
