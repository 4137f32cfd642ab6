"""Property-based invariants (hypothesis) — the reference has none
(SURVEY.md §5); these pin algebraic properties the oracle can't:
reconstruction, bounds, set-invariance, idempotence.

Each property batches all generated examples into ONE DataFrame so a
hypothesis run costs one Spark job, not max_examples jobs.
"""

import string

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from customkb_spark.functions import text as X
from customkb_spark.functions.enhance import correct_spelling, enhance_query
from customkb_spark.ingest.chunker import chunk_fixed

TEXT = st.text(alphabet=string.ascii_lowercase + " .!?0123456789", max_size=400)
SETTINGS = dict(max_examples=10, deadline=None)


@settings(**SETTINGS)
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_chunker_reconstructs_text(texts):
    spark = _spark()
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    chunks = chunk_fixed(docs, "doc_id", "text", 50, overlap=0)
    rebuilt = {
        r["doc_id"]: r["t"]
        for r in chunks.orderBy("doc_id", "sid")
        .groupBy("doc_id")
        .agg(F.concat_ws("", F.collect_list("chunk_text")).alias("t"))
        .collect()
    }
    for i, t in enumerate(texts):
        assert rebuilt[i] == t  # lossless cover, no gaps or overlaps


@settings(**SETTINGS)
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_quality_score_bounded(texts):
    spark = _spark()
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    rows = docs.select(X.quality_score("text").alias("q")).collect()
    assert all(0.0 <= r["q"] <= 1.0 for r in rows)


@settings(**SETTINGS)
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_unique_tokens_set_semantics(texts):
    spark = _spark()
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    rows = docs.select(
        X.unique_tokens("text").alias("u"), X.tokens("text").alias("t")
    ).collect()
    for r in rows:
        assert r["u"] == sorted(set(r["t"]))  # distinct + sorted
        assert len(r["u"]) <= len(r["t"])


@settings(**SETTINGS)
@given(TEXT)
def test_spell_correction_idempotent(q):
    once = correct_spelling(q)
    assert correct_spelling(once) == once


@settings(**SETTINGS)
@given(st.text(alphabet=string.ascii_lowercase + " ", max_size=60))
def test_enhance_deterministic_and_total(q):
    a, b = enhance_query(q), enhance_query(q)
    assert a == b
    assert isinstance(a, str)


def _spark():
    from customkb_spark.session import get_spark

    return get_spark("tests", cpus=8, shuffle_partitions=8)


PII_TEXT = st.text(
    alphabet=string.ascii_lowercase + string.digits + " .@-+_", max_size=120
)


@settings(**SETTINGS)
@given(st.lists(PII_TEXT, min_size=1, max_size=8))
def test_pii_scrub_idempotent(texts):
    """Scrubbing already-scrubbed text changes nothing — redaction
    tokens must never re-match any PII pattern."""
    from customkb_spark.operators.curation import pii_scrub

    spark = _spark()
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    once = pii_scrub(docs).select("doc_id", F.col("redacted").alias("text"))
    twice = pii_scrub(once).select("doc_id", "redacted")
    a = {r.doc_id: r.text for r in once.collect()}
    b = {r.doc_id: r.redacted for r in twice.collect()}
    assert a == b


@settings(**SETTINGS)
@given(st.lists(TEXT, min_size=1, max_size=8), st.integers(min_value=1, max_value=5))
def test_word_ngrams_count_identity(texts, n):
    """len(ngrams) == max(0, len(tokens) - n + 1) for every doc."""
    from customkb_spark.operators.curation import word_ngrams

    spark = _spark()
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    rows = docs.select(
        F.size(X.tokens("text")).alias("nt"),
        F.size(word_ngrams("text", n)).alias("ng"),
    ).collect()
    for r in rows:
        assert r.ng == max(0, r.nt - n + 1)


@settings(**SETTINGS)
@given(st.lists(TEXT, min_size=1, max_size=6))
def test_span_dedup_conservation(texts):
    """Every span is either a first occurrence or a duplicate:
    sum(firsts) + sum(dups) == total spans, and dups == 0 when all
    docs are distinct singleton-span texts."""
    from customkb_spark.operators.curation import span_dedup_stats

    spark = _spark()
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    rows = span_dedup_stats(docs, span_words=3).collect()
    for r in rows:
        assert 0 <= r.dup_spans <= r.n_spans
        assert 0.0 <= r.dup_span_frac <= 1.0


@settings(**SETTINGS)
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_gopher_signals_bounded(texts):
    from customkb_spark.operators.curation import gopher_quality_signals

    spark = _spark()
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    for r in gopher_quality_signals(docs).collect():
        assert r["n_words"] >= 0 and r["n_stop_hits"] >= 0
        for frac in ("symbol_word_ratio", "bullet_line_frac",
                     "ellipsis_line_frac", "alpha_word_frac"):
            # ratios-of-counts: fractions of lines/words stay in [0, 1]
            # (symbol ratio can exceed 1 only when symbols outnumber
            # words, which '#'-only docs can produce — lower bound only)
            assert r[frac] >= 0.0
        assert r["bullet_line_frac"] <= 1.0
        assert r["ellipsis_line_frac"] <= 1.0
        assert r["alpha_word_frac"] <= 1.0
        assert r["mean_word_len"] >= 0.0


@settings(**SETTINGS)
@given(st.lists(TEXT, min_size=2, max_size=8))
def test_tfidf_keyphrases_partitioning_invariant(texts):
    from customkb_spark.operators.curation import tfidf_keyphrases

    spark = _spark()
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    a = {
        r["doc_id"]: (r["keyphrases"], r["scores"])
        for r in tfidf_keyphrases(docs.repartition(1), k=3).collect()
    }
    b = {
        r["doc_id"]: (r["keyphrases"], r["scores"])
        for r in tfidf_keyphrases(docs.repartition(7), k=3).collect()
    }
    assert a == b  # rank + tie-break fully deterministic under shuffles
    for phrases, scores in a.values():
        assert len(phrases) == len(scores) <= 3
        assert scores == sorted(scores, reverse=True)


@settings(**SETTINGS)
@given(
    st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=30),
    st.integers(min_value=1, max_value=16),
)
def test_pack_segments_partition_of_token_stream(counts, seq_len):
    """Packing is a PARTITION of each shard's token stream: segment
    tokens are positive, sum to each doc's count, every pack except the
    last is exactly full, and pack ids are the contiguous prefix
    0..ceil(total/L)-1."""
    from customkb_spark.operators.packing import pack_segments, pack_summary

    spark = _spark()
    rows = [("s", i, c) for i, c in enumerate(counts)]
    df = spark.createDataFrame(rows, ["source", "doc_id", "n"])
    seg = pack_segments(df, seq_len, n_tokens_col="n").collect()
    total = sum(c for c in counts if c > 0)
    assert sum(r.seg_tokens for r in seg) == total
    assert all(1 <= r.seg_tokens <= seq_len for r in seg)
    per_doc = {}
    for r in seg:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.seg_tokens
    for i, c in enumerate(counts):
        assert per_doc.get(i, 0) == c
    if total:
        packs = {}
        for r in seg:
            packs[r.pack_id] = packs.get(r.pack_id, 0) + r.seg_tokens
        n_packs = -(-total // seq_len)
        assert sorted(packs) == list(range(n_packs))
        for p in range(n_packs - 1):
            assert packs[p] == seq_len


@settings(**SETTINGS)
@given(st.lists(TEXT, min_size=2, max_size=10), st.integers(min_value=0, max_value=9))
def test_dsir_weights_finite_and_total(texts, pivot):
    """DSIR weights are finite (never NaN/inf — the Laplace smoothing
    guards every log) and every doc with tokens gets a row with a
    positive token count, for any target/raw split of the corpus."""
    from customkb_spark.operators import curation as CU

    spark = _spark()
    rows = [("t" if i <= pivot else "r", i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["source", "doc_id", "text"])
    out = CU.dsir_log_weights(df, F.col("source") == "t").collect()
    import math

    assert all(math.isfinite(r.log_weight) for r in out)
    assert all(r.n_tokens > 0 for r in out)


@settings(**SETTINGS)
@given(st.text(max_size=2000))
def test_parse_llm_json_never_raises(payload):
    """F19 robustness: arbitrary model output — fences, braces, control
    chars, emoji — never raises; it parses or yields the fallback."""
    from customkb_spark.functions.llm_json import parse_llm_json

    got = parse_llm_json(payload, fallback={"x": 1})
    assert got is not None


@settings(**SETTINGS)
@given(st.text(max_size=2000))
def test_parse_llm_json_roundtrips_valid_json(payload):
    import json

    from customkb_spark.functions.llm_json import parse_llm_json

    doc = json.dumps({"k": payload})
    assert parse_llm_json(doc) == {"k": payload}
    # fenced form parses to the same object
    assert parse_llm_json(f"```json\n{doc}\n```") == {"k": payload}


@settings(**SETTINGS)
@given(st.text(min_size=1, max_size=500))
def test_sanitize_and_mask_idempotent(text):
    """Sanitize and mask are idempotent — running the gate twice never
    changes the result again (no oscillating rewrites in log chains)."""
    from customkb_spark.functions.security import (
        mask_sensitive_data,
        sanitize_query_text,
    )

    masked = mask_sensitive_data(text)
    assert mask_sensitive_data(masked) == masked
    try:
        clean = sanitize_query_text(text)
    except ValueError:
        return  # empty-after-strip or oversized: contract says raise
    if clean:
        assert sanitize_query_text(clean) == clean


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
            min_size=4, max_size=4,
        ),
        min_size=2, max_size=10, unique_by=tuple,
    ),
    st.integers(min_value=1, max_value=4),
    st.floats(min_value=0.1, max_value=0.99),
)
def test_semantic_pairs_subset_of_exact(vecs, nlist, threshold):
    """Cluster scoping only ever DROPS pairs (recall trade, never a
    false positive), and nlist=1 is exactly brute force — for arbitrary
    vectors, cell counts, and thresholds."""
    from customkb_spark.embedding.index import train_centroids
    from customkb_spark.operators import dedup as D

    spark = _spark()
    # zero vectors have undefined cosine; keep the property about scope
    vecs = [v for v in vecs if any(x != 0.0 for x in v)] or [[1.0, 0.0, 0.0, 0.0]]
    emb = spark.createDataFrame(
        list(enumerate(vecs)), "vec_id: long, embedding: array<double>"
    )
    exact = {
        (r.id_a, r.id_b)
        for r in D.embedding_near_duplicates(emb, threshold=threshold).collect()
    }
    cents = train_centroids(emb, "embedding", nlist=nlist, sample_size=100)
    sem = {
        (r.id_a, r.id_b)
        for r in D.semantic_duplicates(emb, cents, threshold=threshold).collect()
    }
    assert sem <= exact
    if nlist == 1:
        assert sem == exact


# token streams with a small alphabet so duplicated >=k runs actually
# occur; words only (the substring ops are token-space)
WORDS = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]), min_size=0, max_size=60
)


@settings(**SETTINGS)
@given(st.lists(WORDS, min_size=1, max_size=6))
def test_substring_spans_invariants(docs_words):
    """ExactSubstr spans: within a doc, spans are disjoint, sorted,
    >= k tokens long, inside the doc, and n_windows matches the island
    arithmetic (span length - k + 1)."""
    from customkb_spark.operators.dedup import duplicated_substring_spans

    k = 4
    spark = _spark()
    docs = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs_words)], ["doc_id", "text"]
    )
    n_toks = {i: len(ws) for i, ws in enumerate(docs_words)}
    spans = duplicated_substring_spans(docs, k=k).orderBy("doc_id", "span_start")
    per_doc: dict[int, list] = {}
    for r in spans.collect():
        per_doc.setdefault(r["doc_id"], []).append(r)
    for d, rs in per_doc.items():
        prev_end = -1
        for r in rs:
            assert 0 <= r["span_start"] < r["span_end"] <= n_toks[d]
            assert r["span_end"] - r["span_start"] >= k
            assert r["n_windows"] == r["span_end"] - r["span_start"] - k + 1
            # maximal islands: disjoint AND non-adjacent in window space
            assert r["span_start"] > prev_end
            prev_end = r["span_end"]


@settings(**SETTINGS)
@given(st.lists(WORDS, min_size=1, max_size=6))
def test_exact_substring_dedup_counters(docs_words):
    """Apply: every doc comes back exactly once; removed ==
    n_tokens - kept; kept tokens are a subsequence of the original."""
    from customkb_spark.operators.dedup import exact_substring_dedup

    k = 4
    spark = _spark()
    docs = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs_words)], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in exact_substring_dedup(docs, k=k).collect()}
    assert set(out) == set(range(len(docs_words)))
    for i, ws in enumerate(docs_words):
        r = out[i]
        kept = r["text"].split() if r["text"] else []
        assert r["n_tokens"] == len(ws)
        assert r["removed_tokens"] == len(ws) - len(kept)
        # kept tokens are a subsequence of the original
        it = iter(ws)
        assert all(any(w == x for x in it) for w in kept)


LINEY = st.lists(
    st.text(
        alphabet=string.ascii_letters + string.digits + " .!?{",
        max_size=40,
    ),
    min_size=0,
    max_size=6,
).map(lambda ls: "\n".join(ls))


@settings(**SETTINGS)
@given(st.lists(LINEY, min_size=1, max_size=6))
def test_c4_and_refinedweb_counter_invariants(texts):
    """Page-cleaning invariants on arbitrary line-shaped text: kept
    lines are a subset of the (trimmed) originals, counters are
    consistent, fractions bounded."""
    from customkb_spark.operators.curation import (
        c4_page_filters,
        refinedweb_line_corrections,
    )

    spark = _spark()
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    # NB: ''.split('\n') == [''] — a kept empty line and zero kept
    # lines both render clean_text == '', so split only when kept > 0
    for r in c4_page_filters(docs).collect():
        orig = {ln.strip() for ln in texts[r.doc_id].split("\n")}
        kept = r.clean_text.split("\n") if r.lines_kept else []
        assert r.lines_kept == len(kept) <= r.lines_total
        assert all(k in orig for k in kept)
        assert r.n_sentences >= 0
    for r in refinedweb_line_corrections(docs).collect():
        kept = r.clean_text.split("\n") if r.lines_kept else []
        assert r.lines_kept == len(kept) <= r.lines_total
        assert 0.0 <= r.removed_char_frac <= 1.0
        assert r.keep == (r.removed_char_frac <= 0.05)


@settings(**SETTINGS)
@given(st.lists(LINEY, min_size=1, max_size=6))
def test_line_dedup_global_uniqueness(texts):
    """After line_dedup, every nonempty normalized line appears EXACTLY
    once across the whole corpus, and the survivors equal the distinct
    normalized nonempty lines of the input."""
    import re

    from customkb_spark.operators.curation import line_dedup

    def norm(l):
        return re.sub(r"\s+", " ", re.sub(r"[^a-z\s]", "", l.lower())).strip()

    spark = _spark()
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    out = {r.doc_id: r for r in line_dedup(docs).collect()}
    seen: list[str] = []
    for r in out.values():
        assert r.lines_kept + r.lines_removed == r.lines_total
        for ln in r.clean_text.split("\n") if r.clean_text else []:
            n = norm(ln)
            if n:
                seen.append(n)
    expected = {norm(l) for t in texts for l in t.split("\n") if norm(l)}
    assert sorted(seen) == sorted(set(seen))  # exactly once each
    assert set(seen) == expected  # nothing lost, nothing invented
