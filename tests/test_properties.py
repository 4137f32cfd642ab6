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
