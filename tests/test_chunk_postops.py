"""merge_small_chunks / validate_chunks / per-language separators —
mirrors the reference's tests/unit/test_database_chunking.py
TestChunkMerging + TestChunkValidation invariants."""

import pytest
from pyspark.sql import functions as F

from customkb_spark.ingest.chunker import (
    LANGUAGE_SEPARATORS,
    chunk_recursive_pandas,
    merge_small_chunks,
    separators_for,
    token_len_estimate,
    validate_chunks,
)


def _chunks_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, sid: int, chunk_text: string")


def _texts(df):
    out = {}
    for r in df.orderBy("doc_id", "sid").collect():
        out.setdefault(r["doc_id"], []).append(r["chunk_text"])
    return out


def test_merge_small_chunks(spark):
    df = _chunks_df(
        spark,
        [
            (1, 0, "Small"),
            (1, 1, "Tiny"),
            (1, 2, "This is a normal sized chunk that should not be merged"),
        ],
    )
    merged = merge_small_chunks(df, min_size=20)
    assert _texts(merged) == {
        1: ["Small\nTiny", "This is a normal sized chunk that should not be merged"]
    }
    rows = merged.orderBy("sid").collect()
    assert [r["sid"] for r in rows] == [0, 1]  # reindexed
    assert all(r["total_chunks"] == 2 for r in rows)
    assert rows[0]["char_count"] == len("Small\nTiny")


def test_merge_all_small_chunks(spark):
    df = _chunks_df(spark, [(1, 0, "A"), (1, 1, "B"), (1, 2, "C")])
    merged = merge_small_chunks(df, min_size=10)
    assert _texts(merged) == {1: ["A\nB\nC"]}


def test_merge_is_per_document(spark):
    df = _chunks_df(
        spark, [(1, 0, "A"), (1, 1, "B"), (2, 0, "C"), (2, 1, "D")]
    )
    merged = merge_small_chunks(df, min_size=10)
    assert _texts(merged) == {1: ["A\nB"], 2: ["C\nD"]}  # no cross-doc merge


def test_merge_stops_once_accumulated_reaches_min(spark):
    # 'aaaa'+'bb' accumulates past min=5 → 'cc' starts a new chunk
    df = _chunks_df(
        spark, [(1, 0, "aaaa"), (1, 1, "bb"), (1, 2, "cc"), (1, 3, "ddddddd"), (1, 4, "ee")]
    )
    merged = merge_small_chunks(df, min_size=5)
    assert _texts(merged) == {1: ["aaaa\nbb", "cc", "ddddddd", "ee"]}


def test_validate_valid_chunks(spark):
    df = _chunks_df(
        spark,
        [(1, 0, "This is a valid chunk"), (1, 1, "Another valid chunk of text")],
    )
    assert validate_chunks(df, max_chunk_size=1000, min_chunk_size=10).count() == 0


def test_validate_empty_text_raises(spark):
    df = _chunks_df(spark, [(1, 0, "Valid chunk"), (1, 1, "")])
    with pytest.raises(ValueError, match="failed validation"):
        validate_chunks(df, max_chunk_size=1000, min_chunk_size=10)
    flagged = validate_chunks(
        df, max_chunk_size=1000, min_chunk_size=10, strict=False
    ).collect()
    assert [(r["sid"], r["reason"]) for r in flagged] == [(1, "empty")]


def test_validate_oversize_raises_small_tail_allowed(spark):
    df = _chunks_df(spark, [(1, 0, "x" * 2001), (1, 1, "tail")])
    with pytest.raises(ValueError):
        validate_chunks(df)
    flagged = validate_chunks(df, strict=False).collect()
    # sid 0 oversize; sid 1 is the LAST chunk → small tail allowed
    assert [(r["sid"], r["reason"]) for r in flagged] == [(0, "oversize")]
    # a small NON-last chunk is flagged as a warning
    df2 = _chunks_df(spark, [(1, 0, "tiny"), (1, 1, "x" * 100)])
    flagged2 = validate_chunks(df2, strict=False).collect()
    assert [(r["sid"], r["reason"]) for r in flagged2] == [(0, "undersize")]


def test_separators_for_language_map():
    assert separators_for("text", ".py")[0] == "\nclass "
    assert separators_for("text", ".go")[0] == "\nfunc "
    assert separators_for("markdown", None)[0] == "\n# "
    assert separators_for("unknown", ".unknown") == separators_for("text")
    assert separators_for("text", ".XML") == LANGUAGE_SEPARATORS[".xml"]


def test_token_len_estimate_matches_reference_fallback():
    # reference database/chunking.py:57: int(len(text.split()) * 1.3)
    assert token_len_estimate("one two three four") == int(4 * 1.3)
    assert token_len_estimate("") == 0


def test_recursive_chunker_token_length_and_merge(spark):
    text = ("para one word " * 30 + "\n\n") * 4  # 4 paragraphs, ~120 words
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    out = chunk_recursive_pandas(
        docs, chunk_size=50, length="tokens", min_merge_size=30
    ).collect()
    assert len(out) >= 2
    # every chunk respects the token budget
    assert all(token_len_estimate(r["chunk_text"]) <= 50 for r in out)
    # python extension splits on def boundaries
    code = "def a():\n    pass\n" * 60
    cdocs = spark.createDataFrame([(2, code)], ["doc_id", "text"])
    cout = chunk_recursive_pandas(
        cdocs, chunk_size=200, extension=".py"
    ).collect()
    assert len(cout) > 1
    assert all(len(r["chunk_text"]) <= 200 for r in cout)
