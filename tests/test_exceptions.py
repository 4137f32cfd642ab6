"""Typed error hierarchy (exceptions.py vs reference utils/exceptions.py,
tests/unit/test_exceptions.py)."""

from __future__ import annotations

import pytest

from customkb_spark import exceptions as E


def test_base_message_and_details_rendering():
    err = E.CustomKBError("broke", {"a": 1, "b": "x"})
    assert err.message == "broke"
    assert str(err) == "broke (a=1, b=x)"
    assert str(E.CustomKBError("plain")) == "plain"


def test_kb_not_found_lists_available():
    err = E.KnowledgeBaseNotFoundError("missing", ["kb1", "kb2"])
    assert "missing" in str(err) and "kb1, kb2" in str(err)
    assert err.details["available"] == ["kb1", "kb2"]
    assert isinstance(err, E.ConfigurationError)


def test_hierarchy_isinstance_chain():
    assert issubclass(E.TableNotFoundError, E.DatabaseError)
    assert issubclass(E.RateLimitError, E.APIError)
    assert issubclass(E.ModelNotAvailableError, E.EmbeddingError)
    assert issubclass(E.DocumentProcessingError, E.ProcessingError)
    for cls in (E.ConfigurationError, E.DatabaseError, E.APIError, E.ProcessingError):
        assert issubclass(cls, E.CustomKBError)


def test_rate_limit_retry_bookkeeping():
    err = E.RateLimitError("slow down", retry_count=2, max_retries=3)
    assert err.can_retry()
    assert not E.RateLimitError("x", retry_count=3, max_retries=3).can_retry()


def test_handle_exception_maps_and_chains():
    with pytest.raises(E.ConfigurationError) as ei:
        E.handle_exception(ValueError("bad knob"))
    assert isinstance(ei.value.__cause__, ValueError)

    with pytest.raises(E.TableNotFoundError):
        E.handle_exception(FileNotFoundError("chunks"))

    with pytest.raises(E.APIError):
        E.handle_exception(ConnectionError("down"))

    # already-typed errors pass through unchanged
    orig = E.CacheError("stale")
    got = E.handle_exception(orig, raise_custom=False)
    assert got is orig


def test_handle_exception_maps_spark_errors():
    from pyspark.errors import AnalysisException

    try:
        raise AnalysisException("[TABLE_OR_VIEW_NOT_FOUND] nope")
    except AnalysisException as e:
        got = E.handle_exception(e, raise_custom=False)
    assert isinstance(got, E.QueryError)


def test_handle_exception_logs(caplog):
    import logging

    logger = logging.getLogger("t_exc")
    with caplog.at_level(logging.ERROR, logger="t_exc"):
        E.handle_exception(ValueError("nope"), logger=logger, raise_custom=False)
    assert "nope" in caplog.text
