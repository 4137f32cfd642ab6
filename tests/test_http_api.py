"""Retrieval HTTP API (http_api.py, reference scripts/retrieve_api.py):
tested core + dep-gated transport."""

from __future__ import annotations

import sys
import types

import pytest

from customkb_spark import http_api as A


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    from customkb_spark.config import KBConfig
    from customkb_spark.kb import KnowledgeBase

    kb_dir = tmp_path_factory.mktemp("httpkb") / "docs"
    docs = spark.createDataFrame(
        [(i, f"spark data document number {i} " * 10, f"/d/{i}.md") for i in range(5)],
        ["doc_id", "text", "source"],
    )
    kb = KnowledgeBase(spark, str(kb_dir), KBConfig(vector_dimensions=8))
    kb.database(docs)
    kb.embed()
    return kb


def test_retrieve_context_returns_plain_references(engine):
    ctx = A.retrieve_context(engine, "spark data document", top_k=3)
    assert ctx and "spark data document" in ctx


def test_empty_query_short_circuits(engine):
    assert A.retrieve_context(engine, "") == ""
    assert A.retrieve_context(engine, "   ") == ""
    assert A.retrieve_context(engine, None) == ""


def test_max_chars_truncation(engine):
    full = A.retrieve_context(engine, "spark data document", max_chars=10**9)
    cut = A.retrieve_context(engine, "spark data document", max_chars=40)
    assert len(cut) == 40 and full.startswith(cut)


def test_health_info_shape(engine):
    info = A.health_info(engine, max_chars=1234, top_k=7)
    assert info["status"] == "ok"
    assert info["kb"] == engine.kb_dir
    assert info["top_k"] == 7 and info["max_chars"] == 1234
    assert A.health_info(None)["kb"] is None


def _no_fastapi() -> bool:
    try:
        import fastapi  # noqa: F401

        return False
    except ImportError:
        return True


@pytest.mark.skipif(not _no_fastapi(), reason="fastapi installed")
def test_build_app_dep_gated(engine):
    with pytest.raises(NotImplementedError, match="fastapi"):
        A.build_app(engine)


def test_build_app_with_mocked_transport(engine, monkeypatch):
    """Fake fastapi/pydantic in sys.modules; the registered routes must
    flow through the tested core (VERDICT r3 #6: transport mocked)."""
    routes: dict[str, object] = {}

    class FakeFastAPI:
        def __init__(self, **kw):
            pass

        def get(self, path):
            def deco(fn):
                routes[("GET", path)] = fn
                return fn

            return deco

        def post(self, path, **kw):
            def deco(fn):
                routes[("POST", path)] = fn
                return fn

            return deco

    class FakeBaseModel:
        def __init__(self, **kw):
            for k, v in kw.items():
                setattr(self, k, v)

    monkeypatch.setitem(
        sys.modules, "fastapi", types.SimpleNamespace(FastAPI=FakeFastAPI)
    )
    monkeypatch.setitem(
        sys.modules, "pydantic", types.SimpleNamespace(BaseModel=FakeBaseModel)
    )
    A.build_app(engine, max_chars=50, top_k=2)
    health = routes[("GET", "/health")]()
    assert health["status"] == "ok" and health["max_chars"] == 50

    req = types.SimpleNamespace(query="spark data document")
    resp = routes[("POST", "/")](req)
    assert len(resp.context) <= 50 and "spark" in resp.context

    resp_empty = routes[("POST", "/")](types.SimpleNamespace(query="  "))
    assert resp_empty.context == ""


def test_cli_serve_http_dep_gated(tmp_path, capsys):
    from customkb_spark import cli

    rc = cli.main(["serve-http", str(tmp_path / "kb"), "--port", "8123"])
    if _no_fastapi():
        assert rc == 2
        assert "serve-http:" in capsys.readouterr().err


def test_top_k_override_restored_and_oversized_query_empty(engine):
    prior = engine.cfg.query_top_k
    out = A.retrieve_context(engine, "spark data document", top_k=2)
    assert out != ""
    assert engine.cfg.query_top_k == prior  # per-request override restored
    # sanitize rejection (too long) → empty context, not a 500
    assert A.retrieve_context(engine, "x" * 20_000) == ""
    assert engine.cfg.query_top_k == prior
