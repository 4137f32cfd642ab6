"""MCP shim (S10, reference mcp_server/server.py:79-131): tool dispatch
over the in-process engine."""

import pytest

from customkb_spark import mcp_shim as M


@pytest.fixture(scope="module")
def kb_base(spark, tmp_path_factory):
    from customkb_spark.config import KBConfig
    from customkb_spark.kb import KnowledgeBase

    base = tmp_path_factory.mktemp("vectordbs")
    kb_dir = base / "techdocs"
    docs = spark.createDataFrame(
        [(i, f"spark data document {i} " * 10, f"/d/{i}.md") for i in range(5)],
        ["doc_id", "text", "source"],
    )
    kb = KnowledgeBase(spark, str(kb_dir), KBConfig(vector_dimensions=8))
    kb.database(docs)
    kb.embed()
    (base / ".hidden").mkdir()
    (base / "empty_dir").mkdir()
    return str(base)


def test_list_knowledgebases(kb_base):
    assert M.list_knowledgebases(kb_base) == ["techdocs"]
    assert M.list_knowledgebases("/nonexistent/nowhere") == []


def test_get_kb_info(spark, kb_base):
    info = M.handle_tool_call(spark, "get_kb_info", {"kb": "techdocs"}, kb_base)
    assert info["available"] is True and info["chunks"] > 0 and info["vectors"] > 0
    missing = M.handle_tool_call(spark, "get_kb_info", {"kb": "nope"}, kb_base)
    assert missing == {"name": "nope", "available": False}


def test_search_tool_both_addressing_forms(spark, kb_base):
    r1 = M.handle_tool_call(
        spark, "search_techdocs", {"query": "spark data", "top_k": 3}, kb_base
    )
    r2 = M.handle_tool_call(
        spark,
        "search_knowledgebase",
        {"kb": "techdocs", "query": "spark data", "top_k": 3},
        kb_base,
    )
    assert isinstance(r1, str) and "document" in r1
    assert r1 == r2


def test_search_errors_never_raise(spark, kb_base):
    out = M.handle_tool_call(spark, "search_missing", {"query": "x"}, kb_base)
    assert out.startswith("Error querying missing")
    out = M.handle_tool_call(spark, "bogus_tool", {}, kb_base)
    assert out.startswith("Error: unknown tool")


def test_serve_dep_gated(kb_base):
    try:
        import mcp  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="mcp"):
            M.serve(kb_base)
