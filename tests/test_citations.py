"""Citations subsystem (operators/citations.py — the reference's
utils/citations analogue): regex tier, provider tier, incremental
skip, frontmatter application."""

from __future__ import annotations

import pytest

from customkb_spark.operators import citations as C

DOCS = [
    (0, "# Machines of Loving Grace\nBy Dario Amodei\nPublished 2024\n\nbody text", "/d/machines-of-loving-grace.md"),
    (1, "An untitled report\nwith more lines\n1987 was a year", "/d/report.txt"),
    (2, "12345\nnumeric title should be dropped", "/d/numeric.md"),
    (3, "Author: Jane Q. Public\nSome essay content", "/d/essay.md"),
    (4, None, "/d/empty.md"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text", "source"])


def test_extract_citations_rules(spark, docs):
    rows = {r.doc_id: r for r in C.extract_citations(docs).collect()}
    assert rows[0].title == "Machines of Loving Grace"
    assert rows[0].author == "Dario Amodei"
    assert rows[0].year == 2024
    assert rows[1].title == "An untitled report"
    assert rows[1].author is None and rows[1].year == 1987
    # all-numeric first line → NF (reference rule), falls to nothing
    assert rows[2].title is None
    assert rows[3].author == "Jane Q. Public"
    assert rows[4].title is None and rows[4].author is None and rows[4].year is None


def test_title_truncation(spark):
    long_line = "word " * 40
    df = spark.createDataFrame([(0, long_line, "s")], ["doc_id", "text", "source"])
    t = C.extract_citations(df).first().title
    assert len(t) <= 80


def test_stub_provider_matches_column_path(spark, docs):
    got = {r.doc_id: r for r in C.llm_citations(docs, model="stub-heuristic").collect()}
    want = {r.doc_id: r for r in C.extract_citations(docs).collect()}
    for i in want:
        assert (got[i].title, got[i].author, got[i].year) == (
            want[i].title,
            want[i].author,
            want[i].year,
        )


def test_chat_json_provider_parses_fenced(spark, docs):
    from customkb_spark.plans.answer import LLMProvider

    class FencedLLM(LLMProvider):
        def complete(self, system, user, max_tokens=512):
            assert "file-title:" in user  # hint reaches the prompt
            return '```json\n{"title": "T", "author": "A", "year": "2001",}\n```'

    prov = C.ChatJSONCitations(llm=FencedLLM())
    got = prov.extract("head text", "some-file")
    assert got == {"title": "T", "author": "A", "year": "2001"}

    class GarbageLLM(LLMProvider):
        def complete(self, system, user, max_tokens=512):
            return "cannot comply"

    assert C.ChatJSONCitations(llm=GarbageLLM()).extract("h", "f") == {
        "title": "",
        "author": "",
        "year": "",
    }


def test_citations_pending_left_anti(spark, docs):
    existing = spark.createDataFrame([(0,), (3,)], ["doc_id"])
    pending = sorted(r.doc_id for r in C.citations_pending(docs, existing).collect())
    assert pending == [1, 2, 4]
    assert C.citations_pending(docs, None).count() == 5


def test_render_frontmatter_rules():
    fm = C.render_frontmatter("T", "A", 2020)
    assert fm == '---\ntitle: "T"\nauthor: "A"\nyear: "2020"\n---\n'
    assert C.render_frontmatter(None, "", None) == ""  # all blank → none
    assert C.render_frontmatter('Say "hi"', None, None) == '---\ntitle: "Say \\"hi\\""\n---\n'


def test_apply_frontmatter_text_skip_and_force():
    body = "content here"
    out = C.apply_frontmatter_text(body, "T", None, None)
    assert out.startswith('---\ntitle: "T"\n---\n') and out.endswith(body)
    # existing frontmatter skipped unless force
    existing = "---\ntitle: \"Old\"\n---\nbody"
    assert C.apply_frontmatter_text(existing, "New", None, None) == existing
    forced = C.apply_frontmatter_text(existing, "New", None, None, force=True)
    assert forced == '---\ntitle: "New"\n---\nbody'
    # no citation fields → text unchanged
    assert C.apply_frontmatter_text(body, None, None, None) == body


def test_apply_frontmatter_frame(spark, docs):
    cits = C.extract_citations(docs)
    out = {r.doc_id: r.text for r in C.apply_frontmatter(docs, cits).collect()}
    assert out[0].startswith('---\ntitle: "Machines of Loving Grace"\nauthor: "Dario Amodei"\nyear: "2024"\n---\n')
    assert out[0].endswith("body text")
    assert out[2] == DOCS[2][1]  # no fields extracted → unchanged
    assert out[4] == ""  # null text, no citation → empty passthrough
