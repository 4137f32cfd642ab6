"""F19 — robust LLM-JSON extraction (functions/llm_json.py).

Mirrors the reference's `_extract_json` + cleanup-parse test coverage
(categorize/categorize_manager.py:38-63,464-483; reference tests in
tests/unit/test_categorize_manager.py): bare JSON, fenced JSON, prose
wrapping, trailing commas, oversized and hopeless payloads, and the
end-to-end path where a fake litellm returns fenced JSON through the
real ChatJSONCategorizer.
"""

from __future__ import annotations

import sys
import types

from customkb_spark.functions.llm_json import (
    extract_json,
    parse_category_response,
    parse_llm_json,
    repair_json,
)

FENCED = """Here are the categories you asked for:

```json
{
  "categories": [
    {"name": "Technology", "confidence": 0.95},
    {"name": "Science", "confidence": 0.81}
  ],
  "suggested_new": []
}
```

Let me know if you need anything else!"""


def test_extract_bare_json_passthrough():
    assert extract_json('  {"a": 1}  ') == '{"a": 1}'
    assert extract_json('["x"]') == '["x"]'


def test_extract_fenced_json():
    got = extract_json(FENCED)
    assert got.startswith("{") and got.endswith("}")
    assert parse_llm_json(FENCED)["categories"][0]["name"] == "Technology"


def test_extract_unfenced_prose_brace_span():
    text = 'Sure! The result is {"a": [1, 2]} which should work.'
    assert extract_json(text) == '{"a": [1, 2]}'
    assert parse_llm_json(text) == {"a": [1, 2]}


def test_extract_no_json_returns_stripped_input():
    assert extract_json("  no json here  ") == "no json here"
    assert parse_llm_json("no json here", fallback="FB") == "FB"


def test_trailing_comma_repair():
    bad = '{"categories": [{"name": "A", "confidence": 0.9},], "x": [1, 2,],}'
    assert parse_llm_json(bad)["x"] == [1, 2]
    assert repair_json('[1, 2,\n]') == '[1, 2\n]'


def test_fenced_plus_trailing_comma():
    text = "```\n{\"a\": 1,}\n```"
    assert parse_llm_json(text) == {"a": 1}


def test_oversized_payload_hits_fallback():
    huge = '{"a": "' + "x" * 100 + '"}'
    assert parse_llm_json(huge, fallback=None, max_bytes=50) is None


def test_hopeless_payload_hits_fallback():
    assert parse_llm_json('{"a": unquoted}', fallback={}) == {}
    assert parse_llm_json(None, fallback={}) == {}


def test_parse_category_response_validation():
    resp = """{
      "categories": [
        {"name": "Good", "confidence": 0.9},
        {"name": "AlsoGood", "confidence": "0.7"},
        {"name": "NoConfidence"},
        {"confidence": 0.5},
        "bare-string",
        {"name": "BadConf", "confidence": "high"}
      ]
    }"""
    got = parse_category_response(resp)
    assert got == [("Good", 0.9), ("AlsoGood", 0.7)]


def test_parse_category_response_non_dict_and_garbage():
    assert parse_category_response('["just", "a", "list"]') == []
    assert parse_category_response("total garbage") == []


# ------------------------------------------- end-to-end through the chat path


def test_chat_json_categorizer_parses_fenced_response():
    from customkb_spark.operators.categorize import ChatJSONCategorizer
    from customkb_spark.plans.answer import LLMProvider

    class FencedLLM(LLMProvider):
        name = "fake-fenced"

        def complete(self, system, user, max_tokens=512):
            assert "JSON" in user  # the prompt demands JSON
            return FENCED

    cats = ChatJSONCategorizer(llm=FencedLLM()).classify("some text", 2)
    assert cats == ["Technology", "Science"]


def test_chat_json_categorizer_with_real_litellm_provider(monkeypatch):
    """Mock litellm returning markdown-fenced JSON; the REAL
    LiteLLMChatLLM provider + ChatJSONCategorizer must parse it
    (VERDICT r3 #3: this was the live gap)."""

    def completion(model, messages, **kwargs):
        msg = types.SimpleNamespace(content=FENCED)
        return types.SimpleNamespace(choices=[types.SimpleNamespace(message=msg)])

    monkeypatch.setitem(
        sys.modules, "litellm", types.SimpleNamespace(completion=completion)
    )
    from customkb_spark.operators.categorize import ChatJSONCategorizer

    prov = ChatJSONCategorizer(model="gpt-4o-mini")
    assert prov.classify("sample", 1) == ["Technology"]


def test_chat_json_categorizer_malformed_yields_empty():
    from customkb_spark.operators.categorize import ChatJSONCategorizer
    from customkb_spark.plans.answer import LLMProvider

    class GarbageLLM(LLMProvider):
        def complete(self, system, user, max_tokens=512):
            return "I cannot help with that."

    assert ChatJSONCategorizer(llm=GarbageLLM()).classify("text", 3) == []


def test_chat_json_categorizer_registered():
    from customkb_spark.operators.categorize import _CATEGORIZERS, ChatJSONCategorizer

    assert _CATEGORIZERS["chat-json"] is ChatJSONCategorizer


def test_deeply_nested_payload_hits_fallback_not_recursion():
    """'['*200k is under max_bytes but would blow json.loads's stack —
    the never-raises contract must hold (code-review r4)."""
    assert parse_llm_json("[" * 200_000, fallback="FB") == "FB"
    assert parse_llm_json("{" * 200_000, fallback="FB") == "FB"
