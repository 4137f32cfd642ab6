"""Dep-gated real-provider integrations (LiteLLM, tiktoken).

The container has neither package, so these tests inject fakes via
sys.modules — exactly the reference's mock-client strategy (SURVEY.md
§5). The gates themselves (ImportError without the package, stub/
estimate fallback) are asserted against the real empty environment.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest


def _no_litellm() -> bool:
    try:
        import litellm  # noqa: F401

        return False
    except ImportError:
        return True


# ------------------------------------------------------------ embedding


def _fake_litellm_embedding(calls):
    def embedding(model, input, **kwargs):  # noqa: A002 (litellm's name)
        calls.append({"model": model, "n": len(input), **kwargs})
        resp = types.SimpleNamespace()
        resp.data = [{"embedding": [float(len(t)), 1.0, 2.0]} for t in input]
        return resp

    return types.SimpleNamespace(embedding=embedding)


def test_litellm_embedding_routing_caps_and_calls(monkeypatch):
    calls: list[dict] = []
    monkeypatch.setitem(sys.modules, "litellm", _fake_litellm_embedding(calls))
    from customkb_spark.embedding.embedder import LiteLLMEmbeddingProvider

    # gemini routing + family batch cap (reference embed_manager.py:649-664)
    p = LiteLLMEmbeddingProvider("gemini-embedding-001", dimensions=3)
    assert p.model == "gemini/gemini-embedding-001"
    assert p.batch_cap == 100

    # explicit provider/model passes through; openai family cap
    p2 = LiteLLMEmbeddingProvider("openai/text-embedding-3-small")
    assert p2.model == "openai/text-embedding-3-small"
    assert p2.batch_cap == 2048

    vecs = p.get_embeddings(["ab", "cdef"])
    assert isinstance(vecs, np.ndarray) and vecs.shape == (2, 3)
    assert vecs.dtype == np.float32
    assert calls[-1] == {"model": "gemini/gemini-embedding-001", "n": 2, "dimensions": 3}


def test_litellm_embedding_retry_backoff(monkeypatch):
    attempts = {"n": 0}

    def flaky(model, input, **kwargs):  # noqa: A002
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise ConnectionError("transient")
        resp = types.SimpleNamespace()
        resp.data = [{"embedding": [1.0, 0.0]} for _ in input]
        return resp

    monkeypatch.setitem(
        sys.modules, "litellm", types.SimpleNamespace(embedding=flaky)
    )
    import time as _time

    monkeypatch.setattr(_time, "sleep", lambda s: None)
    from customkb_spark.embedding.embedder import LiteLLMEmbeddingProvider

    p = LiteLLMEmbeddingProvider("text-embedding-3-small")
    out = p.get_embeddings_with_retry(["x"])
    assert attempts["n"] == 3 and out.shape == (1, 2)


def test_unknown_model_resolves_to_litellm_provider(monkeypatch):
    calls: list[dict] = []
    monkeypatch.setitem(sys.modules, "litellm", _fake_litellm_embedding(calls))
    import customkb_spark.embedding.embedder as EM

    monkeypatch.setattr(EM, "_provider_singleton", None)
    p = EM.get_provider("text-embedding-3-small", 3)
    assert isinstance(p, EM.LiteLLMEmbeddingProvider)
    monkeypatch.setattr(EM, "_provider_singleton", None)  # don't leak


@pytest.mark.skipif(not _no_litellm(), reason="litellm installed")
def test_litellm_gate_raises_without_package():
    from customkb_spark.embedding.embedder import LiteLLMEmbeddingProvider

    with pytest.raises(ImportError):
        LiteLLMEmbeddingProvider("text-embedding-3-small")


# ----------------------------------------------------------------- chat


def test_litellm_chat_completion_shape(monkeypatch):
    calls: list[dict] = []

    def completion(model, messages, **kwargs):
        calls.append({"model": model, "messages": messages, **kwargs})
        msg = types.SimpleNamespace(content="the answer")
        return types.SimpleNamespace(choices=[types.SimpleNamespace(message=msg)])

    monkeypatch.setitem(
        sys.modules, "litellm", types.SimpleNamespace(completion=completion)
    )
    from customkb_spark.plans.answer import LiteLLMChatLLM

    llm = LiteLLMChatLLM("gpt-4o-mini", temperature=0.2)
    out = llm.complete("sys prompt", "user prompt", max_tokens=99)
    assert out == "the answer"
    c = calls[-1]
    assert c["model"] == "gpt-4o-mini"
    assert c["messages"][0] == {"role": "system", "content": "sys prompt"}
    assert c["messages"][1] == {"role": "user", "content": "user prompt"}
    assert c["temperature"] == 0.2 and c["max_tokens"] == 99
    assert c["drop_params"] is True


def test_litellm_chat_rejects_empty_and_retries(monkeypatch):
    attempts = {"n": 0}

    def completion(model, messages, **kwargs):
        attempts["n"] += 1
        content = None if attempts["n"] < 2 else "ok"
        msg = types.SimpleNamespace(content=content)
        return types.SimpleNamespace(choices=[types.SimpleNamespace(message=msg)])

    monkeypatch.setitem(
        sys.modules, "litellm", types.SimpleNamespace(completion=completion)
    )
    import time as _time

    monkeypatch.setattr(_time, "sleep", lambda s: None)
    from customkb_spark.plans.answer import LiteLLMChatLLM

    llm = LiteLLMChatLLM("gpt-4o-mini")
    assert llm.complete("s", "u") == "ok"
    assert attempts["n"] == 2


def test_get_llm_stub_default_and_litellm_dispatch(monkeypatch):
    from customkb_spark.plans import answer as A

    assert isinstance(A.get_llm("stub-extractive"), A.ExtractiveStubLLM)
    monkeypatch.setitem(
        sys.modules, "litellm", types.SimpleNamespace(completion=lambda **k: None)
    )
    assert isinstance(A.get_llm("gpt-4o-mini"), A.LiteLLMChatLLM)


# ------------------------------------------------------------- tiktoken


def test_tiktoken_length_fn_gate(monkeypatch):
    import customkb_spark.ingest.chunker as C

    # without the package: 'tiktoken' falls back to the words×1.3
    # estimate (the reference's own fallback, database/chunking.py:54-60)
    monkeypatch.setattr(C, "_TIKTOKEN_ENCODER", None)
    if "tiktoken" in sys.modules:
        monkeypatch.delitem(sys.modules, "tiktoken")
    try:
        import tiktoken  # noqa: F401

        has = True
    except ImportError:
        has = False
    if not has:
        assert C.pick_length_fn("tiktoken") is C.token_len_estimate

    # with a (fake) encoder: counts tokens via cl100k_base
    class _Enc:
        def encode(self, text):
            return text.split()

    fake = types.SimpleNamespace(get_encoding=lambda name: _Enc())
    monkeypatch.setitem(sys.modules, "tiktoken", fake)
    monkeypatch.setattr(C, "_TIKTOKEN_ENCODER", None)
    fn = C.pick_length_fn("tiktoken")
    assert fn is C.tiktoken_len
    assert fn("a b c") == 3
    monkeypatch.setattr(C, "_TIKTOKEN_ENCODER", None)  # don't leak the fake


def test_tiktoken_chunk_boundaries_match_reference_recipe(monkeypatch):
    """With tiktoken present the chunker sizes by true token count —
    the reference recipe (length_function=token_count, chunk_size in
    tokens, database/chunking.py:140-205). A 1-token-per-word fake
    makes the expected boundary exactly computable. Driver-side via the
    split core: a sys.modules fake can't reach executor workers (each
    worker process re-imports tiktoken for real)."""
    import customkb_spark.ingest.chunker as C

    class _Enc:
        def encode(self, text):
            return text.split()

    monkeypatch.setitem(
        sys.modules, "tiktoken", types.SimpleNamespace(get_encoding=lambda n: _Enc())
    )
    monkeypatch.setattr(C, "_TIKTOKEN_ENCODER", None)
    fn = C.pick_length_fn("tiktoken")
    assert fn is C.tiktoken_len
    text = " ".join(f"w{i}" for i in range(10))
    pieces = C._recursive_split(text, C.separators_for("text"), 4, fn)
    # every chunk ≤ 4 tokens under the same length function, no loss
    assert all(fn(p) <= 4 for p in pieces)
    assert " ".join(pieces).split() == [f"w{i}" for i in range(10)]
    # boundaries differ from the chars length fn — proving the length
    # function actually drives the recursion
    char_pieces = C._recursive_split(text, C.separators_for("text"), 4, len)
    assert pieces != char_pieces
    monkeypatch.setattr(C, "_TIKTOKEN_ENCODER", None)
