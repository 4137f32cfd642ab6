"""Recorded-fixture transport tests (VERDICT r8 "What's missing" #1).

The LiteLLM embed/chat and CrossEncoder paths are dep-gated and the
sandbox has no network, so until now only the stubs' MATH was tested —
the request each provider path would actually serialize (model routing,
message envelope, batching caps, retry/backoff schedule) was pinned by
nothing. These tests inject recording fakes for the transport modules
and compare every captured request against stored fixtures
(tests/fixtures/transport_requests.json) — the reference's own
mock-transport strategy (reference tests/README.md:20-40), no network.

No Spark session needed: the request shaping all lives driver-side or
in module-level helpers split out of the executor closures
(embedder.capped_slices, rerank._crossencoder_score_batch).
"""

import json
import os
import sys
import types

import numpy as np
import pytest

FIXTURES = json.load(
    open(os.path.join(os.path.dirname(__file__), "fixtures", "transport_requests.json"))
)


# ------------------------------------------------------------ fakes


class _FakeEmbedResp:
    def __init__(self, n, dims):
        self.data = [{"embedding": [0.1] * dims} for _ in range(n)]


def _fake_litellm(calls, dims=64, fail_first=0, empty_first=0):
    """A recording stand-in for the ``litellm`` module: captures every
    request's kwargs verbatim; optionally fails the first N calls
    (transient-transport simulation for the retry-envelope tests)."""
    mod = types.ModuleType("litellm")
    state = {"n": 0}

    def embedding(**kwargs):
        state["n"] += 1
        if state["n"] <= fail_first:
            raise ConnectionError("transient")
        calls.append(("embedding", kwargs))
        return _FakeEmbedResp(len(kwargs["input"]), dims)

    def completion(**kwargs):
        state["n"] += 1
        calls.append(("completion", kwargs))
        content = "" if state["n"] <= empty_first else "the answer"
        msg = types.SimpleNamespace(content=content)
        return types.SimpleNamespace(
            choices=[types.SimpleNamespace(message=msg)]
        )

    mod.embedding = embedding
    mod.completion = completion
    return mod


@pytest.fixture()
def no_sleep(monkeypatch):
    """Capture backoff sleeps instead of waiting them out."""
    delays = []
    monkeypatch.setattr("time.sleep", lambda s: delays.append(s))
    return delays


# ------------------------------------------------------ M1: embeddings


def test_embed_request_gemini_routing_and_dimensions(monkeypatch):
    from customkb_spark.embedding.embedder import LiteLLMEmbeddingProvider

    calls = []
    monkeypatch.setitem(sys.modules, "litellm", _fake_litellm(calls))
    p = LiteLLMEmbeddingProvider("gemini-embedding-001", dimensions=64)
    out = p.get_embeddings(["alpha doc", "beta doc"])
    assert out.shape == (2, 64) and out.dtype == np.float32
    assert calls == [("embedding", FIXTURES["embed_gemini"])]


def test_embed_request_openai_passthrough_omits_dimensions(monkeypatch):
    from customkb_spark.embedding.embedder import LiteLLMEmbeddingProvider

    calls = []
    monkeypatch.setitem(sys.modules, "litellm", _fake_litellm(calls))
    p = LiteLLMEmbeddingProvider("text-embedding-3-small", dimensions=None)
    p.get_embeddings(["alpha doc"])
    # no dimensions key at all when unset — some providers reject nulls
    assert calls == [("embedding", FIXTURES["embed_openai_no_dims"])]


def test_embed_request_ollama_prefix(monkeypatch):
    from customkb_spark.embedding.embedder import LiteLLMEmbeddingProvider

    calls = []
    monkeypatch.setitem(sys.modules, "litellm", _fake_litellm(calls, dims=1024))
    p = LiteLLMEmbeddingProvider("bge-m3", dimensions=1024)
    p.get_embeddings(["alpha doc"])
    assert calls == [("embedding", FIXTURES["embed_ollama_bge"])]


def test_embed_batch_caps_per_family(monkeypatch):
    from customkb_spark.embedding.embedder import (
        EmbeddingProvider,
        LiteLLMEmbeddingProvider,
        capped_slices,
    )

    monkeypatch.setitem(sys.modules, "litellm", _fake_litellm([]))
    caps = FIXTURES["batch_caps"]
    assert LiteLLMEmbeddingProvider("gemini-embedding-001").batch_cap == caps["gemini"]
    assert LiteLLMEmbeddingProvider("text-embedding-3-small").batch_cap == caps["openai"]
    assert LiteLLMEmbeddingProvider("bge-m3").batch_cap == caps["bge"]
    assert EmbeddingProvider.batch_cap == caps["default"]
    # the executor loop's slicing: no provider call ever exceeds the cap
    texts = [f"t{i}" for i in range(250)]
    slices = list(capped_slices(texts, 100))
    assert [lo for lo, _ in slices] == [0, 100, 200]
    assert [len(s) for _, s in slices] == [100, 100, 50]
    assert [t for _, s in slices for t in s] == texts


def test_embed_retry_envelope_backoff_schedule(monkeypatch, no_sleep):
    """F14: transient transport errors retry with min(attempt², 30) +
    U(0,1) jitter; the request that finally succeeds is byte-identical
    to the first attempt's."""
    from customkb_spark.embedding.embedder import LiteLLMEmbeddingProvider

    calls = []
    monkeypatch.setitem(
        sys.modules, "litellm", _fake_litellm(calls, fail_first=2)
    )
    p = LiteLLMEmbeddingProvider("gemini-embedding-001", dimensions=64)
    out = p.get_embeddings_with_retry(["alpha doc", "beta doc"])
    assert out.shape == (2, 64)
    assert calls == [("embedding", FIXTURES["embed_gemini"])]  # 3rd try
    assert len(no_sleep) == 2  # two failures → two backoffs
    for attempt, d in enumerate(no_sleep):
        assert min(attempt**2, 30) <= d < min(attempt**2, 30) + 1


# ------------------------------------------------------------ M4: chat


def test_chat_request_envelope(monkeypatch):
    from customkb_spark.plans.answer import LiteLLMChatLLM

    calls = []
    monkeypatch.setitem(sys.modules, "litellm", _fake_litellm(calls))
    llm = LiteLLMChatLLM("gemini-2.0-flash", temperature=0.2)
    got = llm.complete(
        "You are a precise assistant.", "Question\n\nReferences", max_tokens=256
    )
    assert got == "the answer"
    assert calls == [("completion", FIXTURES["chat_default"])]


def test_chat_empty_response_retries_then_succeeds(monkeypatch, no_sleep):
    from customkb_spark.plans.answer import LiteLLMChatLLM

    calls = []
    monkeypatch.setitem(
        sys.modules, "litellm", _fake_litellm(calls, empty_first=1)
    )
    llm = LiteLLMChatLLM("gemini-2.0-flash", temperature=0.2)
    assert llm.complete("s", "u") == "the answer"
    assert len(calls) == 2  # empty content is a retryable failure
    assert len(no_sleep) == 1
    # both attempts shipped the identical request
    assert calls[0][1] == calls[1][1]


# ------------------------------------------- M3: cross-encoder rerank


def _fake_sentence_transformers(instances):
    mod = types.ModuleType("sentence_transformers")

    class CrossEncoder:
        def __init__(self, model_name, device=None):
            self.model_name = model_name
            self.device = device
            self.predict_calls = []
            instances.append(self)

        def predict(self, pairs, batch_size=None):
            self.predict_calls.append(
                {"pairs": [list(p) for p in pairs], "batch_size": batch_size}
            )
            return np.linspace(0.9, 0.1, num=len(pairs))

    mod.CrossEncoder = CrossEncoder
    return mod


def test_crossencoder_request_pairs_and_batch_size(monkeypatch):
    from customkb_spark.operators import rerank as R

    instances = []
    monkeypatch.setitem(
        sys.modules, "sentence_transformers", _fake_sentence_transformers(instances)
    )
    monkeypatch.setattr(R, "_MODELS", {})
    fx = FIXTURES["crossencoder"]
    queries = [p[0] for p in fx["pairs"]]
    texts = [p[1] for p in fx["pairs"]]
    scores = R._crossencoder_score_batch(
        queries, texts, fx["model"], fx["batch_size"]
    )
    assert len(scores) == len(fx["pairs"])
    (model,) = instances
    assert model.model_name == fx["model"] and model.device == fx["device"]
    assert model.predict_calls == [
        {"pairs": fx["pairs"], "batch_size": fx["batch_size"]}
    ]


def test_crossencoder_model_cached_per_name_and_device(monkeypatch):
    from customkb_spark.operators import rerank as R

    instances = []
    monkeypatch.setitem(
        sys.modules, "sentence_transformers", _fake_sentence_transformers(instances)
    )
    monkeypatch.setattr(R, "_MODELS", {})
    R._crossencoder_score_batch(["q"], ["t"], "m1", 8)
    R._crossencoder_score_batch(["q2"], ["t2"], "m1", 8)
    assert len(instances) == 1  # per-process singleton per (name, device)
    R._crossencoder_score_batch(["q"], ["t"], "m2", 8)
    assert len(instances) == 2
