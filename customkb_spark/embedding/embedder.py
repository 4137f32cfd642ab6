"""Batch embedding — provider interface + deterministic local stub.

The reference batches texts to LiteLLM providers with caps/retries
(embedding/embed_manager.py:260-333, SURVEY.md §2.8 M1). The Spark
shape is ``mapInPandas``: each Arrow batch of (id, text) rows becomes
one provider call (or one local-model forward pass); providers are
instantiated once per executor (module-level singleton), and batches
respect the provider's cap.

The default provider is a DETERMINISTIC hash embedder (no network, no
model weights): sha256(text) seeds a NumPy RNG → standard normal →
L2-normalize. This mirrors the reference's mock-embedding test strategy
(SURVEY.md §5) and the seeded-vector benchmark recipe
(scripts/benchmark_vectordb.py:36-57): identical text → identical
vector, on any executor, any run.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# Reference per-provider batch caps (embed_manager.py:649-664): gemini
# hard-caps at 100, openai at 2048, bge-style local models at 64.
PROVIDER_BATCH_CAPS = {"gemini": 100, "openai": 2048, "bge": 64}


class EmbeddingProvider:
    """Provider interface — mirrors litellm_provider.get_embeddings
    (reference embedding/litellm_provider.py:60-119)."""

    name = "base"
    dimensions = 64
    batch_cap = 2048  # per-call text cap (reference: provider caps)
    max_retries = 5  # reference: ≤20 with exp backoff (embed_manager.py:314-326)

    def get_embeddings(self, texts: list[str]) -> np.ndarray:  # (n, dims) float32
        raise NotImplementedError

    def get_embeddings_with_retry(self, texts: list[str]) -> np.ndarray:
        """F14: exponential backoff + jitter around the provider call
        (min(tries², 30) + U(0,1), embed_manager.py:320-326). Composes
        with Spark's task-level retry: transient provider errors are
        absorbed here; a task retry only happens on persistent failure."""
        import random
        import time

        last: Exception | None = None
        for attempt in range(self.max_retries):
            try:
                return self.get_embeddings(texts)
            except Exception as e:  # provider/transport errors
                last = e
                time.sleep(min(attempt**2, 30) + random.random())
        raise last  # type: ignore[misc]


class HashEmbeddingProvider(EmbeddingProvider):
    name = "stub-hash-embed"

    def __init__(self, dimensions: int = 64):
        self.dimensions = dimensions

    def get_embeddings(self, texts: list[str]) -> np.ndarray:
        out = np.empty((len(texts), self.dimensions), dtype=np.float32)
        for i, t in enumerate(texts):
            digest = hashlib.sha256((t or "").encode("utf-8")).digest()
            rng = np.random.default_rng(int.from_bytes(digest[:8], "big"))
            v = rng.standard_normal(self.dimensions)
            n = np.linalg.norm(v)
            out[i] = (v / n if n > 0 else v).astype(np.float32)
        return out


class LiteLLMEmbeddingProvider(EmbeddingProvider):
    """Real embedding provider via LiteLLM — reference
    embedding/litellm_provider.py:60-119 semantics, import-gated exactly
    like the CrossEncoder path (operators/rerank.py): constructing it
    without the ``litellm`` package raises ImportError, and CI keeps
    using the deterministic stub.

    Parity points mirrored from the reference:
    - model routing: explicit ``provider/model`` strings pass through;
      bare gemini/google names get the ``gemini/`` prefix; OpenAI
      ``text-embedding-*`` names are auto-detected by LiteLLM;
    - per-family batch caps (PROVIDER_BATCH_CAPS — gemini 100, openai
      2048, bge 64) bound each call from ``embed_texts``'s loop;
    - retries/backoff come from the base class (F14) — the reference
      wraps the same call in exp-backoff-with-jitter.

    The sync ``litellm.embedding`` entry point is used: this runs inside
    executor ``mapInPandas`` workers, which have no event loop, and
    concurrency comes from Spark's task parallelism rather than asyncio.
    """

    def __init__(self, model: str, dimensions: int | None = None):
        import litellm  # dep-gated

        self._litellm = litellm
        self.name = model
        self.dimensions = dimensions
        self.model = self._route(model)
        low = model.lower()
        for family, cap in PROVIDER_BATCH_CAPS.items():
            if family in low:
                self.batch_cap = cap
                break

    @staticmethod
    def _route(model: str) -> str:
        # registry-driven: gemini/ for Gemini-API, ollama/ for
        # ollama-served (bge-m3 etc.); OpenAI names auto-detected
        from customkb_spark.models import litellm_route

        return litellm_route(model)

    def get_embeddings(self, texts: list[str]) -> np.ndarray:
        kwargs = {"dimensions": self.dimensions} if self.dimensions else {}
        resp = self._litellm.embedding(model=self.model, input=texts, **kwargs)
        return np.asarray([d["embedding"] for d in resp.data], dtype=np.float32)


def capped_slices(texts: list, cap: int):
    """(offset, slice) pairs at the provider's per-family call cap —
    the transport batching contract (reference embed_manager.py:649-664:
    no single provider call ever exceeds the family cap). Extracted
    from the executor loop so the recorded-fixture transport tests pin
    it without a worker."""
    for lo in range(0, len(texts), max(int(cap), 1)):
        yield lo, texts[lo : lo + max(int(cap), 1)]


_PROVIDERS = {"stub-hash-embed": HashEmbeddingProvider}
_provider_singleton: EmbeddingProvider | None = None  # per-executor


def get_provider(name: str, dimensions: int) -> EmbeddingProvider:
    """Per-executor provider singleton. Names resolve through the
    model-alias registry first (models.resolve_model, reference
    customkb.py:566-571); registered stub names construct locally; any
    other canonical name is treated as a LiteLLM model string
    (reference behavior: the model name IS the provider selector)."""
    from customkb_spark.models import resolve_model

    name = resolve_model(name)
    global _provider_singleton
    if (
        _provider_singleton is None
        or _provider_singleton.name != name
        or _provider_singleton.dimensions != dimensions
    ):
        if name in _PROVIDERS:
            _provider_singleton = _PROVIDERS[name](dimensions)
        else:
            _provider_singleton = LiteLLMEmbeddingProvider(name, dimensions)
    return _provider_singleton


def embed_texts(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "embedtext",
    model: str = "stub-hash-embed",
    dimensions: int = 64,
) -> DataFrame:
    """(id, vector) for each input row, via Arrow-batched mapInPandas.

    Duplicate-text dedup (reference embed_manager.py:669-677, J4/A9):
    embed one representative per distinct text, then join vectors back
    to every id sharing that text — the provider is called once per
    unique text regardless of corpus duplication.
    """
    schema = T.StructType(
        [
            T.StructField("text_key", T.StringType()),
            T.StructField("vector", T.ArrayType(T.FloatType())),
        ]
    )

    # NULL-safe key: an equi-join never matches NULL = NULL, so a null
    # text would silently drop its row — embed it as empty instead
    safe_text = F.coalesce(F.col(text_col), F.lit(""))
    distinct_texts = df.select(safe_text.alias("text_key")).distinct()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        provider = get_provider(model, dimensions)
        for pdf in batches:
            texts = pdf["text_key"].fillna("").tolist()
            for lo, sub in capped_slices(texts, provider.batch_cap):
                vecs = provider.get_embeddings_with_retry(sub)
                yield pd.DataFrame(
                    {
                        "text_key": pdf["text_key"].iloc[lo : lo + len(sub)],
                        "vector": [v.tolist() for v in vecs],
                    }
                )

    vectors = distinct_texts.mapInPandas(run, schema=schema)
    return (
        df.select(F.col(id_col).alias("id"), safe_text.alias("text_key"))
        .join(vectors, "text_key")
        .select("id", "vector")
    )
