"""Answer generation — reference M4 (query/llm.py:92-218) behind a
provider interface.

The reference calls LiteLLM chat completion with a templated
{system, user(reference_string, query)} prompt
(query/prompt_templates.py:8-95). LLM calls are non-deterministic and
network-bound, so — like embeddings — they live behind a provider
interface with a DETERMINISTIC EXTRACTIVE STUB as the default (the
reference mocks its LLM the same way in tests, SURVEY.md §5).

This is a driver-side, per-query step (one call). For batch query
workloads, `answer_batch` runs the provider inside mapInPandas — one
Arrow batch of (query, reference_string) rows per call group, the M5
categorize shape.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Mirrors the reference's default template shape
# (query/prompt_templates.py:8-35).
PROMPT_TEMPLATES: dict[str, dict[str, str]] = {
    "default": {
        "system": (
            "You are a helpful assistant. Answer strictly from the "
            "provided reference material. Cite sources."
        ),
        "user": "Reference material:\n{reference_string}\n\nQuestion: {query_text}",
    },
    "instructive": {
        "system": (
            "Answer the question using ONLY the references. If the "
            "references are insufficient, say so."
        ),
        "user": "{reference_string}\n\nQ: {query_text}\nA:",
    },
    # The remaining five named styles the reference ships
    # (query/prompt_templates.py:28-95) — same intents, own wording.
    "scholarly": {
        "system": (
            "You are a research assistant. Be rigorous, cite every "
            "claim to its source passage, and note gaps in the sources."
        ),
        "user": (
            "Sources:\n{reference_string}\n\nResearch question: "
            "{query_text}\n\nAnswer with citations:"
        ),
    },
    "concise": {
        "system": (
            "Answer briefly and directly from the context. No preamble, "
            "no elaboration."
        ),
        "user": "Context:\n{reference_string}\n\n{query_text}",
    },
    "analytical": {
        "system": (
            "You analyze systematically: identify the key factors in "
            "the evidence, weigh them, then conclude."
        ),
        "user": (
            "Evidence:\n{reference_string}\n\nAnalyze: {query_text}\n\n"
            "Structure the answer as factors, analysis, conclusion."
        ),
    },
    "conversational": {
        "system": (
            "Explain in a friendly, plain-spoken tone while staying "
            "strictly accurate to the provided material."
        ),
        "user": (
            "Here is what the knowledgebase says:\n{reference_string}\n\n"
            "{query_text}"
        ),
    },
    "technical": {
        "system": (
            "You are a technical expert. Use precise terminology, give "
            "exact values and steps, and stay within the documentation."
        ),
        "user": (
            "Documentation:\n{reference_string}\n\nTechnical question: "
            "{query_text}"
        ),
    },
}


def build_prompt(
    query_text: str, reference_string: str, template: str = "default"
) -> tuple[str, str]:
    t = PROMPT_TEMPLATES.get(template, PROMPT_TEMPLATES["default"])
    return t["system"], t["user"].format(
        reference_string=reference_string, query_text=query_text
    )


class LLMProvider:
    """Chat-completion interface (reference query/llm.py:157-218)."""

    name = "base"

    def complete(self, system: str, user: str, max_tokens: int = 512) -> str:
        raise NotImplementedError


class ExtractiveStubLLM(LLMProvider):
    """Deterministic 'answer': the most query-term-dense reference
    lines, verbatim. No model, no network — test/CI default."""

    name = "stub-extractive"

    def complete(self, system: str, user: str, max_tokens: int = 512) -> str:
        # user = "...{reference_string}...Question: {query}" — recover both
        lines = [ln.strip() for ln in user.splitlines() if ln.strip()]
        q_terms = set(lines[-1].lower().split()) if lines else set()
        scored = sorted(
            (
                (sum(1 for w in ln.lower().split() if w in q_terms), i, ln)
                for i, ln in enumerate(lines[:-1])
            ),
            key=lambda x: (-x[0], x[1]),
        )
        best = [ln for score, _, ln in scored[:3] if score > 0]
        return " ".join(best) if best else "No relevant reference found."


class LiteLLMChatLLM(LLMProvider):
    """Real chat provider via LiteLLM — reference query/llm.py:92-218
    semantics, import-gated (ImportError without the package; the stub
    stays the CI path). Sync ``litellm.completion`` with
    ``drop_params=True`` (the reference's call shape), empty responses
    rejected, and F14 exp-backoff-with-jitter retries around transient
    failures (the reference wraps calls the same way)."""

    def __init__(
        self,
        model: str,
        temperature: float = 0.7,
        max_retries: int = 5,
    ):
        import litellm  # dep-gated

        from customkb_spark.models import litellm_route

        self._litellm = litellm
        self.name = model
        # same registry-driven provider routing as the embedding path:
        # bare gemini-*/llama*/bge* names need a provider/ prefix or
        # litellm raises (and the retry loop would burn ~60s before
        # surfacing the permanent error)
        self.model = litellm_route(model)
        self.temperature = temperature
        self.max_retries = max_retries

    def complete(self, system: str, user: str, max_tokens: int = 512) -> str:
        import random
        import time

        last: Exception | None = None
        for attempt in range(self.max_retries):
            try:
                resp = self._litellm.completion(
                    model=self.model,
                    messages=[
                        {"role": "system", "content": system},
                        {"role": "user", "content": user},
                    ],
                    temperature=self.temperature,
                    max_tokens=max_tokens,
                    drop_params=True,
                )
                content = resp.choices[0].message.content
                if not content:
                    raise RuntimeError(f"empty response from {self.model}")
                return content
            except Exception as e:
                last = e
                time.sleep(min(attempt**2, 30) + random.random())
        raise last  # type: ignore[misc]


_LLM_PROVIDERS: dict[str, type[LLMProvider]] = {"stub-extractive": ExtractiveStubLLM}


def get_llm(name: str = "stub-extractive", temperature: float | None = None) -> LLMProvider:
    """Registered stub names construct locally; any other name resolves
    through the model-alias registry (models.resolve_model — the
    reference rewrites args.model via get_canonical_model,
    customkb.py:566-571) and is then a LiteLLM model string.
    ``temperature`` reaches the LiteLLM chat path (stubs are
    deterministic and ignore it)."""
    from customkb_spark.models import resolve_model

    name = resolve_model(name)
    if name in _LLM_PROVIDERS:
        return _LLM_PROVIDERS[name]()
    if temperature is None:
        return LiteLLMChatLLM(name)
    return LiteLLMChatLLM(name, temperature=temperature)


def generate_answer(
    query_text: str,
    reference_string: str,
    template: str = "default",
    provider: LLMProvider | None = None,
    role: str | None = None,
    max_tokens: int = 512,
) -> str:
    """Prompt-template answer; ``role`` overrides the template's system
    prompt verbatim (reference ``query -R/--role``)."""
    provider = provider or ExtractiveStubLLM()
    system, user = build_prompt(query_text, reference_string, template)
    if role:
        system = role
    return provider.complete(system, user, max_tokens=max_tokens)


def answer_batch(
    queries: DataFrame,
    query_col: str = "query",
    ref_col: str = "reference_string",
    template: str = "default",
    model: str = "stub-extractive",
) -> DataFrame:
    """Batch answers via mapInPandas — provider instantiated once per
    partition, one row per query."""
    out_schema = f"{queries.schema.simpleString()[7:-1]}, answer string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        provider = get_llm(model)
        for pdf in batches:
            pdf = pdf.copy()
            pdf["answer"] = [
                generate_answer(q, r, template, provider)
                for q, r in zip(pdf[query_col], pdf[ref_col])
            ]
            yield pdf

    return queries.mapInPandas(run, out_schema)
