"""Model-alias registry — the reference's Models.json +
models/model_manager.py re-expressed.

The reference resolves any user-supplied model string through a JSON
registry (models/model_manager.py:22-83: exact id → alias → partial
match, module-cached) and derives the API provider from the entry's
``provider``/``parent``/``family`` fields (query/llm.py:60-90). Its
Models.json ships outside the repo (a symlink), so the registry here is
a BUILT-IN table of public model identifiers with the same field shape,
overridable via ``models_file`` (a JSON path, patchable in tests exactly
like the reference's module-level ``models_file``).

Resolution is what the rest of the engine consumes: the canonical
``model`` string feeds LiteLLM routing (embedding/embedder.py,
plans/answer.py), ``provider`` feeds batch caps and retry families.
"""

from __future__ import annotations

import json
import os
from typing import Any

# Overridable JSON registry path (reference model_manager.py:14). When
# the file exists its entries REPLACE the built-ins.
models_file: str | None = os.environ.get("CUSTOMKB_SPARK_MODELS_JSON")

_models_cache: dict[str, dict[str, Any]] | None = None

# Field shape mirrors the reference's Models.json consumers: 'model'
# (canonical API string), 'alias', 'parent' (vendor), 'family',
# 'context_window'/'max_output_tokens' for chat, 'dimensions' for
# embedding models. Public model identifiers only.
BUILTIN_MODELS: dict[str, dict[str, Any]] = {
    # ---- embeddings
    "text-embedding-3-small": {
        "model": "text-embedding-3-small", "alias": "embed-small",
        "parent": "OpenAI", "family": "embedding", "dimensions": 1536,
    },
    "text-embedding-3-large": {
        "model": "text-embedding-3-large", "alias": "embed-large",
        "parent": "OpenAI", "family": "embedding", "dimensions": 3072,
    },
    "text-embedding-ada-002": {
        "model": "text-embedding-ada-002", "alias": "ada",
        "parent": "OpenAI", "family": "embedding", "dimensions": 1536,
    },
    "gemini-embedding-001": {
        "model": "gemini-embedding-001", "alias": "gemini-embed",
        "parent": "Google", "family": "gemini", "dimensions": 3072,
    },
    "bge-m3": {
        "model": "bge-m3", "alias": "bge",
        "parent": "local", "family": "ollama", "dimensions": 1024,
    },
    # ---- chat
    "gpt-4o": {
        "model": "gpt-4o", "alias": "4o", "parent": "OpenAI",
        "family": "gpt4", "context_window": 128000, "max_output_tokens": 16384,
    },
    "gpt-4o-mini": {
        "model": "gpt-4o-mini", "alias": "4o-mini", "parent": "OpenAI",
        "family": "gpt4", "context_window": 128000, "max_output_tokens": 16384,
    },
    "claude-sonnet-4-20250514": {
        "model": "claude-sonnet-4-20250514", "alias": "sonnet",
        "parent": "Anthropic", "family": "claude",
        "context_window": 200000, "max_output_tokens": 64000,
    },
    "claude-3-5-haiku-20241022": {
        "model": "claude-3-5-haiku-20241022", "alias": "haiku",
        "parent": "Anthropic", "family": "claude",
        "context_window": 200000, "max_output_tokens": 8192,
    },
    "gemini-2.0-flash": {
        "model": "gemini-2.0-flash", "alias": "flash",
        "parent": "Google", "family": "gemini",
        "context_window": 1048576, "max_output_tokens": 8192,
    },
    "llama3.1": {
        "model": "llama3.1", "alias": "llama",
        "parent": "local", "family": "ollama", "context_window": 131072,
    },
    # ---- repo-native deterministic stubs (CI path)
    "stub-hash-embed": {
        "model": "stub-hash-embed", "alias": "stub-embed",
        "parent": "local", "family": "stub", "dimensions": 64,
    },
    "stub-extractive": {
        "model": "stub-extractive", "alias": "stub-llm",
        "parent": "local", "family": "stub",
    },
}


def _load_models() -> dict[str, dict[str, Any]]:
    global _models_cache
    if _models_cache is not None:
        return _models_cache
    if models_file:
        with open(models_file) as f:  # missing override file should be loud
            _models_cache = json.load(f)
    else:
        _models_cache = BUILTIN_MODELS
    return _models_cache


def clear_model_cache() -> None:
    """Drop the parsed-registry cache (after changing ``models_file``)."""
    global _models_cache
    _models_cache = None


def get_canonical_model(model_name: str) -> dict[str, Any]:
    """Resolve a name/alias to its canonical entry — the reference's
    exact preference order (model_manager.py:22-83): direct id → alias
    → partial substring match (id or alias).

    Raises ValueError for empty input, KeyError when nothing matches.
    """
    if not model_name or not isinstance(model_name, str):
        raise ValueError("model_name must be a non-empty string")
    model_name = model_name.strip()
    if not model_name:
        raise ValueError("model_name must be a non-empty string")

    models = _load_models()
    if model_name in models:
        return models[model_name]
    for info in models.values():
        if info.get("alias") == model_name:
            return info
    for model_id, info in models.items():
        alias = info.get("alias")
        if model_name in model_id or (alias and model_name in alias):
            return info
    raise KeyError(f"Model {model_name} not found in registry")


def resolve_model(model_name: str) -> str:
    """Alias → canonical API string; unknown names pass through
    verbatim (they go straight to LiteLLM routing, which accepts any
    provider/model string — reference customkb.py:566-571 only rewrites
    names the registry knows)."""
    try:
        return get_canonical_model(model_name)["model"]
    except (KeyError, ValueError):
        return model_name


def litellm_route(model: str) -> str:
    """Canonical model name → LiteLLM routing string. LiteLLM
    auto-detects OpenAI/Anthropic names but needs an explicit
    ``provider/`` prefix for Gemini-API (vs Vertex) and Ollama-served
    models — passing a bare ``bge-m3`` or ``llama3.1`` raises
    "LLM Provider NOT provided". The prefix comes from the registry's
    provider detection (``get_provider_name``); names already carrying
    a ``/`` or unknown to the registry pass through verbatim."""
    if "/" in model:
        return model
    try:
        info = get_canonical_model(model)
    except (KeyError, ValueError):
        low = model.lower()
        if "gemini" in low or "google" in low:
            return f"gemini/{model}"
        return model
    # prefix the CANONICAL name: an alias like "bge" routes to
    # ollama/bge-m3, not to the nonexistent ollama/bge
    canonical = info.get("model", model)
    provider = get_provider_name(info)
    if provider == "google":
        return f"gemini/{canonical}"
    if provider in ("ollama", "local"):
        return f"ollama/{canonical}"
    return canonical


def get_provider_name(model_info: dict[str, Any]) -> str:
    """Reference _get_provider_from_model_info (query/llm.py:60-90):
    explicit ``provider`` field wins, then family/parent detection,
    default openai."""
    if "provider" in model_info:
        return model_info["provider"]
    parent = str(model_info.get("parent", "")).lower()
    family = str(model_info.get("family", "")).lower()
    if "ollama" in family:
        return "ollama"
    if "local" in parent:
        return "local"
    if "anthropic" in parent or "claude" in family:
        return "anthropic"
    if "google" in parent or "gemini" in family:
        return "google"
    if "xai" in parent or "grok" in family:
        return "xai"
    return "openai"
