"""Model-alias registry (customkb_spark/models.py) — resolution order,
provider derivation, file override; plus the bash-completion script
surface (reference models/model_manager.py + customkb.bash_completion).
"""

from __future__ import annotations

import json
import subprocess

import pytest

import customkb_spark.models as M


@pytest.fixture(autouse=True)
def _fresh_cache(monkeypatch):
    monkeypatch.setattr(M, "_models_cache", None)
    monkeypatch.setattr(M, "models_file", None)
    yield


def test_exact_alias_partial_preference_order():
    # exact id wins
    assert M.get_canonical_model("gpt-4o")["model"] == "gpt-4o"
    # alias
    assert M.get_canonical_model("sonnet")["model"] == "claude-sonnet-4-20250514"
    assert M.get_canonical_model("embed-small")["model"] == "text-embedding-3-small"
    # partial substring (id or alias) as last resort
    assert M.get_canonical_model("4o-mini")["model"] == "gpt-4o-mini"
    assert "embedding" in M.get_canonical_model("embedding-3-large")["model"]


def test_invalid_and_missing_inputs():
    with pytest.raises(ValueError):
        M.get_canonical_model("")
    with pytest.raises(ValueError):
        M.get_canonical_model("   ")
    with pytest.raises(ValueError):
        M.get_canonical_model(None)  # type: ignore[arg-type]
    with pytest.raises(KeyError):
        M.get_canonical_model("zz-no-such-model-zz")


def test_resolve_model_passthrough_for_unknown():
    # unknown strings go to LiteLLM verbatim (reference only rewrites
    # registry hits)
    assert M.resolve_model("openai/custom-finetune-123") == "openai/custom-finetune-123"
    assert M.resolve_model("haiku") == "claude-3-5-haiku-20241022"


def test_provider_derivation_chain():
    assert M.get_provider_name({"provider": "x"}) == "x"
    assert M.get_provider_name({"family": "ollama"}) == "ollama"
    assert M.get_provider_name({"parent": "local"}) == "local"
    assert M.get_provider_name({"parent": "Anthropic"}) == "anthropic"
    assert M.get_provider_name({"family": "claude"}) == "anthropic"
    assert M.get_provider_name({"parent": "Google"}) == "google"
    assert M.get_provider_name({"family": "grok"}) == "xai"
    assert M.get_provider_name({"parent": "OpenAI"}) == "openai"
    assert M.get_provider_name({}) == "openai"


def test_models_file_override_and_cache(tmp_path, monkeypatch):
    f = tmp_path / "Models.json"
    f.write_text(json.dumps({
        "my-model": {"model": "my-model", "alias": "mm", "parent": "local"}
    }))
    monkeypatch.setattr(M, "models_file", str(f))
    M.clear_model_cache()
    assert M.get_canonical_model("mm")["model"] == "my-model"
    with pytest.raises(KeyError):
        M.get_canonical_model("gpt-4o")  # override REPLACES built-ins
    # cache: file deletion is invisible until cleared
    f.unlink()
    assert M.get_canonical_model("mm")["model"] == "my-model"
    M.clear_model_cache()
    with pytest.raises(FileNotFoundError):
        M.get_canonical_model("mm")


def test_stub_names_resolve_through_registry():
    from customkb_spark.plans import answer as A

    assert isinstance(A.get_llm("stub-llm"), A.ExtractiveStubLLM)  # via alias
    import customkb_spark.embedding.embedder as EM

    p = EM.get_provider("stub-embed", 16)  # alias of stub-hash-embed
    assert p.name == "stub-hash-embed"


def test_bash_completion_script():
    # syntax-checks and exercises the completion function end-to-end
    script = "scripts/customkb_spark.bash_completion"
    subprocess.run(["bash", "-n", script], check=True)
    probe = f"""
    source {script}
    COMP_WORDS=(customkb_spark qu); COMP_CWORD=1
    _customkb_spark_completions
    echo "${{COMPREPLY[@]}}"
    COMP_WORDS=(customkb_spark query kb --format pl); COMP_CWORD=4
    _customkb_spark_completions
    echo "${{COMPREPLY[@]}}"
    """
    out = subprocess.run(
        ["bash", "-c", probe], capture_output=True, text=True, check=True
    ).stdout.splitlines()
    assert "query" in out[0].split()
    assert out[1].split() == ["plain"]


def test_litellm_route_provider_prefixes():
    from customkb_spark.models import litellm_route

    # registry-known families that litellm cannot auto-detect get the
    # explicit provider prefix; auto-detected and pre-routed names pass
    assert litellm_route("bge-m3") == "ollama/bge-m3"
    assert litellm_route("llama3.1") == "ollama/llama3.1"
    assert litellm_route("gemini-2.0-flash") == "gemini/gemini-2.0-flash"
    assert litellm_route("gpt-4o") == "gpt-4o"
    assert litellm_route("claude-sonnet-4-0") == "claude-sonnet-4-0"
    assert litellm_route("openai/gpt-4o") == "openai/gpt-4o"
    assert litellm_route("unknown-model") == "unknown-model"
    # unknown-to-registry gemini-ish names still route by heuristic
    assert litellm_route("gemini-exp-foo") == "gemini/gemini-exp-foo"
