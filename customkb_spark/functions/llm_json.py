"""F19 — robust JSON extraction from LLM responses.

Real chat models wrap JSON in markdown fences, prepend prose, or emit
trailing commas; a naive ``json.loads`` on the raw completion fails on
all three. Semantics mirror the reference's extraction/repair ladder
(categorize/categorize_manager.py:38-63 ``_extract_json`` and
:464-483's cleanup-then-fallback parse):

1. bare ``{``/``[`` → use as-is;
2. else the body of the first triple-backtick (or ```json``-tagged) fence;
3. else the first-``{`` … last-``}`` span;
4. parse; on failure strip trailing commas before ``}``/``]`` and
   re-parse;
5. still failing (or input over ``max_bytes``) → the caller's fallback.

Driver-side only (runs inside provider callbacks / Arrow batches — a
few KB per call, never a Spark plan node).
"""

from __future__ import annotations

import json
import re
from typing import Any

_FENCE_RE = re.compile(r"```(?:json)?\s*\n?(.*?)\n?\s*```", re.DOTALL)
_TRAILING_COMMA_RE = re.compile(r",(\s*[}\]])")

# Guard against pathological/adversarial payloads: parsing is O(n) but
# the repair regex + a driver-side json.loads on a multi-MB response is
# never what a categorize/citation prompt legitimately produces.
DEFAULT_MAX_BYTES = 1_000_000


def extract_json(text: str) -> str:
    """Return the best-guess JSON substring of an LLM response
    (not yet parsed). Falls back to the stripped input unchanged when
    no JSON structure is recognizable."""
    stripped = (text or "").strip()
    if stripped.startswith("{") or stripped.startswith("["):
        return stripped
    m = _FENCE_RE.search(stripped)
    if m:
        return m.group(1).strip()
    start = stripped.find("{")
    end = stripped.rfind("}")
    if start != -1 and end > start:
        return stripped[start : end + 1]
    return stripped


def repair_json(text: str) -> str:
    """Remove trailing commas before closing brackets/braces — the one
    malformation common enough that the reference repairs it rather
    than discarding the response."""
    return _TRAILING_COMMA_RE.sub(r"\1", text)


def parse_llm_json(
    text: str,
    fallback: Any = None,
    max_bytes: int = DEFAULT_MAX_BYTES,
) -> Any:
    """Extract-then-parse with repair; never raises on malformed input.

    Returns the parsed object, or ``fallback`` when the payload is
    oversized or unparseable even after repair."""
    if text is None or len(text) > max_bytes:
        return fallback
    candidate = extract_json(text)
    # RecursionError: json.loads recurses per nesting level, so
    # '['*200k (well under max_bytes) would otherwise blow the stack —
    # a hostile/buggy provider response must not kill the Arrow batch
    try:
        return json.loads(candidate)
    except (json.JSONDecodeError, RecursionError):
        pass
    try:
        return json.loads(repair_json(candidate))
    except (json.JSONDecodeError, RecursionError):
        return fallback


def parse_category_response(text: str, max_bytes: int = DEFAULT_MAX_BYTES) -> list[tuple[str, float]]:
    """Validated (name, confidence) pairs from a categorization
    response — the reference's per-entry validation (only dict entries
    carrying both keys survive; confidence coerced to float, entries
    that fail coercion are skipped, categorize_manager.py:486-492).
    Malformed/oversized payloads yield [] (the reference's fallback
    ``{'categories': []}``)."""
    result = parse_llm_json(text, fallback={}, max_bytes=max_bytes)
    if not isinstance(result, dict):
        return []
    out: list[tuple[str, float]] = []
    for cat in result.get("categories", []):
        if isinstance(cat, dict) and "name" in cat and "confidence" in cat:
            try:
                out.append((str(cat["name"]), float(cat["confidence"])))
            except (ValueError, TypeError):
                continue
    return out
