"""Per-cache hit/miss counters — the engine's counterpart of the
reference's cache-performance section (utils/performance_analyzer.py:
67-136: per-cache hits/misses/hit-rate in the performance report).

Every cache in the engine (embedding cache, query-embedding TTL cache,
rerank score cache) is PROBED from driver-side plan code — the probe
is a join or point lookup the driver orchestrates — so a process-local
registry captures the same signal the reference's in-process analyzer
does, with no executor-side state. Counters are advisory diagnostics
(``kb.verify()`` / ``optimize --analyze`` surface them); they never
gate a plan, and they reset with the driver process.
"""

from __future__ import annotations

import threading

_lock = threading.Lock()
_counters: dict[str, dict[str, int]] = {}

#: canonical cache names used by the engine's record() call sites
EMBEDDING_CACHE = "embedding"
QUERY_TTL_CACHE = "query_ttl"
RERANK_CACHE = "rerank"


def record(cache: str, hits: int = 0, misses: int = 0) -> None:
    """Accumulate probe outcomes for one cache."""
    with _lock:
        c = _counters.setdefault(cache, {"hits": 0, "misses": 0})
        c["hits"] += int(hits)
        c["misses"] += int(misses)


def snapshot() -> dict[str, dict[str, float]]:
    """{cache: {hits, misses, hit_rate}} — hit_rate 0.0 when unprobed
    (the reference reports 0% for an idle cache, not NaN)."""
    with _lock:
        out: dict[str, dict[str, float]] = {}
        for name, c in _counters.items():
            total = c["hits"] + c["misses"]
            out[name] = {
                "hits": c["hits"],
                "misses": c["misses"],
                "hit_rate": round(c["hits"] / total, 4) if total else 0.0,
            }
        return out


def reset() -> None:
    with _lock:
        _counters.clear()
