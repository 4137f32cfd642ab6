"""Golden regression lock for the flagship hybrid pipeline
(VERDICT r3 #8).

``hybrid_context_flagship`` is the one driver entry that stays
rows-only (staged ingest→chunk→embed→hybrid→context pipeline; its
pieces are individually oracle-checked). Every stage is deterministic —
hash-stub embedder, fixed chunker, RRF with id tiebreaks — so the full
sf0.001 result is pinned here as a fixture (row identity + text md5)
and compared EXACTLY. Any unintended change to chunk boundaries,
embedding stubs, fusion ranking, or the context range join shows up as
a diff in this test even though no DuckDB oracle covers the composed
pipeline.

Regenerate (only after an INTENTIONAL semantic change):
    python - <<'PY'
    ... run __spark_entry__.entry, md5 the text column, dump sorted
    rows to tests/fixtures/hybrid_golden_sf0001.json (see git log)
    PY
"""

from __future__ import annotations

import hashlib
import json
import os

FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "hybrid_golden_sf0001.json"
)


def _canon(rows) -> list[dict]:
    return sorted(
        (
            {
                "sourcedoc": r.sourcedoc,
                "doc_id": r.doc_id,
                "hit_sid": r.hit_sid,
                "sid": r.sid,
                "text_md5": hashlib.md5(r.text.encode()).hexdigest(),
            }
            for r in rows
        ),
        key=lambda d: (
            d["sourcedoc"], d["doc_id"], d["hit_sid"], d["sid"], d["text_md5"]
        ),
    )


def test_flagship_matches_golden_fixture(spark):
    import __spark_entry__ as E

    with open(FIXTURE) as f:
        golden = json.load(f)
    got = _canon(E.entry(spark).collect())
    # regenerated 2026-08-16: context became DOC-scoped (sourcedoc,
    # doc_id) — the prior 424-row fixture included windows pulled from
    # OTHER documents sharing a hit's source path (sids restart per
    # doc), which was the cross-doc contamination bug, not a contract
    assert len(got) == len(golden) == 19
    # exact, row-by-row: a readable first-diff beats a giant assert
    for g, w in zip(got, golden):
        assert g == w, f"first diff: got={g} want={w}"
