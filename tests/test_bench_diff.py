"""tools/bench_diff.py verdict logic: fingerprint-identical slowdowns
read as stalls, fingerprint changes as plan changes."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from bench_diff import diff  # noqa: E402


def _mk(times, fps):
    return {"queries": times, "plan_fp": fps}


def test_same_plan_slowdown_is_stall():
    old = _mk({"q": 1.0}, {"q": "abc"})
    new = _mk({"q": 3.0}, {"q": "abc"})
    rows = diff(old, new, threshold=1.5)
    assert rows == [("headline:q", "stall", "1.0s -> 3.0s (3.00x) [same plan]")]


def test_fingerprint_change_is_plan_change_even_when_fast():
    old = _mk({"q": 1.0}, {"q": "abc"})
    new = _mk({"q": 1.01}, {"q": "xyz"})
    (row,) = diff(old, new, threshold=1.5)
    assert row[1] == "plan-change"


def test_added_removed_faster_steady():
    old = _mk({"a": 1.0, "b": 2.0, "c": 4.0}, {})
    new = _mk({"a": 1.05, "c": 1.0, "d": 0.5}, {})
    verdicts = {name.split(":")[1]: v for name, v, _ in diff(old, new, threshold=1.5)}
    assert verdicts == {"a": "steady", "b": "removed", "c": "faster", "d": "added"}


def test_no_fingerprint_slowdown_is_slower_not_stall():
    old = _mk({"q": 1.0}, {})
    new = _mk({"q": 3.0}, {})
    (row,) = diff(old, new, threshold=1.5)
    assert row[1] == "slower"


def test_zero_vs_zero_is_steady():
    old = _mk({"q": 0.0}, {"q": "abc"})
    new = _mk({"q": 0.0}, {"q": "abc"})
    (row,) = diff(old, new, threshold=1.5)
    assert row[1] == "steady"


def test_anchor_scaled_threshold_absorbs_regime_slowdown():
    """r8: a same-plan row 2.5x slower on a box whose anchors measured
    2.5x slower is steady, not a stall; without anchors it flags."""
    old = _mk({"q": 1.0}, {"q": "abc"})
    new = _mk({"q": 2.5}, {"q": "abc"})
    (row,) = diff(old, new, threshold=1.5)
    assert row[1] == "stall"  # no anchors: flagged
    old["anchor"] = {"ratio": 1.0}
    new["anchor"] = {"ratio": 2.5}
    rows = diff(old, new, threshold=1.5)
    verdicts = {name: v for name, v, _ in rows}
    assert verdicts["headline:q"] == "steady"
    assert verdicts["headline:(anchor)"] == "anchor"  # the scaling is visible
    # leniency-only: a FASTER box must not tighten the gate
    old["anchor"], new["anchor"] = {"ratio": 2.0}, {"ratio": 1.0}
    new["queries"]["q"] = 1.4
    rows = diff(old, new, threshold=1.5)
    assert {n: v for n, v, _ in rows}["headline:q"] == "steady"
