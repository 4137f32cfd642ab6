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


def test_within_best_floor_downgrades_stall():
    """r9: a same-plan slowdown that still sits within threshold of the
    best-ever floor (same plan+corpus) is weather in the OLD run, not a
    regression in the new one."""
    old = _mk({"q": 1.0}, {"q": "abc"})
    new = _mk({"q": 3.0}, {"q": "abc"})
    new["vs_best"] = {"q": {"best": 2.9, "ratio": 1.03}}
    (row,) = diff(old, new, threshold=1.5)
    assert row[1] == "within-best"
    assert "best=2.9s" in row[2] and "floor holds" in row[2]


def test_far_above_best_floor_stays_stall():
    old = _mk({"q": 1.0}, {"q": "abc"})
    new = _mk({"q": 3.0}, {"q": "abc"})
    new["vs_best"] = {"q": {"best": 1.0, "ratio": 3.0}}
    (row,) = diff(old, new, threshold=1.5)
    assert row[1] == "stall" and "3.00x vs best" in row[2]


def test_update_best_tracks_floor_and_resets_on_plan_change(tmp_path, monkeypatch):
    import bench

    monkeypatch.setattr(bench, "_sf1_dir", lambda: None)
    monkeypatch.setattr(bench, "_sf10_dir", lambda: None)
    monkeypatch.setattr(bench, "_corpus_fp", lambda d: "cfp1")
    best = str(tmp_path / "best.json")

    out = {"queries": {"q": 2.0}, "plan_fp": {"q": "abc"}, "anchor": {"ratio": 1.0}}
    vb = bench._update_best(out, "/sf", best)
    assert vb["q"]["best"] == 2.0 and vb["q"]["ratio"] == 1.0

    # improvement lowers the floor
    out = {"queries": {"q": 1.5}, "plan_fp": {"q": "abc"}, "anchor": {"ratio": 1.2}}
    vb = bench._update_best(out, "/sf", best)
    assert vb["q"]["best"] == 1.5 and vb["q"]["best_anchor"] == 1.2

    # a slow run keeps the floor; ratio reports against it
    out = {"queries": {"q": 4.0}, "plan_fp": {"q": "abc"}}
    vb = bench._update_best(out, "/sf", best)
    assert vb["q"]["best"] == 1.5 and vb["q"]["ratio"] == 2.67

    # plan change RESETS the floor (old floor not comparable)
    out = {"queries": {"q": 4.0}, "plan_fp": {"q": "XYZ"}}
    vb = bench._update_best(out, "/sf", best)
    assert vb["q"]["best"] == 4.0 and vb["q"]["ratio"] == 1.0

    # corpus change resets too
    monkeypatch.setattr(bench, "_corpus_fp", lambda d: "cfp2")
    out = {"queries": {"q": 3.0}, "plan_fp": {"q": "XYZ"}}
    vb = bench._update_best(out, "/sf", best)
    assert vb["q"]["best"] == 3.0


def test_vs_prev_regression_demoted_by_best_floor():
    import bench

    out = {
        "sf": 0.1,
        "queries": {"q": 3.0},
        "queries_med": {"q": 3.0},
        "plan_fp": {"q": "abc"},
    }
    prev = {
        "sf": 0.1,
        "queries": {"q": 1.0},
        "queries_med": {"q": 1.0},
        "plan_fp": {"q": "abc"},
    }
    import json as _json

    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        _json.dump(prev, f)
        prev_path = f.name
    # without a floor: regression
    v = bench._vs_prev(out, prev_path)
    assert v["q"]["verdict"] == "regression"
    # with a floor this run sits on: demoted
    v = bench._vs_prev(out, prev_path, vs_best={"q": {"best": 2.9, "ratio": 1.03}})
    assert v["q"]["verdict"] == "same_vs_best" and v["q"]["vs_best"] == 1.03
