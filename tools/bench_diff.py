"""Decide stall-vs-regression between two BENCH_full artifacts.

The per-query plan fingerprint (bench._plan_fingerprint — optimized
plan with run-varying ids normalized out) makes the call mechanical:

  - fingerprint UNCHANGED + time up      → environment stall (or data
    growth); the plan Spark would run is byte-identical
  - fingerprint CHANGED                  → a real plan change; the time
    delta is attributable to code
  - query added/removed                  → suite change

Usage:
    python tools/bench_diff.py BENCH_full_r05.json BENCH_full_r06.json
    python tools/bench_diff.py old.json new.json --threshold 1.5
"""

from __future__ import annotations

import argparse
import json
import sys

SECTIONS = [
    # (times-key, fingerprint-key, label, anchor-key)
    ("queries", "plan_fp", "headline", "anchor"),
    ("extra_queries", "plan_fp", "extras", "anchor"),
    ("sf1_queries", "sf1_plan_fp", "sf1", "sf1_anchor"),
    ("sf10_queries", "sf10_plan_fp", "sf10", "sf10_anchor"),
    ("ann", None, "ann", None),
]


def _anchor_scale(old: dict, new: dict, akey: str | None) -> float:
    """Threshold multiplier from the per-leg anchor blocks (VERDICT r7
    #1): when the new run's frozen-plan anchors measured the box R×
    slower than the old run's, a same-plan row R× slower is the BOX,
    not the code — stretch the slowdown threshold by R. Leniency-only
    (never < 1): a faster box must not shrink the threshold and start
    flagging noise. The ``ann``/``kb100k`` dicts carry their anchor
    inline under the reserved key ``anchor`` (skipped as a row)."""
    if not akey:
        akey = "anchor"
    o = (old.get(akey) or {}).get("ratio")
    n = (new.get(akey) or {}).get("ratio")
    if not o or not n:
        return 1.0
    return max(1.0, n / o)


def diff(old: dict, new: dict, threshold: float) -> list[tuple[str, str, str]]:
    """[(query, verdict, detail)] — verdicts: plan-change, stall,
    faster, steady, added, removed."""
    rows: list[tuple[str, str, str]] = []
    for tkey, fkey, label, akey in SECTIONS:
        o_t, n_t = old.get(tkey, {}), new.get(tkey, {})
        o_fp = old.get(fkey, {}) if fkey else {}
        n_fp = new.get(fkey, {}) if fkey else {}
        if tkey == "ann":  # anchors ride inline in the leg dict
            o_t = {k: v for k, v in o_t.items() if isinstance(v, (int, float))}
            n_t = {k: v for k, v in n_t.items() if isinstance(v, (int, float))}
        scale = _anchor_scale(
            old if tkey != "ann" else old.get("ann", {}),
            new if tkey != "ann" else new.get("ann", {}),
            akey,
        )
        sec_threshold = threshold * scale
        if scale != 1.0:
            rows.append(
                (f"{label}:(anchor)", "anchor",
                 f"threshold scaled x{scale:.2f} -> {sec_threshold:.2f}")
            )
        for q in sorted(set(o_t) | set(n_t)):
            name = f"{label}:{q}"
            if q not in n_t:
                rows.append((name, "removed", f"was {o_t[q]}s"))
                continue
            if q not in o_t:
                rows.append((name, "added", f"{n_t[q]}s"))
                continue
            # 0.0-vs-0.0 (sub-millisecond queries round to 0.0) is
            # steady, not an infinite-ratio stall
            ratio = (
                n_t[q] / o_t[q]
                if o_t[q]
                else (1.0 if not n_t[q] else float("inf"))
            )
            fp_known = q in o_fp and q in n_fp
            fp_same = fp_known and o_fp[q] == n_fp[q]
            detail = f"{o_t[q]}s -> {n_t[q]}s ({ratio:.2f}x)"
            # best-ever floor (VERDICT r8 #5): the artifact's vs_best
            # rows (bench._update_best — same plan AND same corpus
            # fingerprint) mark how far this run sits above the best
            # time ever recorded; a same-plan slowdown that is still
            # within threshold of that FLOOR means the old run was
            # unusually fast weather, not that the new one regressed
            fb = _vs_best_row(new, label, q)
            if fb:
                detail += f" best={fb['best']}s ({fb['ratio']:.2f}x vs best)"
            if fp_known and not fp_same:
                rows.append((name, "plan-change", detail + " [fingerprint differs]"))
            elif ratio >= sec_threshold:
                if fb and fb["ratio"] <= sec_threshold:
                    rows.append((name, "within-best", detail + " [floor holds]"))
                else:
                    verdict = "stall" if fp_same else "slower"
                    rows.append((name, verdict, detail + (" [same plan]" if fp_same else " [no fingerprint]")))
            elif ratio <= 1.0 / threshold:
                rows.append((name, "faster", detail))
            else:
                rows.append((name, "steady", detail))
    return rows


def _vs_best_row(new: dict, label: str, q: str) -> dict | None:
    """The new artifact's vs_best entry for a diff row, if recorded.
    vs_best keys use bench's section prefixes ('' / 'sf1:' / 'sf10:');
    the headline and extras sections both map to the bare name."""
    prefix = {"headline": "", "extras": "", "sf1": "sf1:", "sf10": "sf10:"}.get(label)
    if prefix is None:
        return None
    row = (new.get("vs_best") or {}).get(prefix + q)
    return row if isinstance(row, dict) and "best" in row and "ratio" in row else None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5,
                    help="ratio above which a slowdown is reported (default 1.5)")
    ap.add_argument("--all", action="store_true", help="print steady rows too")
    args = ap.parse_args()
    with open(args.old) as f:
        old = json.load(f)
    with open(args.new) as f:
        new = json.load(f)
    rows = diff(old, new, args.threshold)
    interesting = [r for r in rows if r[1] != "steady" or args.all]
    width = max((len(r[0]) for r in interesting), default=10)
    for name, verdict, detail in interesting:
        print(f"{name:<{width}}  {verdict:<11}  {detail}")
    n_regress = sum(1 for r in rows if r[1] == "plan-change")
    n_stall = sum(1 for r in rows if r[1] == "stall")
    print(f"\n{len(rows)} queries compared: {n_regress} plan changes, "
          f"{n_stall} same-plan slowdowns (stalls), "
          f"{sum(1 for r in rows if r[1] == 'faster')} faster")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
