"""Dump .explain('formatted') for bench queries to plans/<tag>/<q>_<suffix>.txt.

Usage: python tools/dump_plans.py r09 before [query ...]
With no query list, dumps every BENCH_QUERIES + EXTRA_QUERIES entry.
Planning only — no query is executed."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_ORACLE_ART_SKIP", "1")

import bench  # noqa: E402
import __spark_entry__ as E  # noqa: E402
from customkb_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r09"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or (bench.BENCH_QUERIES + bench.EXTRA_QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    for name in names:
        try:
            df = getattr(E, f"q_{name}")(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            txt = f"PLAN FAILED: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"# wrote {path} ({len(txt)} bytes)", file=sys.stderr)


if __name__ == "__main__":
    main()
