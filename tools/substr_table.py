"""Measured ExactSubstr dedup sweep over the window size k — the
content-signal artifact for dedup.duplicated_substring_spans /
exact_substring_dedup (Lee et al. 2022 use k=50 on real crawls; the
synthetic corpus's planted template runs are shorter, so the sweep
shows how k trades recall of short boilerplate against span count).

Per k: duplicated spans found, docs cut, tokens removed (fraction of
the corpus), and wall time for the spans job (min of 2).

    python tools/substr_table.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from customkb_spark.session import get_spark  # noqa: E402


def main() -> int:
    from pyspark.sql import functions as F

    from customkb_spark.operators.dedup import (
        duplicated_substring_spans,
        exact_substring_dedup,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("substr-table")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    total_tokens = docs.select(
        F.sum(F.size(F.split(F.lower("text"), "[^a-z0-9]+"))).alias("t")
    ).collect()[0]["t"]

    rows = []
    for k in (8, 12, 16, 24, 50):
        walls = []
        for _ in range(2):
            t0 = time.time()
            n_spans = duplicated_substring_spans(docs, k=k).count()
            walls.append(time.time() - t0)
        agg = exact_substring_dedup(docs, k=k).agg(
            F.sum("removed_tokens").alias("removed"),
            F.sum((F.col("removed_tokens") > 0).cast("long")).alias("docs_cut"),
            F.sum("n_tokens").alias("tokens"),
        ).collect()[0]
        rows.append(
            {
                "k": k,
                "spans": n_spans,
                "docs_cut": int(agg["docs_cut"] or 0),
                "removed_tokens": int(agg["removed"] or 0),
                "removed_frac": round((agg["removed"] or 0) / agg["tokens"], 5),
                "spans_wall_s": round(min(walls), 2),
            }
        )
        print(json.dumps(rows[-1]), file=sys.stderr)
    print(json.dumps(rows, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
