"""Measured exact-vs-bloom decontamination trade — the broadcast-size
artifact behind the Bloom tier (curation.build_ngram_bloom /
decontaminate_bloom): at what benchmark size does the string broadcast
stop being the right plan, and what does the bitmap cost instead.

For each synthetic benchmark size (distinct n-grams), reports:
- payload_exact: bytes of the distinct n-gram STRINGS the exact path
  broadcasts;
- payload_bloom: bitmap bytes (m/8) — the fixed-size broadcast the
  bloom tier ships regardless of string length;
- build_s: bloom build wall (distinct + hash + partition-bitmap OR);
- probe ratio: bloom probe wall / exact probe wall over the sf corpus
  (the pandas-UDF membership test vs the JVM broadcast semi-join);
- fp_docs: documents the bloom flags that the exact path does not —
  doc-level error compounds as grams/doc × fpp, which is exactly what
  the fpp=1e-3 rows demonstrate and the 1e-6 default suppresses.

    python tools/bloom_table.py [sf_dir]
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

    from customkb_spark.operators import curation as CU

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bloom-table")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = 8

    rows = []
    for n_grams, fpp in ((100_000, 1e-3), (100_000, 1e-6), (1_000_000, 1e-6)):
        # synthetic benchmark: one 8-gram per row, half sharing corpus
        # vocabulary shape (so some true hits exist via the planted row)
        bench = spark.range(n_grams).selectExpr(
            f"array_join(transform(sequence(0, {n - 1}), "
            "x -> concat('b', CAST(id AS STRING), 'w', CAST(x AS STRING))), ' ') AS text"
        )
        # plant one real corpus doc so true contamination exists
        planted = docs.orderBy("doc_id").limit(1).select("text")
        bench = bench.unionByName(planted)

        grams = bench.select(
            F.explode(CU.word_ngrams("text", n)).alias("ngram")
        ).distinct()
        payload_exact = grams.select(
            F.sum(F.length("ngram")).alias("b")
        ).collect()[0]["b"]

        t0 = time.time()
        bloom = CU.build_ngram_bloom(bench, n=n, fpp=fpp)
        build_s = time.time() - t0

        t0 = time.time()
        exact = CU.decontaminate(docs, bench, n=n).localCheckpoint()
        exact_docs = exact.filter("contaminated").count()
        exact_s = time.time() - t0

        t0 = time.time()
        bl = CU.decontaminate_bloom(docs, bloom, n=n).localCheckpoint()
        bloom_docs = bl.filter("contaminated").count()
        bloom_s = time.time() - t0

        fp_docs = (
            bl.filter("contaminated")
            .join(exact.filter("contaminated").select("doc_id"), "doc_id", "left_anti")
            .count()
        )
        rows.append(
            {
                "bench_ngrams": bloom.n_items,
                "fpp": fpp,
                "payload_exact_mb": round(payload_exact / 1e6, 2),
                "payload_bloom_mb": round(bloom.m_bits / 8 / 1e6, 2),
                "k": bloom.k,
                "build_s": round(build_s, 2),
                "probe_exact_s": round(exact_s, 2),
                "probe_bloom_s": round(bloom_s, 2),
                "contaminated_docs": bloom_docs,
                "fp_docs": fp_docs,
                "exact_docs": exact_docs,
            }
        )
        print(json.dumps(rows[-1]), file=sys.stderr)

    print(json.dumps(rows, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
