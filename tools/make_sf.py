"""Deterministic scale-up of the driver's test tables.

Produces an sfN directory from sf0.1 by replicating fact tables
``factor`` times with disjoint key ranges (referential integrity
preserved: orders.o_custkey follows customer keys, lineitem.l_orderkey
follows order keys). Dimensions (region/nation/supplier/part) stay
fixed — TPC-H-style join selectivity is preserved while fact volume
scales linearly. Values are unchanged, so per-replica distributions
(and therefore plan shapes) match the source exactly.

Used by bench.py to add a data-bound scale point: at sf0.1 most queries
are overhead-bound (BASELINE.md); at 10× the scan/shuffle/agg cost
dominates and per-query scaling ratios become meaningful.

    python tools/make_sf.py [src_dir] [dst_dir] [factor]
"""

from __future__ import annotations

import os
import sys

import duckdb

# per-replica key offsets, all far above source max keys; doc offset is
# 2^41 so replica ids never collide with the +2^40 augmented near-dup
# ids some queries plant
OFFSETS = {
    "customer": {"c_custkey": 1 << 24},
    "orders": {"o_orderkey": 1 << 24, "o_custkey": 1 << 24},
    "lineitem": {"l_orderkey": 1 << 24},
    "events": {"event_id": 1 << 24, "user_id": 1 << 24},
    "documents": {"doc_id": 1 << 41},
    "embeddings": {"vec_id": 1 << 24},
}
DIMS = ["region", "nation", "supplier", "part"]

# every scaled file should carry at least this many row groups: a
# parquet reader (Spark included) cannot split a file finer than its
# row groups, whatever maxPartitionBytes says — a split only does work
# if a row-group midpoint lands in its byte range. DuckDB's 122,880-row
# default wrote sf10 documents as 5 × 50 MB groups, silently capping
# every downstream scan at 5 of 32 local cores (the minhash signatures
# stage measured 33.4 s; the identical plan over a 64-way-splittable
# copy of the same rows runs in ~2 s). 64 ≥ 2× the bench parallelism.
TARGET_ROW_GROUPS = 64


def _replica_salt(r: int) -> str:
    """Letters-only replica salt ('rb', 'rh', 'rbb', …).

    LETTERS, not the replica number itself: CCNet-style line
    normalization (operators/curation.line_normalize) strips DIGITS, so
    a digit salt ('datar7') normalizes identically across every replica
    and the pipeline's line-dedup gate collapses the whole scaled
    corpus back to one replica — BENCH_full_r07's sf10 pipeline leg
    measured docs_out == the sf1 leg's 5,208 because of exactly this.
    Base-26 letters survive every normalizer in the suite, so replicas
    stay distinct through the dedup gates and an sfN pipeline run
    actually carries N× mass end-to-end."""
    s = ""
    n = r
    while True:
        s = chr(97 + n % 26) + s
        n //= 26
        if n == 0:
            return "r" + s


def _row_group_size(total_rows: int) -> int:
    """Rows per parquet row group for a ``total_rows`` file: small
    enough that the file splits TARGET_ROW_GROUPS ways, capped at
    DuckDB's own default. DuckDB quietly rounds the option to a
    multiple of its 2048-row vector, so the formula speaks in those
    units — asking for 512 writes 2048-row groups anyway."""
    ideal = total_rows // TARGET_ROW_GROUPS + 1
    rounded = ((ideal + 2047) // 2048) * 2048
    return max(2048, min(122_880, rounded))


def make_sf(src: str, dst: str, factor: int, tables: list[str] | None = None) -> None:
    """``tables`` restricts the output (e.g. only ``documents`` for a
    curation-suite scale point — generating 100× lineitem just to bench
    text operators would waste minutes and disk)."""
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in DIMS:
        if tables is not None and t not in tables:
            continue
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, offs in OFFSETS.items():
        if tables is not None and t not in tables:
            continue
        cols = [
            c[0]
            for c in con.execute(f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()
        ]
        selects = []
        for r in range(factor):
            exprs = ", ".join(
                f"{c} + {r * off} AS {c}"
                if (off := offs.get(c)) and r
                else (
                    # Salt every 3rd word of replica r>0 with the replica id.
                    # Verbatim replication makes the corpus 99% duplicates at
                    # high factors, so pair-emitting queries (MinHash,
                    # cross-corpus shingle join) measure the synthetic data's
                    # quadratic duplicate mass instead of plan scaling. Every
                    # 3-word shingle contains a salted word, so cross-replica
                    # shingle overlap is zero, while ~2/3 of tokens (stopword
                    # markers, BM25 query terms) survive for the term-matching
                    # queries to stay data-proportional. Within-replica
                    # structure (lengths, planted near-dups) is unchanged.
                    # the salt attaches with NO separator ('datarb', not
                    # 'data~rb'): the tokenizer is [a-z0-9]+ runs, so a
                    # separator would split the salt into its own token,
                    # inserting a positionally-aligned wildcard that
                    # RAISES cross-doc shingle collisions (measured 30x
                    # pair inflation at sf10) instead of lowering them.
                    # Salt characters are LETTERS ONLY (_replica_salt):
                    # digit salts vanish under CCNet line normalization
                    # and the pipeline's dedup gates collapse the corpus.
                    f"regexp_replace({c}, '(\\S+ \\S+ )(\\S+)', "
                    f"'\\1\\2{_replica_salt(r)}', 'g') AS {c}"
                    if t == "documents" and c == "text" and r
                    else c
                )
                for c in cols
            )
            selects.append(f"SELECT {exprs} FROM '{src}/{t}.parquet'")
        union = " UNION ALL ".join(selects)
        src_rows = con.execute(
            f"SELECT count(*) FROM '{src}/{t}.parquet'"
        ).fetchone()[0]
        rg = _row_group_size(src_rows * factor)
        con.execute(
            f"COPY ({union}) TO '{dst}/{t}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE {rg})"
        )


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    make_sf(src, dst, factor)
    print(f"wrote {dst} ({factor}x {src})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
