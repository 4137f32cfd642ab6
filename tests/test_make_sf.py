"""tools/make_sf.py — scaled parquet must stay SPLITTABLE.

A parquet file can't be read by more tasks than it has row groups (a
byte-range split only does work if a row-group midpoint falls inside
it), so the generator's writer settings are a correctness property of
the bench: DuckDB's 122,880-row default once wrote sf10 documents as
5 × 50 MB groups, capping every sf10 scan at 5 of 32 cores and
inflating the minhash signatures stage 33.4 s → ~2 s worth of real
work. These tests pin the row-group sizing so a writer-default change
can't silently reintroduce the parallelism collapse.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.make_sf import (  # noqa: E402
    TARGET_ROW_GROUPS,
    _replica_salt,
    _row_group_size,
    make_sf,
)

SRC = "/root/testdata/sf0.001"


def test_row_group_size_formula():
    # big tables split ~TARGET_ROW_GROUPS ways (2048-row granularity)
    n = 1_000_000
    rg = _row_group_size(n)
    assert rg % 2048 == 0
    assert TARGET_ROW_GROUPS // 2 <= math.ceil(n / rg) <= TARGET_ROW_GROUPS
    # tiny tables never degenerate below DuckDB's 2048-row vector
    assert _row_group_size(10) == 2048
    assert _row_group_size(0) == 2048
    # huge tables keep DuckDB's own cap (122,880 rows/group is plenty
    # of splits once row counts are in the tens of millions)
    assert _row_group_size(100_000_000) == 122_880


@pytest.mark.skipif(not os.path.isdir(SRC), reason="driver testdata absent")
def test_scaled_files_have_enough_row_groups(tmp_path):
    import pyarrow.parquet as pq

    dst = str(tmp_path / "sf_scaled")
    make_sf(SRC, dst, 8, tables=["documents", "lineitem"])
    for t, src_rows in [("documents", 500), ("lineitem", 6000)]:
        f = pq.ParquetFile(f"{dst}/{t}.parquet")
        rows = src_rows * 8
        assert f.metadata.num_rows == rows
        # duckdb flushes at UNION-branch boundaries (early) and merges
        # trailing partials (late, up to ~2x the request); the
        # parallelism guarantee that matters is a floor on the COUNT:
        # groups can never be coarser than twice the requested size
        expected = math.ceil(rows / (2 * _row_group_size(rows)))
        assert f.num_row_groups >= expected


def test_replica_salt_survives_ccnet_normalization():
    """The salt must distinguish replicas AFTER CCNet line
    normalization (lowercase + strip non-letters): r7's digit salt
    ('datar7') normalized identically for every replica, so the
    pipeline's line-dedup gate collapsed the sf10 corpus to sf1 mass
    (BENCH_full_r07 sf10_pipeline.docs_out == sf1's 5,208)."""
    import re

    def ccnet_norm(s: str) -> str:  # python twin of curation.ccnet_line_norm
        return re.sub(r"\s+", " ", re.sub(r"[^a-z\s]", "", s.lower())).strip()

    salts = [_replica_salt(r) for r in range(1, 100)]
    # letters only — nothing for the normalizer to strip
    assert all(s.isalpha() and s.islower() for s in salts)
    # pairwise distinct after normalization (trivially: norm is identity)
    normed = {ccnet_norm(f"alpha beta gamma{s}") for s in salts}
    assert len(normed) == len(salts)


@pytest.mark.skipif(not os.path.isdir(SRC), reason="driver testdata absent")
def test_scaled_replicas_survive_line_dedup_key(tmp_path):
    """End-to-end: scale documents 3x and check the salted third word
    yields DISTINCT ccnet-normalized lines across replicas (the exact
    key line_dedup groups on)."""
    dst = str(tmp_path / "sf_salted")
    make_sf(SRC, dst, 3, tables=["documents"])
    con = duckdb.connect()
    # same normalization as curation.ccnet_line_norm, in duckdb
    n_docs, n_norm = con.execute(
        f"""
        SELECT count(*), count(DISTINCT trim(regexp_replace(
            regexp_replace(lower(text), '[^a-z \\t\\n]', '', 'g'),
            '\\s+', ' ', 'g')))
        FROM '{dst}/documents.parquet'
        """
    ).fetchone()
    # replicas must NOT collapse: distinct normalized texts ≈ doc count
    # (within-replica planted near-dups allow a small shortfall)
    assert n_norm > 0.9 * n_docs
