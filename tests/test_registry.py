"""Driver-contract shape locks for __spark_entry__ (VERDICT r6 #8).

The grading driver samples AT MOST 50 registry entries per round; the
r5→r6 merge got the registry down to exactly 50 so every entry is
value-hash verified each round. These tests make that discipline a CI
property instead of a manual convention: a change that re-splits
entries past 50 (silently shipping unverified rows) or registers an
oracle for a query that doesn't exist goes red here, not in VERDICT.
"""

import __spark_entry__ as E

DRIVER_SAMPLE = 50


def test_registry_fits_driver_sample_window():
    qs = E.queries()
    assert len(qs) <= DRIVER_SAMPLE, (
        f"{len(qs)} registry entries > the driver's {DRIVER_SAMPLE}-entry "
        "sample: fold the new capability into an existing entry (mode= "
        "branch / extra columns) instead of adding one"
    )


def test_every_oracle_names_a_registered_query():
    qs, sql = E.queries(), E.oracle_sql()
    orphans = sorted(set(sql) - set(qs))
    assert not orphans, f"oracle_sql entries with no queries() twin: {orphans}"


def test_every_query_is_oracled():
    """The repo's standing bar (50/50 value-hash green since r6): every
    registered query has a DuckDB twin. Genuinely non-SQL-expressible
    entries would need an explicit exemption list here — keep it empty
    until one exists."""
    qs, sql = E.queries(), E.oracle_sql()
    unoracled = sorted(set(qs) - set(sql))
    assert not unoracled, f"queries() entries with no oracle: {unoracled}"


def test_entry_names_are_stable_identifiers():
    for name in E.queries():
        assert name.isidentifier(), name
