"""Registry-wide regression net: every declared query must at least pass
analysis (schema resolution) against the smallest test data, and every
oracle key must point at a declared query.  Catches bitrot in entries
that no other test or bench exercises.  (Iterative operators execute
eagerly while building — still cheap at sf0.001.)"""

from __future__ import annotations

import __spark_entry__ as entry


def test_every_oracle_key_has_a_query():
    qs = entry.queries()
    missing = set(entry.oracle_sql()) - set(qs)
    assert not missing, f"oracles without queries: {sorted(missing)}"


def test_every_query_analyzes_at_sf0001(spark, sf_dir):
    qs = entry.queries()
    failures = {}
    for name, fn in sorted(qs.items()):
        try:
            df = fn(spark, sf_dir)
            _ = df.schema  # forces full analysis/resolution
            assert len(df.columns) > 0
        except Exception as e:  # noqa: BLE001 — collecting all failures
            failures[name] = repr(e)[:200]
    assert not failures, f"{len(failures)} queries fail analysis: {failures}"
