"""Driver-contract smoke tests (SURVEY.md §5.2)."""

from __future__ import annotations

import __spark_entry__ as e


def test_entry_returns_rows(spark):
    df = e.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"word", "cnt"}


def test_queries_and_oracles_consistent():
    qs, os_ = e.queries(), e.oracle_sql()
    assert qs, "no queries registered"
    # every oracle key must have a query
    assert set(os_) <= set(qs), set(os_) - set(qs)


def test_all_queries_run_smoke(spark):
    """Every registered query must execute and have a stable schema."""
    for name, fn in e.queries().items():
        df = fn(spark, e.SMOKE_SF_DIR)
        assert df.columns, name
        df.limit(5).collect()
