"""Driver-contract smoke: entry() runs and every query builds a plan."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"order_year", "n_orders", "total_revenue", "avg_order_value", "open_rate"} == set(
        df.columns
    )


def test_every_query_builds_and_runs_tiny(spark):
    qs = entrymod.queries()
    assert qs, "no queries registered"
    for name, fn in qs.items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.limit(1).count() >= 0, name


def test_oracles_subset_of_queries():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_) <= set(qs)
