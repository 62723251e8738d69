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


def test_every_query_has_an_oracle():
    """Regression guard: EVERY registered query must carry a DuckDB
    oracle — the correctness gate's strongest setting. A new rows-only
    query is a deliberate decision, not a drift."""
    import __spark_entry__ as m

    qs, oracles = m.queries(), m.oracle_sql()
    assert set(qs) == set(oracles), (
        f"queries without oracles: {sorted(set(qs) - set(oracles))}; "
        f"orphan oracles: {sorted(set(oracles) - set(qs))}"
    )
    assert len(qs) >= 58
