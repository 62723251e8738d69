"""As-of join semantics on crafted timelines."""

from __future__ import annotations

from datetime import datetime

from ipeds_etl_spark.operators.asof import asof_join


def _ts(s):
    return datetime(2024, 1, 1, 0, 0, s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, _ts(5), "l5"), (1, _ts(10), "l10"), (1, _ts(2), "l2"), (2, _ts(7), "x7")],
        "k int, ts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [(1, _ts(3), 30.0), (1, _ts(10), 100.0), (2, _ts(8), 80.0)],
        "k int, ts timestamp, rv double",
    )
    out = {
        (r["k"], r["lv"]): (r["ts_right"], r["rv"])
        for r in asof_join(left, right, keys=["k"], time_col="ts").collect()
    }
    assert out[(1, "l2")] == (None, None)          # nothing at or before t=2
    assert out[(1, "l5")] == (_ts(3), 30.0)        # latest before
    assert out[(1, "l10")] == (_ts(10), 100.0)     # equal time matches (inclusive)
    assert out[(2, "x7")] == (None, None)          # other key's rights invisible

    inner = asof_join(left, right, keys=["k"], time_col="ts", how="inner")
    assert {r["lv"] for r in inner.collect()} == {"l5", "l10"}


def test_asof_payload_row_consistency(spark):
    # payload fields with NULLs must come from the SAME matched row
    left = spark.createDataFrame([(1, _ts(9), "q")], "k int, ts timestamp, lv string")
    right = spark.createDataFrame(
        [(1, _ts(1), 10.0, "a"), (1, _ts(5), None, "b")],
        "k int, ts timestamp, rv double, tag string",
    )
    [r] = asof_join(left, right, keys=["k"], time_col="ts").collect()
    # match is the t=5 row: rv NULL *from that row*, not 10.0 carried
    assert r["tag"] == "b" and r["rv"] is None and r["ts_right"] == _ts(5)
