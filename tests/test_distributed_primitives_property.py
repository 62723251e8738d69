"""Property-based checks for the two-phase distributed primitives:
``exact_quantiles`` and ``global_row_number``. Hypothesis drives the
adversarial shapes a real-data test misses — all-equal values, heavy
ties, singleton groups, one-element tables — and each case is checked
against a literal Python model of the spec (sorted order statistic /
total-order enumeration).

Batched like ``test_cleaning_property``: ONE generated dataset per
example, one Spark job, whole-result comparison.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ipeds_etl_spark.operators.layout import global_row_number
from ipeds_etl_spark.operators.quantile import exact_quantiles

_vals = st.one_of(
    st.integers(min_value=-5, max_value=5).map(float),  # heavy ties
    st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    ),
)

_QS = [0.0, 0.1, 0.5, 0.9, 1.0]


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    data=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), _vals), min_size=1, max_size=60
    )
)
def test_exact_quantiles_property(spark, data):
    df = spark.createDataFrame(data, "g string, v double")
    got = {
        (r["g"], r["q"]): r["v"]
        for r in exact_quantiles(df, "v", _QS, ["g"], n_buckets=8).collect()
    }
    groups: dict[str, list[float]] = {}
    for g, v in data:
        groups.setdefault(g, []).append(v)
    for g, vs in groups.items():
        vs.sort()
        for q in _QS:
            r = max(0, math.ceil(q * len(vs)) - 1)
            assert got[(g, q)] == vs[r], (g, q, vs)
    assert len(got) == len(groups) * len(_QS)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=9), min_size=1, max_size=50
    )
)
def test_global_row_number_property(spark, keys):
    # value column with heavy ties; id column makes the order total
    rows = [(i, float(k)) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, "id long, v double")
    got = {
        r["id"]: r["row_num"]
        for r in global_row_number(df, ["v", "id"], num_partitions=4).collect()
    }
    want = {
        rid: n + 1
        for n, (rid, _v) in enumerate(sorted(rows, key=lambda t: (t[1], t[0])))
    }
    assert got == want
