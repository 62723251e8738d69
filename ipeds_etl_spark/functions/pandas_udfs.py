"""Pandas-UDF API surface — demos, cross-checked against the
production Column forms, and explicitly documented as the SLOW path.

The engine's rule (SURVEY §2.8) is that nothing hot runs in Python:
every production operator in this repo compiles to JVM Column
expressions or, where Python is unavoidable (opaque media bytes,
custom streaming state), Arrow-batched ``mapInPandas`` /
``applyInPandasWithState``. This module completes the remaining API
surface — grouped ``applyInPandas`` and a scalar ``@pandas_udf`` — the
way the UDTF demo (``functions/udtfs.py``) does: a working,
row-for-row cross-checked implementation whose docstring tells you to
use the Column form instead.

When IS ``applyInPandas`` the right tool? When the per-group logic
genuinely needs a numerical library (scipy optimize, statsmodels, a
model's ``predict``) — the grouped-OLS demo below stands in for that
class. The shuffle shape is the same as any groupBy (one exchange on
the key); the extra cost is Arrow serialization + Python execution,
which is why a closed-form aggregate beats it when one exists
(``events_user_trend`` is the production twin here).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TREND_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("slope", T.DoubleType(), True),
    ]
)


def user_trend_applyinpandas(events: DataFrame) -> DataFrame:
    """Per-user OLS slope via grouped ``applyInPandas`` — the
    pandas-native twin of the registered ``events_user_trend``
    (closed-form algebraic aggregates, JVM-only). Same estimator,
    same micro-unit quantization of y, but computed per group in
    float64 with CENTERED x (x−x̄) — the numerically stable form a
    stats library would use (raw Σx² at epoch-seconds magnitude
    would lose ~10 digits to cancellation in float64; the algebraic
    twin dodges that with exact decimal sums instead). The
    equivalence test bounds the two forms to within 1e-6 relative.

    Prefer the algebraic form in production: identical answer, no
    Arrow transfer, no Python workers, map-side-combinable partial
    aggregation instead of full rows shuffling to each group."""

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        uid = int(pdf["user_id"].iloc[0])
        x = pdf["xs"].to_numpy(dtype="float64")
        y = pdf["yq"].to_numpy(dtype="float64")
        n = len(pdf)
        import numpy as np

        if len(np.unique(x)) < 2:
            return pd.DataFrame(
                {"user_id": [uid], "n_events": [n], "slope": [None]}
            ).astype({"slope": "float64"})
        xc = x - x.mean()
        denom = float((xc * xc).sum())
        if denom == 0.0:
            return pd.DataFrame(
                {"user_id": [uid], "n_events": [n], "slope": [None]}
            ).astype({"slope": "float64"})
        slope = float((xc * (y - y.mean())).sum() / denom)
        return pd.DataFrame({"user_id": [uid], "n_events": [n], "slope": [slope]})

    pts = events.select(
        "user_id",
        (F.unix_micros(F.col("ts").cast("timestamp")).cast("double") / 1_000_000.0).alias("xs"),
        (F.floor(F.col("value") * F.lit(1_000_000.0)).cast("double") / 1_000_000.0).alias("yq"),
    )
    return pts.groupBy("user_id").applyInPandas(fit, schema=TREND_SCHEMA)


@F.pandas_udf("double")
def cosine_pandas(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized cosine as a scalar ``@pandas_udf`` — the Arrow-
    batched twin of ``operators.similarity.cosine`` (pure Column
    fold). Numerically both are float64 dot products; they differ
    only in summation order, so the test bounds them to 1e-12.
    Production uses the Column form: it stays inside whole-stage
    codegen and costs no Python round-trip per batch."""
    import numpy as np

    # embeddings land as float32 arrays; the Column twin casts each
    # element to double before multiplying — match it or lose 7 digits
    av = np.stack(a.to_numpy()).astype("float64")
    bv = np.stack(b.to_numpy()).astype("float64")
    num = (av * bv).sum(axis=1)
    den = np.sqrt((av * av).sum(axis=1)) * np.sqrt((bv * bv).sum(axis=1))
    return pd.Series(num / den)


@F.pandas_udf("double")
def median_grouped_agg(v: pd.Series) -> float:
    """Grouped-aggregate ``pandas_udf`` — the UDAF surface (a whole
    group's column arrives as one Series; return one scalar). Twin of
    the built-in ``F.median``; the test demands exact equality (both
    compute the true median in float64). Production rule unchanged:
    the built-in exists, use it — this shape is for aggregations that
    genuinely need numpy/scipy (trimmed estimators, fitted params).
    Caveat at scale: a grouped-agg UDF buffers each whole group on one
    worker (no partial aggregation), so it inherits groupBy-key skew —
    unlike built-in aggregates, which combine map-side."""
    return float(v.median())
