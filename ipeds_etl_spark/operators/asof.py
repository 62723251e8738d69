"""As-of join: for each left row, the most recent right row at or
before its timestamp, per key — the canonical time-series operator
Spark's join set lacks (DuckDB/Pandas/kdb expose it natively).

Implementation is the scalable union formulation, NOT a range join:

    tag left(1)/right(0) → unionByName → window per key ordered by
    (time, tag) → last(right_payload, ignorenulls) carries the latest
    right row forward → keep left rows.

One hash shuffle on the key (same as any groupBy), sort within
partitions, zero row multiplication — a naive ``l.time >= r.time``
range join would explode quadratically per key before aggregation.
Right payload columns travel inside ONE struct so the carried values
always come from the same right row (per-column ``last`` could mix
rows when a payload field is legitimately NULL).

Contract: ``right`` must be unique per (keys, time); equal-time
left/right pairs match (inclusive, tag-ordered right-first) — the same
inclusive semantics as DuckDB's ``ASOF JOIN ... ON l.t >= r.t``, which
the correctness oracle uses.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    time_col: str,
    how: str = "left",
) -> DataFrame:
    """Backward as-of join. Output = left columns + right payload
    columns (right columns other than keys/time) + ``{time_col}_right``
    (the matched right row's time, NULL when no match)."""
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join supports how in ['left', 'inner'], got {how!r}")
    rpayload = [c for c in right.columns if c not in (*keys, time_col)]
    collisions = sorted(set(left.columns) & {f"{time_col}_right", *rpayload})
    if collisions:
        raise ValueError(
            f"asof_join output columns collide with left columns: {collisions}; "
            "rename the right payload (or left) columns before joining"
        )
    R = right.select(
        *keys,
        F.col(time_col),
        F.struct(
            F.col(time_col).alias(f"{time_col}_right"),
            *[F.col(c) for c in rpayload],
        ).alias("__r"),
    ).withColumn("__is_left", F.lit(0))
    L = left.withColumn("__is_left", F.lit(1))
    unioned = L.unionByName(R, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(time_col).asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn("__r", F.last("__r", ignorenulls=True).over(w))
    out = carried.filter(F.col("__is_left") == 1).drop("__is_left")
    for c in (f"{time_col}_right", *rpayload):
        out = out.withColumn(c, F.col("__r").getField(c))
    out = out.drop("__r")
    if how == "inner":
        out = out.filter(F.col(f"{time_col}_right").isNotNull())
    return out
