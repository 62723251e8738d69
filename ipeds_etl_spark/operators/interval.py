"""Interval (range) joins that scale past broadcast.

``fact.ts BETWEEN dim.start AND dim.end`` has no equi-key, so Spark
plans a BroadcastNestedLoopJoin — fine while the interval side fits in
a broadcast, O(facts × intervals) disaster when it doesn't. The scale
path (same family as the LSH band join): align both sides to
fixed-width time buckets, explode each interval into every bucket it
overlaps, equi-join on the bucket, and re-check the exact BETWEEN as a
residual filter. The shuffle key is the bucket, so the join is an
ordinary hash join; work scales with
facts + intervals × (interval_width / bucket_width) + true matches.

Pick ``bucket_days`` near the typical interval length: too small
explodes the interval side, too large makes every bucket pair a
near-cross-product. Results are identical to the nested-loop form by
construction (the residual filter is exact) — the correctness gate
checks the bucketed operator against the plain BETWEEN oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _date_bucket(col, bucket_days: int):
    # epoch literal built lazily — Column construction needs an active
    # session, and this module must import without one
    epoch = F.lit("1970-01-01").cast("date")
    return F.floor(F.datediff(col, epoch) / bucket_days)


def interval_bucket_join(
    facts: DataFrame,
    fact_time_col: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bucket_days: int = 32,
) -> DataFrame:
    """Inner join of ``facts`` to every interval containing its date.

    Output = fact columns + interval columns (names must not collide).
    """
    collide = sorted(set(facts.columns) & set(intervals.columns))
    if collide:
        raise ValueError(f"column collision between sides: {collide}")
    fb = facts.withColumn("__bkt", _date_bucket(F.col(fact_time_col), bucket_days))
    ib = intervals.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                _date_bucket(F.col(start_col), bucket_days),
                _date_bucket(F.col(end_col), bucket_days),
            )
        ),
    )
    return (
        fb.join(ib, "__bkt")
        .filter(F.col(fact_time_col).between(F.col(start_col), F.col(end_col)))
        .drop("__bkt")
    )
