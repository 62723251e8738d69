"""Bucketed tables: pre-shuffled layout for co-located joins.

The reference's answer to repeated join cost was secondary indexes
(reference ``etl/raw_io.py:115-116``, ``architecture.md:75-79``); the
Spark answer is bucketing: write the table hash-partitioned on the
join key once, and every subsequent equi-join or aggregation on that
key skips its shuffle entirely (the scan is already distributed by
key). The win compounds at 100 TB: a nightly-rebuilt fact table joined
by N downstream queries pays one shuffle at write time instead of N at
read time.

Bucketed writes must go through the catalog (``saveAsTable``); tables
are written as EXTERNAL with an explicit path so the parquet stays
under the caller's warehouse layout.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Write ``df`` as an external bucketed+sorted parquet table.
    ``n_buckets`` should be sized so one bucket ≈ one task's worth of
    data at the target scale (buckets are the parallelism unit for
    shuffle-free reads)."""
    w = (
        df.write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort:
        w = w.sortBy(*bucket_cols)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchanges in the executed plan — the metric
    bucketing exists to reduce (0 for a join of two tables bucketed on
    the join key with matching bucket counts)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        line.strip().lstrip("+-:* ").startswith("Exchange")
        for line in plan.split("\n")
    )
