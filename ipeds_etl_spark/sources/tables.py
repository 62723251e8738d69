"""Parquet table loader for the benchmark star schema.

Handles one physical quirk of the driver-generated data: ``events.ts``
is written as parquet TIMESTAMP(NANOS), which Spark's vectorized reader
rejects by default (``PARQUET_TYPE_ILLEGAL``). We flip the public
``spark.sql.legacy.parquet.nanosAsLong`` conf and rebuild a proper
microsecond timestamp with exact integer arithmetic (``ts div 1000`` —
float division would lose sub-microsecond precision at 2024-epoch
nanosecond magnitudes).

Scan hygiene: callers ``select`` the columns they need *after* this
loader; Catalyst prunes the parquet scan to exactly those columns
(verify with ``.explain``: ``ReadSchema`` should list only used fields).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: tables whose parquet carries nanosecond timestamps (column -> it holds)
_NANOS_TS_COLS = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one benchmark table; normalizes nanos-timestamp columns."""
    if name in _NANOS_TS_COLS:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _NANOS_TS_COLS.get(name, ()):
        df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    return df


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register every table as a temp view for the SQL API."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
