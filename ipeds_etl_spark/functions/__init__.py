"""Column-expression builders (the engine's scalar-function layer).

Everything here returns ``pyspark.sql.Column`` built from native
functions — JVM-side, whole-stage-codegen eligible. No row-at-a-time
Python UDFs in any hot path.
"""

from ipeds_etl_spark.functions.cleaning import (
    clean_sentinels,
    coalesce_pick,
    is_missing,
    safe_double,
    safe_int,
    safe_str,
    stable_hash,
)

__all__ = [
    "clean_sentinels",
    "coalesce_pick",
    "is_missing",
    "safe_double",
    "safe_int",
    "safe_str",
    "stable_hash",
]
