"""Deterministic sampling / split assignment for training-data pipelines.

``df.sample()`` is seed-dependent on partitioning and Spark version —
useless for reproducible corpus construction. These operators assign
membership from a *content hash* of a stable key instead:

* the same row always lands in the same split, on any cluster, any
  partitioning, any engine (the hash family is the repo-wide
  sha256-prefix ``parity_hash``, replicable in DuckDB — so sampling is
  value-hash-checked by the correctness gate, not just row-counted);
* adding/removing other rows never flips a row's assignment (unlike
  ``ntile``/rank-based splits);
* disjointness of splits is structural (hash bucket ranges).

All expressions are Column-in/Column-out JVM codegen — a 100 TB
map-only pass with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ipeds_etl_spark.functions.hashing import parity_hash, parity_hash_sql


#: deterministic stand-in for a NULL key: without it, ``concat`` of a
#: NULL key yields a NULL bucket, every comparison on it is NULL, and
#: null-key rows silently vanish from ALL splits/samples — breaking the
#: disjoint-and-complete guarantee. NUL-prefixed so no real key's
#: string form can collide with it.
_NULL_KEY_SENTINEL = "\x00null"


def sample_bucket(key: Column, salt: str = "", n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets) from a key column + salt.
    Different salts give independent assignments (changing salt
    re-rolls every row). NULL keys are mapped to a sentinel before
    hashing, so they get a real (deterministic, shared) bucket instead
    of disappearing from every split."""
    salted = F.concat(
        F.lit(salt), F.coalesce(key.cast("string"), F.lit(_NULL_KEY_SENTINEL))
    )
    return parity_hash(salted) % n_buckets


def sample_bucket_sql(expr: str, salt: str = "", n_buckets: int = 100) -> str:
    """DuckDB twin of ``sample_bucket``."""
    salted = (
        f"concat('{salt}', coalesce(CAST({expr} AS VARCHAR), chr(0) || 'null'))"
    )
    return f"({parity_hash_sql(salted)} % {n_buckets})"


def hash_sample(
    df: DataFrame, key_col: str, rate_pct: int, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ~``rate_pct``% of rows by key hash."""
    if not 0 <= rate_pct <= 100:
        raise ValueError(f"rate_pct must be in [0, 100], got {rate_pct}")
    return df.filter(sample_bucket(F.col(key_col), salt) < rate_pct)


def split_column(
    key: Column,
    splits: dict[str, int],
    salt: str = "",
) -> Column:
    """Named-split assignment from cumulative hash-bucket ranges.

    ``splits`` maps name -> percentage (must sum to 100); e.g.
    ``{"train": 90, "valid": 5, "test": 5}``. Ranges are carved in
    the given order, so the mapping is stable as long as the dict
    order and salt are."""
    if sum(splits.values()) != 100:
        raise ValueError(f"split percentages must sum to 100: {splits}")
    bucket = sample_bucket(key, salt)
    expr = None
    hi = 0
    for name, pct in splits.items():
        hi += pct
        expr = F.when(bucket < hi, name) if expr is None else expr.when(bucket < hi, name)
    return expr


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates_pct: dict[str, int],
    default_pct: int = 0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum keeps its own
    hash-rate (e.g. downsample boilerplate web text to 5%, keep books
    at 100%). Unlisted strata keep ``default_pct``."""
    bucket = sample_bucket(F.col(key_col), salt)
    rate = None
    for stratum, pct in rates_pct.items():
        cond = F.col(strata_col) == stratum
        rate = F.when(cond, pct) if rate is None else rate.when(cond, pct)
    rate = F.lit(default_pct) if rate is None else rate.otherwise(default_pct)
    return df.filter(bucket < rate)
