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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ipeds_etl_spark.functions.hashing import (
    PARITY_HEX_DIGITS,
    parity_hash,
    parity_hash_sql,
)


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


def quota_cap(
    df: DataFrame,
    key_col: str,
    group_col: str,
    cap: int,
    salt: str = "",
    margin: float = 4.0,
) -> DataFrame:
    """Deterministic per-group quota cap: keep EXACTLY ``min(cap, n_g)``
    rows per group — the rows with the smallest ``(parity_hash(salt ||
    key), key)`` — without sorting whole groups.

    The naive form (``row_number() OVER (PARTITION BY group ORDER BY
    hash)``) shuffles and sorts the ENTIRE corpus to keep a few rows
    per group — a non-starter at 100 TB. This is the two-phase scale
    path:

    1. one partial-aggregated pass counts each group (tiny result,
       broadcast back);
    2. a map-side hash prefilter keeps ~``margin * cap`` rows per
       oversized group (threshold ``margin*cap/n_g`` scaled into the
       40-bit hash space); groups at or under the cap skip the filter;
    3. the exact rank runs on the surviving sliver only.

    Exactness is *guaranteed*, not whp: a verification count compares
    survivors per group against ``min(cap, n_g)``; any group whose
    prefilter undershot (P ≈ e^{-cap(margin-1-ln margin)}, ~1e-7 per
    group at cap=10, margin=4) is re-ranked without the prefilter.
    Output is therefore identical to the naive window — the DuckDB
    oracle runs the naive form.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    hash_space = 1 << (4 * PARITY_HEX_DIGITS)
    key_s = F.coalesce(F.col(key_col).cast("string"), F.lit(_NULL_KEY_SENTINEL))
    h = parity_hash(F.concat(F.lit(salt), key_s))
    hashed = df.withColumn("__qc_h", h).withColumn("__qc_k", key_s)
    grp = F.col(group_col)

    counts = hashed.groupBy(grp.alias("__qc_g")).agg(
        F.count(F.lit(1)).alias("__qc_n")
    )
    thr = F.when(F.col("__qc_n") <= cap, F.lit(hash_space)).otherwise(
        F.least(
            F.lit(hash_space),
            F.ceil(F.lit(float(hash_space) * margin * cap) / F.col("__qc_n")),
        )
    )
    thresholds = counts.select(
        "__qc_g", "__qc_n", thr.cast("long").alias("__qc_thr")
    )
    survivors = (
        hashed.join(
            F.broadcast(thresholds), on=[grp.eqNullSafe(F.col("__qc_g"))]
        )
        .filter(F.col("__qc_h") < F.col("__qc_thr"))
        .drop("__qc_g", "__qc_n", "__qc_thr")
    )

    w = Window.partitionBy(grp).orderBy(F.col("__qc_h"), F.col("__qc_k"))
    ranked = survivors.withColumn("__qc_rn", F.row_number().over(w))

    # verification: metadata-sized collect of groups whose prefilter
    # undershot min(cap, n_g); re-rank those (and only those)
    # unfiltered. Driven from the FULL group-count side (left join) so
    # a group whose prefilter kept zero rows — absent from the
    # survivor counts entirely — is still flagged.
    sur_counts = survivors.groupBy(grp.alias("__qc_g2")).agg(
        F.count(F.lit(1)).alias("__qc_got")
    )
    got = (
        thresholds.join(
            sur_counts,
            on=[F.col("__qc_g").eqNullSafe(F.col("__qc_g2"))],
            how="left",
        )
        .filter(
            F.coalesce(F.col("__qc_got"), F.lit(0))
            < F.least(F.lit(cap), F.col("__qc_n"))
        )
    )
    bad = [r[0] for r in got.select("__qc_g").collect()]
    if bad:
        spark = df.sparkSession
        bad_df = F.broadcast(
            spark.createDataFrame([(b,) for b in bad], ["__qc_bad"]).select(
                F.col("__qc_bad").cast(df.schema[group_col].dataType)
            )
        )
        rescued = hashed.join(
            bad_df, on=[grp.eqNullSafe(F.col("__qc_bad"))], how="left_semi"
        )
        ranked = ranked.join(
            bad_df, on=[grp.eqNullSafe(F.col("__qc_bad"))], how="left_anti"
        ).unionByName(rescued.withColumn("__qc_rn", F.row_number().over(w)))
    return ranked.filter(F.col("__qc_rn") <= cap).drop(
        "__qc_h", "__qc_k", "__qc_n", "__qc_thr", "__qc_rn"
    )


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
