"""Deterministic sketches: cardinality estimation that the oracle can
replicate bit-for-bit.

``kmv_distinct`` — K-Minimum-Values estimator (Bar-Yossef et al. 2002):
keep the k smallest values of a uniform hash; estimate distinct count
as ``(k-1) / kth_min_normalized``. Unlike HLL (whose register layout is
engine-specific, so ``approx_count_distinct`` can never be
oracle-checked across engines), KMV over the engine's deterministic
sha256-prefix hash gives the SAME estimate in Spark and DuckDB —
a verifiable approximate aggregate.

Scale shape: ``collect_set`` of hashes per group is map-side combined;
for very-high-cardinality groups swap in ``approx_count_distinct``
(unverifiable but constant-space) — the sketch here bounds its state by
deduping first, which is the right trade until group cardinality ≫ k.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ipeds_etl_spark.functions.hashing import PARITY_HEX_DIGITS, parity_hash

#: hash space size for normalization (40-bit parity hash)
HASH_SPACE = float(1 << (4 * PARITY_HEX_DIGITS))


def kmv_estimate(value_col: Column, k: int = 64) -> Column:
    """Aggregate expression: KMV distinct-count estimate of a column.
    Use inside ``groupBy().agg(...)``. Exact when the group has < k
    distinct values (falls back to the observed count)."""
    mins = F.slice(F.array_sort(F.collect_set(parity_hash(value_col))), 1, k)
    n = F.size(mins)
    kth = F.element_at(mins, n).cast("double") / F.lit(HASH_SPACE)
    return F.when(n < k, n.cast("double")).otherwise((F.lit(k) - 1) / kth)


def kmv_estimate_sql(value_expr: str, k: int = 64) -> str:
    """DuckDB twin of ``kmv_estimate``."""
    h = f"CAST(concat('0x', substr(sha256({value_expr}), 1, {PARITY_HEX_DIGITS})) AS BIGINT)"
    mins = f"list_sort(list_distinct(list({h})))[1:{k}]"
    return (
        f"CASE WHEN len({mins}) < {k} THEN CAST(len({mins}) AS DOUBLE) "
        f"ELSE ({k} - 1) / (CAST({mins}[len({mins})] AS DOUBLE) / {HASH_SPACE:.1f}) END"
    )


# ---------------------------------------------------------------------------
# Mergeable sketch state. The property that makes a sketch usable at
# 100 TB is ASSOCIATIVE MERGE: executors build partial sketches over
# their splits, and any tree of merges yields the same state as one
# pass over the union — so set cardinalities across huge streams reduce
# to merging k-element arrays. KMV merges exactly: union the min-hash
# sets, keep the k smallest (Bar-Yossef et al. 2002 §2; same algebra
# Druid/Theta sketches use). Deterministic hash ⇒ DuckDB replays the
# identical merge, so merged estimates stay oracle-checkable.
# ---------------------------------------------------------------------------


def kmv_sketch(value_col: Column, k: int = 64) -> Column:
    """Aggregate: the sketch STATE — sorted array of the ≤k smallest
    distinct hash values. ``collect_set`` map-side combines; state is
    bounded by the group's distinct count and capped at k."""
    return F.slice(F.array_sort(F.collect_set(parity_hash(value_col))), 1, k)


def kmv_merge(a: Column, b: Column, k: int = 64) -> Column:
    """Scalar: merge two sketch states — distinct union, k smallest.
    Associative and commutative; ``kmv_merge(s(A), s(B)) ==
    kmv_sketch(A ∪ B)`` exactly."""
    return F.slice(F.array_sort(F.array_distinct(F.concat(a, b))), 1, k)


def kmv_estimate_from(sketch: Column, k: int = 64) -> Column:
    """Scalar: distinct-count estimate from a sketch state (same
    estimator as ``kmv_estimate``)."""
    n = F.size(sketch)
    kth = F.element_at(sketch, n).cast("double") / F.lit(HASH_SPACE)
    return F.when(n < k, n.cast("double")).otherwise((F.lit(k) - 1) / kth)


def kmv_sketch_sql(value_expr: str, k: int = 64) -> str:
    """DuckDB twin of ``kmv_sketch``."""
    h = f"CAST(concat('0x', substr(sha256({value_expr}), 1, {PARITY_HEX_DIGITS})) AS BIGINT)"
    return f"list_sort(list_distinct(list({h})))[1:{k}]"


def kmv_merge_sql(a: str, b: str, k: int = 64) -> str:
    """DuckDB twin of ``kmv_merge``."""
    return f"list_sort(list_distinct(list_concat({a}, {b})))[1:{k}]"


def kmv_estimate_from_sql(sketch: str, k: int = 64) -> str:
    """DuckDB twin of ``kmv_estimate_from``."""
    return (
        f"CASE WHEN len({sketch}) < {k} THEN CAST(len({sketch}) AS DOUBLE) "
        f"ELSE ({k} - 1) / (CAST({sketch}[len({sketch})] AS DOUBLE) / {HASH_SPACE:.1f}) END"
    )
