"""Mergeable quantile sketch — hash-level sampling with deterministic
compaction (the missing order-statistics member of the sketch family
next to HLL / CMS / KMV / Misra-Gries in ``operators/sketches.py``).

Construction (the sampler tier of the KLL family — Karnin, Lan &
Liberty, FOCS 2016 §2.1 run a coin-flip sampler below their
compactors; mergeable-summaries framing per Agarwal et al. PODS 2012):
every row gets a LEVEL = number of trailing zero bits of its
``parity_hash`` (geometric: P(level ≥ ℓ) = 2^-ℓ exactly on the uniform
40-bit hash space). The sketch of a key retains the rows with
``level ≥ L`` where ``L`` is the smallest ℓ whose retained count is
≤ k — i.e. a coordinated 2^-L row sample of EXACTLY the nested-family
kind, plus the exact row count n. Estimated rank of v =
2^L · |{retained ≤ v}|; the q-quantile readout is the smallest
retained value whose estimated rank reaches ⌈q·n⌉. Standard sampling
guarantee: rank error O(√(n·2^L)) ≈ n/√k w.h.p. — weaker than full
KLL's O(n/k) but one pass, O(k) state, and EXACTLY mergeable:

    retention sets are nested (level ≥ ℓ+1 ⊂ level ≥ ℓ), so the merge
    of sketches A, B is: union the retained rows, start from
    L₀ = max(L_A, L_B), raise L to the smallest ℓ ≥ L₀ with ≤ k
    survivors. Because every corpus row with level ≥ max(L_parts)
    survives in its part, the merged sketch is BIT-IDENTICAL to the
    sketch built over the whole corpus in one shot (test:
    ``test_wave14_ops::test_qsketch_mergeable``) — not merely
    statistically equivalent.

Everything is deterministic (house ``parity_hash``) and replayable in
DuckDB SQL: trailing zeros come from the ``h & -h`` lowbit and an
integer floor-log2 (binary-string length — the ``docs_bigram_lm_ppl``
trick), so the registered query gets a full value-hash oracle, unlike
a randomized sketch. The streaming twin
(``streaming/stateful.py::quantile_sketch_stream``) applies the same
rule incrementally: append the batch, raise L while over capacity —
state is O(k) per key and the final state equals the batch sketch.

100 TB shape: the level histogram is one map-combinable exchange of
O(keys · 41) rows; picking L is a window over that metadata-sized
frame; retention is a broadcast-join filter (the corpus is scanned,
never shuffled on a data-sized key); all quantile arithmetic runs on
≤ k rows per key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ipeds_etl_spark.functions.hashing import parity_hash, parity_hash_sql

#: bits in the parity-hash space; a zero hash has "40 trailing zeros"
HASH_BITS = 40
#: default sketch capacity (retained rows per key)
DEFAULT_K = 256
#: hash salt — fixed so batch, streaming, and oracle agree
SALT = "qsk|"


def ctz(id_col: Column) -> Column:
    """Trailing-zero count of ``parity_hash(SALT || id)`` — the row's
    sampling level. ``h & -h`` isolates the lowest set bit; its
    floor-log2 via binary-string length is pure integer arithmetic on
    both engines; h = 0 maps to the full hash width."""
    h = parity_hash(F.concat(F.lit(SALT), id_col.cast("string")))
    lowbit = h.bitwiseAND(-h)
    return F.when(h == 0, F.lit(HASH_BITS)).otherwise(
        (F.length(F.conv(lowbit.cast("string"), 10, 2)) - 1).cast("long")
    )


def ctz_sql(id_expr: str) -> str:
    """DuckDB twin of :func:`ctz` (``id_expr`` must be VARCHAR)."""
    h = parity_hash_sql(f"'{SALT}' || {id_expr}")
    return (
        f"CASE WHEN {h} = 0 THEN {HASH_BITS} "
        f"ELSE length(to_base(({h}) & -({h}), 2)) - 1 END"
    )


def pick_level(
    leveled: DataFrame, key_cols: Sequence[str], k: int = DEFAULT_K
) -> DataFrame:
    """Per-key sketch level from a frame carrying ``ctz``: the
    smallest L with |{ctz ≥ L}| ≤ k.
    Output: key cols + ``lev``. The histogram is one map-combinable
    exchange; the suffix-count window runs over ≤ 41 rows per key."""
    return _levels_from_hist(leveled, key_cols, k).select(
        *key_cols, "lev"
    )


def _levels_from_hist(
    leveled: DataFrame, key_cols: Sequence[str], k: int
) -> DataFrame:
    """Level AND total count from ONE pass: the histogram that sizes
    the level also carries n as Σcnt, so no second corpus scan is paid
    for the count (caught at the r11 sf1 sweep: the count join doubled
    the hashed scans). Output: key cols + (lev, n)."""
    keys = list(key_cols)
    hist = leveled.groupBy(*keys, "ctz").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("ctz").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ge = hist.withColumn("ge_c", F.sum("cnt").over(w))
    lev = F.coalesce(
        F.max(F.when(F.col("ge_c") > k, F.col("ctz") + 1)), F.lit(0)
    ).cast("long")
    return ge.groupBy(*keys).agg(
        lev.alias("lev"), F.sum("cnt").cast("long").alias("n")
    )


def quantile_sketch(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    id_col: str,
    k: int = DEFAULT_K,
) -> tuple[DataFrame, DataFrame]:
    """Build the sketch: returns ``(retained, levels)`` where
    ``retained`` = key cols + (value, id, ctz) rows with ctz ≥ L and
    ``levels`` = key cols + (lev, n). ``levels`` is metadata-sized and
    broadcast onto the corpus for the retention filter. Both outputs
    are eagerly materialized (``localCheckpoint``) — they are O(keys)
    and O(k·keys) rows, and every downstream consumer (quantile
    readout, retained-count, audit, merge) would otherwise re-run the
    hash-ctz corpus scans per consumer (measured at the r11 sf1 sweep:
    the un-checkpointed plan paid ~6 hashed scans for 3 of work)."""
    keys = list(key_cols)
    lv = df.select(
        *keys,
        F.col(value_col).alias("value"),
        F.col(id_col).alias("id"),
        ctz(F.col(id_col)).alias("ctz"),
    )
    levels = _levels_from_hist(lv, keys, k).localCheckpoint()
    retained = (
        lv.join(F.broadcast(levels.select(*keys, "lev")), keys)
        .filter(F.col("ctz") >= F.col("lev"))
        .drop("lev")
        .localCheckpoint()
    )
    return retained, levels


def merge_sketches(
    parts: Sequence[tuple[DataFrame, DataFrame]],
    key_cols: Sequence[str],
    k: int = DEFAULT_K,
) -> tuple[DataFrame, DataFrame]:
    """Merge per-part sketches (as produced by :func:`quantile_sketch`)
    into one: union retained rows, floor the level at max(part levels),
    re-raise until ≤ k survive, filter. Exact: equals the one-shot
    sketch of the concatenated input (nested retention sets)."""
    keys = list(key_cols)
    union_ret = parts[0][0]
    union_lvl = parts[0][1]
    for ret, lvl in parts[1:]:
        union_ret = union_ret.unionByName(ret)
        union_lvl = union_lvl.unionByName(lvl)
    floors = union_lvl.groupBy(*keys).agg(
        F.max("lev").alias("floor_lev"), F.sum("n").cast("long").alias("n")
    )
    lv = union_ret.select(*keys, "value", "id", "ctz")
    # smallest ℓ ≥ floor with ≤ k survivors == max(floor, unconstrained
    # smallest ℓ): ge(ℓ) is non-increasing, so if an ℓ below the floor
    # already satisfies the bound, the floor itself does too.
    levels = (
        pick_level(lv, keys, k)
        .join(floors, keys)
        .select(
            *keys,
            F.greatest(F.col("lev"), F.col("floor_lev")).alias("lev"),
            "n",
        )
        .localCheckpoint()
    )
    retained = (
        lv.join(F.broadcast(levels.select(*keys, "lev")), keys)
        .filter(F.col("ctz") >= F.col("lev"))
        .drop("lev")
        .localCheckpoint()
    )
    return retained, levels


def sketch_quantiles(
    retained: DataFrame,
    levels: DataFrame,
    key_cols: Sequence[str],
    q_permilles: Sequence[int],
) -> DataFrame:
    """Quantile readout: for each q (in permille), the smallest
    retained value whose estimated rank 2^L·rank reaches ⌈q·n/1000⌉,
    falling back to the retained max when the sample's total estimated
    mass undershoots n. Runs entirely on the ≤ k-row-per-key retained
    frame. Output: key cols + ``est_p{q}`` columns."""
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy("value", "id")
    rk = (
        retained.join(F.broadcast(levels), keys)
        .withColumn("rn", F.row_number().over(w))
        .withColumn(
            "est_rank",
            F.col("rn")
            * F.expr("shiftleft(CAST(1 AS BIGINT), CAST(lev AS INT))"),
        )
    )
    aggs = []
    for q in q_permilles:
        # integer ceil(q*n/1000): (q*n + 999) div 1000
        target = F.expr(f"(n * {q} + 999) div 1000")
        aggs.append(
            F.coalesce(
                F.min(F.when(F.col("est_rank") >= target, F.col("value"))),
                F.max("value"),
            ).alias(f"est_p{q}")
        )
    return rk.groupBy(*keys).agg(*aggs)
