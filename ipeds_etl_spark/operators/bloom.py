"""Bloom-filter semi-join pruning: map-side pre-filter of a huge fact
table by a compact bitmap of the qualifying dimension keys.

The 100 TB problem this solves: a semi join (``fact WHERE key IN
(SELECT key FROM dim WHERE ...)``) normally either shuffles the fact
table on the key or broadcast-hash-joins the full qualifying key set.
When the qualifying set is millions of keys, the exact hash set is too
big to broadcast cheaply — but its *Bloom filter* is a few hundred KB
and prunes (1 - fp_rate) of the fact rows before any exchange. The
surviving sliver then goes through the exact join, so false positives
never reach the result: output is IDENTICAL to the plain semi join
(the DuckDB oracle runs the plain form).

This is the same reduction Spark's own runtime row-group filtering
(`spark.sql.optimizer.runtime.bloomFilter.enabled`) performs inside
AQE; here it is an explicit, composable operator — usable across
stages, persistable alongside a snapshot, or probed in a totally
different job than the one that built it.

Construction is engine-portable and deterministic (the repo-wide
sha256-prefix ``parity_hash`` family, one salted hash per probe
function), so a filter built today matches one rebuilt from the same
keys on any engine. The bitmap itself is driver-side metadata —
``n_bits / 64`` longs, same footprint class as an IVF codebook — and
the build is one partial-aggregated pass over the dim keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ipeds_etl_spark.functions.hashing import parity_hash

#: bits per key the auto-sizer provisions (10 bits + 3 probes ≈ 1.7% fp)
_BITS_PER_KEY = 10
_MIN_BITS = 1 << 10
_MAX_BITS = 1 << 22


def _positions(key: Column, n_bits: int, n_hashes: int) -> list[Column]:
    """One salted 40-bit hash per probe function, folded into [0, n_bits)."""
    key_s = F.coalesce(key.cast("string"), F.lit("\x00null"))
    return [
        parity_hash(F.concat(F.lit(f"bloom{i}:"), key_s)) % n_bits
        for i in range(n_hashes)
    ]


def suggest_n_bits(n_keys: int) -> int:
    """Power-of-two sizing at ~10 bits/key, clamped to [2^10, 2^22]
    (2^22 bits = 64 KB of longs — still broadcast-trivial)."""
    bits = _MIN_BITS
    while bits < min(_MAX_BITS, max(1, n_keys) * _BITS_PER_KEY):
        bits <<= 1
    return bits


def build_bloom(
    df: DataFrame,
    key_col: str,
    n_bits: int | None = None,
    n_hashes: int = 3,
) -> tuple[list[int], int, int]:
    """One aggregation pass over the qualifying keys -> the filter's
    word array (``n_bits/64`` longs, driver-side metadata).

    Auto-sizes ``n_bits`` from an exact distinct-key count when not
    given. Returns ``(words, n_bits, n_hashes)``.
    """
    keys = df.select(F.col(key_col).alias("k")).distinct()
    if n_bits is None:
        n_bits = suggest_n_bits(keys.count())
    if n_bits % 64:
        raise ValueError(f"n_bits must be a multiple of 64, got {n_bits}")
    pos = F.explode(F.array(*_positions(F.col("k"), n_bits, n_hashes))).alias(
        "pos"
    )
    # PySpark's ``F.shiftleft`` only takes a Python-int shift amount;
    # the SQL form accepts an expression, so the mask goes through expr.
    words_rows = (
        keys.select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "m"
            ),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("mask"))
        .collect()
    )
    words = [0] * (n_bits // 64)
    for r in words_rows:
        words[r["w"]] = r["mask"]
    return words, n_bits, n_hashes


def bloom_probe(
    key: Column, words: list[int], n_bits: int, n_hashes: int
) -> Column:
    """Pure-codegen membership test: AND over ``n_hashes`` bit lookups
    in the literal word array. No join, no shuffle — a map-side filter
    expression (false positives possible, false negatives never)."""
    lit_words = F.lit(words)
    cond = None
    for pos in _positions(key, n_bits, n_hashes):
        word = F.element_at(lit_words, ((pos / 64).cast("int") + 1))
        bit = F.getbit(word, (pos % 64).cast("int")) == F.lit(1)
        cond = bit if cond is None else (cond & bit)
    return cond


def bloom_semi_join(
    big: DataFrame,
    big_key: str,
    small: DataFrame,
    small_key: str,
    n_bits: int | None = None,
    n_hashes: int = 3,
) -> DataFrame:
    """Semi join with Bloom pre-pruning: build the filter from
    ``small``'s keys, map-side prune ``big``, then exact
    ``left_semi`` join on the sliver. Result equals
    ``big.join(small, key, 'left_semi')`` exactly — the Bloom stage
    only removes rows the exact join would also remove."""
    words, n_bits, n_hashes = build_bloom(small, small_key, n_bits, n_hashes)
    pruned = big.filter(bloom_probe(F.col(big_key), words, n_bits, n_hashes))
    keys = small.select(F.col(small_key).alias("__bl_k")).distinct()
    return pruned.join(
        keys, on=[F.col(big_key) == F.col("__bl_k")], how="left_semi"
    )
