"""Skew mitigation: salted aggregation and salted join.

AQE's skew-join splitting (on in the engine session) handles most
runtime skew; these operators are for the cases planners can't fix:

* ``salted_agg`` — a groupBy where a handful of hot keys would pin
  single reducers. Phase 1 aggregates on (key, salt) — the hot key's
  rows spread over ``n_salts`` reducers — phase 2 re-aggregates the
  (algebraic) partials on the key alone. For sum/count/min/max the
  two-phase result is exactly the one-phase result; avg is derived as
  sum/count at the end.
* ``salted_join`` — a many-to-one equi-join whose build side is too
  big to broadcast and whose probe side has hot keys: the small side
  is replicated ``n_salts`` times (explode), the big side is salted
  deterministically, and the join key becomes (key, salt) — hot-key
  rows land on ``n_salts`` different reducers.

Salts are deterministic (hash of the whole row, mod n) so results are
reproducible run to run.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: aggregate spec name -> (phase-1 fn, phase-2 fn)
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def _salt(df: DataFrame, n_salts: int) -> F.Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)).cast("int")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column -> (spec, input column) with spec in
    {sum, count, min, max, avg}. Example::

        salted_agg(df, ["k"], {"total": ("sum", "v"), "n": ("count", "v"),
                               "mean": ("avg", "v")})
    """
    needs_avg = {out for out, (spec, _) in aggs.items() if spec == "avg"}
    phase1_specs: dict[str, tuple[str, str]] = {}
    for out, (spec, col) in aggs.items():
        if spec == "avg":
            phase1_specs[f"__{out}_sum"] = ("sum", col)
            phase1_specs[f"__{out}_cnt"] = ("count", col)
        else:
            phase1_specs[out] = (spec, col)

    salted = df.withColumn("__salt", _salt(df, n_salts))
    p1 = salted.groupBy(*keys, "__salt").agg(
        *[_ALGEBRAIC[s][0](c).alias(out) for out, (s, c) in phase1_specs.items()]
    )
    p2 = p1.groupBy(*keys).agg(
        *[_ALGEBRAIC[s][1](out).alias(out) for out, (s, _) in phase1_specs.items()]
    )
    for out in needs_avg:
        p2 = p2.withColumn(out, F.col(f"__{out}_sum") / F.col(f"__{out}_cnt"))
    return p2.drop(*[c for c in p2.columns if c.startswith("__")])


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big (skewed) side salted and the small side
    replicated ``n_salts``×. Output columns = big ∪ (small − keys),
    like a plain ``join(on=...)``.

    Only join types where the replicated small side cannot surface as
    output rows on its own are allowed: under right/full the n_salts
    copies of unmatched small rows would each emit a null-extended
    duplicate."""
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti", "semi", "anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports how in {sorted(allowed)}, got {how!r}: "
            "right/full would duplicate unmatched small-side rows n_salts times"
        )
    b = big.withColumn("__salt", _salt(big, n_salts))
    s = small.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    out = b.join(s, [*on, "__salt"], how)
    return out.drop("__salt")
