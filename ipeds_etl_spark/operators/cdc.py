"""Snapshot diff (change-data-capture between table versions).

Pairs with the transactional tables in ``operators/txn.py``: given any
two reads of the same table — e.g. ``read_table(path, version=3)`` vs
``read_table(path)`` — emit one row per changed primary key, tagged
``insert`` / ``delete`` / ``update``. This is the "what changed
between snapshot N and M" question every downstream consumer of a
mutable table asks (incremental view maintenance, replication,
audit), answered without any stored change log: the diff is computed
from the snapshots themselves.

Shape at 100 TB: one full-outer join on the primary key (the single
unavoidable shuffle — both sides co-partition on the same key, and
bucketed layouts make it exchange-free), with the update-vs-unchanged
test done via null-safe column comparison, so rows identical in both
snapshots are dropped before anything else happens. No window, no
driver-side state, output is O(changes).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    pk: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Keyed diff of two snapshots -> (pk..., change_type, old/new cols).

    ``change_type``: ``insert`` (pk only in ``new``), ``delete`` (only
    in ``old``), ``update`` (in both, any compared column differs under
    null-safe equality). Unchanged keys are filtered out. Column
    payload: for every compared column ``c`` the output carries
    ``old_c`` and ``new_c``.

    ``compare_cols`` defaults to every shared non-pk column. Schemas
    may differ (added/dropped columns are simply not compared).
    """
    pk = list(pk)
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(pk)]
    compare_cols = list(compare_cols)

    o = old.select(
        *[F.col(c).alias(f"__o_{c}") for c in pk],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(c).alias(f"__n_{c}") for c in pk],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    cond = None
    for c in pk:
        eq = F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
        cond = eq if cond is None else cond & eq
    joined = o.join(n, on=[cond], how="full_outer")

    changed: Column = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change_type = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    out_pk = [
        F.coalesce(F.col(f"__n_{c}"), F.col(f"__o_{c}")).alias(c) for c in pk
    ]
    return (
        joined.withColumn("change_type", change_type)
        .filter(F.col("change_type").isNotNull())
        .select(
            *out_pk,
            "change_type",
            *[f"old_{c}" for c in compare_cols],
            *[f"new_{c}" for c in compare_cols],
        )
    )
