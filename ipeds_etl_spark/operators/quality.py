"""Declarative data-quality checks: a rule set → one violation report.

The reference enforces its contract pointwise (PK completeness filter,
registry drift report — ``etl/core_io.py``, ``architecture.md:174``);
production pipelines at scale need the dbt-test / Deequ shape instead:
declare constraints once, evaluate them in as few passes as possible,
emit a machine-readable report that gates the load.

Execution shape (what matters at 100 TB):

* ``not_null`` / ``accepted_range`` / ``in_set`` / ``matches`` compile
  to conditional-count aggregates and run in ONE full-scan pass over
  the table, combined map-side — adding a rule adds a counter, not a
  scan.
* ``unique`` needs its own hash aggregation on the key (the only way
  to see a duplicate), one shuffle per distinct key-tuple checked.
* ``references`` (foreign key) is a left-anti join against the
  referenced key set — broadcast when the dimension is small, shuffle
  join otherwise; Catalyst decides.

Every rule contributes (rule, violations, total, passed) rows to one
report DataFrame; the report unions tiny 1-row aggregates, so the
plan stays a handful of scans regardless of rule count.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One declarative constraint. ``kind`` ∈ {not_null, unique,
    accepted_range, in_set, matches, references, custom}."""

    name: str
    kind: str
    columns: tuple[str, ...]
    params: dict = field(default_factory=dict)


def not_null(*columns: str, name: str | None = None) -> Rule:
    return Rule(name or f"not_null({','.join(columns)})", "not_null", tuple(columns))


def unique(*columns: str, name: str | None = None) -> Rule:
    return Rule(name or f"unique({','.join(columns)})", "unique", tuple(columns))


def accepted_range(
    column: str,
    lo=None,
    hi=None,
    name: str | None = None,
) -> Rule:
    return Rule(
        name or f"range({column})", "accepted_range", (column,), {"lo": lo, "hi": hi}
    )


def in_set(column: str, values: Sequence, name: str | None = None) -> Rule:
    return Rule(name or f"in_set({column})", "in_set", (column,), {"values": tuple(values)})


def matches(column: str, pattern: str, name: str | None = None) -> Rule:
    return Rule(name or f"matches({column})", "matches", (column,), {"pattern": pattern})


def references(
    column: str, other: DataFrame, other_column: str, name: str | None = None
) -> Rule:
    return Rule(
        name or f"references({column})",
        "references",
        (column,),
        {"other": other, "other_column": other_column},
    )


def custom(name: str, violation_predicate: Column) -> Rule:
    """Violation predicate: TRUE rows count as violations."""
    return Rule(name, "custom", (), {"predicate": violation_predicate})


def _scan_violation(rule: Rule) -> Column | None:
    """Violation predicate for rules evaluable in the single scan pass."""
    if rule.kind == "not_null":
        cond = F.lit(False)
        for c in rule.columns:
            cond = cond | F.col(c).isNull()
        return cond
    if rule.kind == "accepted_range":
        (c,) = rule.columns
        lo, hi = rule.params["lo"], rule.params["hi"]
        cond = F.lit(False)
        if lo is not None:
            cond = cond | (F.col(c) < F.lit(lo))
        if hi is not None:
            cond = cond | (F.col(c) > F.lit(hi))
        return cond & F.col(c).isNotNull()  # NULL is not_null's business
    if rule.kind == "in_set":
        (c,) = rule.columns
        return ~F.col(c).isin(*rule.params["values"]) & F.col(c).isNotNull()
    if rule.kind == "matches":
        (c,) = rule.columns
        return ~F.col(c).rlike(rule.params["pattern"]) & F.col(c).isNotNull()
    if rule.kind == "custom":
        return rule.params["predicate"]
    return None


def dq_report(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Evaluate every rule; returns (rule, violations, total, passed),
    one row per rule. Scan-pass rules share ONE aggregate over ``df``;
    unique/references add their own shaped jobs (see module doc)."""
    total = F.count(F.lit(1))
    scan_rules = [(r, _scan_violation(r)) for r in rules if _scan_violation(r) is not None]
    reports: list[DataFrame] = []
    if scan_rules:
        agg = df.agg(
            total.alias("__total"),
            *[
                F.sum(pred.cast("long")).alias(f"__v{i}")
                for i, (_, pred) in enumerate(scan_rules)
            ],
        )
        # one row per scan rule out of the single agg row (tiny explode)
        pairs = F.array(
            *[
                F.struct(
                    F.lit(r.name).alias("rule"),
                    F.coalesce(F.col(f"__v{i}"), F.lit(0)).alias("violations"),
                )
                for i, (r, _) in enumerate(scan_rules)
            ]
        )
        reports.append(
            agg.select(F.explode(pairs).alias("p"), F.col("__total").alias("total"))
            .select("p.rule", "p.violations", "total")
        )
    for r in rules:
        if r.kind == "unique":
            dup = (
                df.groupBy(*[F.col(c) for c in r.columns])
                .agg(F.count(F.lit(1)).alias("__n"))
                .agg(
                    F.coalesce(
                        F.sum(F.when(F.col("__n") > 1, F.col("__n")).otherwise(0)),
                        F.lit(0),
                    ).alias("violations"),
                    F.coalesce(F.sum("__n"), F.lit(0)).alias("total"),
                )
            )
            reports.append(dup.select(F.lit(r.name).alias("rule"), "violations", "total"))
        elif r.kind == "references":
            (c,) = r.columns
            other = r.params["other"].select(
                F.col(r.params["other_column"]).alias("__ref")
            ).distinct()
            viol = (
                df.select(F.col(c).alias("__fk"))
                .filter(F.col("__fk").isNotNull())
                .join(other, F.col("__fk") == F.col("__ref"), "left_anti")
                .agg(F.count(F.lit(1)).alias("violations"))
            )
            tot = df.agg(total.alias("total"))
            reports.append(
                viol.crossJoin(tot).select(F.lit(r.name).alias("rule"), "violations", "total")
            )
    if not reports:
        raise ValueError("dq_report requires at least one rule")
    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    return out.select(
        "rule",
        F.col("violations").cast("long").alias("violations"),
        F.col("total").cast("long").alias("total"),
        (F.col("violations") == 0).alias("passed"),
    )
