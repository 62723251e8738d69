"""Brute-force recomputation guards for the round-5 TPC-H shapes.

Each test collects the tiny sf0.001 tables and recomputes the query's
answer with plain Python (dicts and loops — no SQL engine at all),
then compares against the registered Spark query. This is a third,
engine-free derivation of the semantics, alongside the Spark plan and
the DuckDB oracle.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from decimal import Decimal

from ipeds_etl_spark import queries as q
from ipeds_etl_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    return [r.asDict() for r in load_table(spark, SF, name).collect()]


def test_customer_order_distribution_recompute(spark):
    customers = _rows(spark, "customer")
    orders = _rows(spark, "orders")
    per_cust = {c["c_custkey"]: 0 for c in customers}
    for o in orders:
        if o["o_orderpriority"] != "1-URGENT" and o["o_custkey"] in per_cust:
            per_cust[o["o_custkey"]] += 1
    dist = Counter(per_cust.values())
    got = {
        (r["c_count"], r["custdist"])
        for r in q.queries()["customer_order_distribution"](spark, SF).collect()
    }
    assert got == {(k, v) for k, v in dist.items()}


def test_suppliers_dominant_parts_recompute(spark):
    li = _rows(spark, "lineitem")
    sup = {s["s_suppkey"]: s["s_name"] for s in _rows(spark, "supplier")}
    per_pair: dict = defaultdict(Decimal)
    per_part: dict = defaultdict(Decimal)
    for r in li:
        qty = Decimal(str(r["l_quantity"]))
        per_pair[(r["l_suppkey"], r["l_partkey"])] += qty
        per_part[r["l_partkey"]] += qty
    counts: Counter = Counter()
    for (sk, pk), s in per_pair.items():
        if s * 6 > per_part[pk]:
            counts[sup[sk]] += 1
    got = {
        (r["s_name"], r["n_dominant_parts"])
        for r in q.queries()["suppliers_dominant_parts"](spark, SF).collect()
    }
    assert got == {(name, n) for name, n in counts.items()}


def test_parts_cheapest_supplier_recompute(spark):
    li = _rows(spark, "lineitem")
    parts10 = {p["p_partkey"] for p in _rows(spark, "part") if p["p_size"] == 10}
    sup = {s["s_suppkey"]: s["s_name"] for s in _rows(spark, "supplier")}
    best: dict = {}
    for r in li:
        key = (r["l_partkey"], r["l_suppkey"])
        price = Decimal(str(r["l_extendedprice"]))
        if key not in best or price < best[key]:
            best[key] = price
    part_min: dict = {}
    for (pk, _), price in best.items():
        if pk not in part_min or price < part_min[pk]:
            part_min[pk] = price
    want = {
        (pk, sup[sk], float(price))
        for (pk, sk), price in best.items()
        if pk in parts10 and price == part_min[pk]
    }
    got = {
        (r["p_partkey"], r["s_name"], r["best_price"])
        for r in q.queries()["parts_cheapest_supplier"](spark, SF).collect()
    }
    assert got == want


def test_top_supplier_by_revenue_recompute(spark):
    li = _rows(spark, "lineitem")
    sup = {s["s_suppkey"]: s["s_name"] for s in _rows(spark, "supplier")}
    rev: dict = defaultdict(Decimal)
    lo, hi = "1996-01-01", "1996-04-01"
    for r in li:
        d = str(r["l_shipdate"])[:10]
        if lo <= d < hi:
            ep = Decimal(str(r["l_extendedprice"])).quantize(Decimal("0.000001"))
            dc = Decimal(str(r["l_discount"])).quantize(Decimal("0.000001"))
            rev[r["l_suppkey"]] += (ep * (1 - dc)).quantize(Decimal("0.000001"))
    top = max(rev.values())
    want = {(sk, sup[sk], float(v)) for sk, v in rev.items() if v == top}
    got = {
        (r["s_suppkey"], r["s_name"], r["total_rev"])
        for r in q.queries()["top_supplier_by_revenue"](spark, SF).collect()
    }
    assert got == want


def test_customers_large_orders_recompute(spark):
    li = _rows(spark, "lineitem")
    orders = {o["o_orderkey"]: o for o in _rows(spark, "orders")}
    cust = {c["c_custkey"]: c["c_name"] for c in _rows(spark, "customer")}
    qty: dict = defaultdict(Decimal)
    for r in li:
        qty[r["l_orderkey"]] += Decimal(str(r["l_quantity"]))
    big = {ok for ok, s in qty.items() if s > 300}
    rows = []
    for ok in big:
        o = orders[ok]
        rows.append(
            (
                cust[o["o_custkey"]],
                o["o_custkey"],
                ok,
                str(o["o_orderdate"])[:10],
                o["o_totalprice"],
                float(qty[ok]),
            )
        )
    rows.sort(key=lambda t: (-t[4], t[2]))
    want = rows[:100]
    got = [
        (
            r["c_name"], r["c_custkey"], r["o_orderkey"], r["orderdate"],
            r["totalprice"], r["sum_qty"],
        )
        for r in q.queries()["customers_large_orders"](spark, SF).collect()
    ]
    assert got == want
