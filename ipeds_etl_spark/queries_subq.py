"""Correlated-subquery decorrelation family + window FRAME surface.

TPC-H shapes the relational layer had not yet exercised:

* Q17 — correlated SCALAR aggregate subqueries (per-part average
  quantity), written as literal SQL on the Spark side so Catalyst's
  decorrelation (RewriteCorrelatedScalarSubquery → aggregate + join)
  is what plans it, not a hand-built join.
* Q21 — EXISTS / NOT EXISTS chains with non-equi correlation
  (``<>`` on the supplier inside the same order), the left-semi /
  left-anti planning shape.
* Q22 — an uncorrelated scalar subquery (global average balance)
  gating an anti-join ("idle high-balance customers").
* A time-based RANGE window frame (trailing 30 days), the one frame
  type the window family (``customer_order_window_funcs``) did not
  cover — ROWS frames count rows, RANGE frames bound the *ordering
  value*, and Spark plans them differently (RangeFrame vs RowFrame
  in the Window physical operator).

Cross-engine exactness follows the house rules: money sums in
DECIMAL(18,6) with one final cast/division, the Q17 threshold
comparison is cross-multiplied (``5 * qty * cnt < sum``) so neither
engine divides, dates are compared in UTC and emitted as formatted
strings. The reference delegates all of this to Postgres (every
query in ``etl/core_io.py`` / the notebooks is a SQL string); this
module is where the engine proves the equivalent declarative surface
plans well under Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ipeds_etl_spark.queries import _register
from ipeds_etl_spark.sources.tables import load_table

_DEC = "decimal(18,6)"


# ===========================================================================
# TPC-H Q17 shape: small-quantity-order revenue (correlated scalar subquery)
# ===========================================================================
@_register(
    "lineitem_small_qty_revenue",
    """
    SELECT p.p_brand,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0
                AS DOUBLE) AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_small
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand IN ('Brand#1', 'Brand#2')
      AND CAST(l.l_quantity AS DECIMAL(18,6)) * 5
          * (SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
        < (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,6)))
           FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    GROUP BY p.p_brand
    ORDER BY p.p_brand
    """,
)
def q_lineitem_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape, deliberately written as SQL WITH the correlated
    scalar subqueries intact: Catalyst decorrelates each ``(SELECT agg
    ... WHERE l2.l_partkey = l.l_partkey)`` into a partkey-grouped
    aggregate joined back on the equality — the textbook
    RewriteCorrelatedScalarSubquery plan (one extra shuffle on
    l_partkey, shared by both subqueries after dedup). The "quantity
    below 20% of the part's average" threshold is cross-multiplied
    (``5 * qty * cnt < sum``) so the comparison is exact decimal
    arithmetic — no division, no float, hash-identical on any engine.
    Scale: the subquery aggregate is map-side combinable per partkey;
    the brand filter pushes to the part scan and prunes the probe side
    before the join."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("q17_lineitem")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("q17_part")
    return spark.sql(
        """
        SELECT p.p_brand,
               CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0
                    AS DOUBLE) AS avg_yearly,
               COUNT(*) AS n_small
        FROM q17_lineitem l JOIN q17_part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand IN ('Brand#1', 'Brand#2')
          AND CAST(l.l_quantity AS DECIMAL(18,6)) * 5
              * (SELECT COUNT(*) FROM q17_lineitem l2
                 WHERE l2.l_partkey = l.l_partkey)
            < (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,6)))
               FROM q17_lineitem l2 WHERE l2.l_partkey = l.l_partkey)
        GROUP BY p.p_brand
        ORDER BY p.p_brand
        """
    )


# ===========================================================================
# TPC-H Q21 shape: suppliers who were the ONLY late shipper of an order
# ===========================================================================
@_register(
    "supplier_late_only_orders",
    """
    WITH late AS (
      SELECT DISTINCT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE l_shipdate > o_orderdate + INTERVAL 80 DAY
    ),
    cand AS (
      SELECT l1.l_orderkey, l1.l_suppkey FROM late l1
      WHERE EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM late l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey)
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM cand JOIN supplier ON s_suppkey = l_suppkey
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q_supplier_late_only_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (lateness = shipped >80 days after the order
    date, the only date pair this schema carries): for each late
    (order, supplier) pair keep it only if the order involved ANOTHER
    supplier and NO other supplier was late on it.

    Both correlated subqueries fold into per-ORDER aggregates instead
    of semi/anti joins over the pair stream (opt r13, guide §2.3/2.4 —
    the join spelling re-ran the late join+distinct subtree on the
    anti-probe side and shuffled the full lineitem pair stream for the
    semi probe; 18 exchanges / 10 joins / 12 scans in the plan):

    * NOT EXISTS (another LATE supplier) ⇔ the order's distinct late-
      supplier count is 1 — a count on the late table, keeping the one
      supplier via ``min`` (with exactly one distinct value, min IS it).
    * EXISTS (another supplier, late or not) ⇔ min/max of the order's
      lineitem suppliers differ from the late supplier — min/max are
      map-combinable, so the lineitem exchange carries one row per
      order instead of every pair, and no second scan of ``late``.

    Both aggregates key on l_orderkey, so the candidate join reuses
    their partitioning; top-20 is TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 80 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    solo = (
        late.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("__nl"),
            F.min("l_suppkey").alias("l_suppkey"),
        )
        .filter(F.col("__nl") == 1)
        .select("l_orderkey", "l_suppkey")
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.min("l_suppkey").alias("__mn"), F.max("l_suppkey").alias("__mx")
    )
    cand = (
        solo.join(per_order, "l_orderkey")
        .filter(
            (F.col("__mn") != F.col("l_suppkey"))
            | (F.col("__mx") != F.col("l_suppkey"))
        )
        .select("l_orderkey", "l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        cand.join(F.broadcast(s), cand.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# ===========================================================================
# TPC-H Q22 shape: idle high-balance customers (global scalar + anti join)
# ===========================================================================
_Q22_CUTOFF = "2000-01-01 00:00:00"


@_register(
    "customers_idle_high_balance",
    f"""
    WITH ab AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS v
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey AS nationkey,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
    FROM customer, ab
    WHERE c_acctbal > ab.v
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '{_Q22_CUTOFF}')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def q_customers_idle_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers whose balance beats the positive-
    balance average but who placed no order since 2000 — per-nation
    count + total balance. The global average is a 1-row aggregate
    broadcast into the filter (the DataFrame twin of an uncorrelated
    scalar subquery — Catalyst plans the SQL form identically); the
    "no recent order" test is a left-anti join whose date predicate is
    pushed INTO the orders scan, so the anti side is the pruned subset,
    not the whole table. Average = exact decimal sum, ONE IEEE
    division — deterministic on both engines."""
    c = load_table(spark, sf_dir, "customer")
    avg_row = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast(_DEC)).cast("double")
                / F.count(F.lit(1))
            ).alias("v")
        )
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(_Q22_CUTOFF).cast("timestamp"))
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(avg_row))
        .filter(F.col("c_acctbal") > F.col("v"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast(_DEC)).cast("double").alias("totacctbal"),
        )
        .orderBy("nationkey")
    )


# ===========================================================================
# Time-based RANGE window frame: trailing 30-day spend per customer
# ===========================================================================
@_register(
    "orders_trailing_30d_spend",
    """
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE) AS t30_spend,
           CAST(COUNT(*) OVER w AS BIGINT) AS t30_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE)
                / (COUNT(*) OVER w) AS DOUBLE) AS t30_avg
    FROM orders
    WHERE o_custkey % 50 = 0
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY epoch_us(o_orderdate)
                 RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW)
    """,
)
def q_orders_trailing_30d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 30-DAY revenue per customer — a true RANGE frame over
    event time (``rangeBetween`` on exact epoch MICROS — the
    ``unix_micros``/``epoch_us`` parity pair, since DuckDB ``epoch()``
    is fractional while Spark ``unix_timestamp`` truncates), not
    a ROWS frame: the frame holds however many orders landed in the
    last 30 days, zero or many, and same-timestamp peers are all
    included (RANGE peer semantics, identical in both engines under
    the UTC session). This is the time-series primitive behind
    trailing-revenue / rolling-MAU metrics; physically one shuffle on
    o_custkey + one sort, with the running frame maintained
    incrementally by Spark's sliding WindowExec (add/remove at the
    frame edges — O(n) per partition, not O(n·frame))."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 50 == 0)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_micros(F.col("o_orderdate").cast("timestamp")))
        .rangeBetween(-30 * 86400 * 1_000_000, 0)
    )
    spend = F.sum(F.col("o_totalprice").cast(_DEC)).over(w).cast("double")
    cnt = F.count(F.lit(1)).over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        spend.alias("t30_spend"),
        cnt.alias("t30_orders"),
        (spend / cnt).alias("t30_avg"),
    )


# ===========================================================================
# Correlated LATERAL subquery: per-customer top-N without a window
# ===========================================================================
@_register(
    "customer_lateral_top_orders",
    """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    WHERE c.c_custkey % 20 = 0
    """,
)
def q_customer_lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per customer expressed as a correlated LATERAL
    subquery (ORDER BY + LIMIT inside the lateral body) — the SQL:2003
    surface Spark added lateral-subquery decorrelation for: Catalyst
    rewrites the per-row subquery into a ranked join, so it executes
    as one shuffle, not one subquery per customer row. The window-
    function formulation of the same problem is ``nation_top2_
    customers``; this pins the OTHER spelling end-to-end (DuckDB runs
    the identical text). Total (price DESC, orderkey) order makes the
    LIMIT deterministic cross-engine."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("lat_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("lat_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM lat_customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM lat_orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        WHERE c.c_custkey % 20 = 0
        """
    )


# ===========================================================================
# Source-mixing weights: temperature-scaled sampling for pretraining mixes
# ===========================================================================
@_register(
    "docs_mixture_weights",
    """
    WITH per AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source),
    tot AS (
      SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total,
             list_reduce(list(sqrt(CAST(n_docs AS DOUBLE)) ORDER BY source),
                         (x, y) -> x + y) AS denom
      FROM per)
    SELECT source, n_docs,
           CAST(n_docs AS DOUBLE) / n_total AS share,
           sqrt(CAST(n_docs AS DOUBLE)) / denom AS samp_prob,
           (sqrt(CAST(n_docs AS DOUBLE)) / denom)
             / (CAST(n_docs AS DOUBLE) / n_total) AS dup_factor
    FROM per CROSS JOIN tot
    ORDER BY source
    """,
)
def q_docs_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (τ=2, i.e. p_s ∝ √share — the
    multilingual/multi-corpus rebalancing rule from mBERT/XLM-R data
    recipes): per source, its natural share, its τ-scaled sampling
    probability, and the per-doc duplication factor a sampler must
    apply (>1 = upsample the small source). √ at τ=2 keeps every op
    IEEE-exact — no pow/exp. The cross-source normalizer is a fold
    over the source-sorted list (20 elements) so float summation
    order is pinned on both engines; everything else is map-side
    combinable counts + one broadcastable 1-row join — the 100 TB
    shape is one count-shuffle on source."""
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    sq = lambda c: F.sqrt(c.cast("double"))  # noqa: E731
    tot = per.agg(
        F.sum("n_docs").alias("n_total"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("source", "n_docs"))),
            F.lit(0.0),
            lambda acc, s: acc + F.sqrt(s["n_docs"].cast("double")),
        ).alias("denom"),
    )
    share = F.col("n_docs").cast("double") / F.col("n_total")
    prob = sq(F.col("n_docs")) / F.col("denom")
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            share.alias("share"),
            prob.alias("samp_prob"),
            (prob / share).alias("dup_factor"),
        )
        .orderBy("source")
    )


# ===========================================================================
# Linear quality filter: model inference as a columnar expression
# ===========================================================================
def _register_quality_logit() -> None:
    from ipeds_etl_spark.functions import text as TX
    from ipeds_etl_spark.queries_ext import _STOP_PAT, _WS_TOKENS

    w0, w_tok, w_stop, w_mtl = -2.0, 0.03, 3.0, -0.2

    @_register(
        "docs_quality_logit",
        f"""
        WITH t AS (
          SELECT doc_id, text, {_WS_TOKENS.format(x='text')} AS w FROM documents),
        f AS (
          SELECT doc_id,
                 CAST(len(w) AS BIGINT) AS n_tokens,
                 CAST(len(regexp_extract_all(text, '{_STOP_PAT}')) AS DOUBLE) / len(w) AS stopword_ratio,
                 CAST(list_sum(list_transform(w, s -> len(s))) AS DOUBLE) / len(w) AS mean_token_len
          FROM t)
        SELECT doc_id, n_tokens, stopword_ratio, mean_token_len,
               ((({w0} + {w_tok} * CAST(n_tokens AS DOUBLE))
                 + {w_stop} * stopword_ratio)
                + {w_mtl} * mean_token_len) AS logit,
               ((({w0} + {w_tok} * CAST(n_tokens AS DOUBLE))
                 + {w_stop} * stopword_ratio)
                + {w_mtl} * mean_token_len) > 0 AS keep
        FROM f
        """,
    )
    def q_docs_quality_logit(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Linear quality-filter inference (the fastText/CCNet-style
        pretraining gate) compiled to a columnar expression: score =
        w·features over the exact quality signals, keep = score > 0.
        No UDF, no model runtime — a trained linear model's weights
        are just literals in whole-stage codegen, which is how a
        100 TB quality pass should ship: map-only, zero shuffle.
        Feature ratios are single double divisions of exact counts
        and the dot product is a fixed left-fold, so the oracle
        reproduces every bit. Weights here are fixed stand-ins
        (swap in trained ones without changing the plan shape)."""
        d = load_table(spark, sf_dir, "documents")
        toks = TX.tokens(F.col("text"))
        d = d.select("doc_id", "text", toks.alias("toks"))
        m = TX.quality_metrics(F.col("text"), toks=F.col("toks"))
        n_tok = m["n_tokens"]
        stop_ratio = m["n_stopwords"].cast("double") / n_tok
        logit = (
            (
                (F.lit(w0) + F.lit(w_tok) * n_tok.cast("double"))
                + F.lit(w_stop) * stop_ratio
            )
            + F.lit(w_mtl) * m["mean_token_len"]
        )
        return d.select(
            "doc_id",
            n_tok.alias("n_tokens"),
            stop_ratio.alias("stopword_ratio"),
            m["mean_token_len"].alias("mean_token_len"),
            logit.alias("logit"),
            (logit > 0).alias("keep"),
        )


_register_quality_logit()


# ===========================================================================
# Global row numbering without the single-task sort
# ===========================================================================
@_register(
    "orders_global_rownum",
    """
    SELECT o_orderkey,
           CAST(row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS BIGINT)
             AS row_num
    FROM orders
    """,
)
def q_orders_global_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (o_orderdate, o_orderkey)-order row numbers via the
    two-phase range-partitioned form (``layout.global_row_number``) —
    NEVER the ``Window.orderBy`` spelling, whose plan funnels the
    whole table through one task (``Exchange SinglePartition``; the
    test pins its absence here). Same answer, all-parallel stages:
    range exchange + per-partition ranks + an O(partitions) offset
    collect. The oracle is the naive window — the equivalence IS the
    point."""
    from ipeds_etl_spark.operators.layout import global_row_number

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return global_row_number(o, ["o_orderdate", "o_orderkey"]).select(
        "o_orderkey", "row_num"
    )


# ===========================================================================
# VARIANT semi-structured type (Spark 4) — dual of the string-path form
# ===========================================================================
@_register(
    "events_props_variant",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same per-type JSON-field aggregate as ``json_extract_agg``,
    but through Spark 4's VARIANT type: ``parse_json`` converts the
    props string ONCE into the binary variant encoding, and
    ``try_variant_get`` extracts typed fields without re-parsing —
    the open-format answer to string-path extraction, which re-parses
    the JSON text per ``get_json_object`` call. Same oracle semantics
    (DuckDB's JSON type plays the variant role there); the dual-form
    equivalence is the driver gate's job. At scale the parse cost is
    paid once per row however many fields you pull, and a variant
    column stored in Parquet can be shredded for pushdown."""
    e = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.try_variant_get(v, "$.k", "bigint")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


# ===========================================================================
# Recursive CTE (Spark 4): bounded multi-hop graph reachability
# ===========================================================================
_RCTE_SQL = """
    WITH RECURSIVE items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS key_a, b.l_partkey AS key_b
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2),
    e AS (SELECT key_a AS s, key_b AS d FROM pairs
          UNION ALL SELECT key_b, key_a FROM pairs),
    seeds AS (SELECT DISTINCT s AS seed FROM e WHERE s % 100 = 0),
    walk(seed, node, depth) AS (
      SELECT seed, seed, 0 FROM seeds
      UNION ALL
      SELECT w.seed, e.d, w.depth + 1
      FROM walk w JOIN e ON e.s = w.node
      WHERE w.depth < 3
    )
    SELECT seed, CAST(count(DISTINCT node) - 1 AS BIGINT) AS n_reachable_3hop
    FROM walk GROUP BY seed ORDER BY seed
    """


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric co-purchase edge list (s, d): part pairs sharing ≥ 2
    orders, both directions, materialized once (``localCheckpoint``) —
    a recursive CTE re-evaluates referenced CTEs each round, and the
    iterative BFS twin re-joins it per level."""
    from ipeds_etl_spark.queries_ext import _basket_items

    items = _basket_items(spark, sf_dir)
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("key_a"), F.col("b.l_partkey").alias("key_b")
        )
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .filter(F.col("pair_n") >= 2)
    )
    return (
        pairs.select(F.col("key_a").alias("s"), F.col("key_b").alias("d"))
        .unionByName(pairs.select(F.col("key_b").alias("s"), F.col("key_a").alias("d")))
        .localCheckpoint(eager=False)
    )


@_register("parts_copurchase_3hop", _RCTE_SQL)
def q_parts_copurchase_3hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts reachable within 3 co-purchase hops of each seed part —
    Spark 4's RECURSIVE CTE surface, exercised inside its current
    limits: recursion must be UNION ALL (the distinct-union form that
    would terminate on cycles is not supported yet —
    UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE, checked this round), so
    termination comes from the explicit depth bound and dedup happens
    once, in the final DISTINCT aggregate. Path multiplicity is
    bounded by deg³ per seed (this graph: max degree 13). For
    unbounded-diameter closure the DataFrame-iterative components
    operators remain the scale path; this query pins the declarative
    spelling end-to-end against DuckDB's identical recursion.

    SCALE CONTRACT (measured r9): UNION ALL recursion enumerates
    PATHS, O(deg³) per seed — on the 10×-denser sf1 graph that
    exceeds Spark's 1M-row cteRecursionRowLimit. The scale path is
    the level-synchronous frontier-dedup twin
    (``parts_copurchase_3hop_bfs``), registered with the SAME oracle;
    this form stays as the declarative API demo at its documented
    sparse-graph scale."""
    edges = _copurchase_edges(spark, sf_dir)
    edges.createOrReplaceTempView("rcte_edges")
    return spark.sql(
        """
        WITH RECURSIVE seeds AS (
          SELECT DISTINCT s AS seed FROM rcte_edges WHERE s % 100 = 0),
        walk(seed, node, depth) AS (
          SELECT seed, seed, 0 FROM seeds
          UNION ALL
          SELECT w.seed, e.d, w.depth + 1
          FROM walk w JOIN rcte_edges e ON e.s = w.node
          WHERE w.depth < 3
        )
        SELECT seed, CAST(count(DISTINCT node) - 1 AS BIGINT) AS n_reachable_3hop
        FROM walk GROUP BY seed ORDER BY seed
        """
    )


@_register("parts_copurchase_3hop_bfs", _RCTE_SQL)
def q_parts_copurchase_3hop_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-synchronous BFS twin of ``parts_copurchase_3hop``
    (VERDICT r9 item 3) — same output contract (depth-bounded
    reachability count per seed), same DuckDB oracle, but the
    DataFrame-iterative form that survives dense graphs.

    SEED-BITMAP spelling (opt r14, VERDICT r13 item 5; guide §8
    "shuffle keys and metadata instead of payloads" + §2.3): the former
    (seed, node) frontier rows made the level-3 expansion the single
    heaviest sf1 stage measured this round — frontier₂ ⋈ edges emitted
    ~240M pair rows whose duplicates mostly cross partitions, so the
    distinct's partial aggregate deduped little and the exchange
    carried nearly all of them (813 of 1188 task-seconds at 32 cores,
    no skew — pure volume). Seeds are multiples of 100, so a seed maps
    to a dense index ``seed div 100`` and the per-node REACHING-SEED
    SET becomes (node, word, bits) rows — one BIGINT carries 64 seeds.
    One BFS round is then: join the bitmap frame to edges on s,
    bitwise-OR per (d, word) (``bit_or`` — idempotent, so map-side
    partial aggregation dedupes REGARDLESS of partitioning, exactly
    what the (seed, node) distinct could not do), and OR the result
    into the previous frame via a full-outer co-keyed merge. No
    distinct, no anti-join, no (seed, node) materialization at any
    level; per-round rows are bounded by nodes × ceil(seeds/64).

    The readout is exact integer bit-counting: per word, 64 codegen'd
    conditional sums ((bits >> b) & 1 — arithmetic shift is safe under
    the & 1 mask) give each seed's reachable count; count includes the
    seed itself, so n_reachable = count − 1 as before. Identical rows
    to the frontier-dedup spelling (unit-pinned against it and against
    brute force), same DuckDB oracle.

    Scale shape: 3 × (shuffle_hash join on s + one bit_or aggregate +
    one co-keyed outer merge), every join pinned (both sides scale
    with the graph; AQE's compressed-bytes estimates are the measured
    defect class), each round's frame lineage-truncated."""
    return _bfs3_seed_counts(_copurchase_edges(spark, sf_dir))


def _bfs3_seed_counts(edges: DataFrame) -> DataFrame:
    """Seed-bitmap 3-hop BFS over an (s, d) edge frame; seeds are the
    sources divisible by 100 (their ``div 100`` index packs into
    64-seed BIGINT words). Factored from the registered query so the
    bit arithmetic is unit-testable on synthetic graphs whose seed
    indices cross word boundaries."""
    seeds = (
        edges.filter(F.col("s") % 100 == 0)
        .select(F.col("s").alias("seed"))
        .distinct()
    )
    reach = seeds.select(
        F.col("seed").alias("node"),
        F.expr("cast((seed div 100) div 64 as int)").alias("word"),
        F.expr("shiftleft(cast(1 as bigint), cast((seed div 100) % 64 as int))").alias(
            "bits"
        ),
    ).localCheckpoint(eager=False)
    for _ in range(3):
        expanded = (
            reach.join(edges.hint("shuffle_hash"), reach["node"] == edges["s"])
            .select(F.col("d").alias("node"), "word", "bits")
            .groupBy("node", "word")
            .agg(F.bit_or("bits").alias("bits"))
        )
        merged = (
            reach.withColumnRenamed("bits", "b0")
            .join(
                expanded.withColumnRenamed("bits", "b1").hint("shuffle_hash"),
                ["node", "word"],
                "full_outer",
            )
            .select(
                "node",
                "word",
                (
                    F.coalesce(F.col("b0"), F.lit(0).cast("long")).bitwiseOR(
                        F.coalesce(F.col("b1"), F.lit(0).cast("long"))
                    )
                ).alias("bits"),
            )
        )
        reach = merged.localCheckpoint(eager=False)
    # readout: explode each row's SET bits and count per (word, bit) —
    # rows exploded = Σ closure sizes (small), ONE narrow aggregate.
    # (The first spelling — 64 conditional sums per word in one wide
    # aggregate — was measured 1.4× SLOWER than the r13 form at sf0.1
    # in the paired record: the 64-aggregate expression tree is pure
    # plan/codegen weight in the driver-bound small-scale regime, and
    # buys nothing at sf1 where the joins dominate. Counts identical:
    # a (word, b) group's size IS the number of nodes with that bit
    # set.) Seeds always reach themselves, so every seed has a row and
    # absent groups cannot correspond to seeds.
    counts = (
        reach.select(
            "word",
            F.explode(
                F.filter(
                    F.sequence(F.lit(0), F.lit(63)),
                    lambda b: F.call_function(
                        "shiftright", F.col("bits"), b.cast("int")
                    ).bitwiseAND(F.lit(1))
                    == 1,
                )
            ).alias("bit"),
        )
        .groupBy("word", "bit")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return counts.select(
        (
            (F.col("word").cast("long") * 64 + F.col("bit")) * 100
        ).alias("seed"),
        (F.col("cnt") - 1).cast("long").alias("n_reachable_3hop"),
    ).orderBy("seed")


# ===========================================================================
# A/B experiment analysis: deterministic assignment + exact moments
# ===========================================================================
def _register_ab_test() -> None:
    from ipeds_etl_spark.operators import sampling as SAMP

    bucket_sql = SAMP.sample_bucket_sql("user_id", salt="ab")

    @_register(
        "events_ab_test",
        f"""
        WITH assigned AS (
          SELECT event_type, value,
                 CASE WHEN {bucket_sql} < 50 THEN 'A' ELSE 'B' END AS arm
          FROM events WHERE value IS NOT NULL),
        q AS (
          SELECT event_type, arm,
                 CAST(count(*) AS BIGINT) AS n,
                 SUM(CAST(floor(value * 1000000.0) AS DECIMAL(38,0))) AS sy,
                 SUM(CAST(floor(value * 1000000.0) AS DECIMAL(38,0))
                     * CAST(floor(value * 1000000.0) AS DECIMAL(38,0))) AS syy
          FROM assigned GROUP BY event_type, arm)
        SELECT a.event_type,
               a.n AS n_a, b.n AS n_b,
               (CAST(a.sy AS DOUBLE) / 1000000.0) / a.n AS mean_a,
               (CAST(b.sy AS DOUBLE) / 1000000.0) / b.n AS mean_b,
               ((CAST(b.sy AS DOUBLE) / 1000000.0) / b.n)
                 - ((CAST(a.sy AS DOUBLE) / 1000000.0) / a.n) AS mean_diff,
               CASE WHEN a.n > 1 THEN
                 ((a.n * CAST(a.syy AS DOUBLE) - CAST(a.sy AS DOUBLE) * CAST(a.sy AS DOUBLE))
                   / 1000000000000.0) / (a.n * (a.n - 1))
               END AS var_a,
               CASE WHEN b.n > 1 THEN
                 ((b.n * CAST(b.syy AS DOUBLE) - CAST(b.sy AS DOUBLE) * CAST(b.sy AS DOUBLE))
                   / 1000000000000.0) / (b.n * (b.n - 1))
               END AS var_b
        FROM (SELECT * FROM q WHERE arm = 'A') a
        JOIN (SELECT * FROM q WHERE arm = 'B') b ON a.event_type = b.event_type
        ORDER BY a.event_type
        """,
    )
    def q_events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
        """A/B experiment readout: users deterministically assigned to
        arms by the split machinery's content hash (assignment is a
        pure function of user_id — reproducible on any engine, any
        partitioning, any day), then per event-type arm comparison
        from EXACT algebraic moments — counts, Σy, Σy² in scale-0
        decimal micro-units (the ``events_user_trend`` recipe: quantize
        first, sum exactly, ONE double conversion, fixed division
        order), so means, mean lift, and sample variances value-hash
        across engines. No p-value on purpose: erf is transcendental
        and engine-specific; the variance/mean/count triple is the
        sufficient statistic a downstream test consumes. One shuffle
        (type × arm groups), all map-side combinable — at 100 TB this
        is a metrics pass, not a join."""
        e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
        arm = F.when(
            SAMP.sample_bucket(F.col("user_id"), salt="ab") < 50, "A"
        ).otherwise("B")
        y = F.floor(F.col("value") * F.lit(1_000_000.0)).cast("decimal(38,0)")
        q = (
            e.select("event_type", arm.alias("arm"), y.alias("y"))
            .groupBy("event_type", "arm")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("y").alias("sy"),
                F.sum(F.col("y") * F.col("y")).alias("syy"),
            )
        )
        a = q.filter(F.col("arm") == "A").alias("a")
        b = q.filter(F.col("arm") == "B").alias("b")

        def mean(side: str):
            return (
                F.col(f"{side}.sy").cast("double") / F.lit(1_000_000.0)
            ) / F.col(f"{side}.n")

        def var(side: str):
            # Numerator in DOUBLE from the first multiply: decimal(38,0)
            # sy*sy silently overflows to NULL in Spark at large n, and
            # the n=1 arm would divide by zero (Spark NULL vs DuckDB
            # IEEE inf) — guard + one early cast keep both engines on
            # the same IEEE arithmetic at any scale.
            n = F.col(f"{side}.n")
            num = n * F.col(f"{side}.syy").cast("double") - F.col(
                f"{side}.sy"
            ).cast("double") * F.col(f"{side}.sy").cast("double")
            return F.when(
                n > 1, (num / F.lit(1_000_000_000_000.0)) / (n * (n - 1))
            )

        return (
            a.join(b, F.col("a.event_type") == F.col("b.event_type"))
            .select(
                F.col("a.event_type").alias("event_type"),
                F.col("a.n").alias("n_a"),
                F.col("b.n").alias("n_b"),
                mean("a").alias("mean_a"),
                mean("b").alias("mean_b"),
                (mean("b") - mean("a")).alias("mean_diff"),
                var("a").alias("var_a"),
                var("b").alias("var_b"),
            )
            .orderBy("event_type")
        )


_register_ab_test()


# ===========================================================================
# TPC-H Q18 shape: large-volume orders (IN over a grouped HAVING)
# ===========================================================================
@_register(
    "customers_large_orders",
    """
    SELECT c.c_name,
           c.c_custkey,
           o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(o.o_totalprice AS DOUBLE) AS totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 300)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q_customers_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: the IN-over-grouped-HAVING form, kept as SQL so
    Catalyst plans the membership test as a LEFT SEMI join against the
    aggregated subquery (no decorrelation needed — the subquery is
    uncorrelated, the planner's cheapest case). The quantity threshold
    sum is exact decimal; the final ordering carries a full tiebreaker
    (totalprice DESC, orderkey) so the LIMIT 100 cut is deterministic
    on any engine and any partitioning. Scale: the HAVING aggregate is
    map-side combinable on l_orderkey, the semi join co-partitions
    with the orders⋈lineitem join on the same key (one exchange
    reused), and TakeOrderedAndProject caps the driver at 100 rows."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("q18_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("q18_orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("q18_lineitem")
    return spark.sql(
        """
        SELECT c.c_name,
               c.c_custkey,
               o.o_orderkey,
               date_format(o.o_orderdate, 'yyyy-MM-dd') AS orderdate,
               CAST(o.o_totalprice AS DOUBLE) AS totalprice,
               CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        FROM q18_customer c
        JOIN q18_orders o ON o.o_custkey = c.c_custkey
        JOIN q18_lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IN (
          SELECT l_orderkey FROM q18_lineitem
          GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 300)
        GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
        ORDER BY totalprice DESC, o.o_orderkey
        LIMIT 100
        """
    )


# ===========================================================================
# TPC-H Q7 shape: bilateral trade volume between two nations by year
# ===========================================================================
@_register(
    "nations_trade_volume",
    """
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,6))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6)))
                AS DOUBLE)
             AS revenue
    FROM lineitem l
    JOIN orders o    ON o.o_orderkey = l.l_orderkey
    JOIN supplier s  ON s.s_suppkey = l.l_suppkey
    JOIN customer c  ON c.c_custkey = o.o_custkey
    JOIN nation n1   ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2   ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q_nations_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the 6-way snowflake join with a DISJUNCTIVE
    pair filter over two dimension branches (supplier nation ×
    customer nation). Discounted revenue follows the house decimal
    idiom (multiply exact decimals, re-round the product to scale 6,
    sum, ONE double cast — the _REV6 rule). Scale: all
    four dimension sides (supplier, customer, nation ×2) broadcast;
    the only exchange is lineitem⋈orders on orderkey, and the nation
    pair predicate prunes before the fact-side shuffle because the
    broadcast joins evaluate first in the same stage."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    # Re-round the per-row product to scale 6 BEFORE the sum (the
    # _REV6 idiom): the unrounded DECIMAL(18,12) product overflows
    # 2^53 when summed at sf>=0.1, so the final double cast differs
    # between engines without it.
    rev = (
        F.col("l_extendedprice").cast("decimal(18,6)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,6)"))
    ).cast("decimal(18,6)")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ===========================================================================
# TPC-H Q20 shape: dominant suppliers per part (nested correlated agg)
# ===========================================================================
@_register(
    "suppliers_dominant_parts",
    """
    SELECT s.s_name,
           CAST(COUNT(*) AS BIGINT) AS n_dominant_parts
    FROM supplier s
    JOIN (
      SELECT l_suppkey, l_partkey
      FROM lineitem l1
      GROUP BY l_suppkey, l_partkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) * 6
           > (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,6)))
              FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
    ) d ON d.l_suppkey = s.s_suppkey
    GROUP BY s.s_name
    ORDER BY s.s_name
    """,
)
def q_suppliers_dominant_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: a correlated scalar aggregate INSIDE a grouped
    HAVING — per (supplier, part) shipped quantity compared against
    a sixth of that part's total across all suppliers (>16.7% share —
    the largest multiplier that yields a non-trivial result set on the
    uniform synthetic quantities). Left as SQL so
    Catalyst decorrelates the inner sum into a partkey aggregate
    joined back on the HAVING's group (the nested form of the Q17
    rewrite). The comparison is cross-multiplied (``sum*6 > total``)
    in exact decimal — no division. Scale: both aggregates are
    map-side combinable over the same lineitem scan; the planner
    shares one exchange on l_partkey between the group and the
    decorrelated subquery, and the supplier join broadcasts."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("q20_lineitem")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("q20_supplier")
    return spark.sql(
        """
        SELECT s.s_name,
               CAST(COUNT(*) AS BIGINT) AS n_dominant_parts
        FROM q20_supplier s
        JOIN (
          SELECT l_suppkey, l_partkey
          FROM q20_lineitem l1
          GROUP BY l_suppkey, l_partkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) * 6
               > (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,6)))
                  FROM q20_lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
        ) d ON d.l_suppkey = s.s_suppkey
        GROUP BY s.s_name
        ORDER BY s.s_name
        """
    )


# ===========================================================================
# TPC-H Q13 shape: customer order-count distribution (filtered outer join)
# ===========================================================================
@_register(
    "customer_order_distribution",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey)
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed exactly N (non-urgent)
    orders — INCLUDING the zero bucket, which is the whole point of the
    shape: the priority filter lives in the LEFT JOIN's ON clause, not
    a WHERE (a WHERE would silently drop order-less customers and every
    customer whose orders are all urgent). ``count(o.o_orderkey)``
    counts only matched rows, so unmatched customers land in c_count=0.
    Scale: one orderkey-side filter inside the join, one shuffle on
    custkey shared by the join and the first aggregate; the second
    aggregate's domain is O(max orders per customer) — tiny
    regardless of corpus."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    per_cust = (
        c.join(
            o,
            (o.o_custkey == c.c_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ===========================================================================
# TPC-H Q19 shape: disjunctive predicate spanning both join sides
# ===========================================================================
@_register(
    "parts_promo_revenue_disjunctive",
    """
    SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
                         * (1 - CAST(l_discount AS DECIMAL(18,6)))
                         AS DECIMAL(18,6))) AS DOUBLE)
             AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 20 AND 35)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 35 AND 50)
    """,
)
def q_parts_promo_revenue_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: a 3-arm disjunction whose arms mix PART-side
    (brand, size) and LINEITEM-side (quantity) predicates — the
    classic can't-fully-push case. What the planner CAN do, and what
    this pins: extract the common ``p_partkey = l_partkey`` equi key
    (never a cartesian), push the union of each side's arm predicates
    down to its scan as a partial filter (brand IN / size range on
    part, quantity range on lineitem), and evaluate the full
    disjunction as the join residual. Revenue follows the house
    decimal idiom. Scale: part side broadcasts; lineitem scan is
    pre-pruned by the pushed quantity envelope before the join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    arm = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(20, 35)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(35, 50)
    )
    # each product rounded back to scale 6 BEFORE the sum: a scale-12
    # decimal sum of this magnitude exceeds 2^53 in integer form and
    # the decimal->double conversion rounds differently per engine
    # (the SCALE.md scale-0 rule, applied at scale 6 here); per-row
    # decimal->decimal rounding is deterministic on both engines
    rev = (
        F.col("l_extendedprice").cast("decimal(18,6)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,6)"))
    ).cast("decimal(18,6)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(arm)
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ===========================================================================
# TPC-H Q12 shape: shipping-delay priority counts (CASE aggregation)
# ===========================================================================
@_register(
    "lineitem_priority_shipping_counts",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate
      AND l_shipdate < o_orderdate + INTERVAL 60 DAY
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_lineitem_priority_shipping_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: lines shipped within 60 days of their order,
    bucketed by return flag with the priority split expressed as CASE
    aggregates — one pass, no second join or pivot. The ship-window
    predicate references BOTH sides, so it evaluates as the join
    residual; the join itself stays equi on orderkey. Scale: one
    orderkey exchange (lineitem side; orders side co-shuffles), then a
    3-group CASE agg that combines map-side."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_shipdate"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(
            (F.col("l_shipdate") >= F.col("o_orderdate"))
            & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# ===========================================================================
# TPC-H Q14 shape: promo revenue share (conditional ratio aggregate)
# ===========================================================================
@_register(
    "parts_promo_revenue_share",
    """
    SELECT CAST(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(CAST(l_extendedprice AS DECIMAL(18,6))
                           * (1 - CAST(l_discount AS DECIMAL(18,6)))
                           AS DECIMAL(18,6))
                 ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
                             * (1 - CAST(l_discount AS DECIMAL(18,6)))
                             AS DECIMAL(18,6))) AS DOUBLE) AS DOUBLE)
             AS promo_revenue_pct,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    """,
)
def q_parts_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percentage of one year's revenue from PROMO
    parts — two conditional exact-decimal sums and ONE final IEEE
    division (both sums at scale 6; products rounded per-row back to
    scale 6 so neither engine leaves the 2^53-exact integer range).
    Scale: date range pushes to the lineitem scan, part broadcasts,
    the whole thing is one map-combinable single-group aggregate."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,6)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,6)"))
    ).cast("decimal(18,6)")
    zero = F.lit(0).cast("decimal(18,6)")
    promo = F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero))
    total = F.sum(rev)
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        (F.lit(100.0) * promo.cast("double") / total.cast("double")).alias(
            "promo_revenue_pct"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ===========================================================================
# TPC-H Q16 shape: supplier counts with a NOT IN exclusion (null-aware anti)
# ===========================================================================
@_register(
    "parts_supplier_counts_excluded",
    """
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON l_partkey = p_partkey
    WHERE p_size IN (1, 14, 23, 45)
      AND p_type <> 'PROMO'
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q_parts_supplier_counts_excluded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per (brand, type, size)
    slice, EXCLUDING a denylist via NOT IN — kept as SQL because NOT IN
    over a nullable key is its own planning shape: Spark must use a
    NULL-AWARE anti join (a single-column broadcast NAAJ; a plain anti
    join would wrongly keep rows when the subquery yields a NULL).
    The denylist (negative-balance suppliers) is broadcast; the
    distinct count rides the Expand rewrite. Scale: part filters push
    to the scan, the only wide exchange is the (brand,type,size,supp)
    distinct."""
    for t in ("part", "lineitem", "supplier"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"q16_{t}")
    return spark.sql(
        """
        SELECT p_brand, p_type, p_size,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM q16_part JOIN q16_lineitem ON l_partkey = p_partkey
        WHERE p_size IN (1, 14, 23, 45)
          AND p_type <> 'PROMO'
          AND l_suppkey NOT IN (SELECT s_suppkey FROM q16_supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """
    )


# ===========================================================================
# TPC-H shape completion: Q2/Q4/Q6/Q8/Q9/Q10/Q15 (schema-adapted)
# ===========================================================================
_REV6 = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,6))"
    " * (1 - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6))"
)


@_register(
    "orders_priority_late_exists",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_orders_priority_late_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders with AT LEAST ONE slow line (EXISTS →
    left-semi join, so an order with many late lines counts once
    without a DISTINCT), counted per priority. The correlation crosses
    sides (l_shipdate vs o_orderdate), so the date predicate is the
    semi join's residual on the equi orderkey key. One orderkey
    exchange + a 5-group combinable agg."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("q4_orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("q4_lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        FROM q4_orders o
        WHERE EXISTS (SELECT 1 FROM q4_lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@_register(
    "lineitem_discount_revenue",
    f"""
    SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
                         * CAST(l_discount AS DECIMAL(18,6))
                         AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.04
      AND l_quantity < 24
    """,
)
def q_lineitem_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure filter-and-aggregate forecast query —
    every predicate pushes to the parquet scan (date, discount range,
    quantity), no join at all, one single-group combinable sum. The
    plan IS the scan; at 100 TB this measures nothing but IO and
    pushdown quality. Products re-scaled to decimal(18,6) per row
    (the >2^53 rule)."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,6)")
        * F.col("l_discount").cast("decimal(18,6)")
    ).cast("decimal(18,6)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.02, 0.04)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@_register(
    "nation_market_share",
    f"""
    WITH vol AS (
      SELECT year(l.l_shipdate) AS l_year,
             n1.n_name AS supp_nation,
             {_REV6} AS rev
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n2.n_regionkey
      WHERE r.r_name = 'ASIA')
    SELECT l_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN rev
                              ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                / CAST(SUM(rev) AS DOUBLE) AS DOUBLE) AS mkt_share,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM vol
    GROUP BY l_year
    ORDER BY l_year
    """,
)
def q_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of the revenue sold into a
    region, per year — the conditional-ratio-over-a-snowflake query.
    All five dimension branches broadcast; the only exchange is the
    fact join on orderkey + the year agg. Share = one IEEE division
    of two exact decimal sums."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_rkey"))
    rev = (
        F.col("l_extendedprice").cast("decimal(18,6)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,6)"))
    ).cast("decimal(18,6)")
    zero = F.lit(0).cast("decimal(18,6)")
    vol = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_rkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select(F.year("l_shipdate").alias("l_year"),
                F.col("supp_nation"), rev.alias("rev"))
    )
    num = F.sum(F.when(F.col("supp_nation") == "NATION_2", F.col("rev")).otherwise(zero))
    return (
        vol.groupBy("l_year")
        .agg(
            (num.cast("double") / F.sum("rev").cast("double")).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("l_year")
    )


@_register(
    "nation_year_red_revenue",
    f"""
    SELECT n_name AS nation, year(l_shipdate) AS o_year,
           CAST(SUM({_REV6}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, year(l_shipdate)
    ORDER BY nation, o_year
    """,
)
def q_nation_year_red_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: supplier-nation × year revenue for a
    LIKE-filtered part family (the product-line profit rollup, minus
    the partsupp cost leg this schema does not carry). The infix LIKE
    pushes as a contains filter on the part scan, part and the
    supplier→nation chain broadcast, one fact exchange feeds the
    (25 nations × years) agg."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,6)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,6)"))
    ).cast("decimal(18,6)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy("nation", "o_year")
    )


@_register(
    "customers_returned_revenue_top",
    f"""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           CAST(SUM({_REV6}) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q_customers_returned_revenue_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: customers who returned the most revenue in a
    half-year window — returned-items triage. Revenue ordering uses
    the exact-decimal-summed double with custkey as total-order
    tiebreak, so the LIMIT 20 cut is engine-deterministic.
    TakeOrderedAndProject caps the driver at 20 rows; customer and
    nation broadcast; one orderkey exchange."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,6)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,6)"))
    ).cast("decimal(18,6)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@_register(
    "top_supplier_by_revenue",
    f"""
    WITH srev AS (
      SELECT l_suppkey, SUM({_REV6}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, CAST(srev.total_rev AS DOUBLE) AS total_rev
    FROM supplier s JOIN srev ON srev.l_suppkey = s.s_suppkey
    WHERE srev.total_rev = (SELECT max(total_rev) FROM srev)
    ORDER BY s.s_suppkey
    """,
)
def q_top_supplier_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) achieving the quarter's MAX
    revenue — a grouped aggregate gated by a scalar aggregate over
    ITSELF with an EQUALITY (ties all surface; no LIMIT hides them).
    The comparison runs on the exact decimal sums — never the doubles
    — so the max-equality is engine-exact. Plan: one suppkey agg
    reused by both the scalar max (single-row broadcast) and the
    probe; supplier broadcasts."""
    for t in ("lineitem", "supplier"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"q15_{t}")
    return spark.sql(
        """
        WITH srev AS (
          SELECT l_suppkey,
                 SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
                          * (1 - CAST(l_discount AS DECIMAL(18,6)))
                          AS DECIMAL(18,6))) AS total_rev
          FROM q15_lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
          GROUP BY l_suppkey)
        SELECT s.s_suppkey, s.s_name, CAST(srev.total_rev AS DOUBLE) AS total_rev
        FROM q15_supplier s JOIN srev ON srev.l_suppkey = s.s_suppkey
        WHERE srev.total_rev = (SELECT max(total_rev) FROM srev)
        ORDER BY s.s_suppkey
        """
    )


@_register(
    "parts_cheapest_supplier",
    """
    WITH offer AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(l_extendedprice AS DECIMAL(18,6))) AS best_price
      FROM lineitem GROUP BY l_partkey, l_suppkey)
    SELECT p.p_partkey, s.s_name,
           CAST(o.best_price AS DOUBLE) AS best_price
    FROM part p
    JOIN offer o ON o.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = o.l_suppkey
    WHERE p.p_size = 10
      AND o.best_price = (SELECT MIN(o2.best_price) FROM offer o2
                          WHERE o2.l_partkey = o.l_partkey)
    ORDER BY p.p_partkey, s.s_name
    """,
)
def q_parts_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (partsupp-less adaptation): for each size-10
    part, the supplier(s) whose best offered line price equals the
    part's global minimum — the CORRELATED SCALAR MIN + EQUALITY
    pattern (ties surface, as Q2 requires). Catalyst decorrelates the
    min subquery into a partkey aggregate joined back; both the offer
    table and the decorrelated min share the same (partkey) exchange.
    Price comparisons stay in exact decimal; the double cast is
    output-only."""
    for t in ("lineitem", "part", "supplier"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"q2_{t}")
    return spark.sql(
        """
        WITH offer AS (
          SELECT l_partkey, l_suppkey,
                 MIN(CAST(l_extendedprice AS DECIMAL(18,6))) AS best_price
          FROM q2_lineitem GROUP BY l_partkey, l_suppkey)
        SELECT p.p_partkey, s.s_name,
               CAST(o.best_price AS DOUBLE) AS best_price
        FROM q2_part p
        JOIN offer o ON o.l_partkey = p.p_partkey
        JOIN q2_supplier s ON s.s_suppkey = o.l_suppkey
        WHERE p.p_size = 10
          AND o.best_price = (SELECT MIN(o2.best_price) FROM offer o2
                              WHERE o2.l_partkey = o.l_partkey)
        ORDER BY p.p_partkey, s.s_name
        """
    )
