"""Round-6 coda: curation-bias and routing readouts — per-source
survivorship of the dedup pipeline (does dedup disproportionately
drop a source, and does kept quality shift?) and multi-keyword
taxonomy tagging (the map-only FlashText shape used for topic/license
routing). House rules as in `queries_wave8`.

The reference (kebe3476/ipeds_etl) ships none of these; they extend
its surface under the same oracle-twin discipline (COVERAGE.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ipeds_etl_spark.functions import text as TX
from ipeds_etl_spark.queries import _register
from ipeds_etl_spark.queries_ext import _lsh_doc_pairs, _WS_TOKENS
from ipeds_etl_spark.sources.tables import load_table


# ===========================================================================
# Dedup survivorship bias per source
# ===========================================================================
def _survivorship_oracle() -> str:
    from ipeds_etl_spark.queries import ORACLE_SQL

    comp = ORACLE_SQL["dedup_components"]
    head, _, _tail = comp.rpartition("SELECT id AS doc_id")
    return (
        head
        + f""",
    res AS (
      SELECT d.doc_id, d.source,
             coalesce(c.id IS NULL OR c.id = c.component_id, TRUE) AS keep
      FROM documents d
      LEFT JOIN (SELECT id, component_id FROM comps) c ON d.doc_id = c.id),
    q AS (
      SELECT doc_id,
             CAST((1000 * len(list_distinct(w))) // greatest(len(w), 1)
                  AS BIGINT) AS sc
      FROM (SELECT doc_id, {_WS_TOKENS.format(x='text')} AS w FROM documents))
    SELECT res.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST((1000 * SUM(CASE WHEN keep THEN 1 ELSE 0 END)) // count(*)
                AS BIGINT) AS kept_x1000,
           CAST(SUM(sc) // count(*) AS BIGINT) AS q_all_x1000,
           CAST(SUM(CASE WHEN keep THEN sc END)
                // SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
             AS q_kept_x1000
    FROM res JOIN q USING (doc_id)
    GROUP BY res.source
    ORDER BY res.source
    """
    )


@_register("docs_dedup_survivorship", _survivorship_oracle())
def q_docs_dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship-bias audit of the dedup pipeline: per source, how
    many documents survive cluster resolution (LSH → components →
    canonical keeper; singletons keep), and whether the KEPT quality
    differs from the source's overall quality (type-token permille —
    the label-propagation bootstrap score). A clone-heavy source loses
    most of its mass here; if its kept-quality also drops, dedup is
    systematically keeping its worst exemplars (min-id keeper is
    quality-blind) — exactly the bias this table is read to catch
    before a mixing recipe trusts post-dedup source weights.

    Scale: the resolution is the `docs_dedup_resolution` composition
    (memoized pairs, O(diameter) label rounds, one left join back);
    the quality score is one map pass; the readout one O(sources)
    agg. Every survivor row carries its verdict from the same pass —
    no second dedup run."""
    from ipeds_etl_spark.operators.components import dedup_clusters

    d = load_table(spark, sf_dir, "documents")
    clusters = dedup_clusters(_lsh_doc_pairs(spark, sf_dir))
    toks = TX.tokens(F.col("text"))
    scored = d.select(
        "doc_id",
        "source",
        F.size(F.array_distinct(toks)).cast("long").alias("nd"),
        F.greatest(F.size(toks), F.lit(1)).cast("long").alias("nt"),
    ).select(
        "doc_id",
        "source",
        F.expr("CAST((1000 * nd) div nt AS BIGINT)").alias("sc"),
    )
    res = scored.join(
        clusters.select("id", "keep"), scored.doc_id == clusters.id, "left"
    ).select(
        "source", "sc", F.coalesce("keep", F.lit(True)).alias("keep")
    )
    return (
        res.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.expr(
                "CAST((1000 * sum(CASE WHEN keep THEN 1 ELSE 0 END))"
                " div count(*) AS BIGINT)"
            ).alias("kept_x1000"),
            F.expr("CAST(sum(sc) div count(*) AS BIGINT)").alias("q_all_x1000"),
            F.expr(
                "CAST(sum(CASE WHEN keep THEN sc END)"
                " div sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("q_kept_x1000"),
        )
        .orderBy("source")
    )


# ===========================================================================
# Multi-keyword taxonomy tagging (FlashText shape, map-only)
# ===========================================================================
#: a topic taxonomy over the corpus vocabulary — the license/domain
#: tagger shape with categories that are non-degenerate on this corpus
_TAXONOMY: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("engine", ("spark", "query", "scan", "sort", "join", "agg")),
    ("storage", ("table", "row", "column", "partition", "parquet")),
    ("streaming", ("stream", "window", "batch", "watermark")),
    ("ml", ("vector", "embedding", "model", "cluster")),
    ("commerce", ("customer", "order", "part", "supplier")),
)


def _tagging_oracle() -> str:
    cases = []
    for tag, words in _TAXONOMY:
        lst = "[" + ", ".join(f"'{w}'" for w in words) + "]"
        cases.append(
            f"SELECT doc_id, source, '{tag}' AS tag,"
            f" len(list_filter(w, t -> list_contains({lst}, t))) AS hits"
            " FROM t"
        )
    union = " UNION ALL ".join(cases)
    return f"""
    WITH t AS (SELECT doc_id, source, {_WS_TOKENS.format(x='text')} AS w
               FROM documents),
    m AS ({union})
    SELECT source, tag,
           CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_tagged,
           CAST(SUM(hits) AS BIGINT) AS n_hits
    FROM m GROUP BY source, tag
    HAVING SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) > 0
    ORDER BY source, tag
    """


@_register("docs_keyword_tagging", _tagging_oracle())
def q_docs_keyword_tagging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-keyword taxonomy tagging — the FlashText/Aho-Corasick
    routing shape (license screens, topic routing, policy filters)
    as pure codegen: one tokenize, then per category a literal-array
    membership count (the `lang_scores` single-scan pattern applied
    to an arbitrary taxonomy). Per (source, tag): documents tagged
    and total keyword hits — the routing table a mixing recipe uses
    to send code to the code pile and legalese to review.

    Scale: map-only per category over one shared token array (the
    tokenizer subtree is projected ONCE — each category lambda reads
    the column, not the regex), one (source, tag) agg."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", TX.tokens(F.col("text")).alias("w")
    )
    out = None
    for tag, words in _TAXONOMY:
        lit_words = F.array(*[F.lit(w) for w in words])
        hits = F.size(
            F.filter(F.col("w"), lambda t: F.array_contains(lit_words, t))
        )
        part = d.select(
            "source", F.lit(tag).alias("tag"), hits.alias("hits")
        )
        out = part if out is None else out.unionByName(part)
    return (
        out.groupBy("source", "tag")
        .agg(
            F.sum(F.when(F.col("hits") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_docs_tagged"),
            F.sum("hits").cast("long").alias("n_hits"),
        )
        .filter(F.col("n_docs_tagged") > 0)
        .orderBy("source", "tag")
    )


# ===========================================================================
# PQ reconstruction distortion audit
# ===========================================================================
_DIFF2 = (
    "list_reduce(list_transform(range(len({a})), "
    "i -> (CAST({a}[i+1] AS DOUBLE) - CAST({b}[i+1] AS DOUBLE))"
    " * (CAST({a}[i+1] AS DOUBLE) - CAST({b}[i+1] AS DOUBLE))), "
    "(x, y) -> x + y)"
)


def _pq_distortion_oracle() -> str:
    from ipeds_etl_spark.queries_ext import _PQ_M, _PQ_SUB_DIM, _pq_sub_sql

    ctes: list[str] = []
    for s in range(_PQ_M):
        ctes.extend(_pq_sub_sql(s))
    errs = []
    for s in range(_PQ_M):
        lo, hi = s * _PQ_SUB_DIM + 1, (s + 1) * _PQ_SUB_DIM
        errs.append(
            _DIFF2.format(a=f"e.embedding[{lo}:{hi}]", b=f"n{s}.embedding")
        )
    total = errs[0]
    for x in errs[1:]:
        total = f"({total} + {x})"
    joins = "\n      ".join(
        f"JOIN s{s}_codes n{s} ON n{s}.vec_id = e.vec_id"
        for s in range(_PQ_M)
    )
    codes = ", ".join(f"n{s}.cid AS code_{s}" for s in range(_PQ_M))
    cte_block = ",\n    ".join(ctes)
    return f"""
    WITH {cte_block}
    SELECT e.vec_id, {codes}, {total} AS recon_err2
    FROM embeddings e
      {joins}
    ORDER BY e.vec_id
    """


@_register("emb_pq_distortion", _pq_distortion_oracle())
def q_emb_pq_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ compression-quality audit: per vector, the squared L2 error
    between the original and its codeword reconstruction — the
    distortion the recall gates (`emb_pq_recall`) can only show
    indirectly. Every float op is order-pinned (left-fold per-dim
    (x−y)² sums, left-fold subspace chain — the `pq_topk` bitwise
    discipline), so the oracle replays codebook training, encoding,
    AND the distortion bit-identically. Rising distortion on a new
    corpus version = retrain the codebooks before trusting ADC ranks.

    Scale: map-only over the corpus scan — the codebooks ride as plan
    literals (no join, no shuffle); output one row per vector."""
    from ipeds_etl_spark.operators import similarity as SIM
    from ipeds_etl_spark.operators.similarity import _matrix_lit, dot
    from ipeds_etl_spark.queries_ext import (
        _PQ_M,
        _PQ_SUB_DIM,
        _pq_codebook,
    )

    e = load_table(spark, sf_dir, "embeddings")
    books = _pq_codebook(spark, sf_dir)
    cols = [F.col("vec_id")]
    errs = []
    for s, book in enumerate(books):
        cids = F.lit([int(cid) for cid, _ in book])
        cvecs = _matrix_lit([[float(v) for v in vec_] for _, vec_ in book])
        sub = F.slice(F.col("embedding"), s * _PQ_SUB_DIM + 1, _PQ_SUB_DIM)
        scored = SIM._scored_centroids(sub, book)
        code = F.array_max(scored)["cid"]
        cols.append(code.alias(f"code_{s}"))
        pos = F.array_position(cids, code).cast("int")
        cw = F.element_at(cvecs, pos)
        errs.append(
            F.aggregate(
                F.zip_with(
                    sub,
                    cw,
                    lambda x, y: (x.cast("double") - y.cast("double"))
                    * (x.cast("double") - y.cast("double")),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
    total = errs[0]
    for x in errs[1:]:
        total = total + x
    return e.select(*cols, total.alias("recon_err2")).orderBy("vec_id")


# ===========================================================================
# CCNet-style head/middle/tail routing by per-source quality terciles
# ===========================================================================
@_register(
    "docs_quality_tercile_routing",
    f"""
    WITH q AS (
      SELECT doc_id, source,
             CAST((1000 * len(list_distinct(w))) // greatest(len(w), 1)
                  AS BIGINT) AS sc
      FROM (SELECT doc_id, source, {_WS_TOKENS.format(x='text')} AS w
            FROM documents)),
    h AS (SELECT source, sc, CAST(count(*) AS BIGINT) AS c
          FROM q GROUP BY source, sc),
    cum AS (SELECT source, sc, c,
                   CAST(SUM(c) OVER (PARTITION BY source ORDER BY sc
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum,
                   CAST(SUM(c) OVER (PARTITION BY source) AS BIGINT) AS n
            FROM h),
    cuts AS (SELECT source,
                    min(CASE WHEN 3 * cum >= n THEN sc END) AS lo,
                    min(CASE WHEN 3 * cum >= 2 * n THEN sc END) AS hi
             FROM cum GROUP BY source),
    r AS (SELECT q.source,
                 CASE WHEN sc <= lo THEN 'tail'
                      WHEN sc <= hi THEN 'middle'
                      ELSE 'head' END AS bucket,
                 sc
          FROM q JOIN cuts USING (source))
    SELECT source, bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(sc) AS BIGINT) AS min_sc,
           CAST(max(sc) AS BIGINT) AS max_sc
    FROM r GROUP BY source, bucket
    ORDER BY source, bucket
    """,
)
def q_docs_quality_tercile_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality routing: per source, split documents into
    head / middle / tail by EXACT quality-score terciles — cutoffs are
    the smallest scores whose cumulative count crosses n/3 and 2n/3
    (integer cross-multiplication, no quantile-function semantics to
    disagree on), mirroring CCNet's per-language perplexity terciles
    with the type-token permille as the quality proxy. The head bucket
    feeds training, the middle gets a second look, the tail is
    dropped — this table is that routing decision, with per-bucket
    score ranges as the audit trail.

    Scale: scores are permille INTEGERS, so the per-source score
    histogram has ≤ 1001 rows per source — the cumulative window runs
    over that metadata-sized frame, never over documents; routing is
    one broadcast-able cutoff join + one map."""
    d = load_table(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    q = d.select(
        "doc_id",
        "source",
        F.size(F.array_distinct(toks)).cast("long").alias("nd"),
        F.greatest(F.size(toks), F.lit(1)).cast("long").alias("nt"),
    ).select(
        "doc_id", "source", F.expr("CAST((1000 * nd) div nt AS BIGINT)").alias("sc")
    )
    h = q.groupBy("source", "sc").agg(F.count(F.lit(1)).cast("long").alias("c"))
    from pyspark.sql import Window as W

    w_cum = (
        W.partitionBy("source")
        .orderBy("sc")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_all = W.partitionBy("source")
    cum = h.select(
        "source",
        "sc",
        F.sum("c").over(w_cum).cast("long").alias("cum"),
        F.sum("c").over(w_all).cast("long").alias("n"),
    )
    cuts = cum.groupBy("source").agg(
        F.min(F.when(3 * F.col("cum") >= F.col("n"), F.col("sc"))).alias("lo"),
        F.min(F.when(3 * F.col("cum") >= 2 * F.col("n"), F.col("sc"))).alias(
            "hi"
        ),
    )
    r = q.join(F.broadcast(cuts), "source").select(
        "source",
        F.when(F.col("sc") <= F.col("lo"), "tail")
        .when(F.col("sc") <= F.col("hi"), "middle")
        .otherwise("head")
        .alias("bucket"),
        "sc",
    )
    return (
        r.groupBy("source", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("sc").cast("long").alias("min_sc"),
            F.max("sc").cast("long").alias("max_sc"),
        )
        .orderBy("source", "bucket")
    )


# ===========================================================================
# Seasonal-naive forecast backtest on monthly revenue
# ===========================================================================
@_register(
    "orders_seasonal_naive_backtest",
    """
    WITH m AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
             CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS actual_cents
      FROM orders GROUP BY date_trunc('month', o_orderdate)),
    j AS (
      SELECT a.month, a.actual_cents, f.actual_cents AS forecast_cents
      FROM m a JOIN m f
        ON f.month = strftime(CAST(a.month || '-01' AS DATE)
                              - INTERVAL 12 MONTH, '%Y-%m'))
    SELECT month, actual_cents, forecast_cents,
           abs(actual_cents - forecast_cents) AS abs_err_cents,
           CAST((1000 * abs(actual_cents - forecast_cents)) // actual_cents
                AS BIGINT) AS ape_x1000
    FROM j ORDER BY month
    """,
)
def q_orders_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the seasonal-naive forecaster (ŷ_m = y_{m−12}) on
    monthly order revenue — the baseline every demand-forecast model
    must beat, produced the way a backtest harness wants it: one row
    per forecastable month with the exact absolute error and
    per-month APE in truncated permille. Revenue is floor-quantized
    to integer CENTS per order before summing (the scale-0 rule —
    double sums are order-dependent, cent sums are exact), so errors
    are exact BIGINTs; WAPE assembles in the test as Σ|err| over
    Σactual. Lag-12 is an equi-join on the shifted month key, not a
    window — no ordering requirement at all.

    Scale: one map-combinable monthly rollup to O(months) rows;
    everything after runs on that metadata-sized frame."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
            "month"
        )
    ).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        )
        .cast("long")
        .alias("actual_cents")
    ).localCheckpoint(eager=False)
    f = m.select(
        F.date_format(
            F.add_months(F.to_date(F.concat(F.col("month"), F.lit("-01"))), 12),
            "yyyy-MM",
        ).alias("month"),
        F.col("actual_cents").alias("forecast_cents"),
    )
    return (
        m.join(f, "month")
        .select(
            "month",
            "actual_cents",
            "forecast_cents",
            F.abs(F.col("actual_cents") - F.col("forecast_cents")).alias(
                "abs_err_cents"
            ),
            F.expr(
                "CAST((1000 * abs(actual_cents - forecast_cents))"
                " div actual_cents AS BIGINT)"
            ).alias("ape_x1000"),
        )
        .orderBy("month")
    )


# ===========================================================================
# Per-supplier order-to-ship lag percentiles (exact, histogram-based)
# ===========================================================================
@_register(
    "supplier_ship_latency_percentiles",
    """
    WITH lag AS (
      SELECT l_suppkey AS suppkey,
             CAST(datediff('day', CAST(o_orderdate AS DATE),
                           CAST(l_shipdate AS DATE)) AS BIGINT) AS d
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    h AS (SELECT suppkey, d, CAST(count(*) AS BIGINT) AS c
          FROM lag GROUP BY suppkey, d),
    cum AS (SELECT suppkey, d, c,
                   CAST(SUM(c) OVER (PARTITION BY suppkey ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum,
                   CAST(SUM(c) OVER (PARTITION BY suppkey) AS BIGINT) AS n
            FROM h)
    SELECT suppkey, CAST(min(n) AS BIGINT) AS n_items,
           CAST(min(CASE WHEN 2 * cum >= n THEN d END) AS BIGINT) AS p50_days,
           CAST(min(CASE WHEN 10 * cum >= 9 * n THEN d END) AS BIGINT)
             AS p90_days,
           CAST(min(CASE WHEN 100 * cum >= 99 * n THEN d END) AS BIGINT)
             AS p99_days,
           CAST(min(d) AS BIGINT) AS min_days
    FROM cum GROUP BY suppkey ORDER BY suppkey
    """,
)
def q_supplier_ship_latency_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-supplier order-to-ship lag SLA profile: exact p50/p90/p99
    in days via the integer histogram trick — lag days are a small
    integer domain, so the per-supplier cumulative runs over a
    histogram of O(distinct lags) rows, never over line items, and
    the percentile is the cross-multiplied cutoff (2·cum ≥ n etc.),
    not an engine quantile function. Negative minimums (present in
    this corpus) surface as the DQ smell they are — an SLA profile
    that hides them is lying.

    Scale: one fact-fact equi-join on the orderkey exchange, one
    map-combinable (supplier, lag) count, per-supplier windows over
    the metadata-sized histogram, one O(suppliers) rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    lag = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("l_suppkey").alias("suppkey"),
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
        .cast("long")
        .alias("d"),
    )
    h = lag.groupBy("suppkey", "d").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    from pyspark.sql import Window as W

    w_cum = (
        W.partitionBy("suppkey")
        .orderBy("d")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_all = W.partitionBy("suppkey")
    cum = h.select(
        "suppkey",
        "d",
        F.sum("c").over(w_cum).cast("long").alias("cum"),
        F.sum("c").over(w_all).cast("long").alias("n"),
    )
    return (
        cum.groupBy("suppkey")
        .agg(
            F.min("n").cast("long").alias("n_items"),
            F.min(F.when(2 * F.col("cum") >= F.col("n"), F.col("d")))
            .cast("long")
            .alias("p50_days"),
            F.min(F.when(10 * F.col("cum") >= 9 * F.col("n"), F.col("d")))
            .cast("long")
            .alias("p90_days"),
            F.min(F.when(100 * F.col("cum") >= 99 * F.col("n"), F.col("d")))
            .cast("long")
            .alias("p99_days"),
            F.min("d").cast("long").alias("min_days"),
        )
        .orderBy("suppkey")
    )
