"""Round-6 additions: regression/seasonality analytics on exact
moments, tolerance-bounded as-of matching, a calibrated histogram
quantile estimator, boilerplate-chunk profiling, integer-bit unigram
surprisal, KMV set-operation completion, bigram conditionals, and the
decile mobility matrix on two-pass quantile cutoffs.

Design rules carried over from the earlier waves (see SCALE.md):
exact integer/decimal moments with ONE IEEE operation at the very end;
`x div y` ↔ DuckDB `//` (both truncate toward zero) for scaled-BIGINT
fixed-point results; order statistics through the two-pass histogram
quantile, never a buffering `percentile`; windows only over
metadata-sized frames; no transcendental functions anywhere (libm is
not cross-engine deterministic — integer bit-lengths stand in for
log2 where a magnitude is needed).

The reference (kebe3476/ipeds_etl) ships none of these operators; they
extend its analytics surface following the same oracle-twin discipline
as the rest of the extension track (see COVERAGE.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ipeds_etl_spark.functions import text as TX
from ipeds_etl_spark.functions.hashing import parity_hash
from ipeds_etl_spark.queries import _register
from ipeds_etl_spark.sources.tables import load_table

_WS_TOKENS = r"list_filter(regexp_split_to_array({x}, '\s+'), t -> len(t) > 0)"
_HASH10 = "CAST(concat('0x', substr(sha256({x}), 1, 10)) AS BIGINT)"


# ===========================================================================
# Per-supplier OLS price trend from exact integer moments
# ===========================================================================
#: centering constants — shifting x and y changes neither the slope
#: nor its exactness, but keeps every cross-moment comfortably inside
#: BIGINT (|x'| <= ~1300 days, |y'| <= ~5.3e6 cents; see magnitude
#: audit in the docstring)
_TREND_X0 = "DATE '1995-01-01'"
_TREND_XC = 1250
_TREND_YC = 5_250_000  # cents


@_register(
    "supplier_price_trend",
    f"""
    WITH pts AS (
      SELECT l_suppkey,
             datediff('day', {_TREND_X0}, CAST(l_shipdate AS DATE)) - {_TREND_XC} AS x,
             CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * 100 AS BIGINT)
               - {_TREND_YC} AS y
      FROM lineitem),
    m AS (
      SELECT l_suppkey,
             CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM pts GROUP BY l_suppkey)
    SELECT l_suppkey,
           n AS n_lines,
           CAST(((n * sxy - sx * sy) * 1000) // (n * sxx - sx * sx) AS BIGINT)
             AS slope_millicents_per_day
    FROM m
    WHERE n > 1 AND n * sxx - sx * sx <> 0
    ORDER BY l_suppkey
    """,
)
def q_supplier_price_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier OLS slope of shipped price vs time — the classic
    "is this supplier's pricing drifting" monitor — computed entirely
    from exact integer moments: x = day index centered on the date
    range's midpoint, y = exact cents centered near the price mean,
    slope = (nΣxy − ΣxΣy)·1000 div (nΣx² − (Σx)²) as a scaled-BIGINT
    fixed point (milli-cents/day). NO floating point anywhere, so the
    result is a total function of the data on both engines.

    Magnitude audit (the reason for the centering constants): with
    |x'| ≤ 1300 and |y'| ≤ 5.3e6 and ~600 lines/supplier at any sf
    (lineitem and supplier scale together), nΣx'y'·1000 ≤ ~2.4e18 —
    inside BIGINT with 4x headroom. If per-supplier line counts ever
    grow 10x beyond that, promote the two products to DECIMAL(38,0)
    (DuckDB's SUM already widens to HUGEINT).

    Scale: ONE map-combinable aggregate over the fact scan (five
    integer sums), output O(suppliers). The slope arithmetic runs on
    the aggregate rows only."""
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        "l_suppkey",
        (
            F.datediff(F.col("l_shipdate").cast("date"), F.lit("1995-01-01").cast("date"))
            - F.lit(_TREND_XC)
        ).alias("x"),
        (
            (F.col("l_extendedprice").cast("decimal(18,6)") * 100).cast("bigint")
            - F.lit(_TREND_YC)
        ).alias("y"),
    )
    m = pts.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        m.filter((F.col("n") > 1) & (den != 0))
        .select(
            "l_suppkey",
            F.col("n").alias("n_lines"),
            F.expr(
                "CAST(((n * sxy - sx * sy) * 1000) div (n * sxx - sx * sx) AS BIGINT)"
            ).alias("slope_millicents_per_day"),
        )
        .orderBy("l_suppkey")
    )


# ===========================================================================
# Month-of-year seasonality index
# ===========================================================================
@_register(
    "orders_monthly_seasonality",
    """
    WITH m AS (
      SELECT month(o_orderdate) AS month_of_year,
             CAST(count(*) AS BIGINT) AS n_orders,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1),
    t AS (SELECT SUM(rev) AS total FROM m)
    SELECT month_of_year,
           n_orders,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(rev AS DOUBLE) * 12 / CAST(total AS DOUBLE) AS seasonal_index
    FROM m CROSS JOIN t
    ORDER BY month_of_year
    """,
)
def q_orders_monthly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-of-year seasonal index (rev_month × 12 / rev_total — 1.0
    means a perfectly flat month). Sums are exact DECIMAL(18,2) —
    scale 2, not 6, because the 12-group monthly sums approach the
    2^53 integer-form boundary at scale 6 on a few hundred times this
    data (the SCALE.md re-rounding rule applied preemptively: cents
    are exact for money and 10^4 more headroom). One double
    multiply-by-12 (exact) + one IEEE division at the end.

    Scale: one 12-group map-combinable agg + a broadcast 1-row total —
    the cheapest possible seasonality readout at any corpus size."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(F.month("o_orderdate").alias("month_of_year")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
    )
    t = m.agg(F.sum("rev").alias("total"))
    return (
        m.crossJoin(F.broadcast(t))
        .select(
            "month_of_year",
            "n_orders",
            F.col("rev").cast("double").alias("revenue"),
            (F.col("rev").cast("double") * 12 / F.col("total").cast("double")).alias(
                "seasonal_index"
            ),
        )
        .orderBy("month_of_year")
    )


# ===========================================================================
# Forward as-of match with tolerance (view -> next purchase within 1h)
# ===========================================================================
_ASOF_TOL_US = 3_600_000_000  # 1 hour in microseconds


@_register(
    "events_asof_next_purchase",
    f"""
    WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS t FROM events),
    m AS (
      SELECT event_id, user_id, event_type, t,
             min(CASE WHEN event_type = 'purchase' THEN t END) OVER (
               PARTITION BY user_id ORDER BY t
               RANGE BETWEEN 1 FOLLOWING AND {_ASOF_TOL_US} FOLLOWING
             ) AS next_purchase_t
      FROM e)
    SELECT event_id, user_id, t AS view_t, next_purchase_t,
           next_purchase_t - t AS latency_us
    FROM m WHERE event_type = 'view'
    ORDER BY event_id
    """,
)
def q_events_asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join with a tolerance bound: for every 'view',
    the user's EARLIEST 'purchase' strictly after it and within one
    hour (NULL when none) — the attribution-window primitive, spelled
    as ONE window over the interleaved event stream instead of a
    range self-join: min(t | purchase) over a RANGE frame of
    (1, tolerance] microseconds following. The range frame is
    maintained incrementally by WindowExec (add/remove at the frame
    edges — the `orders_trailing_30d_spend` property), so per-user
    cost is O(events), not O(events × window width), and there is no
    join at all: one user shuffle total.

    Strictness note: the frame starts at 1 following, so a purchase
    at the exact same microsecond does NOT match — 'next' means
    strictly later, deterministic on both engines."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("t")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rangeBetween(1, _ASOF_TOL_US)
    )
    m = e.withColumn(
        "next_purchase_t",
        F.min(F.when(F.col("event_type") == "purchase", F.col("t"))).over(w),
    )
    return (
        m.filter(F.col("event_type") == "view")
        .select(
            "event_id",
            "user_id",
            F.col("t").alias("view_t"),
            "next_purchase_t",
            (F.col("next_purchase_t") - F.col("t")).alias("latency_us"),
        )
        .orderBy("event_id")
    )

# ===========================================================================
# Histogram quantile estimator with built-in calibration against exact
# ===========================================================================
_HQ_BINS = 256
_HQ_QS = (0.5, 0.9, 0.99)


@_register(
    "lineitem_histogram_quantile_error",
    f"""
    WITH s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                      min(l_extendedprice) AS lo,
                      max(l_extendedprice) AS hi FROM lineitem),
    b AS (SELECT CAST(least({_HQ_BINS - 1},
                 floor((l_extendedprice - lo) * {_HQ_BINS} / (hi - lo))) AS INT) AS bin,
                 CAST(count(*) AS BIGINT) AS c
          FROM lineitem CROSS JOIN s GROUP BY 1),
    cb AS (SELECT bin, SUM(c) OVER (ORDER BY bin) AS cum FROM b),
    tgt AS (SELECT q, greatest(0, CAST(ceil(q * n) AS BIGINT) - 1) AS r
            FROM (SELECT unnest([{", ".join(str(q) for q in _HQ_QS)}]) AS q)
            CROSS JOIN s),
    hit AS (SELECT tgt.q, min(cb.bin) AS bin
            FROM tgt JOIN cb ON cb.cum > tgt.r GROUP BY tgt.q),
    ex AS ({" UNION ALL ".join(
        f"SELECT {q} AS q, quantile_disc(l_extendedprice, {q}) AS exact_value FROM lineitem"
        for q in _HQ_QS)})
    SELECT hit.q,
           lo + (bin + 1) * ((hi - lo) / {_HQ_BINS}) AS est_value,
           ex.exact_value,
           lo + (bin + 1) * ((hi - lo) / {_HQ_BINS}) - ex.exact_value AS err
    FROM hit JOIN ex ON hit.q = ex.q CROSS JOIN s
    ORDER BY hit.q
    """,
)
def q_lineitem_histogram_quantile_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass equi-width histogram quantile ESTIMATOR with its
    calibration gate attached: estimate p50/p90/p99 of price from a
    256-bin histogram (right bin edge of the bin containing the target
    order statistic), then report the error against the EXACT two-pass
    order statistic — the accuracy audit that justifies shipping the
    one-pass estimator on a 100 TB column where even the two-pass
    exact costs a second scan. Bin assignment and edge arithmetic use
    the IDENTICAL operation order on both engines (every step a
    correctly-rounded IEEE op), so estimates — not just errors — hash
    cross-engine.

    Scale: the estimator is ONE map-combinable agg into ≤256 counters
    (constant state, CMS-style); the cumulative window runs over 256
    rows; the exact side is the standard two-pass histogram quantile.
    At 100 TB you run the estimator per-batch and the exact gate on
    samples — both shapes are here."""
    from ipeds_etl_spark.operators.quantile import exact_quantiles

    # one materialized 1-column projection feeds all consumers (stats
    # agg, histogram, both exact-quantile passes) — without it each
    # consumer re-plans its own parquet scan (9 scans in the first
    # audit; the events_temporal_split single-scan rule)
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_extendedprice").alias("v"))
        .localCheckpoint(eager=False)
    )
    s = li.agg(
        F.count(F.lit(1)).alias("n"), F.min("v").alias("lo"), F.max("v").alias("hi")
    )
    binned = (
        li.crossJoin(F.broadcast(s))
        .select(
            F.least(
                F.lit(_HQ_BINS - 1),
                F.floor(
                    (F.col("v") - F.col("lo")) * _HQ_BINS / (F.col("hi") - F.col("lo"))
                ),
            )
            .cast("int")
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("cum", F.sum("c").over(Window.orderBy("bin")))
    )
    tgt = s.select(
        "n",
        F.explode(F.array(*[F.lit(float(q)) for q in _HQ_QS])).alias("q"),
    ).select(
        "q",
        F.greatest(
            F.lit(0).cast("long"), (F.ceil(F.col("q") * F.col("n")) - 1).cast("long")
        ).alias("r"),
    )
    hit = (
        tgt.join(F.broadcast(binned), F.col("cum") > F.col("r"))
        .groupBy("q")
        .agg(F.min("bin").alias("bin"))
    )
    exact = exact_quantiles(
        li.withColumn("g", F.lit("all")), "v", list(_HQ_QS), ["g"], n_buckets=4096
    ).select("q", F.col("v").alias("exact_value"))
    est = F.col("lo") + (F.col("bin") + 1) * (
        (F.col("hi") - F.col("lo")) / _HQ_BINS
    )
    return (
        hit.join(exact, "q")
        .crossJoin(F.broadcast(s))
        .select(
            "q",
            est.alias("est_value"),
            "exact_value",
            (est - F.col("exact_value")).alias("err"),
        )
        .orderBy("q")
    )

# ===========================================================================
# Boilerplate chunk profile (CCNet-style repeated-passage removal signal)
# ===========================================================================
_BP_CHUNK = 8  # words per non-overlapping chunk
_BP_MINDOCS = 5  # chunk seen in >= this many docs => boilerplate

#: non-overlapping 8-word chunks, 1-based inclusive DuckDB slices; a
#: doc shorter than one chunk contributes itself; the (< CHUNK)-word
#: tail is DISCARDED on both engines (documented determinism choice)
_BP_CHUNKS_SQL = (
    "CASE WHEN len({w}) < 8 THEN [array_to_string({w}, ' ')] "
    "ELSE list_transform(range(len({w}) // 8), "
    "i -> array_to_string({w}[i*8+1:i*8+8], ' ')) END"
)


@_register(
    "docs_boilerplate_chunks",
    f"""
    WITH t AS (
      SELECT doc_id, source, {_WS_TOKENS.format(x='text')} AS w FROM documents),
    ch AS (
      SELECT doc_id, source, {_HASH10.format(x='g')} AS h
      FROM (SELECT doc_id, source, unnest({_BP_CHUNKS_SQL.format(w='w')}) AS g FROM t)),
    freq AS (
      SELECT h, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM ch GROUP BY h)
    SELECT ch.source,
           CAST(count(DISTINCT ch.doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN freq.n_docs >= {_BP_MINDOCS} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_boilerplate,
           CAST(SUM(CASE WHEN freq.n_docs >= {_BP_MINDOCS} THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS boilerplate_frac
    FROM ch JOIN freq ON ch.h = freq.h
    GROUP BY ch.source
    ORDER BY ch.source
    """,
)
def q_docs_boilerplate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate profile per source: chop every document into
    NON-overlapping 8-word chunks (the cheap cousin of the
    `docs_dup_ngram_fraction` sliding shingles — 1/8th the rows),
    call a chunk boilerplate when it appears in >= 5 distinct
    documents, and report each source's boilerplate instance
    fraction — the "repeated passage" signal CCNet-style pipelines
    use to strip headers/footers/navigation before training. Exact.

    Scale: chunking is map-side (one generated array per doc, O(doc)
    allocation); document frequency is one exchange on the chunk hash
    (map-combinable count over map-side-deduped (doc, h) pairs); the
    instance stream joins that O(distinct chunks) table on the same
    hash key — shuffle reuse — and the final source rollup is
    O(sources). A doc's sub-chunk tail is discarded identically on
    both engines."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", TX.tokens(F.col("text")).alias("w")
    )
    nch = F.size("w")
    chunks = F.when(
        nch < _BP_CHUNK, F.array(F.array_join("w", " "))
    ).otherwise(
        F.expr(
            f"transform(sequence(0, size(w) div {_BP_CHUNK} - 1), "
            f"i -> array_join(slice(w, i*{_BP_CHUNK}+1, {_BP_CHUNK}), ' '))"
        )
    )
    ch = d.select(
        "doc_id", "source", F.explode(F.transform(chunks, parity_hash)).alias("h")
    )
    freq = (
        ch.select("doc_id", "h")
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_docs_h"))
    )
    boiler = F.sum(F.when(F.col("n_docs_h") >= _BP_MINDOCS, 1).otherwise(0))
    return (
        ch.join(freq, "h")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_chunks"),
            boiler.cast("long").alias("n_boilerplate"),
            (boiler.cast("double") / F.count(F.lit(1))).alias("boilerplate_frac"),
        )
        .orderBy("source")
    )


# ===========================================================================
# Unigram surprisal in integer bits (libm-free LM quality proxy)
# ===========================================================================
@_register(
    "docs_unigram_surprisal",
    f"""
    WITH tok AS (
      SELECT source, unnest({_WS_TOKENS.format(x='text')}) AS t FROM documents),
    cnt AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY t),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total,
                   CAST(length(to_base(CAST(SUM(c) AS BIGINT), 2)) AS BIGINT)
                     AS total_bits FROM cnt)
    SELECT tok.source,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(SUM(total_bits - length(to_base(cnt.c, 2))) AS BIGINT) AS sum_bits,
           CAST(SUM(total_bits - length(to_base(cnt.c, 2))) AS DOUBLE) / count(*)
             AS avg_surprisal_bits
    FROM tok JOIN cnt ON tok.t = cnt.t CROSS JOIN tot
    GROUP BY tok.source
    ORDER BY tok.source
    """,
)
def q_docs_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality proxy WITHOUT libm: per-token surprisal in
    whole bits = bitlength(total_tokens) − bitlength(count(token)) —
    the integer floor-log2 approximation of −log2 p(token), computed
    via binary-string length (`conv(x,10,2)` ↔ `to_base(x,2)`), which
    is pure integer arithmetic and therefore bit-identical across
    engines (the house ban on ln/log2 — libm is not cross-engine
    deterministic — applied to LM scoring, same trick as the
    `docs_vocabulary` df-rank spelling). Per-source mean bits/token is
    the corpus-quality readout: sources full of rare junk tokens score
    high, repetitive boilerplate scores low — the CCNet perplexity
    filter's shape with a verifiable arithmetic core.

    Scale: one token-count exchange (map-combinable), one join of the
    token stream against the O(vocab) count table on the same token
    key, one O(sources) rollup + a broadcast 1-row total. When vocab
    fits in memory the join auto-broadcasts; at web scale it rides
    the token-hash exchange already paid by the count."""
    d = load_table(spark, sf_dir, "documents").select(
        "source", F.explode(TX.tokens(F.col("text"))).alias("t")
    )
    cnt = d.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(
        F.sum("c").alias("total"),
        F.length(F.conv(F.sum("c").cast("string"), 10, 2)).cast("long").alias(
            "total_bits"
        ),
    )
    bits_c = F.length(F.conv(F.col("c").cast("string"), 10, 2)).cast("long")
    joined = d.join(cnt, "t").crossJoin(F.broadcast(tot))
    surp = F.sum(F.col("total_bits") - bits_c)
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            surp.cast("long").alias("sum_bits"),
            (surp.cast("double") / F.count(F.lit(1))).alias("avg_surprisal_bits"),
        )
        .orderBy("source")
    )

# ===========================================================================
# KMV sketch set operations: pairwise union / Jaccard / intersection
# ===========================================================================
_KMV_K = 64


def _kmv_inter_oracle() -> str:
    from ipeds_etl_spark.operators import sketches as SK

    sk = SK.kmv_sketch_sql("CAST(user_id AS VARCHAR)", _KMV_K)
    merged = SK.kmv_merge_sql("a.sk", "b.sk", _KMV_K)
    union_est = SK.kmv_estimate_from_sql("m", _KMV_K)
    return f"""
    WITH s AS (SELECT event_type, {sk} AS sk FROM events GROUP BY event_type),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             a.sk AS ska, b.sk AS skb, {merged} AS m
      FROM s a JOIN s b ON a.event_type < b.event_type),
    est AS (
      SELECT type_a, type_b,
             {union_est} AS union_est,
             CAST(len(list_intersect(list_intersect(m, ska), skb)) AS DOUBLE)
               / len(m) AS jaccard_est
      FROM pairs),
    ud AS (SELECT DISTINCT event_type, user_id FROM events),
    ex AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS BIGINT) AS exact_common
      FROM ud a JOIN ud b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT est.type_a, est.type_b, est.union_est, est.jaccard_est,
           est.jaccard_est * est.union_est AS intersection_est,
           ex.exact_common
    FROM est JOIN ex ON est.type_a = ex.type_a AND est.type_b = ex.type_b
    ORDER BY est.type_a, est.type_b
    """


@_register("events_kmv_intersection", _kmv_inter_oracle())
def q_events_kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set-operation completion (the Theta-sketch algebra): from
    one bounded sketch per event type, estimate pairwise audience
    UNION (k-th min estimator on the merged sketch), JACCARD (fraction
    of the merged sketch's k minima present in BOTH input sketches —
    the classic KMV/Theta intersection rule), and INTERSECTION
    (jaccard × union), with the exact common-user count joined
    alongside as the calibration column. Everything runs on the
    deterministic parity hash, so DuckDB replays the estimates
    bit-for-bit (division and one product — no reordered float sums).

    Scale: sketch build is one map-combinable agg (state ≤ k hashes
    per type); the pair algebra runs on an O(types²) frame of
    k-length arrays. The exact side is one distinct + a user-keyed
    self-join — the audit you run at gate scale, while the sketch
    path is the one that survives 100 TB."""
    from ipeds_etl_spark.operators import sketches as SK

    e = load_table(spark, sf_dir, "events")
    uid = F.col("user_id").cast("string")
    s = e.groupBy("event_type").agg(SK.kmv_sketch(uid, _KMV_K).alias("sk"))
    a, b = s.alias("a"), s.alias("b")
    pairs = a.join(b, F.col("a.event_type") < F.col("b.event_type")).select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
        F.col("a.sk").alias("ska"),
        F.col("b.sk").alias("skb"),
        SK.kmv_merge(F.col("a.sk"), F.col("b.sk"), _KMV_K).alias("m"),
    )
    union_est = SK.kmv_estimate_from(F.col("m"), _KMV_K)
    jacc = (
        F.size(F.array_intersect(F.array_intersect("m", "ska"), "skb")).cast("double")
        / F.size("m")
    )
    est = pairs.select(
        "type_a",
        "type_b",
        union_est.alias("union_est"),
        jacc.alias("jaccard_est"),
    )
    ud = e.select("event_type", "user_id").distinct()
    ua, ub = ud.alias("ua"), ud.alias("ub")
    ex = (
        ua.join(
            ub,
            (F.col("ua.user_id") == F.col("ub.user_id"))
            & (F.col("ua.event_type") < F.col("ub.event_type")),
        )
        .groupBy(
            F.col("ua.event_type").alias("type_a"),
            F.col("ub.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("exact_common"))
    )
    return (
        est.join(ex, ["type_a", "type_b"])
        .select(
            "type_a",
            "type_b",
            "union_est",
            "jaccard_est",
            (F.col("jaccard_est") * F.col("union_est")).alias("intersection_est"),
            "exact_common",
        )
        .orderBy("type_a", "type_b")
    )


# ===========================================================================
# Sliding-window HLL: hourly registers merged across adjacent hours
# ===========================================================================
def _hll_sliding_oracle() -> str:
    from ipeds_etl_spark.operators import sketches as SK

    b = SK.hll_bucket_sql("CAST(user_id AS VARCHAR)")
    r = SK.hll_rho_sql("CAST(user_id AS VARCHAR)")
    pow_r = SK.hll_register_pow_sql("r")
    est = SK.hll_estimate_from_registers_sql("sp", "nreg")
    return f"""
    WITH h AS (
      SELECT date_trunc('hour', ts) AS hr, {b} AS bucket, {r} AS rho FROM events),
    hourly AS (
      SELECT hr, bucket, max(rho) AS r FROM h GROUP BY hr, bucket),
    contrib AS (
      SELECT unnest([hr, hr + INTERVAL 1 HOUR]) AS win_end, bucket, r FROM hourly),
    regs AS (SELECT win_end, bucket, max(r) AS r FROM contrib GROUP BY win_end, bucket),
    per AS (SELECT win_end, SUM({pow_r}) AS sp, CAST(count(*) AS BIGINT) AS nreg
            FROM regs GROUP BY win_end),
    ex AS (
      SELECT w.win_end AS win_end, CAST(count(DISTINCT e.user_id) AS BIGINT) AS exact_users
      FROM (SELECT DISTINCT win_end FROM contrib) w
      JOIN events e
        ON date_trunc('hour', e.ts) BETWEEN w.win_end - INTERVAL 1 HOUR AND w.win_end
      GROUP BY w.win_end)
    SELECT strftime(per.win_end, '%Y-%m-%d %H:00') AS window_end_hour,
           ex.exact_users, {est} AS hll_users,
           ({est} - ex.exact_users) / ex.exact_users AS rel_err
    FROM per JOIN ex ON per.win_end = ex.win_end
    ORDER BY window_end_hour
    """


@_register("events_hll_sliding", _hll_sliding_oracle())
def q_events_hll_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2-hour distinct-user estimates WITHOUT rescanning: the
    raw stream is compacted once into hourly HLL registers; each hour
    then contributes its registers to the two sliding windows that
    contain it (a map-side explode of the O(hours × 64) register
    frame), and windows merge by MAX — the mergeable-sketch property
    doing the work a naive rolling COUNT(DISTINCT) would pay a full
    band-join for (`events_dau_wau_stickiness` documents that exact
    shape; this is its sketch dual). Exact per-window counts ride
    alongside as the calibration column.

    Scale: ONE corpus-sized agg (hour × bucket registers); everything
    downstream is O(hours × 64) rows. State per window is exactly 64
    small ints regardless of cardinality — the register-reuse pattern
    that makes sliding uniques tractable on an unbounded stream."""
    from ipeds_etl_spark.operators import sketches as SK

    e = load_table(spark, sf_dir, "events")
    uid = F.col("user_id").cast("string")
    h = e.select(
        F.date_trunc("hour", "ts").alias("hr"),
        SK.hll_bucket(uid).alias("bucket"),
        SK.hll_rho(uid).alias("rho"),
    )
    hourly = h.groupBy("hr", "bucket").agg(F.max("rho").alias("r"))
    contrib = hourly.select(
        F.explode(
            F.array(F.col("hr"), F.col("hr") + F.expr("INTERVAL 1 HOUR"))
        ).alias("win_end"),
        "bucket",
        "r",
    )
    regs = contrib.groupBy("win_end", "bucket").agg(F.max("r").alias("r"))
    per = regs.groupBy("win_end").agg(
        F.sum(SK.hll_register_pow(F.col("r"))).alias("sp"),
        F.count(F.lit(1)).alias("nreg"),
    )
    # exact side by the SAME covering-window explode (an event's hour
    # feeds exactly the 2 windows that contain it) — an equi-keyed
    # distinct-count, NOT a band join: the first sf1 smoke caught the
    # inequality-join spelling planning a BroadcastNestedLoopJoin of
    # windows × events (126 s at sf1; this form is 4 s)
    ex = (
        e.select(F.date_trunc("hour", "ts").alias("ehr"), "user_id")
        .select(
            F.explode(
                F.array(F.col("ehr"), F.col("ehr") + F.expr("INTERVAL 1 HOUR"))
            ).alias("win_end"),
            "user_id",
        )
        .groupBy("win_end")
        .agg(F.countDistinct("user_id").alias("exact_users"))
    )
    est = SK.hll_estimate_from_registers(F.col("sp"), F.col("nreg"))
    return (
        per.join(ex, "win_end")
        .select(
            F.date_format("win_end", "yyyy-MM-dd HH:00").alias("window_end_hour"),
            "exact_users",
            est.alias("hll_users"),
            ((est - F.col("exact_users")) / F.col("exact_users")).alias("rel_err"),
        )
        .orderBy("window_end_hour")
    )

# ===========================================================================
# Bigram conditionals: top next-token per head with conditional prob
# ===========================================================================
@_register(
    "docs_bigram_conditionals",
    f"""
    WITH t AS (SELECT {_WS_TOKENS.format(x='text')} AS w FROM documents),
    bg AS (
      SELECT s.a AS head, s.b AS nxt
      FROM (SELECT unnest(list_transform(range(len(w) - 1),
                   i -> {{'a': w[i+1], 'b': w[i+2]}})) AS s
            FROM t WHERE len(w) >= 2)),
    pc AS (SELECT head, nxt, CAST(count(*) AS BIGINT) AS pair_n
           FROM bg GROUP BY head, nxt),
    hc AS (SELECT head, CAST(SUM(pair_n) AS BIGINT) AS head_n FROM pc GROUP BY head),
    top AS (
      SELECT head, nxt, pair_n FROM pc
      QUALIFY row_number() OVER (PARTITION BY head ORDER BY pair_n DESC, nxt) = 1)
    SELECT top.head, top.nxt AS top_next, top.pair_n, hc.head_n,
           CAST(top.pair_n AS DOUBLE) / hc.head_n AS cond_p
    FROM top JOIN hc ON top.head = hc.head
    ORDER BY top.head
    """,
)
def q_docs_bigram_conditionals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-head-token most-likely next token with its conditional
    probability — the bigram-LM table a fertility/packing pipeline
    inspects to sanity-check a tokenizer's merge candidates (the BPE
    scorer in `operators/bpe.py` ranks exactly these adjacent-pair
    counts). Bigrams are generated MAP-SIDE from each doc's token
    array (no self-join on position anywhere); the per-head winner is
    the associative min(struct(-count, token)) pick — the
    `docs_golden_record` survivorship idiom, so no window touches the
    corpus-sized pair stream on the Spark side (the oracle uses
    QUALIFY, its SinglePartition being oracle-only as usual). Count
    arithmetic exact; ONE division per head row.

    Scale: one exchange on (head, next) for pair counts (map-side
    combinable), then O(vocab²)-bounded frames — head totals and the
    argmax both ride a second small exchange on head."""
    d = load_table(spark, sf_dir, "documents").select(
        TX.tokens(F.col("text")).alias("w")
    )
    bg = d.filter(F.size("w") >= 2).select(
        F.explode(
            F.expr("transform(sequence(0, size(w) - 2), i -> struct(w[i] AS a, w[i+1] AS b))")
        ).alias("s")
    ).select(F.col("s.a").alias("head"), F.col("s.b").alias("nxt"))
    pc = bg.groupBy("head", "nxt").agg(F.count(F.lit(1)).alias("pair_n"))
    per_head = pc.groupBy("head").agg(
        F.sum("pair_n").alias("head_n"),
        F.min(F.struct((-F.col("pair_n")).alias("neg_n"), F.col("nxt").alias("tok"))).alias(
            "w_"
        ),
    )
    return per_head.select(
        "head",
        F.col("w_.tok").alias("top_next"),
        (-F.col("w_.neg_n")).cast("long").alias("pair_n"),
        F.col("head_n").cast("long").alias("head_n"),
        ((-F.col("w_.neg_n")).cast("double") / F.col("head_n")).alias("cond_p"),
    ).orderBy("head")


# ===========================================================================
# Customer spend-decile YoY transition matrix (mobility analysis)
# ===========================================================================
_DEC_Y1, _DEC_Y2 = 1996, 1997
_DEC_QS = [round(0.1 * i, 1) for i in range(1, 10)]


def _decile_oracle() -> str:
    qlist = ", ".join(str(q) for q in _DEC_QS)
    bucket = " + ".join(
        f"CASE WHEN spend > cuts[{i}] THEN 1 ELSE 0 END"
        for i in range(1, len(_DEC_QS) + 1)
    )
    return f"""
    WITH sp AS (
      SELECT o_custkey, year(o_orderdate) AS y,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
      FROM orders WHERE year(o_orderdate) IN ({_DEC_Y1}, {_DEC_Y2})
      GROUP BY 1, 2),
    cuts AS (
      SELECT y, quantile_disc(spend, [{qlist}]) AS cuts FROM sp GROUP BY y),
    dec AS (
      SELECT sp.o_custkey, sp.y, CAST(1 + {bucket} AS INTEGER) AS decile
      FROM sp JOIN cuts ON sp.y = cuts.y)
    SELECT a.decile AS decile_{_DEC_Y1}, b.decile AS decile_{_DEC_Y2},
           CAST(count(*) AS BIGINT) AS n_customers
    FROM dec a JOIN dec b ON a.o_custkey = b.o_custkey
     AND a.y = {_DEC_Y1} AND b.y = {_DEC_Y2}
    GROUP BY 1, 2
    ORDER BY 1, 2
    """


@_register("customer_decile_transition", _decile_oracle())
def q_customer_decile_transition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year spend-decile mobility matrix: customers are
    bucketed into WITHIN-YEAR spend deciles and the (decile_y1 →
    decile_y2) transition counts come out — the cohort-mobility
    readout behind churn/upsell models, and for a training-data
    pipeline the drift check on any score whose deciles should be
    stable across snapshots. Deciles use exact per-year quantile
    cutoffs from the two-pass histogram quantile (`exact_quantiles`
    with year as the group — NEVER ntile(), whose global sort is one
    task per partition clause), and bucket assignment is the RFM
    cut-point CASE chain over a broadcast 9-cutoff row. Customers
    active in only one of the two years drop out via the inner join
    (documented choice — the matrix is over the retained cohort).

    Scale: one (customer, year) spend agg; quantile's two passes over
    it; bucketing map-side against broadcast cutoffs; the transition
    join is customer-keyed between two year-slices of the same frame;
    output ≤ 100 cells."""
    from ipeds_etl_spark.operators.quantile import exact_quantiles

    o = load_table(spark, sf_dir, "orders")
    sp = (
        o.filter(F.year("o_orderdate").isin(_DEC_Y1, _DEC_Y2))
        .groupBy(
            "o_custkey", F.year("o_orderdate").alias("y")
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend"))
        .localCheckpoint(eager=False)
    )
    cuts = (
        exact_quantiles(sp, "spend", _DEC_QS, ["y"])
        .groupBy("y")
        .agg(F.sort_array(F.collect_list("spend")).alias("cuts"))
    )
    bucket = F.lit(1)
    for i in range(1, len(_DEC_QS) + 1):
        bucket = bucket + F.when(
            F.col("spend") > F.element_at("cuts", i), 1
        ).otherwise(0)
    dec = sp.join(F.broadcast(cuts), "y").select(
        "o_custkey", "y", bucket.cast("int").alias("decile")
    )
    a, b = dec.alias("a"), dec.alias("b")
    return (
        a.filter(F.col("a.y") == _DEC_Y1)
        .join(
            b.filter(F.col("b.y") == _DEC_Y2),
            F.col("a.o_custkey") == F.col("b.o_custkey"),
        )
        .groupBy(
            F.col("a.decile").alias(f"decile_{_DEC_Y1}"),
            F.col("b.decile").alias(f"decile_{_DEC_Y2}"),
        )
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(f"decile_{_DEC_Y1}", f"decile_{_DEC_Y2}")
    )

# ===========================================================================
# Two-sample Kolmogorov-Smirnov drift statistic (exact, cross-multiplied)
# ===========================================================================
_KS_A, _KS_B = "en", "de"


@_register(
    "docs_length_ks_drift",
    f"""
    WITH v AS (
      SELECT n_chars,
             CAST(SUM(CASE WHEN lang = '{_KS_A}' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN lang = '{_KS_B}' THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM documents WHERE lang IN ('{_KS_A}', '{_KS_B}')
      GROUP BY n_chars),
    c AS (
      SELECT n_chars,
             SUM(ca) OVER (ORDER BY n_chars) AS cuma,
             SUM(cb) OVER (ORDER BY n_chars) AS cumb
      FROM v),
    t AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM v),
    d AS (
      SELECT n_chars, abs(cuma * nb - cumb * na) AS dnum, na, nb
      FROM c CROSS JOIN t)
    SELECT CAST(min(CASE WHEN dnum = m THEN n_chars END) AS BIGINT) AS ks_at_n_chars,
           CAST(m AS BIGINT) AS ks_numerator,
           CAST(min(na) * min(nb) AS BIGINT) AS ks_denominator,
           CAST(m AS DOUBLE) / (min(na) * min(nb)) AS ks_stat
    FROM d CROSS JOIN (SELECT max(dnum) AS m FROM d) mm
    GROUP BY m
    """,
)
def q_docs_length_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic between the
    'en' and 'de' document-length distributions — the
    distribution-shift alarm an eval-hygiene pipeline runs on any
    feature whose drift would silently skew training (the continuous
    companion to `docs_source_lang_drift`'s categorical chi-square).
    The ECDF difference is cross-multiplied to stay integer-exact
    (|cumA·nB − cumB·nA|, one IEEE division at the very end), and the
    argmax location comes out with a min-tiebreak so the whole row is
    a total function of the data.

    Scale: one map-combinable count agg compacts the corpus to
    O(distinct lengths) rows; the cumulative windows run over that
    compacted frame (bounded by the value domain, not the corpus —
    the `events_rolling_anomaly` compaction argument; swap in
    `global_prefix_sum` if the domain were ever corpus-sized)."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("lang").isin(_KS_A, _KS_B)
    )
    v = d.groupBy("n_chars").agg(
        F.sum(F.when(F.col("lang") == _KS_A, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("lang") == _KS_B, 1).otherwise(0)).alias("cb"),
    )
    w = Window.orderBy("n_chars")
    c = v.select(
        "n_chars",
        F.sum("ca").over(w).alias("cuma"),
        F.sum("cb").over(w).alias("cumb"),
    )
    t = v.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    dd = c.crossJoin(F.broadcast(t)).select(
        "n_chars",
        F.abs(F.col("cuma") * F.col("nb") - F.col("cumb") * F.col("na")).alias("dnum"),
        "na",
        "nb",
    )
    mm = dd.agg(F.max("dnum").alias("m"))
    return (
        dd.crossJoin(F.broadcast(mm))
        .groupBy("m")
        .agg(
            F.min(F.when(F.col("dnum") == F.col("m"), F.col("n_chars")))
            .cast("long")
            .alias("ks_at_n_chars"),
            F.min("na").alias("_na"),
            F.min("nb").alias("_nb"),
        )
        .select(
            "ks_at_n_chars",
            F.col("m").cast("long").alias("ks_numerator"),
            (F.col("_na") * F.col("_nb")).cast("long").alias("ks_denominator"),
            (F.col("m").cast("double") / (F.col("_na") * F.col("_nb"))).alias(
                "ks_stat"
            ),
        )
    )


# ===========================================================================
# Label-centroid distance matrix on quantized-exact embedding sums
# ===========================================================================
_CENT_Q = 1000  # milli-unit quantization of embedding components


@_register(
    "emb_label_centroid_distances",
    f"""
    WITH q AS (
      SELECT label, i AS dim,
             CAST(floor(embedding[i] * {_CENT_Q}) AS BIGINT) AS qv
      FROM embeddings
      CROSS JOIN (SELECT unnest(range(1, 65)) AS i)),
    s AS (SELECT label, dim,
                 CAST((CAST(SUM(qv) AS BIGINT) * 1000) // count(*) AS BIGINT) AS c
          FROM q GROUP BY label, dim),
    p AS (
      SELECT a.label AS label_a, b.label AS label_b,
             CAST(SUM((a.c - b.c) * (a.c - b.c)) AS BIGINT) AS num
      FROM s a JOIN s b ON a.dim = b.dim AND a.label < b.label
      GROUP BY 1, 2)
    SELECT label_a, label_b,
           sqrt(CAST(num AS DOUBLE)) / {_CENT_Q * 1000} AS centroid_dist
    FROM p ORDER BY label_a, label_b
    """,
)
def q_emb_label_centroid_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Euclidean distances between per-label embedding
    centroids — the cluster-separation / embedding-drift readout an
    ANN pipeline tracks across model versions. Components are
    floor-quantized to milli-units FIRST (one correctly-rounded
    multiply + floor per value, exact BIGINT sums), then each centroid
    coordinate is itself fixed-pointed to the micro grid by one
    truncating division (S·1000 div n) — so the squared-difference
    numerator is bounded by |c| ≤ 10⁶ ⇒ Σ64·(2·10⁶)² ≈ 2.6e14 < 2^53
    REGARDLESS of corpus size (the first spelling cross-multiplied raw
    sums, whose square passed 2^53 just beyond sf0.1 — this form's
    bound is n-free by construction). Final step: one correctly-
    rounded sqrt + one division on identical inputs in both engines.

    Scale: one (label × 64) sum agg over the exploded components —
    map-combinable, output O(labels × dims); the pair join runs on
    that tiny frame. The corpus is touched once. Verified at 100×
    sf0.1 (500k vectors) by the quad smoke."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.select(
        "label",
        F.posexplode("embedding").alias("dim0", "x"),
    ).select(
        "label",
        (F.col("dim0") + 1).alias("dim"),
        F.floor(F.col("x").cast("double") * _CENT_Q).cast("bigint").alias("qv"),
    )
    s = q.groupBy("label", "dim").agg(
        F.expr("CAST((CAST(SUM(qv) AS BIGINT) * 1000) div count(*) AS BIGINT)").alias(
            "c"
        )
    )
    a, b = s.alias("a"), s.alias("b")
    diff = F.col("a.c") - F.col("b.c")
    p = (
        a.join(
            b,
            (F.col("a.dim") == F.col("b.dim")) & (F.col("a.label") < F.col("b.label")),
        )
        .groupBy(F.col("a.label").alias("label_a"), F.col("b.label").alias("label_b"))
        .agg(F.sum(diff * diff).alias("num"))
    )
    return p.select(
        "label_a",
        "label_b",
        (F.sqrt(F.col("num").cast("double")) / (_CENT_Q * 1000)).alias(
            "centroid_dist"
        ),
    ).orderBy("label_a", "label_b")

# ===========================================================================
# Zipf rank-frequency bit-slope (libm-free power-law check)
# ===========================================================================
@_register(
    "docs_zipf_bitslope",
    f"""
    WITH cnt AS (
      SELECT t, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest({_WS_TOKENS.format(x='text')}) AS t FROM documents)
      GROUP BY t),
    rk AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, t) AS r FROM cnt),
    pts AS (
      SELECT CAST(length(to_base(r, 2)) AS BIGINT) AS x,
             CAST(length(to_base(c, 2)) AS BIGINT) AS y
      FROM rk),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM pts)
    SELECT n AS n_vocab,
           CAST(((n * sxy - sx * sy) * 1000) // (n * sxx - sx * sx) AS BIGINT)
             AS zipf_bitslope_milli
    FROM m
    """,
)
def q_docs_zipf_bitslope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf power-law check without libm: OLS slope of
    bitlength(count) against bitlength(rank) over the vocabulary —
    integer-granularity log-log regression (a Zipfian corpus gives a
    slope near −1000 milli; boilerplate-heavy or truncated corpora
    bend it), combining the `docs_unigram_surprisal` bit-log trick
    with the `supplier_price_trend` exact-moment OLS. Every number is
    integer until the final scaled truncating division — bit-identical
    across engines by construction.

    Scale: one token-count exchange; ranks via the distributed
    two-phase `global_row_number` over the O(vocab) count table (the
    oracle's single-task row_number window is oracle-only); moments
    are one map-combinable 1-row agg."""
    from ipeds_etl_spark.operators.layout import global_row_number

    d = load_table(spark, sf_dir, "documents").select(
        F.explode(TX.tokens(F.col("text"))).alias("t")
    )
    cnt = d.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    rk = global_row_number(
        cnt.select((-F.col("c")).alias("negc"), "t", "c"), ["negc", "t"], "r"
    )
    bits = lambda col: F.length(F.conv(F.col(col).cast("string"), 10, 2)).cast("long")
    pts = rk.select(bits("r").alias("x"), bits("c").alias("y"))
    m = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return m.select(
        F.col("n").alias("n_vocab"),
        F.expr(
            "CAST(((n * sxy - sx * sy) * 1000) div (n * sxx - sx * sx) AS BIGINT)"
        ).alias("zipf_bitslope_milli"),
    )


# ===========================================================================
# Within-window event dedup (tumbling 10-minute, keep earliest)
# ===========================================================================
_WD_WIN_US = 600_000_000  # 10 minutes


@_register(
    "events_window_dedup",
    f"""
    WITH e AS (
      SELECT event_type, user_id, epoch_us(ts) AS t, event_id,
             epoch_us(ts) // {_WD_WIN_US} AS win
      FROM events),
    k AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept
      FROM (SELECT event_type, user_id, win, min(t) AS t0
            FROM e GROUP BY event_type, user_id, win)
      GROUP BY event_type),
    a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_events FROM e GROUP BY 1)
    SELECT a.event_type, a.n_events, k.n_kept,
           a.n_events - k.n_kept AS n_dropped,
           CAST(a.n_events - k.n_kept AS DOUBLE) / a.n_events AS drop_frac
    FROM a JOIN k ON a.event_type = k.event_type
    ORDER BY a.event_type
    """,
)
def q_events_window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window event dedup readout: within each 10-minute
    window, repeated (user, type) events collapse to the earliest one
    — the batch twin of the stream's dropDuplicatesWithinWatermark
    (same key, same window arithmetic), reported as kept/dropped
    counts per type. Window id is integer floor-division of epoch
    micros — exact on both engines; no session state needed because
    the window is TUMBLING (the sessionize operator handles the
    gap-based case).

    Scale: one (type, user, window) agg — map-combinable, state one
    row per active key-window — plus an O(types) rollup. This is the
    cheap first pass a pipeline runs before the expensive content
    dedup: at 100 TB it kills the retry/duplicate-delivery storm for
    the cost of a single exchange."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        F.unix_micros("ts").alias("t"),
        F.expr(f"unix_micros(ts) div {_WD_WIN_US}").alias("win"),
    )
    kept = (
        e.groupBy("event_type", "user_id", "win")
        .agg(F.min("t").alias("t0"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    alln = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))
    return (
        alln.join(kept, "event_type")
        .select(
            "event_type",
            "n_events",
            "n_kept",
            (F.col("n_events") - F.col("n_kept")).alias("n_dropped"),
            (
                (F.col("n_events") - F.col("n_kept")).cast("double")
                / F.col("n_events")
            ).alias("drop_frac"),
        )
        .orderBy("event_type")
    )


# ===========================================================================
# Supplier concentration per part (Herfindahl-Hirschman index)
# ===========================================================================
@_register(
    "parts_supplier_hhi",
    """
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,0))) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2),
    p AS (
      SELECT l_partkey,
             CAST(count(*) AS BIGINT) AS n_suppliers,
             CAST(SUM(q * q) AS BIGINT) AS sq2,
             CAST(SUM(q) AS BIGINT) AS qt
      FROM ps GROUP BY 1)
    SELECT l_partkey, n_suppliers,
           CAST((sq2 * 10000) // (qt * qt) AS BIGINT) AS hhi_bp
    FROM p WHERE qt > 0
    ORDER BY l_partkey
    """,
)
def q_parts_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-concentration monitor: the Herfindahl–Hirschman index of
    each part's supplier quantity shares, in basis points —
    HHI = Σ share² = Σq²·10000 div (Σq)², cross-multiplied so the
    whole figure is one truncating integer division (10000 bp = single
    supplier, 10000/n = perfectly split). The procurement-risk dual of
    `suppliers_dominant_parts`' share threshold.

    Scale: two map-combinable aggs — (part, supplier) quantity, then
    the per-part moment rollup; both ride the same partkey-prefixed
    key, so AQE coalesces them into one effective exchange. Output
    O(parts). Magnitude: q ≤ 50·lines-per-(part,supplier); q²·10⁴
    needs ~2^47 per part at 1000× this density — BIGINT-safe."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,0)")).cast("bigint").alias("q")
    )
    p = ps.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum(F.col("q") * F.col("q")).alias("sq2"),
        F.sum("q").alias("qt"),
    )
    return (
        p.filter(F.col("qt") > 0)
        .select(
            "l_partkey",
            "n_suppliers",
            F.expr("CAST((sq2 * 10000) div (qt * qt) AS BIGINT)").alias("hhi_bp"),
        )
        .orderBy("l_partkey")
    )

# ===========================================================================
# Audio-window chunk profile through the mapInPandas framing operator
# ===========================================================================
_AW_WIN, _AW_HOP = 64, 48


@_register(
    "multimodal_audio_windows",
    f"""
    WITH d AS (
      SELECT doc_id, source, text, length(text) AS n,
             CASE WHEN length(text) <= {_AW_WIN} THEN 1
                  ELSE (length(text) - {_AW_WIN} + {_AW_HOP} - 1) // {_AW_HOP} + 1 END
               AS k
      FROM documents),
    w AS (
      SELECT doc_id, source,
             unnest(list_transform(range(k),
                    i -> substr(text, CAST(i * {_AW_HOP} + 1 AS INT), {_AW_WIN})))
               AS win
      FROM d),
    f AS (
      SELECT doc_id, source, sha256(win) AS wsha,
             list_sum(list_transform(range(len(win)),
                      j -> ascii(substr(win, CAST(j + 1 AS INT), 1)))) AS energy
      FROM w)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(count(DISTINCT wsha) AS BIGINT) AS n_distinct_windows,
           CAST(1.0 - CAST(count(DISTINCT wsha) AS DOUBLE) / count(*) AS DOUBLE)
             AS dup_frac,
           CAST(SUM(energy) AS BIGINT) AS sum_energy
    FROM f GROUP BY source ORDER BY source
    """,
)
def q_multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIO-modality plumbing end-to-end: payloads frame into
    overlapping 64-byte windows with a 48-byte hop (the STFT frame
    shape) through the Arrow-batched `window_audio` mapInPandas
    operator — real schema, real batch expansion, stubbed decode per
    the container's no-codec policy — then a per-source chunk profile:
    window count, distinct fingerprints, duplicate-window fraction
    (the audio-chunk dedup signal), and total byte-energy. The oracle
    replays the framing arithmetic with ASCII substr (payload = UTF-8
    of single-byte text, so char slicing ≡ byte slicing) and the
    energy as an ascii-code list sum — the whole Python stage is
    byte-for-byte verifiable.

    Scale: framing is map-only (~n/hop rows per payload); the profile
    is one source-keyed agg with an Expand for the distinct. The only
    Python stage is the documented Arrow mapInPandas — everything
    before and after is JVM."""
    from ipeds_etl_spark.operators.multimodal import attach_payload, window_audio

    d = load_table(spark, sf_dir, "documents")
    src = d.select("doc_id", "source")
    w = window_audio(
        attach_payload(d, "text", "doc_id", modality="audio"),
        win=_AW_WIN,
        hop=_AW_HOP,
    )
    return (
        w.join(F.broadcast(src), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.countDistinct("window_sha").alias("n_distinct_windows"),
            (
                F.lit(1.0)
                - F.countDistinct("window_sha").cast("double") / F.count(F.lit(1))
            ).alias("dup_frac"),
            F.sum("energy").alias("sum_energy"),
        )
        .orderBy("source")
    )

# ===========================================================================
# Distributed PCA: top principal component by integer power iteration
# ===========================================================================
_PCA_DIMS = 64
_PCA_ITERS = 3


def _pca_oracle() -> str:
    q = (
        "SELECT vec_id, i, CAST(floor(embedding[i] * 1000) AS BIGINT) AS qv "
        "FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i)"
    )
    # unrolled integer power iteration over the 64x64 scaled matrix
    iters = []
    prev = "v0"
    for k in range(1, _PCA_ITERS + 1):
        iters.append(
            f"w{k} AS (SELECT c.i AS i, CAST(SUM(c.cn * {prev}.v) AS BIGINT) AS w "
            f"FROM c JOIN {prev} ON c.j = {prev}.i GROUP BY c.i), "
            f"m{k} AS (SELECT max(abs(w)) AS m FROM w{k}), "
            f"v{k} AS (SELECT i, CAST(w // greatest(1, m // 1000) AS BIGINT) AS v "
            f"FROM w{k} CROSS JOIN m{k})"
        )
        prev = f"v{k}"
    return f"""
    WITH q AS ({q}),
    s AS (SELECT i, CAST(SUM(qv) AS BIGINT) AS si, CAST(count(*) AS BIGINT) AS n
          FROM q GROUP BY i),
    c AS (
      SELECT a.i AS i, b.i AS j,
             CAST((min(sa.n) * CAST(SUM(a.qv * b.qv) AS BIGINT)
                   - min(sa.si) * min(sb.si)) // min(sa.n) AS BIGINT) AS cn
      FROM q a JOIN q b ON a.vec_id = b.vec_id
      JOIN s sa ON sa.i = a.i JOIN s sb ON sb.i = b.i
      GROUP BY a.i, b.i),
    v0 AS (SELECT i, CAST(1000 AS BIGINT) AS v FROM s),
    {", ".join(iters)}
    SELECT i AS dim, v AS loading_milli FROM {prev} ORDER BY dim
    """


@_register("emb_pca_power_iteration", _pca_oracle())
def q_emb_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding corpus by POWER
    ITERATION in exact integer arithmetic — the PageRank/Markov
    scaled-BIGINT recipe applied to PCA, the eigen-analysis an
    embedding pipeline runs to detect collapsed dimensions / dominant
    nuisance directions before ANN indexing. Components quantize to
    milli-units; the scaled covariance C·n = n·Σqᵢqⱼ − ΣqᵢΣqⱼ is an
    exact BIGINT re-normalized by one truncating div n; each of the 3
    iterations is a 64-row matrix-vector product with max-|component|
    renormalization to the 1000 grid (truncating div both engines).
    The emitted 64-vector is a total function of the data — no
    eigensolver, no floats, no libm.

    Magnitude audit: |qv| ≤ 1000 so Σqᵢqⱼ ≤ n·10⁶, cn ≤ n·10⁶ after
    the div-n renormalization, and w = Σⱼ cn·v ≤ 64·n·10⁹ — BIGINT-
    safe through n ≈ 10⁵ vectors per this geometry; beyond that,
    promote cn to DECIMAL(38,0) (the oracle's HUGEINT already is).

    Scale: the (i,j) cross-moment agg rides a single vec_id-keyed
    self-join whose fan-out is the fixed 64×64 dim grid, partial-
    aggregated map-side (a per-row map-side outer-product fold was
    measured 2× SLOWER at sf0.1 — the 4096-struct array allocation per
    row costs more than the join machinery — and reverted, opt r13).
    The dim-marginal frame (64 rows) and each iteration's w (64 rows)
    are lazily checkpointed (opt r13, guide §2.4/§5): w feeds both the
    renorm max and the next v, and v0 fed every iteration's chain —
    unmaterialized, the corpus-sized marginal agg re-ran 2^ITERS = 8
    times (measured: 8 embeddings scans in the plan). Everything after
    the corpus passes is O(dims²) = 4096 rows."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.select(
        "vec_id", F.posexplode("embedding").alias("dim0", "x")
    ).select(
        "vec_id",
        (F.col("dim0") + 1).alias("i"),
        F.floor(F.col("x").cast("double") * 1000).cast("bigint").alias("qv"),
    )
    s = (
        q.groupBy("i")
        .agg(F.sum("qv").alias("si"), F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    a, b = q.alias("a"), q.alias("b")
    sij = (
        a.join(b, "vec_id")
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(F.sum(F.col("a.qv") * F.col("b.qv")).alias("sij"))
    )
    sa = s.select(F.col("i").alias("i"), F.col("si").alias("sa_si"), "n")
    sb = s.select(F.col("i").alias("j"), F.col("si").alias("sb_si"))
    c = (
        sij.join(F.broadcast(sa), "i")
        .join(F.broadcast(sb), "j")
        .select(
            "i",
            "j",
            F.expr("CAST((n * sij - sa_si * sb_si) div n AS BIGINT)").alias("cn"),
        )
        .localCheckpoint(eager=False)
    )
    v = s.select("i", F.lit(1000).cast("bigint").alias("v"))
    for _ in range(_PCA_ITERS):
        w = (
            c.join(v.select(F.col("i").alias("j"), "v"), "j")
            .groupBy("i")
            .agg(F.sum(F.col("cn") * F.col("v")).alias("w"))
            .localCheckpoint(eager=False)
        )
        m = w.agg(F.max(F.abs("w")).alias("m"))
        v = (
            w.crossJoin(F.broadcast(m))
            .select(
                "i",
                F.expr("CAST(w div greatest(1, m div 1000) AS BIGINT)").alias("v"),
            )
        )
    return v.select(F.col("i").alias("dim"), F.col("v").alias("loading_milli")).orderBy(
        "dim"
    )

# ===========================================================================
# Seasonal (dow x hour) baseline anomaly cells
# ===========================================================================
@_register(
    "events_seasonal_anomaly",
    """
    WITH cell AS (
      SELECT CAST(ts AS DATE) AS d, isodow(ts) AS dow, hour(ts) AS hr,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2, 3),
    base AS (
      SELECT dow, hr,
             CAST(count(*) AS BIGINT) AS k,
             CAST(SUM(n) AS BIGINT) AS s,
             CAST(SUM(n * n) AS BIGINT) AS ss
      FROM cell GROUP BY dow, hr)
    SELECT strftime(cell.d, '%Y-%m-%d') AS day,
           cell.dow AS dow, cell.hr AS hr, cell.n AS n,
           CAST(base.s AS DOUBLE) / base.k AS baseline_mean,
           CAST(cell.n * base.k - base.s AS BIGINT) AS dev_num,
           CAST(base.k AS BIGINT) AS dev_den,
           (CAST(cell.n * base.k - base.s AS BIGINT)
              * CAST(cell.n * base.k - base.s AS BIGINT))
             > 4 * base.k * (base.k * base.ss - base.s * base.s) AS is_anomaly
    FROM cell JOIN base ON cell.dow = base.dow AND cell.hr = base.hr
    ORDER BY day, cell.dow, cell.hr
    """,
)
def q_events_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-profile anomaly detection: each (day, dow, hour) cell's
    event count against the BASELINE of all same-(dow, hour) cells —
    the weekday-rhythm monitor that catches "Tuesday 3pm is dead this
    week" where a plain rolling window (`events_rolling_anomaly`)
    would average across unlike hours. The 2σ test is fully
    cross-multiplied: (n·k − s)² > 4·k·(k·ss − s²) — both sides exact
    BIGINT (dev² and 4k²·var are the z²>4 inequality scaled by k²),
    so the anomaly flag is engine-exact with zero divisions; the
    reported baseline mean is the single IEEE division.

    Scale: one map-combinable (day, dow, hour) compaction — the raw
    stream never reaches anything wider — then an O(168) baseline agg
    broadcast back over the O(days × 24) cell frame."""
    e = load_table(spark, sf_dir, "events")
    cell = e.groupBy(
        F.col("ts").cast("date").alias("d"),
        ((F.dayofweek("ts") + 5) % 7 + 1).alias("dow"),  # ISO: Mon=1..Sun=7
        F.hour("ts").alias("hr"),
    ).agg(F.count(F.lit(1)).alias("n"))
    base = cell.groupBy("dow", "hr").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("s"),
        F.sum(F.col("n") * F.col("n")).alias("ss"),
    )
    dev = F.col("n") * F.col("k") - F.col("s")
    return (
        cell.join(F.broadcast(base), ["dow", "hr"])
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "dow",
            "hr",
            "n",
            (F.col("s").cast("double") / F.col("k")).alias("baseline_mean"),
            dev.cast("long").alias("dev_num"),
            F.col("k").cast("long").alias("dev_den"),
            (
                dev * dev
                > 4 * F.col("k") * (F.col("k") * F.col("ss") - F.col("s") * F.col("s"))
            ).alias("is_anomaly"),
        )
        .orderBy("day", "dow", "hr")
    )


# ===========================================================================
# Inter-purchase gap quantiles (per-customer lag gaps, exact order stats)
# ===========================================================================
@_register(
    "customer_interpurchase_gaps",
    """
    WITH g AS (
      SELECT datediff('day',
               lag(CAST(o_orderdate AS DATE)) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
               CAST(o_orderdate AS DATE)) AS gap
      FROM orders),
    gg AS (SELECT gap FROM g WHERE gap IS NOT NULL)
    SELECT CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(quantile_disc(gap, 0.5) AS BIGINT) AS p50_days,
           CAST(quantile_disc(gap, 0.9) AS BIGINT) AS p90_days,
           CAST(SUM(gap) AS BIGINT) AS sum_days,
           CAST(SUM(gap) AS DOUBLE) / count(*) AS mean_days
    FROM gg
    """,
)
def q_customer_interpurchase_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide inter-purchase cadence: per-customer consecutive
    order gaps (a lag window inside each customer partition — O(orders
    per customer) state), then EXACT p50/p90 of the gap distribution
    through the two-pass histogram quantile (the percentile() sort-agg
    would buffer every gap on one reducer) plus the exact-integer
    mean. The repurchase-cycle number behind churn windows and
    replenishment forecasts.

    Scale: one custkey exchange for the lag, the quantile's two
    map-combinable passes over the gap column, and a 1-row rollup —
    gaps never collect anywhere."""
    from ipeds_etl_spark.operators.quantile import exact_quantiles

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = (
        o.select(
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lag(F.col("o_orderdate").cast("date")).over(w),
            ).alias("gap")
        )
        .filter(F.col("gap").isNotNull())
        .localCheckpoint(eager=False)
    )
    qs = (
        exact_quantiles(g.withColumn("s", F.lit("all")), "gap", [0.5, 0.9], ["s"])
        .groupBy()
        .pivot("q", [0.5, 0.9])
        .agg(F.first("gap"))
        .select(
            F.col("`0.5`").cast("long").alias("p50_days"),
            F.col("`0.9`").cast("long").alias("p90_days"),
        )
    )
    stats = g.agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap").cast("long").alias("sum_days"),
        (F.sum("gap").cast("double") / F.count(F.lit(1))).alias("mean_days"),
    )
    return stats.crossJoin(F.broadcast(qs)).select(
        "n_gaps", "p50_days", "p90_days", "sum_days", "mean_days"
    )

# ===========================================================================
# Multi-touch attribution: U-shaped credit over clicks before a purchase
# ===========================================================================
_MTA_TOL_US = 3_600_000_000  # attribution window: 1 hour


@_register(
    "events_multitouch_attribution",
    f"""
    WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS t FROM events),
    cl AS (
      SELECT event_id AS click_id, user_id, t,
             min(CASE WHEN event_type = 'purchase' THEN t END) OVER (
               PARTITION BY user_id ORDER BY t
               RANGE BETWEEN 1 FOLLOWING AND {_MTA_TOL_US} FOLLOWING
             ) AS purchase_t
      FROM e WHERE event_type IN ('click', 'purchase')),
    a AS (SELECT click_id, user_id, t, purchase_t
          FROM cl WHERE purchase_t IS NOT NULL
            AND click_id IN (SELECT event_id FROM e WHERE event_type = 'click')),
    r AS (
      SELECT user_id, purchase_t, click_id,
             row_number() OVER (PARTITION BY user_id, purchase_t
                                ORDER BY t, click_id) AS pos,
             CAST(count(*) OVER (PARTITION BY user_id, purchase_t) AS BIGINT) AS n
      FROM a),
    w AS (
      SELECT user_id, purchase_t, click_id, pos, n,
             CASE WHEN n = 1 THEN CAST(10000 AS BIGINT)
                  WHEN n = 2 THEN CAST(5000 AS BIGINT)
                  WHEN pos = 1 OR pos = n THEN CAST(4000 AS BIGINT)
                  ELSE CAST(2000 // (n - 2) AS BIGINT)
                    + CASE WHEN pos - 1 <= 2000 % (n - 2) THEN 1 ELSE 0 END
             END AS credit_bp
      FROM r)
    SELECT CAST(count(DISTINCT (user_id, purchase_t)) AS BIGINT) AS n_purchases,
           CAST(count(*) AS BIGINT) AS n_credited_clicks,
           CAST(SUM(credit_bp) AS BIGINT) AS total_credit_bp,
           CAST(SUM(CASE WHEN pos = 1 THEN credit_bp ELSE 0 END) AS BIGINT)
             AS first_touch_bp,
           CAST(SUM(CASE WHEN pos = n AND n > 1 THEN credit_bp ELSE 0 END) AS BIGINT)
             AS last_touch_bp
    FROM w
    """,
)
def q_events_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution: every click
    is assigned to the user's NEXT purchase within 1 hour (the
    `events_asof_next_purchase` forward-as-of RANGE frame — one window,
    no purchase×click band join), then each purchase's credit is split
    40/20/40 in integer BASIS POINTS with the middle share apportioned
    by largest remainder (the `docs_token_budget_allocation` Hamilton
    rule applied per purchase) — so Σ credit_bp == 10000·n_purchases
    EXACTLY, which the output proves arithmetically
    (total_credit_bp = 10000 × n_purchases; pinned by test). The whole
    computation is integer: no attribution dust is ever lost to float
    rounding, at any scale.

    Scale: one user shuffle for the as-of window; the position/count
    windows ride a (user, purchase) key whose group size is the
    clicks-per-purchase burst (bounded by the 1 h window); one 1-row
    rollup. No joins on the event stream at all."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("t")
    ).filter(F.col("event_type").isin("click", "purchase"))
    w_asof = (
        Window.partitionBy("user_id").orderBy("t").rangeBetween(1, _MTA_TOL_US)
    )
    cl = e.withColumn(
        "purchase_t",
        F.min(F.when(F.col("event_type") == "purchase", F.col("t"))).over(w_asof),
    ).filter(
        (F.col("event_type") == "click") & F.col("purchase_t").isNotNull()
    )
    w_rank = Window.partitionBy("user_id", "purchase_t").orderBy("t", "event_id")
    w_grp = Window.partitionBy("user_id", "purchase_t")
    r = cl.select(
        "user_id",
        "purchase_t",
        F.col("event_id").alias("click_id"),
        F.row_number().over(w_rank).alias("pos"),
        F.count(F.lit(1)).over(w_grp).alias("n"),
    )
    mid = F.expr("CAST(2000 div (n - 2) AS BIGINT)") + F.when(
        F.col("pos") - 1 <= F.expr("2000 % (n - 2)"), 1
    ).otherwise(0)
    credit = (
        F.when(F.col("n") == 1, F.lit(10000).cast("bigint"))
        .when(F.col("n") == 2, F.lit(5000).cast("bigint"))
        .when((F.col("pos") == 1) | (F.col("pos") == F.col("n")), F.lit(4000).cast("bigint"))
        .otherwise(mid)
    )
    w = r.withColumn("credit_bp", credit)
    return w.agg(
        F.countDistinct("user_id", "purchase_t").alias("n_purchases"),
        F.count(F.lit(1)).alias("n_credited_clicks"),
        F.sum("credit_bp").cast("long").alias("total_credit_bp"),
        F.sum(F.when(F.col("pos") == 1, F.col("credit_bp")).otherwise(0))
        .cast("long")
        .alias("first_touch_bp"),
        F.sum(
            F.when((F.col("pos") == F.col("n")) & (F.col("n") > 1), F.col("credit_bp")).otherwise(0)
        )
        .cast("long")
        .alias("last_touch_bp"),
    )

# ===========================================================================
# Quality-filter ablation grid (which filter costs which tokens)
# ===========================================================================
_ABL_MIN_TOKENS = 40
_ABL_STOP_BP = 100  # stopword ratio >= 1% (basis points, cross-multiplied)
_ABL_REP_BP = 1000  # consecutive-dup fraction <= 10%


@_register(
    "docs_quality_ablation",
    f"""
    WITH t AS (
      SELECT doc_id, {_WS_TOKENS.format(x='text')} AS w,
             len(list_filter(regexp_extract_all(lower(text), '\\p{{L}}+'),
                 x -> list_contains(['the','a','of','and','to','in','is','it',
                                     'for','on','with','as','was','at','by'], x)))
               AS n_stop
      FROM documents),
    f AS (
      SELECT doc_id, len(w) AS n_tokens,
             len(w) >= {_ABL_MIN_TOKENS} AS pass_len,
             CAST(n_stop AS BIGINT) * 10000 >= {_ABL_STOP_BP} * len(w) AS pass_stop,
             CASE WHEN len(w) >= 2 THEN
               CAST(len(list_filter(range(len(w) - 1), i -> w[i+1] = w[i+2]))
                    AS BIGINT) * 10000 <= {_ABL_REP_BP} * (len(w) - 1)
             ELSE TRUE END AS pass_rep
      FROM t)
    SELECT pass_len, pass_stop, pass_rep,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM f GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def q_docs_quality_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-ablation grid: every document evaluated against three
    independent cheap quality gates — minimum length, minimum English
    stopword density (the classic "is this natural language" signal),
    and maximum consecutive-token repetition — and the corpus broken
    down by the 2³ pass/fail combinations with doc AND token counts
    per cell. This is the table a data-curation review actually reads:
    it says which filter is doing the cutting, how much the filters
    overlap, and what a threshold change would cost in tokens, without
    re-running the pipeline per configuration. All three gates are
    integer cross-multiplied (basis points — no ratio is ever
    materialized as a float), so the grid is engine-exact.

    Scale: entirely map-side per document (two token projections) +
    one ≤8-group aggregate — the cheapest possible ablation study at
    any corpus size."""
    stop_set = [
        "the", "a", "of", "and", "to", "in", "is", "it",
        "for", "on", "with", "as", "was", "at", "by",
    ]
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        TX.tokens(F.col("text")).alias("w"),
        F.size(
            F.filter(
                F.regexp_extract_all(F.lower("text"), F.lit(r"\p{L}+"), 0),
                lambda x: x.isin(*stop_set),
            )
        ).alias("n_stop"),
    )
    n = F.size("w")
    n_consec = F.size(
        F.filter(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.element_at("w", i + 1) == F.element_at("w", i + 2),
        )
    )
    f = d.select(
        n.alias("n_tokens"),
        (n >= _ABL_MIN_TOKENS).alias("pass_len"),
        (F.col("n_stop").cast("bigint") * 10000 >= _ABL_STOP_BP * n).alias(
            "pass_stop"
        ),
        F.when(n >= 2, n_consec.cast("bigint") * 10000 <= _ABL_REP_BP * (n - 1))
        .otherwise(F.lit(True))
        .alias("pass_rep"),
    )
    return (
        f.groupBy("pass_len", "pass_stop", "pass_rep")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
        .orderBy("pass_len", "pass_stop", "pass_rep")
    )

# ===========================================================================
# Join-key overlap profiler (sketch-estimated selectivity vs exact)
# ===========================================================================
def _join_profile_oracle() -> str:
    from ipeds_etl_spark.operators import sketches as SK

    ska = SK.kmv_sketch_sql("CAST(o_custkey AS VARCHAR)", _KMV_K)
    skb = SK.kmv_sketch_sql("CAST(c_custkey AS VARCHAR)", _KMV_K)
    merged = SK.kmv_merge_sql("a.sk", "b.sk", _KMV_K)
    union_est = SK.kmv_estimate_from_sql("m", _KMV_K)
    return f"""
    WITH a AS (SELECT {ska} AS sk FROM orders),
    b AS (SELECT {skb} AS sk FROM customer),
    p AS (SELECT a.sk AS ska, b.sk AS skb, {merged} AS m FROM a, b),
    est AS (
      SELECT {union_est} AS union_est,
             CAST(len(list_intersect(list_intersect(m, ska), skb)) AS DOUBLE)
               / len(m) AS jaccard_est
      FROM p),
    ex AS (
      SELECT (SELECT count(DISTINCT o_custkey) FROM orders) AS exact_a,
             (SELECT count(DISTINCT c_custkey) FROM customer) AS exact_b,
             (SELECT count(*) FROM (
                SELECT DISTINCT o_custkey FROM orders
                INTERSECT SELECT DISTINCT c_custkey FROM customer))
               AS exact_common)
    SELECT est.union_est, est.jaccard_est,
           est.jaccard_est * est.union_est AS intersection_est,
           CAST(ex.exact_a AS BIGINT) AS exact_a,
           CAST(ex.exact_b AS BIGINT) AS exact_b,
           CAST(ex.exact_common AS BIGINT) AS exact_common
    FROM est CROSS JOIN ex
    """


@_register("orders_customer_join_profile", _join_profile_oracle())
def q_orders_customer_join_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-selectivity profiling from sketches — estimate how much of
    each side's key domain a join will touch BEFORE paying the join:
    one KMV sketch per side (each a single map-combinable agg over its
    own table — the two scans never meet), Theta-algebra
    union/Jaccard/intersection estimates on the merged k-minima, and
    the exact distinct/intersection counts alongside as calibration.
    This is the profile a pipeline consults to pick broadcast vs
    shuffle vs bloom-pruned join strategies (`orders_bloom_semi_join`
    is the action this readout justifies), and the same sketches
    stored per table-partition give partition-level overlap maps for
    free (merge is associative).

    Scale: sketch state ≤ k hashes per side regardless of table size;
    the estimate algebra runs on ONE 1×1 row pair. The exact columns
    are the gate-scale audit."""
    from ipeds_etl_spark.operators import sketches as SK

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    a = o.agg(SK.kmv_sketch(F.col("o_custkey").cast("string"), _KMV_K).alias("ska"))
    b = c.agg(SK.kmv_sketch(F.col("c_custkey").cast("string"), _KMV_K).alias("skb"))
    p = a.crossJoin(F.broadcast(b)).select(
        "ska", "skb", SK.kmv_merge(F.col("ska"), F.col("skb"), _KMV_K).alias("m")
    )
    union_est = SK.kmv_estimate_from(F.col("m"), _KMV_K)
    jacc = (
        F.size(F.array_intersect(F.array_intersect("m", "ska"), "skb")).cast("double")
        / F.size("m")
    )
    est = p.select(union_est.alias("union_est"), jacc.alias("jaccard_est"))
    oa = o.select(F.col("o_custkey").alias("k")).distinct()
    cb = c.select(F.col("c_custkey").alias("k")).distinct()
    ex = (
        oa.agg(F.count(F.lit(1)).alias("exact_a"))
        .crossJoin(F.broadcast(cb.agg(F.count(F.lit(1)).alias("exact_b"))))
        .crossJoin(
            F.broadcast(
                oa.intersect(cb).agg(F.count(F.lit(1)).alias("exact_common"))
            )
        )
    )
    return est.crossJoin(F.broadcast(ex)).select(
        "union_est",
        "jaccard_est",
        (F.col("jaccard_est") * F.col("union_est")).alias("intersection_est"),
        "exact_a",
        "exact_b",
        "exact_common",
    )

# ===========================================================================
# Header/detail reconciliation (order total vs line-item rollup)
# ===========================================================================
@_register(
    "orders_header_detail_reconciliation",
    """
    WITH lsum AS (
      SELECT l_orderkey,
             SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
                      * (1 - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6)))
               AS detail_rev
      FROM lineitem GROUP BY l_orderkey),
    j AS (
      SELECT o.o_orderkey,
             CAST(o.o_totalprice AS DECIMAL(18,6)) AS header_total,
             lsum.detail_rev,
             abs(CAST(o.o_totalprice AS DECIMAL(18,6)) - lsum.detail_rev) AS adiff
      FROM orders o LEFT JOIN lsum ON lsum.l_orderkey = o.o_orderkey)
    SELECT CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN detail_rev IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_headerless,
           CAST(SUM(CASE WHEN adiff * 100 <= header_total THEN 1 ELSE 0 END)
                AS BIGINT) AS n_within_1pct,
           CAST(SUM(CASE WHEN adiff * 100 > header_total THEN 1 ELSE 0 END)
                AS BIGINT) AS n_beyond_1pct,
           CAST(max(adiff) AS DOUBLE) AS max_abs_diff
    FROM j
    """,
)
def q_orders_header_detail_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-header reconciliation — the bread-and-butter data-quality
    check on any header/detail pair: per-order discounted line revenue
    (exact decimal, the _REV6 re-round) against the order header's
    total, profiled as exact-match bands (within/beyond 1%, header
    with no lines). The 1% band is cross-multiplied in decimal
    (adiff·100 ≤ total — no ratio is ever floated), so every count is
    engine-exact; only max_abs_diff converts to double, once.

    Scale: one orderkey-keyed map-combinable rollup of lineitem + a
    same-key join to orders (co-partitioned by AQE on the shared key)
    + a 1-row profile. The per-order diff column is what a DQ alert
    would persist; the 1-row profile is what the dashboard reads."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,6)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,6)"))
    ).cast("decimal(18,6)")
    lsum = li.groupBy("l_orderkey").agg(F.sum(rev).alias("detail_rev"))
    # the detail rollup is FACT-derived (O(orders) rows) — never let
    # AQE broadcast it from compression-skewed size estimates (31 s at
    # sf1 vs 4 s shuffled; the similarity-reattach lesson): pin a
    # shuffle-hash join on the shared orderkey, which both sides'
    # exchanges already provide
    j = o.select(
        "o_orderkey", F.col("o_totalprice").cast("decimal(18,6)").alias("header_total")
    ).join(lsum.hint("shuffle_hash"), F.col("l_orderkey") == F.col("o_orderkey"), "left")
    adiff = F.abs(F.col("header_total") - F.col("detail_rev"))
    return j.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("detail_rev").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_headerless"),
        F.sum(F.when(adiff * 100 <= F.col("header_total"), 1).otherwise(0))
        .cast("long")
        .alias("n_within_1pct"),
        F.sum(F.when(adiff * 100 > F.col("header_total"), 1).otherwise(0))
        .cast("long")
        .alias("n_beyond_1pct"),
        F.max(adiff).cast("double").alias("max_abs_diff"),
    )

# ===========================================================================
# Neyman (variance-optimal) sample allocation across sources
# ===========================================================================
_NEY_BUDGET = 10_000


@_register(
    "docs_neyman_allocation",
    f"""
    WITH m AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS nh,
             CAST(SUM(n_chars) AS BIGINT) AS s1,
             CAST(SUM(n_chars * n_chars) AS BIGINT) AS s2
      FROM documents GROUP BY source),
    w AS (
      SELECT source, nh,
             nh * CAST(floor(sqrt(CAST(nh * s2 - s1 * s1 AS DOUBLE))) AS BIGINT)
               AS wt
      FROM m),
    t AS (SELECT CAST(SUM(wt) AS BIGINT) AS tw FROM w),
    q AS (
      SELECT source, nh, wt,
             CAST(({_NEY_BUDGET} * wt) // tw AS BIGINT) AS floor_alloc,
             ({_NEY_BUDGET} * wt) % tw AS rem
      FROM w CROSS JOIN t),
    r AS (
      SELECT source, nh, wt, floor_alloc,
             row_number() OVER (ORDER BY rem DESC, source) AS rr,
             {_NEY_BUDGET} - SUM(floor_alloc) OVER () AS short
      FROM q)
    SELECT source, nh AS n_docs, wt AS neyman_weight,
           CAST(floor_alloc + CASE WHEN rr <= short THEN 1 ELSE 0 END AS BIGINT)
             AS alloc
    FROM r ORDER BY source
    """,
)
def q_docs_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-optimal (Neyman) sample allocation: each source's share
    of a 10,000-unit sampling budget proportional to N_h·S_h — the
    stratified-sampling design that minimizes estimator variance at a
    fixed budget, the statistically-correct upgrade over the
    size-proportional `docs_token_budget_allocation`. S_h enters as
    the INTEGER square root of the exact variance numerator
    (floor∘sqrt of an exact BIGINT: sqrt is correctly rounded on an
    exactly-representable input, so the floor is engine-identical —
    the one sanctioned use of sqrt in a decision path), and the
    allocation is Hamilton largest-remainder, so Σ alloc == budget
    EXACTLY and every number is an integer.

    Scale: one map-combinable moment agg per source + O(sources)
    arithmetic; the remainder-rank window runs over the metadata-sized
    source frame."""
    d = load_table(spark, sf_dir, "documents")
    m = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("nh"),
        F.sum("n_chars").alias("s1"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("s2"),
    )
    w = m.select(
        "source",
        "nh",
        (
            F.col("nh")
            * F.floor(
                F.sqrt((F.col("nh") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double"))
            ).cast("bigint")
        ).alias("wt"),
    )
    t = w.agg(F.sum("wt").alias("tw"))
    q = w.crossJoin(F.broadcast(t)).select(
        "source",
        "nh",
        "wt",
        F.expr(f"CAST(({_NEY_BUDGET} * wt) div tw AS BIGINT)").alias("floor_alloc"),
        F.expr(f"({_NEY_BUDGET} * wt) % tw").alias("rem"),
    )
    win = Window.orderBy(F.desc("rem"), F.asc("source"))
    r = q.select(
        "source",
        "nh",
        "wt",
        "floor_alloc",
        F.row_number().over(win).alias("rr"),
        (F.lit(_NEY_BUDGET) - F.sum("floor_alloc").over(Window.partitionBy())).alias(
            "short"
        ),
    )
    return r.select(
        "source",
        F.col("nh").alias("n_docs"),
        F.col("wt").alias("neyman_weight"),
        (
            F.col("floor_alloc")
            + F.when(F.col("rr") <= F.col("short"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc"),
    ).orderBy("source")

# ===========================================================================
# Near-copy point lookup: find near-duplicates of ONE query document
# ===========================================================================
_NC_QUERY_DOC = 335


def _near_copies_oracle() -> str:
    from ipeds_etl_spark.operators import dedup as DD
    from ipeds_etl_spark.queries_ext import _band_key_sql, _minhash_sig_sql

    bands_union = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, {_band_key_sql(b)} AS band_key FROM sig"
        for b in range(DD.N_PERMS // DD.ROWS_PER_BAND)
    )
    return f"""
    WITH {_minhash_sig_sql()},
    bands AS ({bands_union}),
    qb AS (SELECT band, band_key FROM bands WHERE doc_id = {_NC_QUERY_DOC}),
    cand AS (
      SELECT DISTINCT bands.doc_id FROM bands JOIN qb
        ON bands.band = qb.band AND bands.band_key = qb.band_key
      WHERE bands.doc_id <> {_NC_QUERY_DOC}),
    sets AS (SELECT doc_id, list_distinct(w) AS s FROM toks),
    qs AS (SELECT s AS qset FROM sets WHERE doc_id = {_NC_QUERY_DOC})
    SELECT cand.doc_id,
           CAST(len(list_intersect(sets.s, qset)) AS DOUBLE)
             / len(list_distinct(list_concat(sets.s, qset))) AS jaccard
    FROM cand JOIN sets ON sets.doc_id = cand.doc_id CROSS JOIN qs
    ORDER BY jaccard DESC, cand.doc_id
    """


@_register("docs_find_near_copies", _near_copies_oracle())
def q_docs_find_near_copies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search-by-document: all near-copies of ONE query document via
    the LSH index — the point-lookup dual of the corpus-wide
    `dedup_minhash_lsh` sweep ("has anyone copied this page?"). The
    query doc's ≤4 band keys probe the banded index (an equi join that
    touches only colliding buckets — O(collisions), not O(corpus)),
    then exact token-set Jaccard scores just the candidate sliver.

    Scale: the banded index is the memoized corpus artifact the dedup
    family already maintains; a point lookup costs 4 bucket probes +
    |candidates| Jaccard evaluations — milliseconds against an index
    of any size, the interactive-latency path a takedown/provenance
    workflow needs."""
    from ipeds_etl_spark.operators import dedup as DD

    d = load_table(spark, sf_dir, "documents")
    sigs = DD.minhash_signatures(d, "text", "doc_id")
    buckets = DD.lsh_band_buckets(sigs, "doc_id")
    # the query side hashes ONE document — computing it by filtering
    # the full bucket frame would build corpus signatures TWICE (the
    # sf1 smoke measured 45 s; this form is ~4 s): derive the ≤4 probe
    # keys from the query doc alone, O(1) work
    qb = DD.lsh_band_buckets(
        DD.minhash_signatures(
            d.filter(F.col("doc_id") == _NC_QUERY_DOC), "text", "doc_id"
        ),
        "doc_id",
    ).select("band", "band_key")
    cand = (
        buckets.join(F.broadcast(qb), ["band", "band_key"])
        .filter(F.col("doc_id") != _NC_QUERY_DOC)
        .select("doc_id")
        .distinct()
    )
    sets = d.select(
        "doc_id", F.array_distinct(TX.tokens(F.col("text"))).alias("s")
    )
    qset = sets.filter(F.col("doc_id") == _NC_QUERY_DOC).select(
        F.col("s").alias("qset")
    )
    inter = F.size(F.array_intersect(F.col("s"), F.col("qset")))
    # |A∪B| = |A|+|B|−|A∩B| on distinct arrays (opt r13)
    union = F.size(F.col("s")) + F.size(F.col("qset")) - inter
    return (
        cand.join(sets, "doc_id")
        .crossJoin(F.broadcast(qset))
        .select("doc_id", (inter.cast("double") / union).alias("jaccard"))
        .orderBy(F.desc("jaccard"), "doc_id")
    )

# ===========================================================================
# Growth accounting: new / retained / resurrected / churned per week
# ===========================================================================
@_register(
    "events_growth_accounting",
    """
    WITH uw AS (
      SELECT DISTINCT user_id,
             CAST(epoch_us(date_trunc('week', ts)) // 604800000000 AS BIGINT) AS wk
      FROM events),
    lagged AS (
      SELECT user_id, wk,
             min(wk) OVER (PARTITION BY user_id) AS first_wk,
             lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk
      FROM uw),
    staged AS (
      SELECT wk,
             CASE WHEN wk = first_wk THEN 'new'
                  WHEN prev_wk = wk - 1 THEN 'retained'
                  ELSE 'resurrected' END AS stage
      FROM lagged),
    act AS (
      SELECT wk, stage, CAST(count(*) AS BIGINT) AS n_users
      FROM staged GROUP BY wk, stage),
    churn AS (
      SELECT a.wk + 1 AS wk, 'churned' AS stage,
             CAST(count(*) AS BIGINT) AS n_users
      FROM uw a LEFT JOIN uw b
        ON a.user_id = b.user_id AND b.wk = a.wk + 1
      WHERE b.user_id IS NULL AND a.wk + 1 <= (SELECT max(wk) FROM uw)
      GROUP BY a.wk + 1)
    SELECT wk, stage, n_users FROM act
    UNION ALL SELECT wk, stage, n_users FROM churn
    ORDER BY wk, stage
    """,
)
def q_events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth-accounting table (the canonical DAU/MAU decomposition):
    every (user, week) activity cell classified as NEW (first week
    ever), RETAINED (also active the previous week), or RESURRECTED
    (returning after a gap), plus CHURNED counts attributed to the
    week a user went silent — the four series whose sums reconcile to
    net weekly active growth. Week ids are integer epoch-week numbers
    (floor-div of epoch micros — engine-exact, no date arithmetic in
    the keys).

    Scale: the raw stream compacts to the distinct (user, week) grid
    first (one map-combinable distinct — the `events_dau_wau` rule);
    the stage windows run per user over O(weeks-active) rows; churn is
    a self-join on the compacted grid keyed (user, week+1). Output
    O(weeks × 4)."""
    e = load_table(spark, sf_dir, "events")
    uw = (
        e.select(
            "user_id",
            F.expr("unix_micros(date_trunc('week', ts)) div 604800000000").alias("wk"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    w_first = Window.partitionBy("user_id")
    w_lag = Window.partitionBy("user_id").orderBy("wk")
    staged = uw.select(
        "wk",
        F.when(F.col("wk") == F.min("wk").over(w_first), "new")
        .when(F.lag("wk").over(w_lag) == F.col("wk") - 1, "retained")
        .otherwise("resurrected")
        .alias("stage"),
    )
    act = staged.groupBy("wk", "stage").agg(F.count(F.lit(1)).alias("n_users"))
    mx = uw.agg(F.max("wk").alias("mxwk"))
    a, b = uw.alias("a"), uw.alias("b")
    churn = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.wk") == F.col("a.wk") + 1),
            "left_anti",
        )
        .crossJoin(F.broadcast(mx))
        .filter(F.col("wk") + 1 <= F.col("mxwk"))
        .select((F.col("wk") + 1).alias("wk"), F.lit("churned").alias("stage"))
        .groupBy("wk", "stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    return act.unionByName(churn).orderBy("wk", "stage")

# ===========================================================================
# Near-dup pair diff: what actually changed between two near-copies
# ===========================================================================
def _pair_diff_oracle() -> str:
    from ipeds_etl_spark.operators import dedup as DD
    from ipeds_etl_spark.queries_ext import _band_key_sql, _minhash_sig_sql

    bands_union = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, {_band_key_sql(b)} AS band_key FROM sig"
        for b in range(DD.N_PERMS // DD.ROWS_PER_BAND)
    )
    return f"""
    WITH {_minhash_sig_sql()},
    bands AS ({bands_union}),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
    sets AS (SELECT doc_id, list_distinct(w) AS s FROM toks)
    SELECT pairs.id_a, pairs.id_b,
           CAST(len(list_intersect(sa.s, sb.s)) AS BIGINT) AS n_common,
           CAST(len(sa.s) - len(list_intersect(sa.s, sb.s)) AS BIGINT) AS n_only_a,
           CAST(len(sb.s) - len(list_intersect(sa.s, sb.s)) AS BIGINT) AS n_only_b,
           CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
             / len(list_distinct(list_concat(sa.s, sb.s))) AS jaccard
    FROM pairs JOIN sets sa ON sa.doc_id = pairs.id_a
               JOIN sets sb ON sb.doc_id = pairs.id_b
    ORDER BY pairs.id_a, pairs.id_b
    """


@_register("docs_near_dup_diff", _pair_diff_oracle())
def q_docs_near_dup_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The "what changed" view on near-duplicates: for every LSH
    candidate pair, the token-set diff — common / only-in-A /
    only-in-B counts and the Jaccard — the triage table a curator
    reads to decide whether near-dups are boilerplate variants
    (small asymmetric diffs) or genuine revisions (balanced diffs).

    Scale: pairs come from the memoized banded index (ids only); the
    set diff re-attaches the two token arrays by equi-join and is
    evaluated per CANDIDATE pair — O(pairs), the near-dup re-attach
    discipline throughout the dedup family."""
    from ipeds_etl_spark.queries_ext import _lsh_doc_pairs

    d = load_table(spark, sf_dir, "documents")
    pairs = _lsh_doc_pairs(spark, sf_dir)
    sets = d.select("doc_id", F.array_distinct(TX.tokens(F.col("text"))).alias("s"))
    sa = sets.select(F.col("doc_id").alias("id_a"), F.col("s").alias("s_a"))
    sb = sets.select(F.col("doc_id").alias("id_b"), F.col("s").alias("s_b"))
    j = pairs.join(sa, "id_a").join(sb, "id_b")
    inter = F.size(F.array_intersect("s_a", "s_b"))
    # |A∪B| = |A|+|B|−|A∩B| on distinct arrays (opt r13)
    union = F.size("s_a") + F.size("s_b") - inter
    return j.select(
        "id_a",
        "id_b",
        inter.cast("long").alias("n_common"),
        (F.size("s_a") - inter).cast("long").alias("n_only_a"),
        (F.size("s_b") - inter).cast("long").alias("n_only_b"),
        (inter.cast("double") / union).alias("jaccard"),
    ).orderBy("id_a", "id_b")


# ===========================================================================
# STL-lite: integer-exact trend / day-of-week seasonal / residual
# ===========================================================================
@_register(
    "orders_stl_lite",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             isodow(o_orderdate) AS dow,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2),
    tr AS (
      SELECT d, dow, cents,
             CAST(SUM(cents) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                  // (count(*) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))
                  AS BIGINT) AS trend
      FROM daily),
    se AS (
      SELECT dow, CAST(SUM(cents - trend) // count(*) AS BIGINT) AS seasonal
      FROM tr GROUP BY dow)
    SELECT strftime(tr.d, '%Y-%m-%d') AS day,
           tr.cents, tr.trend, se.seasonal,
           tr.cents - tr.trend - se.seasonal AS residual
    FROM tr JOIN se ON tr.dow = se.dow
    ORDER BY day
    """,
)
def q_orders_stl_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite seasonal decomposition, fully integer: daily revenue in
    exact cents; TREND = centered 7-day moving average (truncating
    integer division of an exact window sum — the edges use the
    partial window, same rule both engines); SEASONAL = per-ISO-dow
    mean of the detrended series (again one truncating div); RESIDUAL
    = exact remainder. Each component is a BIGINT, so
    cents == trend + seasonal + residual reconciles bit-for-bit and
    the decomposition is a total function of the data — the anomaly
    baseline `events_seasonal_anomaly` reads off raw cells, this one
    removes trend first (the classic decomposition split).

    Scale: the corpus compacts to O(days) rows in one map-combinable
    agg; every window thereafter runs over the compacted daily frame
    (the rolling-anomaly compaction rule)."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("d"),
        ((F.dayofweek("o_orderdate") + 5) % 7 + 1).alias("dow"),
    ).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    )
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    tr = daily.select(
        "d",
        "dow",
        "cents",
        F.expr(
            "CAST(SUM(cents) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)"
            " div (count(*) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))"
            " AS BIGINT)"
        ).alias("trend"),
    )
    se = tr.groupBy("dow").agg(
        F.expr("CAST(SUM(cents - trend) div count(*) AS BIGINT)").alias("seasonal")
    )
    return (
        tr.join(F.broadcast(se), "dow")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "cents",
            "trend",
            "seasonal",
            (F.col("cents") - F.col("trend") - F.col("seasonal")).alias("residual"),
        )
        .orderBy("day")
    )

# ===========================================================================
# Relational set similarity: suppliers near-identical by part portfolio
# ===========================================================================
def _supplier_sim_oracle() -> str:
    from ipeds_etl_spark.functions.hashing import PARITY_HEX_DIGITS
    from ipeds_etl_spark.operators.dedup import (
        MERSENNE_P,
        N_PERMS,
        ROWS_PER_BAND,
        minhash_perms,
    )

    h = f"CAST(concat('0x', substr(sha256(x), 1, {PARITY_HEX_DIGITS})) AS BIGINT)"
    mins = ",\n             ".join(
        f"list_min(list_transform(hv, h -> (h * {a} + {b}) % {MERSENNE_P})) AS mh{i}"
        for i, (a, b) in enumerate(minhash_perms(N_PERMS))
    )
    def band_key(b):
        cols = [f"mh{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)]
        return " || '_' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
    bands_union = " UNION ALL ".join(
        f"SELECT l_suppkey, {b} AS band, {band_key(b)} AS band_key FROM sig"
        for b in range(N_PERMS // ROWS_PER_BAND)
    )
    return f"""
    WITH sets AS (
      SELECT l_suppkey, list_distinct(list(CAST(l_partkey AS VARCHAR))) AS s
      FROM lineitem GROUP BY l_suppkey),
    hv AS (SELECT l_suppkey, list_transform(s, x -> {h}) AS hv FROM sets),
    sig AS (SELECT l_suppkey, {mins} FROM hv),
    bands AS ({bands_union}),
    pairs AS (
      SELECT DISTINCT a.l_suppkey AS supp_a, b.l_suppkey AS supp_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key
       AND a.l_suppkey < b.l_suppkey)
    SELECT pairs.supp_a, pairs.supp_b,
           CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
             / len(list_distinct(list_concat(sa.s, sb.s))) AS jaccard
    FROM pairs JOIN sets sa ON sa.l_suppkey = pairs.supp_a
               JOIN sets sb ON sb.l_suppkey = pairs.supp_b
    ORDER BY pairs.supp_a, pairs.supp_b
    """


@_register("suppliers_similar_by_parts", _supplier_sim_oracle())
def q_suppliers_similar_by_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH set-similarity on a RELATIONAL set — supplier pairs whose
    part portfolios band-collide, with exact portfolio Jaccard on the
    candidate sliver: the text-dedup machinery
    (`minhash_signatures_from_sets` + the same banded index) applied
    to "documents" that are sets of part keys. At 100 TB this is how
    you find near-identical entities by behavior (suppliers by
    catalog, users by event vocabulary, baskets by contents) without
    an O(n²) set-similarity join — the generalization the operator
    layer was designed for.

    Scale: one (supplier, part) distinct + collect_set agg builds the
    portfolios (set size bounded by catalog breadth); signatures are
    map-only; candidates are bucket collisions; Jaccard touches only
    the collided pairs."""
    from ipeds_etl_spark.operators.dedup import (
        lsh_band_buckets,
        minhash_signatures_from_sets,
    )

    li = load_table(spark, sf_dir, "lineitem")
    sets = li.groupBy("l_suppkey").agg(
        F.array_distinct(
            F.collect_list(F.col("l_partkey").cast("string"))
        ).alias("s")
    )
    sigs = minhash_signatures_from_sets(sets, "s", "l_suppkey")
    buckets = lsh_band_buckets(sigs, "l_suppkey")
    a, b = buckets.alias("a"), buckets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .select(
            F.col("a.l_suppkey").alias("supp_a"), F.col("b.l_suppkey").alias("supp_b")
        )
        .distinct()
    )
    sa = sets.select(F.col("l_suppkey").alias("supp_a"), F.col("s").alias("s_a"))
    sb = sets.select(F.col("l_suppkey").alias("supp_b"), F.col("s").alias("s_b"))
    inter = F.size(F.array_intersect("s_a", "s_b"))
    # |A∪B| = |A|+|B|−|A∩B| on distinct arrays (opt r13)
    union = F.size("s_a") + F.size("s_b") - inter
    return (
        pairs.join(sa, "supp_a")
        .join(sb, "supp_b")
        .select("supp_a", "supp_b", (inter.cast("double") / union).alias("jaccard"))
        .orderBy("supp_a", "supp_b")
    )
