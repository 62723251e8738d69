"""Round-9 wave: training-pipeline breadth — content-defined chunk
dedup (the shift-robust chunking FastCDC/LBFS storage dedup uses,
applied to corpus text), a differentially-private histogram release
with a frozen-table geometric mechanism, an A/B sample-ratio-mismatch
guardrail, an exact Gini concentration readout over the distributed
global-rank machinery, and a sequence-packing fragmentation audit.
House rules as in ``queries_wave8``: integer-exact or op-order-pinned
arithmetic on both engines, every aggregate aliased identically in
Spark and DuckDB, transcendental-free surrogates (the one place a
textbook formula needs exp() — the geometric noise CDF — ships as a
frozen integer table, so both engines only ever compare integers).

The reference (kebe3476/ipeds_etl) ships none of these; they extend
its surface under the same oracle-twin discipline (COVERAGE.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ipeds_etl_spark.functions.hashing import parity_hash, parity_hash_sql
from ipeds_etl_spark.queries import _register
from ipeds_etl_spark.functions import text as TX
from ipeds_etl_spark.queries_ext import _WS_TOKENS
from ipeds_etl_spark.sources.tables import load_table

_HASH10 = "CAST(concat('0x', substr(sha256({x}), 1, 10)) AS BIGINT)"


# ===========================================================================
# Content-defined chunking + chunk-level dedup accounting
# ===========================================================================
#: rolling-gram width and boundary divisor: a chunk boundary falls
#: AFTER token i when the hash of the W-gram ending at i ≡ 0 (mod D) —
#: expected chunk length ≈ D tokens. Content-defined boundaries
#: re-synchronize after insertions/deletions, which is why storage
#: dedup (LBFS, Muthitacharoen et al. 2001; FastCDC, Xia et al. 2016)
#: prefers them over fixed-offset chunks: an edited document still
#: shares every chunk outside the edit's own chunk.
_CDC_W = 4
_CDC_D = 8

#: shared oracle CTE chain ending in ``ch(doc_id, source, chunk_no,
#: clen, chunk)`` — the content-defined chunking of every document,
#: reused verbatim by the dedup ACCOUNTING query below and the dedup
#: REWRITE (``queries_wave14.docs_cdc_dedup_rewrite``) so both engines
#: chunk identically.
CDC_CH_SQL = f"""
    t AS (SELECT doc_id, source, {_WS_TOKENS.format(x='text')} AS w
               FROM documents),
    tk0 AS (SELECT doc_id, source, w, unnest(range(len(w))) AS i0 FROM t),
    tk AS (SELECT doc_id, source, i0, w[i0 + 1] AS tok,
                  -- slice start clamped: rows with i0 < W-1 are gated
                  -- out by the AND, but a vectorized engine still
                  -- EVALUATES the hash there, and an underflowed slice
                  -- yields NULL -> concat('0x', NULL) cast error
                  CASE WHEN i0 >= {_CDC_W - 1} AND
                    {_HASH10.format(x=f"array_to_string(w[GREATEST(i0 - {_CDC_W - 2}, 1):i0 + 1], ' ')")}
                      % {_CDC_D} = 0
                  THEN 1 ELSE 0 END AS cut
           FROM tk0),
    tc AS (SELECT tk.*, CAST(COALESCE(SUM(cut) OVER (
             PARTITION BY doc_id ORDER BY i0
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             AS chunk_no
           FROM tk),
    ch AS (SELECT doc_id, source, chunk_no,
                  CAST(count(*) AS BIGINT) AS clen,
                  string_agg(tok, ' ' ORDER BY i0) AS chunk
           FROM tc GROUP BY doc_id, source, chunk_no)"""


def cdc_chunks(d: DataFrame) -> DataFrame:
    """Content-defined chunks of every document's whitespace tokens:
    ``(doc_id, source, chunk_no, clen, chunk)``. A boundary falls AFTER
    any token whose trailing ``_CDC_W``-gram hash ≡ 0 (mod ``_CDC_D``)
    — boundaries depend only on LOCAL content, so they re-synchronize
    after insertions/deletions (LBFS, Muthitacharoen et al. 2001).
    Spark twin of the ``CDC_CH_SQL`` oracle CTE chain; shared by the
    chunk-dedup accounting and the global dedup rewrite.

    Scale: boundary flags are computed MAP-SIDE inside one
    ``transform`` over the token array (each doc touches only its own
    tokens); the cumulative chunk number is a per-doc window (sorts a
    document, never the corpus); chunk assembly is one (doc, chunk)
    agg. Zero-token docs simply produce no chunks (explode of an empty
    array drops the row)."""
    W, D = _CDC_W, _CDC_D
    pos = F.expr(
        f"transform(w, (tok, i) -> named_struct("
        f"'i0', i, 'tok', tok, 'cut', CASE WHEN i >= {W - 1} AND "
        f"CAST(conv(substr(sha2(array_join("
        f"slice(w, greatest(i - {W - 2}, 1), {W}), ' '), "
        f"256), 1, 10), 16, 10) AS BIGINT) % {D} = 0 THEN 1 ELSE 0 END))"
    )
    tk = (
        d.select(
            "doc_id",
            "source",
            TX.tokens(F.col("text")).alias("w"),
        )
        .select("doc_id", "source", F.explode(pos).alias("s"))
        .select(
            "doc_id",
            "source",
            F.col("s.i0").alias("i0"),
            F.col("s.tok").alias("tok"),
            F.col("s.cut").alias("cut"),
        )
    )
    wcum = (
        Window.partitionBy("doc_id")
        .orderBy("i0")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tc = tk.withColumn(
        "chunk_no", F.coalesce(F.sum("cut").over(wcum), F.lit(0)).cast("long")
    )
    return tc.groupBy("doc_id", "source", "chunk_no").agg(
        F.count(F.lit(1)).cast("long").alias("clen"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i0", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("chunk"),
    )


@_register(
    "docs_cdc_chunk_dedup",
    f"""
    WITH {CDC_CH_SQL},
    hh AS (SELECT doc_id, source, chunk_no, clen,
                  {_HASH10.format(x="chunk")} AS h
           FROM ch),
    freq AS (SELECT h, CAST(count(DISTINCT doc_id) AS BIGINT) AS nd
             FROM hh GROUP BY h),
    j AS (SELECT hh.*, freq.nd FROM hh JOIN freq USING (h))
    SELECT source,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(clen) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
           CAST(sum(CASE WHEN nd >= 2 THEN clen ELSE 0 END) AS BIGINT) AS dup_tokens,
           (1000 * CAST(sum(CASE WHEN nd >= 2 THEN clen ELSE 0 END) AS BIGINT))
             // CAST(sum(clen) AS BIGINT) AS dup_token_permille,
           (10 * CAST(sum(clen) AS BIGINT)) // CAST(count(*) AS BIGINT)
             AS avg_chunk_len_x10
    FROM j GROUP BY source ORDER BY source
    """,
)
def q_docs_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunk dedup (LBFS/FastCDC boundaries over
    tokens): cut after any token whose trailing 4-gram hashes ≡ 0
    (mod 8), hash each variable-length chunk, and report — per source
    — how much of the corpus is chunk-level duplicated across
    documents (a chunk is duplicated when ≥2 distinct docs contain
    it). Because boundaries depend only on LOCAL content, two
    documents that share a long passage at different offsets still
    produce identical chunks — the shift-robustness fixed 8-word
    chunking (``docs_boilerplate_chunks``) lacks, and the reason
    storage dedup systems pay for rolling hashes.

    Scale: chunking is the map-side ``cdc_chunks`` shape (see its
    docstring); document frequency is one exchange on the chunk hash,
    and the accounting join reuses that same hash key. Nothing is ever
    corpus² — total work tracks token count."""
    d = load_table(spark, sf_dir, "documents")
    ch = cdc_chunks(d).withColumn("h", parity_hash(F.col("chunk"))).drop(
        "chunk"
    )
    freq = ch.groupBy("h").agg(
        F.countDistinct("doc_id").cast("long").alias("nd")
    )
    j = ch.join(freq, "h")
    return (
        j.groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum("clen").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_chunks"),
            F.sum(F.when(F.col("nd") >= 2, F.col("clen")).otherwise(0))
            .cast("long")
            .alias("dup_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "n_chunks",
            "n_tokens",
            "n_dup_chunks",
            "dup_tokens",
            F.expr("(1000 * dup_tokens) div n_tokens").alias(
                "dup_token_permille"
            ),
            F.expr("(10 * n_tokens) div n_chunks").alias("avg_chunk_len_x10"),
        )
        .orderBy("source")
    )


# ===========================================================================
# Differentially-private histogram release (geometric mechanism)
# ===========================================================================
#: frozen CDF of the two-sided geometric ("discrete Laplace")
#: distribution with α = e^(-ε), ε = 1, truncated at ±8 and scaled to
#: 2^20 — the integer table IS the mechanism (Ghosh-Roughgarden-
#: Sundararajan 2009: the geometric mechanism is the universally
#: optimal ε-DP noise for counts). Freezing the table keeps both
#: engines transcendental-free: sampling = one hash, one modulo, one
#: CASE ladder. Noise is SEEDED per released cell (hash of the cell
#: key), making the release deterministic and oracle-replayable —
#: production would swap the seed for real entropy; everything else
#: (sensitivity-1 count, post-processed clamp at 0) is the real shape.
_DP_SCALE = 1 << 20
_DP_CDF = [
    (-8, 163), (-7, 605), (-6, 1806), (-5, 5071), (-4, 13948),
    (-3, 38078), (-2, 103668), (-1, 281962), (0, 766614), (1, 944908),
    (2, 1010498), (3, 1034628), (4, 1043505), (5, 1046770),
    (6, 1047971), (7, 1048413), (8, 1048576),
]


def _dp_case_sql(u_expr: str) -> str:
    whens = " ".join(
        f"WHEN {u_expr} < {c} THEN {k}" for k, c in _DP_CDF[:-1]
    )
    return f"CAST(CASE {whens} ELSE {_DP_CDF[-1][0]} END AS BIGINT)"


@_register(
    "docs_dp_source_histogram",
    f"""
    WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
               FROM documents GROUP BY source),
    u AS (SELECT source, n_docs,
                 {parity_hash_sql("'dpnoise|' || source")} % {_DP_SCALE} AS u
          FROM c),
    n AS (SELECT source, n_docs, {_dp_case_sql('u')} AS noise FROM u)
    SELECT source, n_docs, noise,
           GREATEST(n_docs + noise, CAST(0 AS BIGINT)) AS released,
           ABS(noise) AS abs_err
    FROM n ORDER BY source
    """,
)
def q_docs_dp_source_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-DP per-source document histogram via the geometric mechanism
    (Dwork et al. 2006 calibration; Ghosh et al. 2009 optimality):
    true count + two-sided-geometric noise (ε = 1, frozen integer CDF
    table, hash-seeded inverse-CDF sampling), clamped at 0 by
    post-processing. The readout keeps the true count and the noise
    beside the released value so tests can pin the mechanism — a real
    release would publish ``released`` only.

    Scale: one map-combinable count per source, then O(sources) rows
    of pure codegen arithmetic (hash → modulo → 17-arm CASE). The
    noise table is part of the PLAN, not the data — nothing joins,
    nothing shuffles beyond the count."""
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    u = c.withColumn(
        "u",
        parity_hash(F.concat(F.lit("dpnoise|"), F.col("source")))
        % F.lit(_DP_SCALE),
    )
    noise = None
    for k, cum in _DP_CDF[:-1]:
        cond = F.col("u") < cum
        noise = F.when(cond, k) if noise is None else noise.when(cond, k)
    noise = noise.otherwise(_DP_CDF[-1][0]).cast("long")
    return (
        u.withColumn("noise", noise)
        .select(
            "source",
            "n_docs",
            "noise",
            F.greatest(
                F.col("n_docs") + F.col("noise"), F.lit(0).cast("long")
            ).alias("released"),
            F.abs("noise").alias("abs_err"),
        )
        .orderBy("source")
    )


# ===========================================================================
# A/B guardrail: sample-ratio mismatch (SRM) chi-square check
# ===========================================================================
#: chi-square critical value at p = 0.05, df = 1, scaled by 10^6 —
#: the standard SRM alarm threshold (Fabijan et al. 2019). For a
#: 50/50 split, chi² collapses exactly to (n_a - n_b)² / n, so the
#: scaled test is pure BIGINT: 10^6·d² vs 3841459·n.
_SRM_CRIT_X1E6 = 3_841_459


@_register(
    "events_srm_check",
    f"""
    WITH ua AS (SELECT DISTINCT event_type, user_id FROM events),
    arm AS (SELECT event_type, user_id,
                   {parity_hash_sql("'srm|' || CAST(user_id AS VARCHAR)")} % 2 AS arm
            FROM ua),
    g AS (SELECT event_type,
                 CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS users_a,
                 CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS users_b
          FROM arm GROUP BY event_type)
    SELECT event_type, users_a, users_b,
           users_a + users_b AS total_users,
           users_a - users_b AS delta,
           (1000000 * (users_a - users_b) * (users_a - users_b))
             // (users_a + users_b) AS chi2_x1e6,
           CAST(CASE WHEN 1000000 * (users_a - users_b) * (users_a - users_b)
                     >= {_SRM_CRIT_X1E6} * (users_a + users_b)
                THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
    FROM g ORDER BY event_type
    """,
)
def q_events_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail (Fabijan et al. 2019 — the #1
    invalidator of A/B readouts): deterministically hash-assign every
    user to one of two arms per experiment (event_type stands in for
    the experiment key, as in ``events_ab_test``), then chi-square the
    arm counts against the designed 50/50 split. For two arms the
    statistic reduces exactly to (n_a-n_b)²/n, so the whole test is
    integer arithmetic: scaled statistic and a 1/0 alarm against the
    p<0.05 critical value. Envelope: |d| ≤ 10⁵ users ⇒ 10⁶·d² ≤ 10¹⁶
    < 2⁶³.

    Scale: one map-side-deduped distinct on (experiment, user), one
    combinable count agg, O(experiments) output rows of codegen
    arithmetic. The assignment hash is the same engine-portable
    sha256 prefix every sampling operator here uses — no RNG, no
    state, reproducible across engines and reruns."""
    e = load_table(spark, sf_dir, "events")
    ua = e.select("event_type", "user_id").distinct()
    arm = ua.withColumn(
        "arm",
        parity_hash(F.concat(F.lit("srm|"), F.col("user_id").cast("string")))
        % 2,
    )
    g = arm.groupBy("event_type").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("users_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("users_b"),
    )
    return (
        g.select(
            "event_type",
            "users_a",
            "users_b",
            (F.col("users_a") + F.col("users_b")).alias("total_users"),
            (F.col("users_a") - F.col("users_b")).alias("delta"),
            F.expr(
                "(1000000 * (users_a - users_b) * (users_a - users_b)) "
                "div (users_a + users_b)"
            ).alias("chi2_x1e6"),
            F.when(
                F.lit(1_000_000)
                * (F.col("users_a") - F.col("users_b"))
                * (F.col("users_a") - F.col("users_b"))
                >= F.lit(_SRM_CRIT_X1E6) * (F.col("users_a") + F.col("users_b")),
                1,
            )
            .otherwise(0)
            .cast("long")
            .alias("srm_flag"),
        )
        .orderBy("event_type")
    )


# ===========================================================================
# Exact Gini concentration over the distributed global rank
# ===========================================================================
@_register(
    "customer_revenue_gini",
    """
    WITH rev AS (SELECT o_custkey AS c,
                        CAST(floor(SUM(o_totalprice)) AS BIGINT) AS x
                 FROM orders GROUP BY 1),
    r AS (SELECT c, x,
                 CAST(row_number() OVER (ORDER BY x, c) AS BIGINT) AS rnk
          FROM rev)
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(x) AS BIGINT) AS total_revenue,
           CAST((CAST(1000 AS HUGEINT) * (2 * CAST(sum(rnk * x) AS HUGEINT)
                    - (CAST(count(*) AS HUGEINT) + 1) * CAST(sum(x) AS HUGEINT)))
             // (CAST(count(*) AS HUGEINT) * CAST(sum(x) AS HUGEINT))
             AS BIGINT) AS gini_x1000
    FROM r
    """,
)
def q_customer_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gini coefficient of customer revenue concentration via
    the rank formula G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over
    ascending-sorted revenues — the single number behind every
    "how concentrated is our corpus/revenue/token budget" audit, here
    integer-exact: revenues floor to whole currency units (SUM the
    exact decimals FIRST, floor once) and the result ships ×1000
    truncated. Arithmetic envelope (ADVICE r9: the original BIGINT
    form wrapped silently at ~sf10 — 1000·(2T−(n+1)S) ≈ 1000·G·n·S
    reaches ~10²¹ ≫ 2⁶³): every product/sum past the per-row rnk·x is
    DECIMAL(38,0) (Spark) / HUGEINT (DuckDB), good to n·Σx < 10³⁵ ≈
    sf10¹⁴ — checked-overflow types on both engines, so an envelope
    breach raises instead of recording garbage. The integral quotient
    is recovered exactly as (numer − numer % denom) / denom — decimal
    remainder is exact, and decimal division of an exact multiple
    yields the exact integer — rather than `div`, which Spark defines
    only on integral operands.

    Scale: the rank comes from ``layout.global_row_number`` — the
    two-phase range-exchange form — NOT a ``row_number() OVER (ORDER
    BY ...)`` window, whose plan funnels the whole table through one
    ``Exchange SinglePartition`` task (the oracle spells it that way
    because DuckDB is single-node anyway; the Spark plan must not).
    One combinable final aggregate; ties broken by custkey so the
    rank is a well-defined function of the data on both engines."""
    from ipeds_etl_spark.operators.layout import global_row_number

    o = load_table(spark, sf_dir, "orders")
    rev = o.groupBy(F.col("o_custkey").alias("c")).agg(
        F.floor(F.sum("o_totalprice")).cast("long").alias("x")
    )
    r = global_row_number(rev, ["x", "c"], "rnk")
    return gini_from_ranked(r)


def gini_from_ranked(r: DataFrame) -> DataFrame:
    """Decimal-exact gini×1000 from a ``(x, rnk)`` frame (ascending
    dense global rank, 1-based). Split out so the overflow envelope is
    testable on synthetic magnitudes the tables never reach
    (test_round10_ops: values where the old int64 form wrapped)."""
    dec = "decimal(38,0)"
    return (
        r.agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            # per-row rnk·x fits int64 (rnk ≤ n, x per key — the
            # stated per-row contract); everything ACCUMULATED is
            # decimal(38,0), including Σx: a plain long sum wraps
            # silently, a decimal one raises (caught writing the
            # round-10 envelope test)
            F.sum(F.col("x").cast(dec)).cast(dec).alias("__s"),
            F.sum((F.col("rnk") * F.col("x")).cast(dec)).cast(dec).alias("__t"),
        )
        .select(
            "n_customers",
            F.col("__s").alias("__sdec"),
            (
                F.lit(1000).cast(dec)
                * (
                    F.lit(2).cast(dec) * F.col("__t")
                    - (F.col("n_customers").cast(dec) + F.lit(1).cast(dec))
                    * F.col("__s")
                )
            ).alias("__numer"),
            (F.col("n_customers").cast(dec) * F.col("__s")).alias("__denom"),
        )
        .select(
            "n_customers",
            F.col("__sdec").cast("long").alias("total_revenue"),
            ((F.col("__numer") - F.col("__numer") % F.col("__denom")) / F.col("__denom"))
            .cast("long")
            .alias("gini_x1000"),
        )
    )


# ===========================================================================
# Sequence-packing fragmentation audit (pad-vs-pack waste)
# ===========================================================================
_FRAG_CTX = 256


@_register(
    "docs_packing_fragmentation",
    f"""
    WITH n AS (SELECT doc_id, source,
                      CAST(len({_WS_TOKENS.format(x='text')}) AS BIGINT) AS n_toks
               FROM documents),
    g AS (SELECT source,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(n_toks) AS BIGINT) AS total_tokens,
                 CAST(sum((n_toks + {_FRAG_CTX} - 1) // {_FRAG_CTX}) AS BIGINT)
                   AS padded_blocks
          FROM n WHERE n_toks > 0 GROUP BY source)
    SELECT source, n_docs, total_tokens, padded_blocks,
           (total_tokens + {_FRAG_CTX} - 1) // {_FRAG_CTX} AS packed_blocks,
           (1000 * (padded_blocks * {_FRAG_CTX} - total_tokens))
             // (padded_blocks * {_FRAG_CTX}) AS padded_waste_permille,
           (1000 * (((total_tokens + {_FRAG_CTX} - 1) // {_FRAG_CTX}) * {_FRAG_CTX}
                    - total_tokens))
             // (((total_tokens + {_FRAG_CTX} - 1) // {_FRAG_CTX}) * {_FRAG_CTX})
             AS packed_waste_permille,
           padded_blocks - ((total_tokens + {_FRAG_CTX} - 1) // {_FRAG_CTX})
             AS blocks_saved
    FROM g ORDER BY source
    """,
)
def q_docs_packing_fragmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loader-efficiency audit: for a context length of 256 tokens,
    compare the two ways a training loader turns documents into
    fixed-size blocks — per-document padding (each doc rounds up to
    its own blocks; the waste every "pad to max length" collator
    pays) vs cross-document packing (one concatenated stream per
    source, only the final block padded — the
    ``docs_concat_chunk_packing`` strategy). Per source: block counts
    under each strategy, permille padding waste, and blocks saved by
    packing — the number that justifies the packing pipeline's
    existence in a 100 TB token budget.

    Scale: one map pass (token count per doc), one combinable agg per
    source, O(sources) rows of integer arithmetic. Ceilings are
    integer-division spellings, truncation-exact on both engines."""
    d = load_table(spark, sf_dir, "documents")
    L = _FRAG_CTX
    n = d.select(
        "source",
        TX.token_count(F.col("text")).cast("long").alias("n_toks"),
    ).filter(F.col("n_toks") > 0)
    g = n.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("total_tokens"),
        F.sum(F.expr(f"(n_toks + {L} - 1) div {L}"))
        .cast("long")
        .alias("padded_blocks"),
    )
    return (
        g.select(
            "source",
            "n_docs",
            "total_tokens",
            "padded_blocks",
            F.expr(f"(total_tokens + {L} - 1) div {L}").alias("packed_blocks"),
            F.expr(
                f"(1000 * (padded_blocks * {L} - total_tokens)) "
                f"div (padded_blocks * {L})"
            ).alias("padded_waste_permille"),
            F.expr(
                f"(1000 * (((total_tokens + {L} - 1) div {L}) * {L} - total_tokens)) "
                f"div (((total_tokens + {L} - 1) div {L}) * {L})"
            ).alias("packed_waste_permille"),
            F.expr(
                f"padded_blocks - ((total_tokens + {L} - 1) div {L})"
            ).alias("blocks_saved"),
        )
        .orderBy("source")
    )


# ===========================================================================
# IVF probe sweep: the ANN quality-cost tuning curve
# ===========================================================================
_SWEEP_PROBES = (1, 2, 4)


def _ivf_probe_sweep_oracle() -> str:
    from ipeds_etl_spark.queries_ext import _COS_AB, _IVF_PAIR_COS, _ivf_sql

    per_probe_ctes = ",\n    ".join(
        f"""probes{p} AS (SELECT vec_id, embedding, cid AS centroid_id
               FROM scored WHERE rn <= {p} AND vec_id < 5),
    ivf{p} AS (SELECT query_id, neighbor_id FROM (
      SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {_IVF_PAIR_COS} DESC, n.vec_id ASC) AS rnk
      FROM probes{p} q JOIN assigned n
        ON q.centroid_id = n.centroid_id AND q.vec_id <> n.vec_id)
      WHERE rnk <= 5)"""
        for p in _SWEEP_PROBES
    )
    arms = "\n      UNION ALL\n      ".join(
        f"""SELECT CAST({p} AS BIGINT) AS n_probe,
             CAST(count(*) AS BIGINT) AS k_total,
             CAST(count(i.neighbor_id) AS BIGINT) AS n_hit,
             CAST(count(i.neighbor_id) AS DOUBLE) / count(*) AS recall
      FROM brute b LEFT JOIN ivf{p} i
        ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id"""
        for p in _SWEEP_PROBES
    )
    return f"""
    WITH {_ivf_sql()},
    brute AS (SELECT query_id, neighbor_id FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {_COS_AB} DESC, c.vec_id ASC) AS rnk
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < 5)
      WHERE rnk <= 5),
    {per_probe_ctes}
    SELECT * FROM ({arms})
    ORDER BY n_probe
    """


@_register("emb_ivf_probe_sweep", _ivf_probe_sweep_oracle())
def q_emb_ivf_probe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN tuning curve: recall@5 of the refined-centroid IVF at
    nprobe ∈ {1, 2, 4} against the exact brute-force top-5, aggregated
    over the 5-query anchor batch — the measurement that decides the
    probe budget before a production rollout (recall climbs toward 1
    as nprobe approaches the centroid count; the cost climbs
    linearly). Extends the single-point ``emb_ivf_recall`` gate to the
    curve FAISS's own tuning loop sweeps.

    Scale: the brute-force ground truth is O(anchors × corpus) map
    work — the same sanctioned broadcast-anchor shape as every recall
    gate here (bench-excluded with them; at production scale the truth
    set comes from an offline exact pass, not a per-run recompute).
    Each probe arm scans only its probed partitions; the deterministic
    k-means codebook is memoized once per corpus
    (``operators/indexes.py``), so the sweep reuses ONE assignment
    pass across all three arms."""
    from ipeds_etl_spark.operators import similarity as SIM
    from ipeds_etl_spark.queries_ext import _ivf_codebook

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    brute = SIM.brute_force_topk(e, queries, "vec_id", "embedding", k=5)
    out = None
    for p in _SWEEP_PROBES:
        ivf = SIM.ivf_topk(
            e, queries, "vec_id", "embedding",
            k=5, n_centroids=8, n_probe=p,
            cent_rows=_ivf_codebook(spark, sf_dir),
        )
        arm = (
            brute.alias("b")
            .join(
                ivf.alias("i"),
                on=[
                    F.col("b.query_id") == F.col("i.query_id"),
                    F.col("b.neighbor_id") == F.col("i.neighbor_id"),
                ],
                how="left",
            )
            .agg(
                F.count(F.lit(1)).cast("long").alias("k_total"),
                F.count(F.col("i.neighbor_id")).cast("long").alias("n_hit"),
            )
            .select(
                F.lit(p).cast("long").alias("n_probe"),
                "k_total",
                "n_hit",
                (F.col("n_hit").cast("double") / F.col("k_total")).alias(
                    "recall"
                ),
            )
        )
        out = arm if out is None else out.unionByName(arm)
    return out.orderBy("n_probe")


# ===========================================================================
# Web-log bot heuristics: training-data hygiene for event-derived corpora
# ===========================================================================
#: rule thresholds (plan constants): a minute with ≥3 events, a single
#: event type carrying ≥60% of a user's volume, and sustained ≥2
#: events per active minute each score one point; ≥2 points ⇒ bot.
_BOT_BURST_MIN = 3
_BOT_MONOTONY_PERMILLE = 600
_BOT_POINTS_FLAG = 2


@_register(
    "events_bot_score",
    f"""
    WITH pm AS (SELECT user_id, epoch_us(ts) // 60000000 AS minute,
                       CAST(count(*) AS BIGINT) AS c
                FROM events GROUP BY user_id, minute),
    u AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
                 CAST(count(*) AS BIGINT) AS active_minutes,
                 CAST(max(c) AS BIGINT) AS max_per_minute
          FROM pm GROUP BY user_id),
    pt AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY user_id, event_type),
    tt AS (SELECT user_id, CAST(max(c) AS BIGINT) AS top_type_events,
                 CAST(count(*) AS BIGINT) AS n_types
           FROM pt GROUP BY user_id),
    j AS (SELECT u.user_id, n_events, active_minutes, max_per_minute,
                 n_types, (1000 * top_type_events) // n_events AS top_type_permille
          FROM u JOIN tt ON tt.user_id = u.user_id),
    sc AS (SELECT j.*,
                  CAST(CASE WHEN max_per_minute >= {_BOT_BURST_MIN} THEN 1 ELSE 0 END
                     + CASE WHEN top_type_permille >= {_BOT_MONOTONY_PERMILLE} THEN 1 ELSE 0 END
                     + CASE WHEN n_events >= 2 * active_minutes THEN 1 ELSE 0 END
                     AS BIGINT) AS bot_points
           FROM j)
    SELECT user_id, n_events, active_minutes, max_per_minute, n_types,
           top_type_permille, bot_points,
           CAST(CASE WHEN bot_points >= {_BOT_POINTS_FLAG} THEN 1 ELSE 0 END AS BIGINT)
             AS is_bot
    FROM sc
    ORDER BY bot_points DESC, n_events DESC, user_id
    LIMIT 20
    """,
)
def q_events_bot_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based bot/automation scoring over user event streams — the
    hygiene gate a web-log-derived training corpus runs before text
    extraction (automated traffic poisons both dedup statistics and
    quality priors). Three integer heuristics per user: burst rate
    (max events in any one minute), type monotony (top event type's
    permille share), and sustained density (≥2 events per active
    minute); ≥2 points flags the user. Review queue = top 20 by score.

    Scale: two map-combinable aggregates — (user, minute) and
    (user, type) — whose second stages and the final join all share
    one user_id exchange; minute ids are integer floor-divs of epoch
    micros (`unix_micros` ↔ DuckDB `epoch_us`, the exact-parity pair).
    O(users) rows of codegen arithmetic; top-20 is a distributed
    TakeOrderedAndProject, never a full sort."""
    e = load_table(spark, sf_dir, "events")
    pm = (
        e.select("user_id", F.expr("unix_micros(ts) div 60000000").alias("minute"))
        .groupBy("user_id", "minute")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    u = pm.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("active_minutes"),
        F.max("c").cast("long").alias("max_per_minute"),
    )
    pt = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tt = pt.groupBy("user_id").agg(
        F.max("c").cast("long").alias("top_type_events"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )
    j = u.join(tt, "user_id").select(
        "user_id",
        "n_events",
        "active_minutes",
        "max_per_minute",
        "n_types",
        F.expr("(1000 * top_type_events) div n_events").alias(
            "top_type_permille"
        ),
    )
    pts = (
        F.when(F.col("max_per_minute") >= _BOT_BURST_MIN, 1).otherwise(0)
        + F.when(
            F.col("top_type_permille") >= _BOT_MONOTONY_PERMILLE, 1
        ).otherwise(0)
        + F.when(
            F.col("n_events") >= 2 * F.col("active_minutes"), 1
        ).otherwise(0)
    ).cast("long")
    sc = j.withColumn("bot_points", pts)
    return (
        sc.select(
            "*",
            F.when(F.col("bot_points") >= _BOT_POINTS_FLAG, 1)
            .otherwise(0)
            .cast("long")
            .alias("is_bot"),
        )
        .orderBy(F.desc("bot_points"), F.desc("n_events"), "user_id")
        .limit(20)
    )


# ===========================================================================
# PQ codebook utilization audit
# ===========================================================================
def _pq_balance_oracle() -> str:
    from ipeds_etl_spark.queries_ext import _PQ_M, _pq_sub_sql

    ctes: list[str] = []
    for s in range(_PQ_M):
        ctes.extend(_pq_sub_sql(s))
    unions = "\n      UNION ALL\n      ".join(
        f"SELECT CAST({s} AS BIGINT) AS subspace, cid FROM s{s}_codes"
        for s in range(_PQ_M)
    )
    joined_ctes = ",\n    ".join(ctes)
    return f"""
    WITH {joined_ctes},
    codes AS ({unions}),
    per AS (SELECT subspace, cid, CAST(count(*) AS BIGINT) AS n
            FROM codes GROUP BY subspace, cid),
    tot AS (SELECT subspace,
                   CAST(sum(n) AS BIGINT) AS nt,
                   CAST(count(*) AS BIGINT) AS n_codes_used,
                   CAST(max(n) AS BIGINT) AS nmax,
                   CAST(sum(n * n) AS BIGINT) AS s2
            FROM per GROUP BY subspace)
    SELECT subspace, n_codes_used,
           (1000 * nmax) // nt AS max_code_share_permille,
           (1000000 * s2) // (nt * nt) AS simpson_x1e6
    FROM tot ORDER BY subspace
    """


@_register("emb_pq_codebook_balance", _pq_balance_oracle())
def q_emb_pq_codebook_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ codebook utilization audit: per subspace, how evenly the
    corpus distributes over the 16 codewords — codes used, the hottest
    code's permille share, and the Simpson concentration ×10⁶ (uniform
    over k codes → 10⁶/k = 62,500; one dead-centroid subspace reads
    instantly as a higher Simpson and a lower used count). Unbalanced
    codebooks waste code bits and flatten ADC score resolution — this
    is the health check FAISS users run as `codebook imbalance factor`
    (Jégou et al. 2011), here integer-exact and oracle-replayed through
    the same deterministic train+encode CTEs as the PQ search queries.

    Scale: encoding is the map-only codebook-literal argmax (corpus
    never shuffles); the audit aggregates (subspace, code) — at most
    M×k = 64 groups — so everything after the map is metadata-sized.
    BIGINT envelope: Σn² ≤ n² = (2·10⁵)² = 4·10¹⁰, ×10⁶ < 2⁶³."""
    from ipeds_etl_spark.operators import similarity as SIM
    from ipeds_etl_spark.queries_ext import _PQ_M, _PQ_SUB_DIM, _pq_codebook

    e = load_table(spark, sf_dir, "embeddings")
    codes = SIM.pq_encode(
        e, "vec_id", "embedding", _pq_codebook(spark, sf_dir),
        sub_dim=_PQ_SUB_DIM,
    )
    stack = F.expr(
        "stack({m}, {args})".format(
            m=_PQ_M,
            args=", ".join(
                f"CAST({s} AS BIGINT), code_{s}" for s in range(_PQ_M)
            ),
        )
    ).alias("subspace", "cid")
    per = (
        codes.select(stack)
        .groupBy("subspace", "cid")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = per.groupBy("subspace").agg(
        F.sum("n").cast("long").alias("nt"),
        F.count(F.lit(1)).cast("long").alias("n_codes_used"),
        F.max("n").cast("long").alias("nmax"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("s2"),
    )
    return (
        tot.select(
            "subspace",
            "n_codes_used",
            F.expr("(1000 * nmax) div nt").alias("max_code_share_permille"),
            F.expr("(1000000 * s2) div (nt * nt)").alias("simpson_x1e6"),
        )
        .orderBy("subspace")
    )
