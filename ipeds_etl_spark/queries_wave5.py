"""Round-5 additions: verifiable-sketch completion, skyline, CEP-style
sequence matching, sorted-neighborhood dedup, corpus-drift audit.

Families this wave completes or opens:

* **Sketches** — the KMV estimator (``operators/sketches.py``) gets its
  two classic siblings, both on the engine-portable parity hash so the
  DuckDB oracle replays them bit-for-bit: a HyperLogLog whose harmonic
  sum is EXACT in IEEE double (dyadic terms only — no order
  sensitivity, no libm), and a Count-Min sketch whose build is one
  map-combinable aggregate and whose point estimates broadcast-join a
  ≤ d·w-row counts table.
* **Skyline / Pareto frontier** — the 2-D skyline reduces to a prefix
  MIN over the price order, so the O(n²) dominance NOT-EXISTS becomes
  a two-phase distributed running min (the ``orders_open_interval_counts``
  prefix-sum recipe applied to MIN); the oracle runs the quadratic
  definition directly.
* **Sequence pattern matching (CEP)** — MATCH_RECOGNIZE-style per-user
  regex over the delimited, totally-ordered event-type string; the
  negation ("no error between") is spelled with character classes
  because the oracle's RE2 has no lookahead.
* **Sorted-neighborhood dedup (Hernández & Stolfo 1995)** — the third
  classic blocking discipline next to LSH banding and SimHash blocks:
  global sort key rank (via the distributed ``global_row_number``),
  candidate pairs = rank distance ≤ w, exact verification on the pair
  sliver only.
* **Corpus composition audit** — source × language chi-square
  contributions from exact integer moments (one IEEE division per
  cell), the drift alarm a training-data pipeline runs per crawl.

The reference (kebe3476/ipeds_etl) ships none of these operators; they
extend its analytics surface following the same oracle-twin discipline
as the rest of the extension track (see COVERAGE.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ipeds_etl_spark.operators import sketches as SK
from ipeds_etl_spark.queries import _register
from ipeds_etl_spark.sources.tables import load_table

# DuckDB token helpers (same spelling as queries_ext)
_WS_TOKENS = r"list_filter(regexp_split_to_array({x}, '\s+'), t -> len(t) > 0)"


# ===========================================================================
# HyperLogLog distinct-user estimate, per event type + max-merged global
# ===========================================================================
def _hll_oracle() -> str:
    b = SK.hll_bucket_sql("CAST(user_id AS VARCHAR)")
    r = SK.hll_rho_sql("CAST(user_id AS VARCHAR)")
    pow_r = SK.hll_register_pow_sql("r")
    est = SK.hll_estimate_from_registers_sql("sp", "nreg")
    return f"""
    WITH h AS (SELECT event_type, {b} AS bucket, {r} AS rho FROM events),
    regs AS (SELECT event_type, bucket, max(rho) AS r
             FROM h GROUP BY GROUPING SETS ((event_type, bucket), (bucket))),
    per AS (SELECT coalesce(event_type, '__all__') AS event_type,
                   SUM({pow_r}) AS sp, CAST(count(*) AS BIGINT) AS nreg
            FROM regs GROUP BY 1),
    ex AS (SELECT coalesce(event_type, '__all__') AS event_type,
                  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
           FROM events GROUP BY GROUPING SETS ((event_type), ()))
    SELECT per.event_type, ex.exact_users,
           {est} AS hll_users,
           CAST({SK.HLL_M} AS BIGINT) - per.nreg AS empty_registers,
           ({est} - ex.exact_users) / ex.exact_users AS rel_err
    FROM per JOIN ex ON per.event_type = ex.event_type
    ORDER BY per.event_type
    """


@_register("events_hll_users", _hll_oracle())
def q_events_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct users per event type AND the max-merged global
    sketch in one plan: registers are built per (type, bucket) and per
    (bucket) by ONE grouping-sets pass (register merge IS max, so the
    global registers are exactly the merge of the per-type ones —
    demonstrated structurally, asserted by test). Emits the exact
    count, the raw HLL estimate (no ln-based low-range correction —
    transcendental, engine-specific; the zero-register count V is
    emitted so a consumer can apply it), and the relative error.
    Scale: two map-combinable aggregates over (m × groups) register
    rows; state is 64 registers per group regardless of input size."""
    uid = F.col("user_id").cast("string")
    e = load_table(spark, sf_dir, "events")
    h = e.select(
        "event_type",
        SK.hll_bucket(uid).alias("bucket"),
        SK.hll_rho(uid).alias("rho"),
    )
    regs = (
        h.groupingSets([["event_type", "bucket"], ["bucket"]], "event_type", "bucket")
        .agg(F.max("rho").alias("r"))
    )
    per = (
        regs.withColumn("event_type", F.coalesce("event_type", F.lit("__all__")))
        .groupBy("event_type")
        .agg(
            F.sum(SK.hll_register_pow(F.col("r"))).alias("sp"),
            F.count(F.lit(1)).alias("nreg"),
        )
    )
    ex = (
        e.groupingSets([["event_type"], []], "event_type")
        .agg(F.countDistinct("user_id").alias("exact_users"))
        .withColumn("event_type", F.coalesce("event_type", F.lit("__all__")))
    )
    est = SK.hll_estimate_from_registers(F.col("sp"), F.col("nreg"))
    return (
        per.join(F.broadcast(ex), "event_type")
        .select(
            "event_type",
            "exact_users",
            est.alias("hll_users"),
            (F.lit(SK.HLL_M).cast("long") - F.col("nreg")).alias("empty_registers"),
            ((est - F.col("exact_users")) / F.col("exact_users")).alias("rel_err"),
        )
        .orderBy("event_type")
    )


# ===========================================================================
# Count-Min sketch: per-user event-count point estimates, top-15
# ===========================================================================
def _cms_oracle() -> str:
    b_build = SK.cms_bucket_sql("CAST(user_id AS VARCHAR)", "i")
    return f"""
    WITH rows_ AS (SELECT unnest([0, 1, 2, 3]) AS i),
    sk AS (SELECT i, {b_build} AS bucket, CAST(count(*) AS BIGINT) AS c
           FROM events CROSS JOIN rows_ GROUP BY 1, 2),
    exact AS (SELECT user_id, CAST(count(*) AS BIGINT) AS exact_n
              FROM events GROUP BY 1),
    probe AS (SELECT user_id, exact_n, i, {b_build} AS bucket
              FROM exact CROSS JOIN rows_),
    est AS (SELECT user_id, exact_n, min(c) AS cms_n
            FROM probe JOIN sk USING (i, bucket) GROUP BY 1, 2)
    SELECT user_id, exact_n, cms_n, cms_n - exact_n AS overcount
    FROM est ORDER BY cms_n DESC, user_id LIMIT 15
    """


@_register("events_cms_user_counts", _cms_oracle())
def q_events_cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min point estimates of per-user event counts next to the
    exact counts, top-15 heavy users by estimate (deterministic
    tiebreak on user_id). Build = ONE map-combinable aggregate over the
    d-fold exploded stream into a ≤ d·w = 512-row counts table; probe =
    broadcast join of that table. CMS never underestimates (min over d
    rows, each an overcount) — the ``overcount`` column is the measured
    error, bounded by n/w per row (Cormode & Muthukrishnan 2005). The
    batch twin of the Misra-Gries streaming heavy hitters
    (``streaming/stateful.py::heavy_hitters_stream``): MG bounds state
    by keeping few keys, CMS by hashing all keys into fixed counters."""
    uid = F.col("user_id").cast("string")
    rows_ = F.explode(F.array(*[F.lit(i) for i in range(SK.CMS_D)])).alias("i")
    e = load_table(spark, sf_dir, "events")
    sk = (
        e.select("user_id", rows_)
        .select(F.col("i"), SK.cms_bucket(uid, F.col("i")).alias("bucket"))
        .groupBy("i", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exact = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
    probe = exact.select("user_id", "exact_n", rows_).select(
        "user_id", "exact_n", "i", SK.cms_bucket(uid, F.col("i")).alias("bucket")
    )
    return (
        probe.join(F.broadcast(sk), ["i", "bucket"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("c").alias("cms_n"))
        .select(
            "user_id",
            "exact_n",
            "cms_n",
            (F.col("cms_n") - F.col("exact_n")).alias("overcount"),
        )
        .orderBy(F.desc("cms_n"), "user_id")
        .limit(15)
    )


# ===========================================================================
# 2-D skyline (Pareto frontier): cheapest-and-smallest parts
# ===========================================================================
@_register(
    "parts_skyline_2d",
    """
    SELECT p_partkey, p_name, p_retailprice, p_size
    FROM part p
    WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
      AND NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_retailprice IS NOT NULL AND q.p_size IS NOT NULL
          AND q.p_retailprice <= p.p_retailprice AND q.p_size <= p.p_size
          AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size))
    ORDER BY p_retailprice, p_partkey
    """,
)
def q_parts_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (minimize price AND size): a part survives iff no other
    part is ≤ on both dimensions and < on one. In 2-D, dominance
    collapses to a prefix MIN over the price order — a point is on the
    frontier iff it has the min size at its price AND every strictly
    cheaper price's min size is larger — so the O(n²) NOT EXISTS the
    oracle runs becomes: per-price min (one map-combinable shuffle),
    then the distributed two-phase prefix min (per-bucket running min +
    a bucket-level offset table, the ``orders_open_interval_counts``
    recipe — the only global window runs over the O(buckets) offset
    rows, never over data). Ties: equal (price, size) points don't
    dominate each other, so duplicates all survive — both spellings
    agree by construction."""
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_retailprice").isNotNull() & F.col("p_size").isNotNull())
        .select("p_partkey", "p_name", "p_retailprice", "p_size")
    )
    per_price = p.groupBy("p_retailprice").agg(F.min("p_size").alias("msize"))
    pp = per_price.withColumn(
        "bkt", F.floor(F.col("p_retailprice") / 100.0).cast("long")
    )
    w_in = (
        Window.partitionBy("bkt")
        .orderBy("p_retailprice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pp = pp.withColumn("prev_in", F.min("msize").over(w_in))
    # bucket offsets: O(price-range/100) rows — metadata-sized, the one
    # global window in the plan (same shape as the year-offset table in
    # orders_open_interval_counts)
    bstats = pp.groupBy("bkt").agg(F.min("msize").alias("bmin"))
    w_b = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    bstats = bstats.withColumn("prev_b", F.min("bmin").over(w_b))
    big = 1 << 31
    prev_min = F.least(
        F.coalesce(F.col("prev_in"), F.lit(big)),
        F.coalesce(F.col("prev_b"), F.lit(big)),
    )
    pref = pp.join(F.broadcast(bstats.select("bkt", "prev_b")), "bkt").select(
        "p_retailprice", "msize", prev_min.alias("prev_min")
    )
    return (
        p.join(pref, "p_retailprice")
        .filter((F.col("p_size") == F.col("msize")) & (F.col("p_size") < F.col("prev_min")))
        .select("p_partkey", "p_name", "p_retailprice", "p_size")
        .orderBy("p_retailprice", "p_partkey")
    )


# ===========================================================================
# CEP-style sequence pattern matching over per-user event streams
# ===========================================================================
_CEP_P1 = ">view>purchase>"  # purchase immediately after view
_CEP_P2 = ">signup>([^e>][^>]*>)*purchase>"  # signup→purchase, no error between
_CEP_P3 = ">purchase>error>"  # error immediately after purchase


@_register(
    "events_cep_pattern_match",
    f"""
    WITH seq AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             '>' || string_agg(event_type, '>' ORDER BY ts, event_id) || '>' AS s
      FROM events GROUP BY user_id)
    SELECT user_id, n_events,
           regexp_matches(s, '{_CEP_P1}') AS view_then_purchase,
           regexp_matches(s, '{_CEP_P2}') AS signup_to_purchase_clean,
           regexp_matches(s, '{_CEP_P3}') AS purchase_then_error
    FROM seq ORDER BY user_id
    """,
)
def q_events_cep_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE / Flink-CEP-style sequence detection, batch
    form: each user's events collapse to ONE delimited type string in
    true (ts, event_id) order, and patterns are regexes over it —
    adjacency ('view then purchase immediately'), gapped reachability
    with negation ('signup→purchase with NO error between'). The
    negation is a character class, not a lookahead (the five event
    types have distinct initials; RE2 — the oracle engine — has no
    lookahead). State per user = its event-type string (bounded by the
    per-user event count, same bound as any sessionization); matching
    is JVM-side regex, map-only after the one user shuffle. A 100 TB
    run keys the same plan by (user, day) to bound string length."""
    e = load_table(spark, sf_dir, "events")
    seq = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))).alias("evs"),
    )
    s = F.concat(
        F.lit(">"),
        F.array_join(F.transform("evs", lambda x: x["event_type"]), ">"),
        F.lit(">"),
    )
    return seq.select(
        "user_id",
        "n_events",
        s.rlike(_CEP_P1).alias("view_then_purchase"),
        s.rlike(_CEP_P2).alias("signup_to_purchase_clean"),
        s.rlike(_CEP_P3).alias("purchase_then_error"),
    ).orderBy("user_id")


# ===========================================================================
# Sorted-neighborhood dedup: the third blocking discipline
# ===========================================================================
_SNM_W = 4  # window width: candidate pairs are rank distance 1..w
_SNM_J = 0.3


def _snm_oracle() -> str:
    toks = _WS_TOKENS.format(x="text")
    return f"""
    WITH t AS (SELECT doc_id, substr(lower(text), 1, 20) AS k,
                      list_distinct({toks}) AS s
               FROM documents),
    r AS (SELECT doc_id, k, s, row_number() OVER (ORDER BY k, doc_id) AS rn FROM t),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(b.rn - a.rn AS BIGINT) AS window_dist,
             CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
      FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND {_SNM_W})
    SELECT doc_a, doc_b, window_dist, jaccard
    FROM pairs WHERE jaccard >= {_SNM_J}
    ORDER BY doc_a, doc_b
    """


@_register("docs_snm_pairs", _snm_oracle())
def q_docs_snm_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood method (Hernández & Stolfo 1995): sort the
    corpus by a blocking key (first 20 chars of the lowercased text),
    slide a width-w window over the sorted order, verify only pairs
    within the window — candidate count is n·w, LINEAR in the corpus,
    vs LSH's collision-driven and SimHash's block-driven candidate
    sets. Spark shape: the global sort rank comes from the distributed
    ``global_row_number`` (range exchange + per-partition ranks +
    O(partitions) offsets — no single-task window); window pairs are an
    EQUI-join on rank+offset (offsets 1..w exploded), so no range join
    anywhere; exact token-set Jaccard runs on the O(n·w) pair sliver
    only. The oracle spells the same pipeline with a plain row_number
    window and a rank-band join."""
    from ipeds_etl_spark.functions import text as TX
    from ipeds_etl_spark.operators.layout import global_row_number

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring(F.lower(F.col("text")), 1, 20).alias("k"),
        F.array_distinct(TX.tokens(F.col("text"))).alias("s"),
    )
    ranked = global_row_number(d, ["k", "doc_id"], "rn")
    right = ranked.withColumn(
        "d", F.explode(F.array(*[F.lit(i) for i in range(1, _SNM_W + 1)]))
    ).withColumn("rn_left", F.col("rn") - F.col("d"))
    a, b = ranked.alias("a"), right.alias("b")
    inter = F.size(F.array_intersect(F.col("a.s"), F.col("b.s")))
    # |A∪B| = |A|+|B|−|A∩B| on distinct arrays (opt r13)
    union = F.size(F.col("a.s")) + F.size(F.col("b.s")) - inter
    return (
        a.join(b, F.col("a.rn") == F.col("b.rn_left"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("b.d").cast("long").alias("window_dist"),
            (inter.cast("double") / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= _SNM_J)
        .orderBy("doc_a", "doc_b")
    )


# ===========================================================================
# k-core decomposition of the dedup candidate graph (fixed peel rounds)
# ===========================================================================
_KCORE_K = 2
_KCORE_ROUNDS = 4


def _kcore_oracle() -> str:
    from ipeds_etl_spark.operators import dedup as DD
    from ipeds_etl_spark.queries_ext import _band_key_sql, _minhash_sig_sql

    bands = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, {_band_key_sql(b)} AS band_key FROM sig"
        for b in range(DD.N_PERMS // DD.ROWS_PER_BAND)
    )
    peel = []
    for r in range(_KCORE_ROUNDS):
        peel.append(
            f"n{r + 1} AS (SELECT s FROM e{r} GROUP BY s HAVING count(*) >= {_KCORE_K})"
        )
        peel.append(
            f"e{r + 1} AS (SELECT e.s, e.d FROM e{r} e "
            f"JOIN n{r + 1} x ON e.s = x.s JOIN n{r + 1} y ON e.d = y.s)"
        )
    peels = ",\n    ".join(peel)
    return f"""
    WITH {_minhash_sig_sql()},
    bands AS ({bands}),
    lsh AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
    e0 AS (SELECT id_a AS s, id_b AS d FROM lsh
           UNION ALL SELECT id_b, id_a FROM lsh),
    {peels}
    SELECT s AS doc_id, CAST(count(*) AS BIGINT) AS degree
    FROM e{_KCORE_ROUNDS} GROUP BY s ORDER BY doc_id
    """


@_register("dedup_kcore", _kcore_oracle())
def q_dedup_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peel (k=2, FIXED 4 rounds — the fixed-iteration contract
    the PageRank query set, so both engines run the identical bounded
    computation) over the LSH candidate-pair graph: rounds alternate
    degree-count → node filter → edge filter. The 2-core separates
    tight duplicate clusters from the chains and pendants LSH
    collisions produce — a structural dedup signal components can't
    give (a long chain is one component but has NO 2-core). Spark
    shape: per round one map-combinable degree agg + two left-semi
    joins, edges ``localCheckpoint``ed so lineage stays O(1) (the
    ``connected_components`` discipline); the oracle unrolls the same
    rounds as CTEs. At fixpoint every emitted degree is ≥ k; before
    it, degrees are degrees-in-e4 (test pins the Python replay)."""
    from ipeds_etl_spark.queries_ext import _lsh_doc_pairs

    pairs = _lsh_doc_pairs(spark, sf_dir)
    edges = pairs.select(
        F.col("id_a").alias("s"), F.col("id_b").alias("d")
    ).unionAll(pairs.select(F.col("id_b").alias("s"), F.col("id_a").alias("d")))
    for _ in range(_KCORE_ROUNDS):
        deg = edges.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= _KCORE_K).select("s")
        edges = (
            edges.join(keep, "s", "left_semi")
            .join(keep.withColumnRenamed("s", "d"), "d", "left_semi")
            .localCheckpoint(eager=False)
        )
    return (
        edges.groupBy("s")
        .agg(F.count(F.lit(1)).alias("degree"))
        .select(F.col("s").alias("doc_id"), "degree")
        .orderBy("doc_id")
    )


# ===========================================================================
# MinHash estimator calibration: signature-agreement Ĵ vs exact J
# ===========================================================================
def _minhash_estimate_oracle() -> str:
    from ipeds_etl_spark.operators import dedup as DD
    from ipeds_etl_spark.queries_ext import (
        _SHINGLES,
        _band_key_sql,
        _minhash_sig_sql,
    )

    bands = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, {_band_key_sql(b)} AS band_key FROM sig"
        for b in range(DD.N_PERMS // DD.ROWS_PER_BAND)
    )
    matches = " + ".join(
        f"CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END" for i in range(DD.N_PERMS)
    )
    toks = _WS_TOKENS.format(x="text")
    return f"""
    WITH {_minhash_sig_sql()},
    bands AS ({bands}),
    lsh AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
    ptoks AS (SELECT doc_id, {toks} AS w FROM documents),
    psh AS (SELECT doc_id, list_distinct({_SHINGLES.format(w='w')}) AS s FROM ptoks)
    SELECT l.id_a, l.id_b,
           CAST({matches} AS DOUBLE) / {DD.N_PERMS} AS est_j,
           CAST(len(list_intersect(pa.s, pb.s)) AS DOUBLE)
             / len(list_distinct(list_concat(pa.s, pb.s))) AS exact_j,
           CAST({matches} AS DOUBLE) / {DD.N_PERMS}
             - CAST(len(list_intersect(pa.s, pb.s)) AS DOUBLE)
                 / len(list_distinct(list_concat(pa.s, pb.s))) AS err
    FROM lsh l
    JOIN sig a ON a.doc_id = l.id_a
    JOIN sig b ON b.doc_id = l.id_b
    JOIN psh pa ON pa.doc_id = l.id_a
    JOIN psh pb ON pb.doc_id = l.id_b
    ORDER BY l.id_a, l.id_b
    """


@_register("dedup_minhash_estimate", _minhash_estimate_oracle())
def q_dedup_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator calibration on the candidate sliver: for every LSH
    candidate pair, the MinHash ESTIMATE of Jaccard (fraction of
    agreeing signature positions — the unbiased per-permutation
    collision estimator, Broder 1997) next to the exact shingle-set
    Jaccard and the signed error. This is the third gate of the
    MinHash family — recall says what bucketing missed, precision says
    what the verifier discards, calibration says how far the SKETCH
    value itself drifts (what you rely on when you skip exact
    verification at 100 TB and threshold on Ĵ directly). est_j is
    matches/16 (dyadic, exact); one IEEE division for exact_j; the
    subtraction is then deterministic on both engines. Candidate-fed:
    costs O(pairs), never O(n²)."""
    from ipeds_etl_spark.functions import text as TX
    from ipeds_etl_spark.operators import dedup as DD
    from ipeds_etl_spark.queries_ext import _docs, _lsh_doc_pairs

    d = _docs(spark, sf_dir)
    pairs = _lsh_doc_pairs(spark, sf_dir)
    # ONE per-doc frame carrying both the signature and the shingle set
    # — each pair side re-attaches with a single equi-join (the 4-join
    # spelling paid two extra exchanges for the same rows)
    feats = (
        DD.minhash_signatures(d, "text", "doc_id")
        .join(
            d.select("doc_id", TX.tokens(F.col("text")).alias("toks")).select(
                "doc_id",
                F.array_distinct(TX.shingles_of(F.col("toks"), 3)).alias("sh"),
            ),
            "doc_id",
        )
        # NOTE (opt r13): feats is consumed by both pair sides and the
        # plan shows the signature subtree twice, but a localCheckpoint
        # barrier measured NEUTRAL at sf1 (8.4 → 8.6 s) — the frame is
        # wide (signature + shingle arrays), so serializing it costs
        # what the second signature pass saves (round-6 wide-row
        # lesson). Left recomputed on purpose.
    )
    n_match = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda m: m,
        )
    )
    est_j = n_match.cast("double") / F.lit(DD.N_PERMS)
    # |A∪B| = |A| + |B| − |A∩B| (both sides are array_distinct'd), so
    # the per-pair array_union — which materialized and re-deduped a
    # ~600-string array per candidate — is pure overhead: the division
    # operands are the same exact integers either way (opt r13).
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    exact_j = inter.cast("double") / (
        F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    )
    return (
        pairs.join(
            feats.select(
                F.col("doc_id").alias("id_a"),
                F.col("sig").alias("sig_a"),
                F.col("sh").alias("sh_a"),
            ),
            "id_a",
        )
        .join(
            feats.select(
                F.col("doc_id").alias("id_b"),
                F.col("sig").alias("sig_b"),
                F.col("sh").alias("sh_b"),
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            est_j.alias("est_j"),
            exact_j.alias("exact_j"),
            (est_j - exact_j).alias("err"),
        )
        .orderBy("id_a", "id_b")
    )


# ===========================================================================
# Gaps-and-islands: per-customer consecutive-month order streaks
# ===========================================================================
@_register(
    "customer_order_streaks",
    """
    WITH months AS (
      SELECT DISTINCT o_custkey,
             year(o_orderdate) * 12 + month(o_orderdate) - 1 AS m
      FROM orders),
    isl AS (SELECT o_custkey, m,
                   m - row_number() OVER (PARTITION BY o_custkey ORDER BY m) AS grp
            FROM months),
    runs AS (SELECT o_custkey, grp, CAST(count(*) AS BIGINT) AS len
             FROM isl GROUP BY 1, 2)
    SELECT o_custkey AS custkey,
           CAST(SUM(len) AS BIGINT) AS active_months,
           CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(max(len) AS BIGINT) AS longest_streak
    FROM runs GROUP BY 1 ORDER BY 1
    """,
)
def q_customer_order_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive-calendar-month activity runs per
    customer (month_index − row_number is constant within an island —
    the classic Tabibian/SQL-cookbook identity), then per-customer
    streak stats. The dual of ``events_sessionize``: sessionization
    groups by TIME GAP on the raw stream, islands group by CALENDAR
    ADJACENCY on the distinct-period set. One custkey shuffle shared
    by the window and both aggregates; all integer arithmetic."""
    o = load_table(spark, sf_dir, "orders")
    months = o.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias("m"),
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("m")
    isl = months.withColumn("grp", F.col("m") - F.row_number().over(w))
    runs = isl.groupBy("o_custkey", "grp").agg(F.count(F.lit(1)).alias("len"))
    return (
        runs.groupBy("o_custkey")
        .agg(
            F.sum("len").alias("active_months"),
            F.count(F.lit(1)).alias("n_streaks"),
            F.max("len").alias("longest_streak"),
        )
        .select(
            F.col("o_custkey").alias("custkey"),
            "active_months",
            "n_streaks",
            "longest_streak",
        )
        .orderBy("custkey")
    )


# ===========================================================================
# Rolling anomaly detection over daily event-type counts
# ===========================================================================
@_register(
    "events_rolling_anomaly",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2),
    stats AS (
      SELECT event_type, day, cnt,
             count(*) OVER w AS n_prev,
             CAST(SUM(cnt) OVER w AS BIGINT) AS sx,
             CAST(SUM(cnt * cnt) OVER w AS BIGINT) AS sxx
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day, cnt,
           CAST(sx AS DOUBLE) / 7.0 AS mean7,
           CASE WHEN 7 * sxx - sx * sx > 0
                THEN (CAST(cnt AS DOUBLE) - CAST(sx AS DOUBLE) / 7.0)
                     / sqrt(CAST(7 * sxx - sx * sx AS DOUBLE) / 42.0)
           END AS zscore,
           (7 * sxx - sx * sx = 0 AND cnt * 7 <> sx)
             OR (7 * sxx - sx * sx > 0
                 AND abs((CAST(cnt AS DOUBLE) - CAST(sx AS DOUBLE) / 7.0)
                         / sqrt(CAST(7 * sxx - sx * sx AS DOUBLE) / 42.0)) > 2.0)
             AS is_anomaly
    FROM stats WHERE n_prev = 7
    ORDER BY event_type, day
    """,
)
def q_events_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detection: each (event_type, day)'s
    count against the mean/std of the PREVIOUS 7 observed days (ROWS
    frame — observed days, not calendar days; densify upstream with
    ``events_resample_locf`` if calendar frames are wanted). Variance
    comes from exact integer moments (n·Σx² − (Σx)² in BIGINT — the
    ``events_user_trend`` recipe on a window instead of a group), so
    the only floating steps are one division, one IEEE-exact sqrt
    (correctly rounded by both engines), and the z division, in pinned
    order. Zero-variance windows get a NULL z but still flag level
    SHIFTS via the integer compare cnt·7 ≠ Σx. One event_type shuffle;
    window state is 7 rows."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    stats = daily.select(
        "event_type",
        "day",
        "cnt",
        F.count(F.lit(1)).over(w).alias("n_prev"),
        F.sum("cnt").over(w).alias("sx"),
        F.sum(F.col("cnt") * F.col("cnt")).over(w).alias("sxx"),
    ).filter(F.col("n_prev") == 7)
    varnum = 7 * F.col("sxx") - F.col("sx") * F.col("sx")
    mean7 = F.col("sx").cast("double") / F.lit(7.0)
    z = (F.col("cnt").cast("double") - mean7) / F.sqrt(
        varnum.cast("double") / F.lit(42.0)
    )
    return stats.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "cnt",
        mean7.alias("mean7"),
        F.when(varnum > 0, z).alias("zscore"),
        (
            ((varnum == 0) & (F.col("cnt") * 7 != F.col("sx")))
            | ((varnum > 0) & (F.abs(z) > 2.0))
        ).alias("is_anomaly"),
    ).orderBy("event_type", "day")


# ===========================================================================
# Golden record: survivorship merge over dedup clusters
# ===========================================================================
def _golden_record_sql() -> str:
    from ipeds_etl_spark.queries import ORACLE_SQL

    comp = ORACLE_SQL["dedup_components"]
    head, _, _tail = comp.rpartition("SELECT id AS doc_id")
    return (
        head
        + """,
    members AS (
      SELECT d.doc_id, coalesce(c.component_id, d.doc_id) AS cluster_id,
             d.lang, d.n_chars
      FROM documents d LEFT JOIN comps c ON d.doc_id = c.id),
    surv AS (
      SELECT cluster_id, doc_id, n_chars,
             row_number() OVER (PARTITION BY cluster_id
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM members),
    langs AS (
      SELECT cluster_id, lang,
             row_number() OVER (PARTITION BY cluster_id
                                ORDER BY count(*) DESC, lang) AS rn
      FROM members GROUP BY cluster_id, lang),
    sizes AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
              FROM members GROUP BY 1)
    SELECT s.cluster_id, z.cluster_size,
           s.doc_id AS survivor_doc_id, s.n_chars AS survivor_n_chars,
           l.lang AS majority_lang
    FROM surv s
    JOIN langs l ON s.cluster_id = l.cluster_id AND l.rn = 1
    JOIN sizes z ON s.cluster_id = z.cluster_id
    WHERE s.rn = 1 ORDER BY s.cluster_id
    """
    )


@_register("docs_golden_record", None)
def q_docs_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship merge (MDM 'golden record'): for every dedup
    cluster — LSH components plus singletons — pick the canonical
    document by an explicit, total survivorship rule (longest text,
    then smallest doc_id) and the majority language (most frequent,
    then alphabetical — every tie broken, so both engines agree). This
    is the step AFTER ``docs_dedup_resolution``'s keep/drop verdict:
    resolution says which rows survive, survivorship says what the
    surviving record looks like. Shape: the components fixpoint plus
    two cluster-keyed windows and one count aggregate — all on the
    same cluster_id exchange."""
    from ipeds_etl_spark.operators.components import dedup_clusters
    from ipeds_etl_spark.queries_ext import _lsh_doc_pairs

    d = load_table(spark, sf_dir, "documents")
    clusters = dedup_clusters(_lsh_doc_pairs(spark, sf_dir))
    members = (
        d.select("doc_id", "lang", "n_chars")
        .join(clusters.select("id", "component_id"), d.doc_id == F.col("id"), "left")
        .select(
            "doc_id",
            F.coalesce("component_id", "doc_id").alias("cluster_id"),
            "lang",
            "n_chars",
        )
    )
    # Survivorship as TWO map-combinable aggregates, zero windows (the
    # first spelling used three cluster-keyed windows + joins — 11
    # exchanges, 5 SMJs in the audit). min(struct(...)) is associative,
    # so "longest text then smallest id" is min(struct(-n_chars,
    # doc_id)) and rolls up through any partial-agg tree; the majority
    # language folds the same way over per-(cluster, lang) counts
    # (min(struct(-n, lang)) = most frequent, alphabetical tiebreak).
    # hash(cluster_id, lang) → hash(cluster_id): the second exchange is
    # O(clusters × langs) rows, the first is the only corpus-sized one.
    lv1 = members.groupBy("cluster_id", "lang").agg(
        F.count(F.lit(1)).alias("n_lang"),
        F.min(F.struct((-F.col("n_chars")).alias("neg"), F.col("doc_id"))).alias(
            "sv"
        ),
    )
    lv2 = lv1.groupBy("cluster_id").agg(
        F.sum("n_lang").alias("cluster_size"),
        F.min("sv").alias("sv"),
        F.min(F.struct((-F.col("n_lang")).alias("neg"), F.col("lang"))).alias("mj"),
    )
    return lv2.select(
        "cluster_id",
        "cluster_size",
        F.col("sv.doc_id").alias("survivor_doc_id"),
        (-F.col("sv.neg")).alias("survivor_n_chars"),
        F.col("mj.lang").alias("majority_lang"),
    ).orderBy("cluster_id")


from ipeds_etl_spark.queries import ORACLE_SQL as _W5_OSQL  # noqa: E402

_W5_OSQL["docs_golden_record"] = _golden_record_sql()


# ===========================================================================
# Blocking-union recall: LSH vs SNM vs SimHash vs their union
# ===========================================================================
def _blocking_union_oracle() -> str:
    from ipeds_etl_spark.operators import dedup as DD
    from ipeds_etl_spark.queries_ext import (
        _HASH14,
        _SHINGLES,
        _band_key_sql,
        _minhash_sig_sql,
    )

    bands = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, {_band_key_sql(b)} AS band_key FROM sig"
        for b in range(DD.N_PERMS // DD.ROWS_PER_BAND)
    )
    toks = _WS_TOKENS.format(x="text")
    return f"""
    WITH {_minhash_sig_sql()},
    bands AS ({bands}),
    lsh AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
    st AS (SELECT doc_id, substr(lower(text), 1, 20) AS k FROM documents),
    sr AS (SELECT doc_id, k, row_number() OVER (ORDER BY k, doc_id) AS rn FROM st),
    snm AS (SELECT DISTINCT least(a.doc_id, b.doc_id) AS id_a,
                            greatest(a.doc_id, b.doc_id) AS id_b
            FROM sr a JOIN sr b ON b.rn - a.rn BETWEEN 1 AND {_SNM_W}),
    stoks AS (SELECT doc_id, {toks} AS w FROM documents),
    shv AS (SELECT doc_id, list_transform(w, t -> {_HASH14.format(x='t')}) AS h
            FROM stoks WHERE len(w) > 0),
    sfp AS (SELECT doc_id,
             CAST(list_sum(list_transform(range({DD.SIMHASH_BITS}), j ->
               CASE WHEN list_sum(list_transform(h, x ->
                      CASE WHEN (x >> j) & 1 = 1 THEN 1 ELSE -1 END)) > 0
                    THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END))
               AS BIGINT) AS simhash
           FROM shv),
    sblocks AS (
      SELECT doc_id, simhash, t.j AS blk,
             (simhash >> (t.j * {DD.BLOCK_BITS})) & {(1 << DD.BLOCK_BITS) - 1} AS blk_val
      FROM sfp CROSS JOIN (VALUES (0),(1),(2),(3)) AS t(j)),
    simp AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sblocks a JOIN sblocks b
        ON a.blk = b.blk AND a.blk_val = b.blk_val AND a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= {DD.HAMMING_K}),
    rtoks AS (SELECT doc_id, {toks} AS w FROM documents),
    rsh AS (SELECT doc_id, list_distinct({_SHINGLES.format(w='w')}) AS s FROM rtoks),
    gold AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM rsh a JOIN rsh b ON a.doc_id < b.doc_id
      WHERE 2 * len(list_intersect(a.s, b.s))
            >= len(list_distinct(list_concat(a.s, b.s)))),
    hits AS (
      SELECT g.id_a, g.id_b,
             l.id_a IS NOT NULL AS h_lsh,
             s2.id_a IS NOT NULL AS h_snm,
             sp.id_a IS NOT NULL AS h_sim
      FROM gold g
      LEFT JOIN lsh l ON g.id_a = l.id_a AND g.id_b = l.id_b
      LEFT JOIN snm s2 ON g.id_a = s2.id_a AND g.id_b = s2.id_b
      LEFT JOIN simp sp ON g.id_a = sp.id_a AND g.id_b = sp.id_b)
    SELECT CAST(count(*) AS BIGINT) AS n_gold,
           CAST(count(*) FILTER (WHERE h_lsh) AS BIGINT) AS n_lsh,
           CAST(count(*) FILTER (WHERE h_snm) AS BIGINT) AS n_snm,
           CAST(count(*) FILTER (WHERE h_sim) AS BIGINT) AS n_simhash,
           CAST(count(*) FILTER (WHERE h_lsh OR h_snm OR h_sim) AS BIGINT) AS n_union,
           CAST(count(*) FILTER (WHERE h_lsh) AS DOUBLE) / count(*) AS recall_lsh,
           CAST(count(*) FILTER (WHERE h_snm) AS DOUBLE) / count(*) AS recall_snm,
           CAST(count(*) FILTER (WHERE h_sim) AS DOUBLE) / count(*) AS recall_simhash,
           CAST(count(*) FILTER (WHERE h_lsh OR h_snm OR h_sim) AS DOUBLE) / count(*)
             AS recall_union
    FROM hits
    """


@_register("dedup_blocking_union_recall", _blocking_union_oracle())
def q_dedup_blocking_union_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The blocking-completeness audit: recall of EACH candidate
    discipline — MinHash/LSH banding, sorted-neighborhood rank windows,
    SimHash pigeonhole blocks — and of their UNION, against the exact
    Jaccard ≥ 0.5 gold pairs. The three disciplines miss different
    pairs (LSH misses low-J true pairs the s-curve suppresses, SNM
    misses pairs whose first 20 chars diverge, SimHash misses pairs
    beyond Hamming 3), so the union row quantifies how much a
    multi-blocking production pipeline buys — the same multi-modal-
    sweep argument the retrieval family makes, measured and
    oracle-checked. Gold is the O(n²) verifier (oracle scale only, as
    in ``dedup_minhash_recall``); every candidate set is the REAL
    production operator's output, canonicalized (id_a < id_b) and
    deduped before the left joins so hit counts can't multiply."""
    from ipeds_etl_spark.functions import text as TX
    from ipeds_etl_spark.operators import dedup as DD
    from ipeds_etl_spark.operators.layout import global_row_number
    from ipeds_etl_spark.queries_ext import _docs, _lsh_doc_pairs

    d = _docs(spark, sf_dir)
    # gold: O(n²) exact verifier (oracle-scale only)
    sets = d.select("doc_id", TX.tokens(F.col("text")).alias("toks")).select(
        "doc_id", F.array_distinct(TX.shingles_of(F.col("toks"), 3)).alias("sh")
    )
    L, R = sets.alias("l"), sets.alias("r")
    inter = F.size(F.array_intersect(F.col("l.sh"), F.col("r.sh")))
    # |A∪B| = |A|+|B|−|A∩B| on distinct arrays (opt r13)
    union = F.size(F.col("l.sh")) + F.size(F.col("r.sh")) - inter
    gold = (
        L.join(R, F.col("l.doc_id") < F.col("r.doc_id"))
        .filter(2 * inter >= union)
        .select(F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b"))
    )
    lsh = _lsh_doc_pairs(spark, sf_dir).withColumn("h_lsh", F.lit(True))
    ranked = global_row_number(
        d.select("doc_id", F.substring(F.lower(F.col("text")), 1, 20).alias("k")),
        ["k", "doc_id"],
        "rn",
    )
    right = ranked.withColumn(
        "dd", F.explode(F.array(*[F.lit(i) for i in range(1, _SNM_W + 1)]))
    ).withColumn("rn_left", F.col("rn") - F.col("dd"))
    snm = (
        ranked.alias("a")
        .join(right.alias("b"), F.col("a.rn") == F.col("b.rn_left"))
        .select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("id_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("id_b"),
        )
        .distinct()
        .withColumn("h_snm", F.lit(True))
    )
    simp = (
        DD.simhash_near_pairs(d, "text", "doc_id")
        .select("id_a", "id_b")
        .withColumn("h_sim", F.lit(True))
    )
    hits = (
        gold.join(lsh, ["id_a", "id_b"], "left")
        .join(snm, ["id_a", "id_b"], "left")
        .join(simp, ["id_a", "id_b"], "left")
        .select(
            F.coalesce("h_lsh", F.lit(False)).alias("h_lsh"),
            F.coalesce("h_snm", F.lit(False)).alias("h_snm"),
            F.coalesce("h_sim", F.lit(False)).alias("h_sim"),
        )
    )
    c = hits.agg(
        F.count(F.lit(1)).alias("n_gold"),
        F.sum(F.when(F.col("h_lsh"), 1).otherwise(0)).alias("n_lsh"),
        F.sum(F.when(F.col("h_snm"), 1).otherwise(0)).alias("n_snm"),
        F.sum(F.when(F.col("h_sim"), 1).otherwise(0)).alias("n_simhash"),
        F.sum(
            F.when(F.col("h_lsh") | F.col("h_snm") | F.col("h_sim"), 1).otherwise(0)
        ).alias("n_union"),
    )
    return c.select(
        "n_gold",
        "n_lsh",
        "n_snm",
        "n_simhash",
        "n_union",
        (F.col("n_lsh").cast("double") / F.col("n_gold")).alias("recall_lsh"),
        (F.col("n_snm").cast("double") / F.col("n_gold")).alias("recall_snm"),
        (F.col("n_simhash").cast("double") / F.col("n_gold")).alias("recall_simhash"),
        (F.col("n_union").cast("double") / F.col("n_gold")).alias("recall_union"),
    )


# ===========================================================================
# Clustering evaluation: IVF cluster purity against the label column
# ===========================================================================
def _cluster_purity_oracle() -> str:
    from ipeds_etl_spark.queries_ext import _ivf_sql

    return f"""
    WITH {_ivf_sql()},
    pl AS (SELECT a.centroid_id, e.label, CAST(count(*) AS BIGINT) AS n
           FROM assigned a JOIN embeddings e ON a.vec_id = e.vec_id
           GROUP BY 1, 2),
    top AS (SELECT centroid_id, label, n,
                   row_number() OVER (PARTITION BY centroid_id
                                      ORDER BY n DESC, label) AS rn
            FROM pl),
    sz AS (SELECT centroid_id, CAST(SUM(n) AS BIGINT) AS cluster_size
           FROM pl GROUP BY 1)
    SELECT t.centroid_id, s.cluster_size, t.label AS majority_label,
           t.n AS n_majority,
           CAST(t.n AS DOUBLE) / s.cluster_size AS purity
    FROM top t JOIN sz s ON t.centroid_id = s.centroid_id
    WHERE t.rn = 1 ORDER BY t.centroid_id
    """


@_register("emb_cluster_purity", _cluster_purity_oracle())
def q_emb_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering evaluation: per-IVF-cluster PURITY against the
    ground-truth ``label`` column — majority label share per cluster,
    every tie broken (count desc, label asc). Purity is the
    transcendental-free clustering metric (NMI needs logs — engine-
    specific; purity is one exact count ratio), which is why it's the
    one that can be oracle-checked. Reuses the memoized deterministic
    k-means codebook, so assignment is a map-only argmax projection
    (no join); the evaluation is one (cluster, label) count aggregate
    plus a cluster-keyed window. At 100 TB: codebook is a driver
    artifact, evaluation state is O(clusters × labels)."""
    from ipeds_etl_spark.operators import similarity as SIM
    from ipeds_etl_spark.queries_ext import _ivf_codebook

    e = load_table(spark, sf_dir, "embeddings")
    assigned = SIM.assign_centroids(
        e, "vec_id", "embedding", None, cent_rows=_ivf_codebook(spark, sf_dir)
    )
    pl = (
        assigned.select("vec_id", "centroid_id")
        .join(e.select("vec_id", "label"), "vec_id")
        .groupBy("centroid_id", "label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("centroid_id").orderBy(F.desc("n"), F.asc("label"))
    top = pl.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    sz = pl.groupBy("centroid_id").agg(F.sum("n").alias("cluster_size"))
    return (
        top.join(sz, "centroid_id")
        .select(
            "centroid_id",
            "cluster_size",
            F.col("label").alias("majority_label"),
            F.col("n").alias("n_majority"),
            (F.col("n").cast("double") / F.col("cluster_size")).alias("purity"),
        )
        .orderBy("centroid_id")
    )


# ===========================================================================
# Funnel conversion-time quantiles (exact order statistics)
# ===========================================================================
_CONV_QS = [0.25, 0.5, 0.75, 0.9]


def _funnel_time_oracle() -> str:
    sel = "\n    UNION ALL\n    ".join(
        f"SELECT 'view->purchase' AS stage_pair, {q} AS q, "
        f"quantile_disc(conv_micros, {q}) AS conv_micros FROM conv"
        for q in _CONV_QS
    )
    return f"""
    WITH per_user AS (
      SELECT user_id,
             min(ts) FILTER (WHERE event_type = 'view') AS t_view,
             min(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
      FROM events GROUP BY user_id),
    conv AS (
      SELECT epoch_us(t_purchase) - epoch_us(t_view) AS conv_micros
      FROM per_user
      WHERE t_view IS NOT NULL AND t_purchase IS NOT NULL
        AND t_purchase >= t_view)
    {sel}
    """


@_register("events_funnel_time_quantiles", _funnel_time_oracle())
def q_events_funnel_time_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How long conversion takes, not just whether it happens (the
    ``events_funnel`` counts' latency twin): first-view → first-purchase
    duration per converting user in EXACT epoch micros
    (``unix_micros`` ↔ ``epoch_us`` — the integer time parity rule),
    then exact discrete quantiles through the two-pass histogram
    operator (no group buffering, DuckDB ``quantile_disc`` semantics).
    One user shuffle for the stage mins, then the quantile operator's
    two metadata-sized passes."""
    from ipeds_etl_spark.operators.quantile import exact_quantiles

    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    conv = (
        per_user.filter(
            F.col("t_view").isNotNull()
            & F.col("t_purchase").isNotNull()
            & (F.col("t_purchase") >= F.col("t_view"))
        )
        .select(
            F.lit("view->purchase").alias("stage_pair"),
            (F.unix_micros("t_purchase") - F.unix_micros("t_view")).alias(
                "conv_micros"
            ),
        )
        # the quantile operator's two passes (stats, histogram) plus the
        # candidate probe each re-execute their input: materialize the
        # shuffled per-user mins ONCE instead of re-running the events
        # aggregate three times (audit showed 5 events scans without it)
        .localCheckpoint(eager=False)
    )
    return exact_quantiles(conv, "conv_micros", _CONV_QS, ["stage_pair"])


# ===========================================================================
# Top-k per group WITH TIES (rank, not row_number)
# ===========================================================================
@_register(
    "nation_top_customers_ties",
    """
    WITH spend AS (
      SELECT c.c_nationkey AS nationkey, c.c_custkey AS custkey,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS spend
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2),
    ranked AS (
      SELECT nationkey, custkey, spend,
             CAST(rank() OVER (PARTITION BY nationkey
                               ORDER BY spend DESC) AS BIGINT) AS rnk
      FROM spend)
    SELECT nationkey, custkey, CAST(spend AS DOUBLE) AS spend, rnk
    FROM ranked WHERE rnk <= 3
    ORDER BY nationkey, rnk, custkey
    """,
)
def q_nation_top_customers_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation top-3 spenders WITH TIES — ``rank()``, not
    ``row_number()``: equal exact-decimal spends share a rank and ALL
    surface, so the result is a function of the data alone (the
    row_number spelling silently drops tied rows by arbitrary choice
    unless a tiebreak key is added — this is the other standards-
    compliant top-k semantics, SQL's FETCH FIRST ... WITH TIES). Spend
    is summed in DECIMAL(18,6) so ties are exact, not float-accidental.
    One custkey-grouped aggregate, one nation-keyed window."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    spend = (
        c.join(o, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_custkey").alias("custkey"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("spend"))
    )
    w = Window.partitionBy("nationkey").orderBy(F.desc("spend"))
    return (
        spend.withColumn("rnk", F.rank().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("nationkey", "custkey", F.col("spend").cast("double").alias("spend"), "rnk")
        .orderBy("nationkey", "rnk", "custkey")
    )


# ===========================================================================
# Pareto concentration (80/20) via the distributed global prefix sum
# ===========================================================================
@_register(
    "orders_pareto_8020",
    """
    WITH spend AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS spend
      FROM orders GROUP BY 1),
    tot AS (SELECT SUM(spend) AS total FROM spend),
    c AS (SELECT o_custkey, spend,
                 SUM(spend) OVER (ORDER BY spend DESC, o_custkey) AS cum
          FROM spend)
    SELECT CAST(count(*) AS BIGINT) AS total_customers,
           CAST(SUM(CASE WHEN 5 * cum < 4 * total THEN 1 ELSE 0 END) + 1
                AS BIGINT) AS top_customers_for_80pct,
           CAST(SUM(CASE WHEN 5 * cum < 4 * total THEN 1 ELSE 0 END) + 1
                AS DOUBLE) / count(*) AS customer_share,
           CAST(MIN(CASE WHEN 5 * cum >= 4 * total THEN cum END) AS DOUBLE)
             / CAST(MIN(total) AS DOUBLE) AS revenue_share_at_cut
    FROM c CROSS JOIN tot
    """,
)
def q_orders_pareto_8020(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration: how many top customers cover 80% of
    revenue (the Pareto question every usage dashboard asks). The
    cumulative spend over the spend-descending order runs through
    ``operators/layout.py::global_prefix_sum`` — per-range-partition
    running sums + O(partitions) driver offsets — NOT a global
    ``SUM() OVER (ORDER BY ...)`` window (an Exchange SinglePartition,
    the oracle's spelling, semantics-only). Decimal partials make the
    distributed prefix bit-equal to the serial one; the 80% threshold
    is cross-multiplied (5·cum ≥ 4·total) so no division happens until
    the two emitted ratios."""
    from ipeds_etl_spark.operators.layout import global_prefix_sum

    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("spend")
    )
    c = global_prefix_sum(
        spend, [F.desc("spend"), F.asc("o_custkey")], "spend", "cum"
    )
    tot = spend.agg(F.sum("spend").alias("total"))
    below = F.when(5 * F.col("cum") < 4 * F.col("total"), 1).otherwise(0)
    return (
        c.crossJoin(F.broadcast(tot))
        .agg(
            F.count(F.lit(1)).alias("total_customers"),
            (F.sum(below) + 1).alias("top_customers_for_80pct"),
            F.min(
                F.when(5 * F.col("cum") >= 4 * F.col("total"), F.col("cum"))
            ).alias("_cut_cum"),
            F.min("total").alias("_total"),
        )
        .select(
            "total_customers",
            F.col("top_customers_for_80pct").cast("long").alias(
                "top_customers_for_80pct"
            ),
            (
                F.col("top_customers_for_80pct").cast("double")
                / F.col("total_customers")
            ).alias("customer_share"),
            (
                F.col("_cut_cum").cast("double") / F.col("_total").cast("double")
            ).alias("revenue_share_at_cut"),
        )
    )


# ===========================================================================
# Temporal train/test split with user-leakage audit
# ===========================================================================
@_register(
    "events_temporal_split",
    """
    WITH cut AS (SELECT quantile_disc(epoch_us(ts), 0.8) AS cutoff FROM events),
    ev AS (SELECT CAST(count(*) FILTER (WHERE epoch_us(ts) <= cutoff) AS BIGINT) AS n_train,
                  CAST(count(*) FILTER (WHERE epoch_us(ts) > cutoff) AS BIGINT) AS n_test
           FROM events CROSS JOIN cut),
    us AS (SELECT user_id, min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
           FROM events GROUP BY 1),
    ua AS (SELECT CAST(SUM(CASE WHEN mn <= cutoff THEN 1 ELSE 0 END) AS BIGINT) AS train_users,
                  CAST(SUM(CASE WHEN mx > cutoff THEN 1 ELSE 0 END) AS BIGINT) AS test_users,
                  CAST(SUM(CASE WHEN mn <= cutoff AND mx > cutoff THEN 1 ELSE 0 END) AS BIGINT)
                    AS overlap_users
           FROM us CROSS JOIN cut)
    SELECT cut.cutoff AS cutoff_micros, ev.n_train, ev.n_test,
           ua.train_users, ua.test_users, ua.overlap_users,
           CAST(ua.overlap_users AS DOUBLE) / ua.test_users AS user_leakage_rate
    FROM ev CROSS JOIN ua CROSS JOIN cut
    """,
)
def q_events_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based train/test split readout with the contamination
    number attached: cutoff = the exact 0.8 order statistic of event
    time (integer epoch micros, two-pass histogram quantile — no
    buffering, engine-identical), then event counts per side and the
    USER overlap — users active on both sides of the cut are the
    leakage channel a per-event split silently admits (the
    split-by-user-not-by-row rule of eval hygiene, quantified). Shape:
    the quantile's two passes + one user-keyed agg + a broadcast 1-row
    cutoff; everything else is conditional counting. The (t, user_id)
    projection is deliberately NOT materialized (VERDICT r6 item 4,
    remeasured this round): the consumers re-scan the parquet, but the
    scan is column-pruned to 2 of 6 columns and vectorized — a
    same-process 5-run A/B at sf1 put plain recompute at 1.24 s vs
    2.55 s for localCheckpoint(eager=False) and 5.49 s for .cache()
    (the round-5 "17 scans" count was plan nodes, not cost; the
    materialization write+reread tax exceeds 4 pruned scans). At
    100 TB the same holds: k pruned column scans stream at full IO
    parallelism, while a checkpoint writes the projection once and
    rereads it k times — strictly more bytes moved."""
    from ipeds_etl_spark.operators.quantile import exact_quantiles

    e = load_table(spark, sf_dir, "events")
    base = e.select(F.unix_micros("ts").alias("t"), "user_id")
    ev = base.select("t")
    cut = exact_quantiles(
        ev.withColumn("s", F.lit("all")), "t", [0.8], ["s"]
    ).select(F.col("t").alias("cutoff"))
    evc = ev.crossJoin(F.broadcast(cut)).agg(
        F.sum(F.when(F.col("t") <= F.col("cutoff"), 1).otherwise(0))
        .cast("long")
        .alias("n_train"),
        F.sum(F.when(F.col("t") > F.col("cutoff"), 1).otherwise(0))
        .cast("long")
        .alias("n_test"),
    )
    us = (
        base.groupBy("user_id")
        .agg(
            F.min("t").alias("mn"),
            F.max("t").alias("mx"),
        )
        .crossJoin(F.broadcast(cut))
        .agg(
            F.sum(F.when(F.col("mn") <= F.col("cutoff"), 1).otherwise(0))
            .cast("long")
            .alias("train_users"),
            F.sum(F.when(F.col("mx") > F.col("cutoff"), 1).otherwise(0))
            .cast("long")
            .alias("test_users"),
            F.sum(
                F.when(
                    (F.col("mn") <= F.col("cutoff"))
                    & (F.col("mx") > F.col("cutoff")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("overlap_users"),
        )
    )
    return (
        evc.crossJoin(us)
        .crossJoin(F.broadcast(cut))
        .select(
            F.col("cutoff").alias("cutoff_micros"),
            "n_train",
            "n_test",
            "train_users",
            "test_users",
            "overlap_users",
            (
                F.col("overlap_users").cast("double") / F.col("test_users")
            ).alias("user_leakage_rate"),
        )
    )


# ===========================================================================
# Equi-depth histogram from exact decile cut points
# ===========================================================================
_EQD_QS = [round(0.1 * i, 1) for i in range(1, 10)]


def _equidepth_oracle() -> str:
    cuts = ", ".join(
        f"quantile_disc(l_extendedprice, {q}) AS c{i}"
        for i, q in enumerate(_EQD_QS, 1)
    )
    bucket = " + ".join(
        f"CASE WHEN l_extendedprice > c{i} THEN 1 ELSE 0 END"
        for i in range(1, len(_EQD_QS) + 1)
    )
    return f"""
    WITH cuts AS (SELECT {cuts} FROM lineitem)
    SELECT CAST(1 + {bucket} AS INTEGER) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           min(l_extendedprice) AS lo,
           max(l_extendedprice) AS hi
    FROM lineitem CROSS JOIN cuts
    GROUP BY 1 ORDER BY 1
    """


@_register("lineitem_price_equidepth", _equidepth_oracle())
def q_lineitem_price_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-frequency) histogram — the complement of
    ``events_value_histogram``'s equal-WIDTH bins: bucket bounds are
    the exact price deciles (two-pass histogram quantile operator, no
    buffering), broadcast back as a 1-row frame, and each row's bucket
    is a map-side CASE count of exceeded cut points (the RFM cut-point
    recipe generalized to 9 cuts). Ties land in the lowest qualifying
    bucket on both engines (strict >), so bucket populations are a
    pure function of the data — near-equal depths with skewed
    duplicates absorbed deterministically. One scan + the quantile
    passes; final shuffle is O(10 buckets)."""
    from ipeds_etl_spark.operators.quantile import exact_quantiles

    li = load_table(spark, sf_dir, "lineitem")
    qrows = exact_quantiles(
        li.withColumn("s", F.lit("all")), "l_extendedprice", _EQD_QS, ["s"]
    )
    cuts = qrows.groupBy().agg(
        *[
            F.max(
                F.when(F.col("q") == F.lit(q), F.col("l_extendedprice"))
            ).alias(f"c{i}")
            for i, q in enumerate(_EQD_QS, 1)
        ]
    )
    bucket = F.lit(1)
    for i in range(1, len(_EQD_QS) + 1):
        bucket = bucket + F.when(
            F.col("l_extendedprice") > F.col(f"c{i}"), 1
        ).otherwise(0)
    return (
        li.select("l_extendedprice")
        .crossJoin(F.broadcast(cuts))
        .groupBy(bucket.cast("int").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
        .orderBy("bucket")
    )


# ===========================================================================
# Markov stationary distribution over event types (integer-scaled)
# ===========================================================================
_MK_SCALE = 1_000_000_000_000
_MK_ITERS = 3


def _markov_oracle() -> str:
    out = f"""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events),
    m AS (SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS n
          FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2),
    deg AS (SELECT prev_type, CAST(SUM(n) AS BIGINT) AS d FROM m GROUP BY 1),
    nt AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS k FROM events),
    p0 AS (SELECT DISTINCT event_type, CAST({_MK_SCALE} // k AS BIGINT) AS pi
           FROM events CROSS JOIN nt)"""
    for i in range(1, _MK_ITERS + 1):
        out += f""",
    p{i} AS (
      SELECT m.next_type AS event_type,
             CAST(SUM((p.pi * m.n) // deg.d) AS BIGINT) AS pi
      FROM m
      JOIN p{i - 1} p ON p.event_type = m.prev_type
      JOIN deg ON deg.prev_type = m.prev_type
      GROUP BY 1)"""
    return (
        out
        + f"""
    SELECT event_type, pi AS pi_pico FROM p{_MK_ITERS} ORDER BY event_type
    """
    )


@_register("events_markov_stationary", _markov_oracle())
def q_events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the event-type Markov chain
    (``events_type_transitions``' matrix taken to its fixed point):
    three power iterations from the uniform vector, in SCALED
    BIGINT with floor division — the PageRank integer recipe applied
    to a row-stochastic chain, so partial-agg order cannot move a bit
    and the oracle replays exact values. Answers 'where does user
    attention settle' — the long-run type mix a simulator or traffic
    model needs. The chain state is O(types²) rows after one user
    shuffle; each iteration is a join + map-combinable sum over that
    tiny frame (types, not users — this is the cheap dual of PageRank's
    node-sized state)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    # The O(types²) transition matrix is consumed by every iteration
    # AND by deg — unmaterialized, the events window+agg subtree re-ran
    # once per power iteration (8 events scans in the plan; opt r13,
    # guide §2.4/§5). Same for the distinct-type frame, which seeds p0
    # and carries the k count (F.count over it skips NULLs exactly like
    # the old countDistinct and the oracle's count(DISTINCT)).
    m = (
        seq.groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    deg = m.groupBy("prev_type").agg(F.sum("n").alias("d"))
    types = e.select("event_type").distinct().localCheckpoint(eager=False)
    nt = types.agg(F.count("event_type").alias("k"))
    p = (
        types
        .crossJoin(F.broadcast(nt))
        .select("event_type", F.expr(f"CAST({_MK_SCALE} div k AS BIGINT)").alias("pi"))
    )
    for _ in range(_MK_ITERS):
        p = (
            m.join(p, p.event_type == m.prev_type)
            .join(F.broadcast(deg), "prev_type")
            .select(
                F.col("next_type").alias("et"),
                F.expr("(pi * n) div d").alias("c"),
            )
            .groupBy(F.col("et").alias("event_type"))
            .agg(F.sum("c").cast("long").alias("pi"))
        )
    return p.select("event_type", F.col("pi").alias("pi_pico")).orderBy("event_type")


# ===========================================================================
# Token-budget apportionment (largest-remainder / Hamilton method)
# ===========================================================================
_ALLOC_BUDGET = 100_000


@_register(
    "docs_token_budget_allocation",
    f"""
    WITH toks AS (
      SELECT source,
             CAST(SUM(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                      t -> len(t) > 0))) AS BIGINT) AS tok
      FROM documents GROUP BY 1),
    tot AS (SELECT CAST(SUM(tok) AS BIGINT) AS t FROM toks),
    q AS (SELECT source, tok,
                 CAST(({_ALLOC_BUDGET} * tok) // t AS BIGINT) AS quota_floor,
                 CAST(({_ALLOC_BUDGET} * tok) % t AS BIGINT) AS remainder
          FROM toks CROSS JOIN tot),
    l AS (SELECT CAST({_ALLOC_BUDGET} - SUM(quota_floor) AS BIGINT) AS leftover FROM q),
    r AS (SELECT q.*, l.leftover,
                 row_number() OVER (ORDER BY remainder DESC, source) AS rk
          FROM q CROSS JOIN l)
    SELECT source, tok AS tokens, quota_floor, remainder,
           CAST(quota_floor + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS allocated
    FROM r ORDER BY source
    """,
)
def q_docs_token_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of a fixed token
    budget across sources — the integer-exact step after
    ``docs_mixture_weights``' proportions: floor quotas from the exact
    integer division, then the leftover seats go to the largest
    remainders (ties to the alphabetically first source), so
    Σ allocated == budget EXACTLY (pinned by test) with no float
    anywhere. This is how a data recipe turns 'p_s ∝ share' into an
    actual per-source document/token quota. Shape: one token-count
    agg, a 1-row total and leftover broadcast back, and a rank window
    over O(sources) rows (metadata-sized, like the bucket-offset
    windows elsewhere)."""
    from ipeds_etl_spark.functions import text as TX

    d = load_table(spark, sf_dir, "documents")
    # one corpus scan: total/quotas/leftover all consume this agg
    # no materialization (VERDICT r6 item 4, remeasured): the three
    # consumers of this O(sources) aggregate are served by Spark's
    # ReusedExchange — the corpus is scanned once either way, and the
    # sf1 same-process A/B put plain recompute at 0.63 s vs 0.90 s
    # (localCheckpoint) / 0.91 s (.cache())
    toks = d.groupBy("source").agg(
        F.sum(TX.token_count(F.col("text")).cast("long")).alias("tok")
    )
    tot = toks.agg(F.sum("tok").cast("long").alias("t"))
    q = toks.crossJoin(F.broadcast(tot)).select(
        "source",
        "tok",
        F.expr(f"CAST(({_ALLOC_BUDGET} * tok) div t AS BIGINT)").alias("quota_floor"),
        F.expr(f"CAST(({_ALLOC_BUDGET} * tok) % t AS BIGINT)").alias("remainder"),
    )
    leftover = q.agg(
        (F.lit(_ALLOC_BUDGET) - F.sum("quota_floor")).cast("long").alias("leftover")
    )
    w = Window.orderBy(F.desc("remainder"), F.asc("source"))
    return (
        q.crossJoin(F.broadcast(leftover))
        .withColumn("rk", F.row_number().over(w))
        .select(
            "source",
            F.col("tok").alias("tokens"),
            "quota_floor",
            "remainder",
            (
                F.col("quota_floor")
                + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
            )
            .cast("long")
            .alias("allocated"),
        )
        .orderBy("source")
    )


# ===========================================================================
# Winsorized robust statistics (clip at exact p01/p99)
# ===========================================================================
@_register(
    "orders_winsorized_stats",
    """
    WITH cuts AS (
      SELECT quantile_disc(o_totalprice, 0.01) AS lo,
             quantile_disc(o_totalprice, 0.99) AS hi
      FROM orders),
    w AS (
      SELECT CASE WHEN o_totalprice < lo THEN lo
                  WHEN o_totalprice > hi THEN hi
                  ELSE o_totalprice END AS v,
             CASE WHEN o_totalprice < lo OR o_totalprice > hi
                  THEN 1 ELSE 0 END AS clipped
      FROM orders CROSS JOIN cuts)
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(clipped) AS BIGINT) AS n_clipped,
           min(v) AS lo, max(v) AS hi,
           CAST(CAST(SUM(CAST(floor(v * 100.0) AS DECIMAL(38,0))) AS DOUBLE)
                / 100.0 / count(*) AS DOUBLE) AS winsorized_mean
    FROM w
    """,
)
def q_orders_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization — the robust-stats cleaning step between clipping
    and dropping: values outside the exact [p01, p99] order statistics
    are pulled TO the fence (not removed), then the mean is computed
    from exact cent-quantized decimal sums (the scale-0 micro-unit
    recipe; o_totalprice has 2 decimal digits so ×100 is lossless).
    Cut points come from the two-pass histogram quantile operator and
    broadcast as one row; clipping is a map-side CASE; the final
    aggregate is one combine-friendly pass. Mirrors what a feature
    pipeline does before z-scoring heavy-tailed monetary columns."""
    from ipeds_etl_spark.operators.quantile import exact_quantiles

    o = load_table(spark, sf_dir, "orders")
    qrows = exact_quantiles(
        o.withColumn("s", F.lit("all")), "o_totalprice", [0.01, 0.99], ["s"]
    )
    cuts = qrows.groupBy().agg(
        F.max(F.when(F.col("q") == 0.01, F.col("o_totalprice"))).alias("clo"),
        F.max(F.when(F.col("q") == 0.99, F.col("o_totalprice"))).alias("chi"),
    )
    v = (
        F.when(F.col("o_totalprice") < F.col("clo"), F.col("clo"))
        .when(F.col("o_totalprice") > F.col("chi"), F.col("chi"))
        .otherwise(F.col("o_totalprice"))
    )
    clipped = F.when(
        (F.col("o_totalprice") < F.col("clo"))
        | (F.col("o_totalprice") > F.col("chi")),
        1,
    ).otherwise(0)
    w = o.select("o_totalprice").crossJoin(F.broadcast(cuts)).select(
        v.alias("v"), clipped.alias("clipped")
    )
    return w.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("clipped").cast("long").alias("n_clipped"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        (
            F.sum(F.floor(F.col("v") * 100.0).cast("decimal(38,0)")).cast("double")
            / F.lit(100.0)
            / F.count(F.lit(1))
        ).alias("winsorized_mean"),
    )


# ===========================================================================
# Weighted median via the distributed global prefix sum
# ===========================================================================
@_register(
    "lineitem_weighted_median_price",
    """
    WITH w AS (
      SELECT l_extendedprice AS v, CAST(l_quantity AS BIGINT) AS wt
      FROM lineitem),
    tot AS (SELECT CAST(SUM(wt) AS BIGINT) AS total_w FROM w),
    c AS (SELECT v, wt, SUM(wt) OVER (ORDER BY v, wt) AS cum FROM w)
    SELECT min(CASE WHEN 2 * cum >= total_w THEN v END) AS weighted_median,
           CAST(MIN(total_w) AS BIGINT) AS total_weight
    FROM c CROSS JOIN tot
    """,
)
def q_lineitem_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price: the first value (in price order)
    whose cumulative weight reaches half the total — lower weighted
    median, integer weights so the threshold compare is the exact
    2·cum ≥ W cross-multiplication. The cumulative weight runs through
    ``global_prefix_sum`` (range exchange + O(partitions) offsets);
    the single-task ORDER BY window exists only in the oracle.
    Determinism note: (v, wt) is NOT unique across duplicate
    lineitems, so PER-ROW cumulative weights are tie-order-dependent
    (and the oracle's default RANGE frame assigns them differently
    than Spark's ROWS frame). Only the CROSSING VALUE is a total
    function of the data: within a tie group all rows share v, so
    whichever permutation the engines pick, the first row with
    2·cum ≥ W carries the same v. Do not rely on per-row prefix
    parity here; use a unique tiebreak (e.g. a row id) if you need
    it."""
    from ipeds_etl_spark.operators.layout import global_prefix_sum

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").cast("long").alias("wt"),
    )
    c = global_prefix_sum(li, [F.asc("v"), F.asc("wt")], "wt", "cum")
    tot = li.agg(F.sum("wt").cast("long").alias("total_w"))
    return (
        c.crossJoin(F.broadcast(tot))
        .agg(
            F.min(
                F.when(2 * F.col("cum") >= F.col("total_w"), F.col("v"))
            ).alias("weighted_median"),
            F.min("total_w").cast("long").alias("total_weight"),
        )
    )


# ===========================================================================
# Butterfly (4-cycle) counting on the order-part bipartite graph
# ===========================================================================
@_register(
    "parts_copurchase_butterflies",
    """
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2,
             CAST(count(*) AS BIGINT) AS n_co
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2)
    SELECT CAST(SUM((n_co * (n_co - 1)) // 2) AS BIGINT) AS n_butterflies,
           CAST(count(*) AS BIGINT) AS n_copurchase_pairs,
           CAST(SUM(CASE WHEN n_co >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS pairs_with_reinforcement
    FROM pairs
    """,
)
def q_parts_copurchase_butterflies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Butterfly (2×2 biclique / 4-cycle) count of the order-part
    bipartite graph — THE cohesion measure for bipartite networks
    (Wang et al., 'Butterfly counting in bipartite networks', and the
    motif behind bipartite clustering coefficients): a butterfly is
    two parts co-purchased by the same TWO orders, i.e. a reinforced
    co-purchase. Counted without enumerating 4-cycles: butterflies =
    Σ over co-purchase pairs of C(n_co, 2) — the pair-count table the
    basket family already materializes (memoized `_basket_items` +
    rank-capped in-bucket expansion) plus one integer aggregate.
    n_co·(n_co−1)/2 is exact BIGINT (even product halved)."""
    from ipeds_etl_spark.operators import dedup as DD
    from ipeds_etl_spark.queries_ext import _basket_items

    items = _basket_items(spark, sf_dir)
    pairs = (
        DD.pairs_within_buckets(
            items,
            ["l_orderkey"],
            F.struct(F.col("l_partkey").alias("id")),
            cap_mode="agg",
        )
        .select(F.col("a.id").alias("p1"), F.col("b.id").alias("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_co"))
    )
    return pairs.agg(
        F.sum(F.expr("(n_co * (n_co - 1)) div 2"))
        .cast("long")
        .alias("n_butterflies"),
        F.count(F.lit(1)).alias("n_copurchase_pairs"),
        F.sum(F.when(F.col("n_co") >= 2, 1).otherwise(0))
        .cast("long")
        .alias("pairs_with_reinforcement"),
    )


# ===========================================================================
# Corpus composition drift: source × language chi-square contributions
# ===========================================================================
@_register(
    "docs_source_lang_drift",
    """
    WITH obs AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS o
                 FROM documents GROUP BY 1, 2),
    rt AS (SELECT source, CAST(SUM(o) AS BIGINT) AS rt FROM obs GROUP BY 1),
    ct AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS ct FROM obs GROUP BY 1),
    n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs)
    SELECT obs.source, obs.lang, obs.o AS observed,
           CAST(rt.rt * ct.ct AS DOUBLE) / n.n AS expected,
           CAST(CAST(obs.o * n.n - rt.rt * ct.ct AS DECIMAL(19,0))
                * CAST(obs.o * n.n - rt.rt * ct.ct AS DECIMAL(19,0)) AS DOUBLE)
             / (CAST(n.n AS DOUBLE) * rt.rt * ct.ct) AS chi2_contrib
    FROM obs JOIN rt USING (source) JOIN ct USING (lang) CROSS JOIN n
    ORDER BY obs.source, obs.lang
    """,
)
def q_docs_source_lang_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source × language contingency audit: observed counts, expected
    counts under independence, and per-cell chi-square contributions —
    the composition-drift alarm a training-data pipeline runs per crawl
    (a cell whose contribution spikes means a source changed its
    language mix). Exactness recipe: the numerator (o·N − rt·ct)² is
    computed in integer/decimal arithmetic (DECIMAL(19,0)² → (38,0),
    exact), ONE IEEE division per cell, multiplication order pinned
    identically in both engines. The total χ² is deliberately NOT
    emitted: it would sum doubles in engine-dependent order — consumers
    sum the cells in whatever order they define. Shape: one count
    aggregate + two broadcast margins + a 1-row broadcast total."""
    d = load_table(spark, sf_dir, "documents")
    obs = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("o"))
    rt = obs.groupBy("source").agg(F.sum("o").alias("rt"))
    ct = obs.groupBy("lang").agg(F.sum("o").alias("ct"))
    n = obs.agg(F.sum("o").alias("n"))
    diff = (F.col("o") * F.col("n") - F.col("rt") * F.col("ct")).cast("decimal(19,0)")
    return (
        obs.join(F.broadcast(rt), "source")
        .join(F.broadcast(ct), "lang")
        .crossJoin(F.broadcast(n))
        .select(
            "source",
            "lang",
            F.col("o").alias("observed"),
            ((F.col("rt") * F.col("ct")).cast("double") / F.col("n")).alias("expected"),
            (
                (diff * diff).cast("double")
                / (F.col("n").cast("double") * F.col("rt") * F.col("ct"))
            ).alias("chi2_contrib"),
        )
        .orderBy("source", "lang")
    )
