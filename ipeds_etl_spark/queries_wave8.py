"""Round-6 final wave: community structure, change detection, and
measurement hygiene for the curation pipeline — synchronous label
propagation (LPA) over the near-dup graph, CUSUM changepoint detection
on event volumes, inter-rater agreement (Cohen's kappa) between two
deterministic quality raters, plus the statistical tooling registered
in later batches of this module.

House rules as everywhere: integer/decimal-exact numerators with one
IEEE operation per output cell, bit-length in place of log2 (the libm
ban), ``div`` ↔ ``//`` scaled fixed point, windows only over
metadata-sized or per-entity-bounded frames, iteration only with a
fixed round count and per-round ``localCheckpoint``.

The reference (kebe3476/ipeds_etl) ships none of these; they extend
its surface under the same oracle-twin discipline (COVERAGE.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ipeds_etl_spark.functions import text as TX
from ipeds_etl_spark.operators import dedup as DD
from ipeds_etl_spark.queries import _register
from ipeds_etl_spark.queries_ext import (
    _band_key_sql,
    _docs,
    _lsh_doc_pairs,
    _minhash_sig_sql,
    _STOP_PAT,
    _WS_TOKENS,
)
from ipeds_etl_spark.sources.tables import load_table

#: synchronous LPA rounds — fixed, like every iterative operator here
#: (components' star rounds, k-core's peels, PageRank's power steps):
#: a data-dependent convergence loop cannot be oracle-replayed and has
#: unbounded cost at scale; a fixed-round contract has neither problem.
_LPA_ROUNDS = 2


def _lpa_oracle() -> str:
    bands = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, {_band_key_sql(b)} AS band_key FROM sig"
        for b in range(DD.N_PERMS // DD.ROWS_PER_BAND)
    )
    parts = [
        _minhash_sig_sql(),
        f"bands AS ({bands})",
        """pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id)""",
        """edges AS (SELECT id_a AS s, id_b AS d FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs)""",
        "lab0 AS (SELECT DISTINCT s AS id, s AS lab FROM edges)",
    ]
    for r in range(_LPA_ROUNDS):
        parts.append(
            f"""n{r + 1} AS (
      SELECT e.s, l.lab, CAST(count(*) AS BIGINT) AS c
      FROM edges e JOIN lab{r} l ON e.d = l.id
      GROUP BY e.s, l.lab)"""
        )
        parts.append(
            f"""lab{r + 1} AS (
      SELECT s AS id, lab FROM (
        SELECT s, lab,
               row_number() OVER (PARTITION BY s ORDER BY c DESC, lab ASC) AS rn
        FROM n{r + 1})
      WHERE rn = 1)"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT lab AS community_id, CAST(count(*) AS BIGINT) AS n_members
    FROM lab{_LPA_ROUNDS}
    GROUP BY lab
    ORDER BY n_members DESC, community_id"""
    )


@_register("dedup_lpa_communities", _lpa_oracle())
def q_dedup_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection over the near-dup graph via SYNCHRONOUS
    label propagation (Raghavan et al. 2007, the deterministic
    synchronous variant): every node starts labeled with its own id;
    each round every node adopts the MOST FREQUENT label among its
    neighbors, ties to the smallest label. Two fixed rounds, then
    community sizes. Unlike connected components (`dedup_components`,
    min-label fixpoint), LPA respects edge DENSITY: a chain of
    borderline LSH collisions does not pull two dense duplicate
    clusters into one community, which is exactly the failure mode of
    transitive-closure dedup on boilerplate-heavy corpora.

    Scale: edges come from the memoized banded-LSH pair table (never
    O(n²)). Each round is (1) one join of the O(E) edge list against
    the O(V) label table on the destination key, (2) one
    map-combinable (node, label) count, (3) one per-node argmax via a
    single ``max(struct(count, -label))`` aggregate — no window, no
    SinglePartition. Labels are ``localCheckpoint``-ed per round so
    lineage stays O(1) (the components/PageRank contract). The oracle
    unrolls the same two rounds as CTEs with a row_number argmax."""
    pairs = _lsh_doc_pairs(spark, sf_dir)
    edges = (
        pairs.selectExpr("id_a AS s", "id_b AS d")
        .unionAll(pairs.selectExpr("id_b AS s", "id_a AS d"))
        .localCheckpoint(eager=False)
    )
    cur = edges.select(F.col("s").alias("id")).distinct().withColumn(
        "lab", F.col("id")
    )
    for _r in range(_LPA_ROUNDS):
        nb = edges.join(
            cur.select(F.col("id").alias("d"), "lab"), "d"
        ).groupBy("s", "lab").agg(F.count(F.lit(1)).alias("c"))
        cur = (
            nb.groupBy("s")
            .agg(
                F.max(
                    F.struct(F.col("c").alias("c"), (-F.col("lab")).alias("nl"))
                ).alias("m")
            )
            .select(F.col("s").alias("id"), (-F.col("m.nl")).alias("lab"))
            .localCheckpoint(eager=False)
        )
    return (
        cur.groupBy(F.col("lab").alias("community_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_members"))
        .orderBy(F.desc("n_members"), "community_id")
    )


# ===========================================================================
# CUSUM changepoint detection on daily event volumes
# ===========================================================================
@_register(
    "events_cusum_changepoint",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY event_type, CAST(ts AS DATE)),
    tot AS (
      SELECT event_type, CAST(SUM(c) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS nd
      FROM daily GROUP BY event_type),
    cu AS (
      SELECT daily.event_type, d, nd,
             CAST(SUM(c * nd - total) OVER (
               PARTITION BY daily.event_type ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cusum
      FROM daily JOIN tot USING (event_type)),
    pick AS (
      SELECT event_type, d AS cp_date, abs(cusum) AS peak_abs_cusum,
             nd AS n_days
      FROM (SELECT *, row_number() OVER (
              PARTITION BY event_type ORDER BY abs(cusum) DESC, d ASC) AS rn
            FROM cu)
      WHERE rn = 1),
    seg AS (
      SELECT daily.event_type, cp_date, peak_abs_cusum, n_days,
             CASE WHEN d <= cp_date THEN c END AS cb,
             CASE WHEN d > cp_date THEN c END AS ca
      FROM daily JOIN pick USING (event_type))
    SELECT event_type, strftime(cp_date, '%Y-%m-%d') AS cp_date,
           CAST(peak_abs_cusum AS BIGINT) AS peak_abs_cusum,
           n_days,
           CAST((1000 * SUM(cb)) // count(cb) AS BIGINT) AS mean_before_x1000,
           CASE WHEN count(ca) = 0 THEN NULL
                ELSE CAST((1000 * SUM(ca)) // count(ca) AS BIGINT)
           END AS mean_after_x1000
    FROM seg
    GROUP BY event_type, strftime(cp_date, '%Y-%m-%d'), peak_abs_cusum, n_days
    ORDER BY event_type
    """,
)
def q_events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint per event type: the day t maximizing
    |Σ_{i≤t} (c_i − mean)| over the daily count series — the classic
    cumulative-deviation statistic (Page 1954), kept INTEGER by
    cross-multiplying the mean away: Σ (c_i·n_days − total) is the
    CUSUM scaled by n_days, and scaling doesn't move the argmax. Ties
    break to the earliest day. Readout: the changepoint date, the
    scaled peak, and mean daily volume before/after (×1000, truncating
    div) — the drift detector a crawl-volume monitor runs per source.

    Scale: daily rollup is one map-combinable agg to O(types × days)
    rows; the running sum windows per type over that METADATA-SIZED
    frame (a type's day count, not its event count); the argmax is a
    ``max(struct)`` agg; the before/after means are one more pass over
    the daily frame joined against the O(types) picks (broadcast)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = daily.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("nd"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cu = daily.join(F.broadcast(tot), "event_type").withColumn(
        "cusum", F.sum(F.col("c") * F.col("nd") - F.col("total")).over(w)
    )
    pick = (
        cu.groupBy("event_type")
        .agg(
            F.max(
                F.struct(
                    F.abs(F.col("cusum")).alias("a"),
                    (-F.unix_date(F.col("d"))).alias("nud"),
                )
            ).alias("m"),
            F.first("nd").alias("n_days"),
        )
        .select(
            "event_type",
            F.date_from_unix_date(-F.col("m.nud")).alias("cp_date"),
            F.col("m.a").alias("peak_abs_cusum"),
            "n_days",
        )
    )
    # date keys compare as 'yyyy-MM-dd' strings on both engines (the
    # strftime/date_format output idiom used across the registry)
    seg = daily.join(F.broadcast(pick), "event_type")
    return (
        seg.groupBy("event_type", "cp_date", "peak_abs_cusum", "n_days")
        .agg(
            F.expr(
                "CAST((1000 * sum(CASE WHEN d <= cp_date THEN c END))"
                " div count(CASE WHEN d <= cp_date THEN 1 END) AS BIGINT)"
            ).alias("mean_before_x1000"),
            F.expr(
                "CASE WHEN count(CASE WHEN d > cp_date THEN 1 END) = 0 THEN NULL"
                " ELSE CAST((1000 * sum(CASE WHEN d > cp_date THEN c END))"
                " div count(CASE WHEN d > cp_date THEN 1 END) AS BIGINT) END"
            ).alias("mean_after_x1000"),
        )
        .withColumn("cp_date", F.date_format("cp_date", "yyyy-MM-dd"))
        .orderBy("event_type")
    )


# ===========================================================================
# Inter-rater agreement: Cohen's kappa between two deterministic raters
# ===========================================================================
@_register(
    "docs_rater_agreement_kappa",
    f"""
    WITH t AS (
      SELECT {_WS_TOKENS.format(x='text')} AS w,
             CAST(len(regexp_extract_all(text, '{_STOP_PAT}')) AS BIGINT) AS sw
      FROM documents),
    r AS (
      SELECT (2 * len(list_distinct(w)) >= len(w)) AS ra,
             (10 * sw >= len(w)) AS rb
      FROM t),
    ct AS (
      SELECT
        CAST(SUM(CASE WHEN ra AND rb THEN 1 ELSE 0 END) AS BIGINT) AS yes_yes,
        CAST(SUM(CASE WHEN ra AND NOT rb THEN 1 ELSE 0 END) AS BIGINT) AS yes_no,
        CAST(SUM(CASE WHEN NOT ra AND rb THEN 1 ELSE 0 END) AS BIGINT) AS no_yes,
        CAST(SUM(CASE WHEN NOT ra AND NOT rb THEN 1 ELSE 0 END) AS BIGINT) AS no_no
      FROM r),
    k AS (
      SELECT yes_yes, yes_no, no_yes, no_no,
             yes_yes + yes_no + no_yes + no_no AS n,
             (yes_yes + yes_no) * (yes_yes + no_yes)
               + (no_yes + no_no) * (yes_no + no_no) AS e
      FROM ct)
    SELECT yes_yes, yes_no, no_yes, no_no,
           CAST((1000 * (yes_yes + no_no)) // n AS BIGINT) AS po_x1000,
           CAST(n * (yes_yes + no_no) - e AS DOUBLE) / (n * n - e) AS kappa
    FROM k
    """,
)
def q_docs_rater_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two deterministic document-quality raters
    — rater A flags lexical diversity (2·distinct_tokens ≥ tokens),
    rater B flags natural-language stopword density (10·stopwords ≥
    tokens); both are integer cross-multiplied predicates, no ratio
    float ever formed. Kappa comes out of the 2×2 contingency in the
    single-division form κ = (n·agree − Σ marginal products) /
    (n² − Σ marginal products): numerator and denominator are exact
    BIGINTs, ONE IEEE division total — the agreement number a labeling
    pipeline reports before trusting silver labels. Observed agreement
    also reported in exact permille.

    Scale: pure map (two codegen predicates per doc) into one 4-cell
    global aggregate — nothing shuffles but four partial counters."""
    d = _docs(spark, sf_dir)
    toks = TX.tokens(F.col("text"))
    r = d.select(
        (2 * F.size(F.array_distinct(toks)) >= F.size(toks)).alias("ra"),
        (10 * TX.stopword_count(F.col("text")) >= F.size(toks)).alias("rb"),
    )
    ct = r.agg(
        F.sum(F.when(F.col("ra") & F.col("rb"), 1).otherwise(0))
        .cast("long")
        .alias("yes_yes"),
        F.sum(F.when(F.col("ra") & ~F.col("rb"), 1).otherwise(0))
        .cast("long")
        .alias("yes_no"),
        F.sum(F.when(~F.col("ra") & F.col("rb"), 1).otherwise(0))
        .cast("long")
        .alias("no_yes"),
        F.sum(F.when(~F.col("ra") & ~F.col("rb"), 1).otherwise(0))
        .cast("long")
        .alias("no_no"),
    )
    n = F.col("yes_yes") + F.col("yes_no") + F.col("no_yes") + F.col("no_no")
    e = (F.col("yes_yes") + F.col("yes_no")) * (
        F.col("yes_yes") + F.col("no_yes")
    ) + (F.col("no_yes") + F.col("no_no")) * (F.col("yes_no") + F.col("no_no"))
    agree = F.col("yes_yes") + F.col("no_no")
    return ct.select(
        "yes_yes",
        "yes_no",
        "no_yes",
        "no_no",
        F.expr(
            "CAST((1000 * (yes_yes + no_no)) div"
            " (yes_yes + yes_no + no_yes + no_no) AS BIGINT)"
        ).alias("po_x1000"),
        ((n * agree - e).cast("double") / (n * n - e)).alias("kappa"),
    )
