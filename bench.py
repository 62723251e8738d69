#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full computation,
no collect/serialization cost). The session is warmed once so JVM/
codegen startup is not billed to the first query, and each query is
timed as the MEDIAN of 3 runs so round-over-round deltas are
attributable to plan changes, not GC/scheduler noise.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from ipeds_etl_spark.session import get_spark  # noqa: E402
from ipeds_etl_spark import queries as q  # noqa: E402

#: Headline suite: one representative per operator family (scan+agg,
#: window/top-1, multi-join, broadcast rollup, top-k, scalar cleaning,
#: JSON round-trip, keyed merge, hashing).
HEADLINE = [
    "kpi_yearly",
    "latest_per_key_agg",
    "enrich_join",
    "dim_lookup_agg",
    "filter_between_topk",
    "sentinel_clean",
    "json_page_roundtrip",
    "upsert_on_pk",
    "stable_hash",
    # training-data extension track
    "text_quality",
    "text_lang_id",
    "doc_fingerprint",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "emb_topk_bruteforce",
    "emb_ivf_topk",
    "events_window_hourly",
    "events_sessionize",
    "multimodal_features",
    # round-2 additions (suite total covers 26 queries from here on;
    # compare per-query medians round-over-round, not the total)
    "dedup_components",
    "docs_split_and_sample",
    "docs_chunk_windows",
    "docs_pack_sequences",
    "events_click_attribution",
    "orders_range_join_bucketed",
    # round-2 query families (VERDICT r2 item 7: benched so round-over-
    # round deltas are attributable)
    "customer_order_window_funcs",
    "orders_calendar_dims",
    "part_name_fuzzy_pairs",
    # round-3 additions
    "kpi_grouping_sets",
    "docs_tfidf_topterms",
    "events_funnel",
    "events_user_retention",
    # capped RP-LSH / centroid near-dup paths (round-3 rework)
    "emb_rp_lsh_near_dups",
    "emb_near_dups",
    # corpus hygiene (round-3 additions)
    "docs_repetition_filters",
    "docs_decontaminate",
    "docs_token_diversity",
    "events_value_histogram",
    "dedup_components_star",
    "dedup_graph_stats",
    "events_type_transitions",
    # round-4 additions: distributed prefix-sum sweep line; mergeable
    # sketch set-ops (three 1-row sketch aggs + broadcast merge)
    "orders_open_interval_counts",
    "events_kmv_merge",
    # round-4, second wave: two-phase quota cap, bloom fact pruning,
    # frequent n-grams, join-free BM25, map-only PII scrub, exact
    # prefix-filtered similarity join
    "docs_source_quota_sample",
    "orders_bloom_semi_join",
    "docs_ngram_heavy_hitters",
    "docs_bm25_search",
    "customers_pii_scrub",
    "docs_jaccard_prefix_join",
    # round-5 additions: TPC-H Q1 shape, one-shuffle SCD2 build,
    # basket pair mining, sequential paths, cohort LTV, SemDeDup
    # verdict, full-outer reconciliation
    "lineitem_pricing_summary",
    "customer_scd2",
    "orders_market_basket",
    "events_top_paths",
    "customer_cohort_ltv",
    "emb_semantic_dedup",
    "nations_customer_supplier_balance",
    # round-5, second wave: grid resample + LOCF fill, yoy lag
    # analytics, cut-point RFM scoring, integer-exact PageRank
    "events_resample_locf",
    "orders_yoy_growth",
    "customer_rfm_scores",
    "parts_copurchase_pagerank",
    # round-5, third wave: association rules, end-to-end dedup
    # resolution, relational division, unpivot
    "orders_basket_rules",
    "docs_dedup_resolution",
    "supplier_brand_coverage",
    "orders_yearly_metrics_long",
    # round-5, fourth wave: canonical text normalization, containment
    # (near-subset) pairs, exact-moment correlation matrix
    "docs_normalize_text",
    "docs_containment_pairs",
    "lineitem_corr_matrix",
    # TPC-H Q3/Q5 shapes: filtered 3-way top-k; 6-way dim-chain join
    "orders_shipping_priority",
    "regional_supplier_volume",
    "events_sliding_active_users",
    # round-6 wave: correlated-subquery decorrelation (Q17/Q21/Q22
    # shapes) + the time-RANGE window frame
    "lineitem_small_qty_revenue",
    "supplier_late_only_orders",
    "customers_idle_high_balance",
    "orders_trailing_30d_spend",
    # product quantization: compressed-domain ADC scan + two-stage
    # shortlist/re-rank (codebook build amortized like IVF's)
    "emb_pq_topk",
    "emb_pq_rerank_recall",
    # LATERAL top-n, source-mixing weights, linear quality gate
    "customer_lateral_top_orders",
    "docs_mixture_weights",
    "docs_quality_logit",
    # frame-fingerprint video dedup through the mapInPandas sampler
    "multimodal_frame_dedup",
    # two-phase global row numbering (no Exchange SinglePartition)
    "orders_global_rownum",
    # VARIANT-typed semi-structured extraction (Spark 4 parse_json)
    "events_props_variant",
    # point-in-time join against the SCD2 dimension
    "orders_scd2_pointintime",
    # crawl-over-crawl dedup: incoming batch vs reference corpus
    "docs_incremental_dedup",
    # two-pass exact quantiles (no group buffering)
    "events_value_exact_quantiles",
    # Spark 4 recursive CTE: bounded 3-hop reachability
    "parts_copurchase_3hop",
    # A/B readout: hash assignment + exact algebraic moments
    "events_ab_test",
    # candidate-fed precision gate (cheap at any scale)
    "dedup_minhash_precision",
    # round-7 wave: TPC-H Q18 (IN over grouped HAVING), Q7 (bilateral
    # snowflake), Q20 (nested correlated agg in HAVING), Q11 (self-
    # gating scalar agg), sub-document duplication fraction (map-side
    # shingle dedup), DAU/WAU stickiness (banded distinct-count)
    "customers_large_orders",
    "nations_trade_volume",
    "suppliers_dominant_parts",
    "nation_part_value_concentration",
    "docs_dup_ngram_fraction",
    "events_dau_wau_stickiness",
    # Q13 (zero-inclusive outer-join count distribution) and Q19
    # (cross-side disjunctive residual over an extracted equi key)
    "customer_order_distribution",
    "parts_promo_revenue_disjunctive",
    # distributed BPE tokenizer training (6 unrolled merge rounds)
    "docs_bpe_merges",
    # Q12 (CASE agg over residual-filtered join), Q14 (conditional
    # ratio), Q16 (NOT IN -> null-aware anti join + Expand distinct)
    "lineitem_priority_shipping_counts",
    "parts_promo_revenue_share",
    "parts_supplier_counts_excluded",
    # BPE apply side: per-doc fertility under the learned tokenizer
    "docs_bpe_fertility",
    # passage-level dedup as a rewrite (global first-occurrence keep)
    "docs_passage_dedup_rewrite",
    # TPC-H completion: Q4 exists, Q6 pure scan-agg, Q8 share-over-
    # snowflake, Q9 LIKE rollup, Q10 top-returns, Q15 max-equality,
    # Q2 correlated-min equality
    "orders_priority_late_exists",
    "lineitem_discount_revenue",
    "nation_market_share",
    "nation_year_red_revenue",
    "customers_returned_revenue_top",
    "top_supplier_by_revenue",
    "parts_cheapest_supplier",
    # round-8 wave: verifiable HLL + Count-Min sketches, 2-D skyline
    # (prefix-min form), CEP sequence regexes, sorted-neighborhood
    # dedup, composition drift, k-core peel, MinHash calibration,
    # gaps-and-islands streaks, rolling anomaly, golden record,
    # cluster purity, funnel latency quantiles, top-k with ties.
    # (dedup_blocking_union_recall is registered but NOT benched: its
    # gold standard is the O(n²) verifier, oracle-scale only — the
    # same exclusion as dedup_minhash_recall.)
    "events_hll_users",
    "events_cms_user_counts",
    "parts_skyline_2d",
    "events_cep_pattern_match",
    "docs_snm_pairs",
    "docs_source_lang_drift",
    "dedup_kcore",
    "dedup_minhash_estimate",
    "customer_order_streaks",
    "events_rolling_anomaly",
    "docs_golden_record",
    "emb_cluster_purity",
    "events_funnel_time_quantiles",
    "nation_top_customers_ties",
    # distributed prefix-sum Pareto, temporal-split leakage audit,
    # equi-depth histogram, integer Markov fixed point, Hamilton
    # token-budget apportionment
    "orders_pareto_8020",
    "events_temporal_split",
    "lineitem_price_equidepth",
    "events_markov_stationary",
    "docs_token_budget_allocation",
    # winsorized robust stats, weighted median (prefix-sum reuse),
    # bipartite butterfly counting (basket-pair reuse)
    "orders_winsorized_stats",
    "lineitem_weighted_median_price",
    "parts_copurchase_butterflies",
]

#: Headline inclusion criterion (VERDICT r5 item 6): the suite is the
#: ENTIRE registry minus this exclusion list. Excluded queries embed
#: an O(n²) brute-force gold standard (all-pairs similarity / shingle
#: Jaccard verifiers) that only exists to CALIBRATE the scalable
#: operator at oracle scale — benching them times the deliberately
#: quadratic verifier, not a production path. Their correctness rows
#: come from the sf0.01 driver gate like everything else.
EXCLUDED = {
    "dedup_minhash_recall": "O(n²) exact-Jaccard gold standard",
    "dedup_blocking_union_recall": "O(n²) exact-Jaccard gold standard",
    "emb_ivf_recall": "O(n²) brute-force neighbor gold standard",
    "emb_pq_recall": "O(n²) brute-force neighbor gold standard",
    "emb_rp_lsh_recall": "O(n²) brute-force neighbor gold standard",
    "emb_rp_lsh_banded_recall": "O(n²) brute-force neighbor gold standard",
    "dedup_bcubed_eval": "O(n²) exact-Jaccard truth clustering gold standard",
}


def _run_suite() -> None:
    """Child-process body: run the suite, write BENCH_SUMMARY.json.

    Everything this function (and Spark) prints goes to the CAPTURED
    child stdout/stderr — none of it reaches the parent's stdout, so
    the artifact the driver parses is exactly two clean JSON lines.
    """
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("ipeds_etl_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Generic warm-up: JVM codegen, shuffle machinery, and the parquet
    # vectorized-reader classpath (one tiny read). Billing JVM class
    # loading to the first measured query would misstate its cost.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").limit(1).collect()

    # Shared-index builds billed to DEDICATED entries (ADVICE r5): the
    # LSH candidate-pair table and the distinct basket-items table are
    # memoized per (session, corpus) and consumed by ~10 queries, so
    # per-query numbers below are consumption-only — the one-time
    # build cost is timed here, cold, exactly once.
    from ipeds_etl_spark import queries_ext as qext

    index_builds: dict[str, float] = {}
    for label, memo, builder in (
        ("lsh_doc_pairs", qext._LSH_DOC_PAIRS, qext._lsh_doc_pairs),
        ("basket_items", qext._BASKET_ITEMS, qext._basket_items),
    ):
        memo.clear()
        t0 = time.perf_counter()
        builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        index_builds[label] = round(time.perf_counter() - t0, 3)

    n_runs = int(os.environ.get("BENCH_RUNS", "3"))
    registered = q.queries()
    suite = HEADLINE + sorted(
        n for n in registered if n not in HEADLINE and n not in EXCLUDED
    )
    timings: dict[str, float] = {}
    for name in suite:
        fn = registered[name]
        samples = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 3)

    total = round(sum(timings.values()), 3)
    summary = json.dumps(
        {
            "metric": "suite_total_runtime",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            "runs_per_query": n_runs,
            "aggregation": "median",
            "n_queries": len(timings),
            "index_builds": index_builds,
            "index_build_total": round(sum(index_builds.values()), 3),
            "suite_criterion": (
                "entire registry minus O(n^2) gold-standard recall gates; "
                "query timings exclude the one-time shared-index builds "
                "billed under index_builds"
            ),
            "excluded": sorted(EXCLUDED),
        }
    )
    Path(__file__).resolve().parent.joinpath("BENCH_SUMMARY.json").write_text(
        summary + "\n"
    )
    print(summary, file=sys.stderr)


def main() -> None:
    """Parent: re-exec as a captured child, then print ONLY the JSON.

    BENCH_r04/r05 lesson: the driver keeps a character-bounded window
    of captured stdout, and anything Spark writes there (progress
    bars, Ivy/log4j banners, native-loader warnings) can push the
    summary line's head out of it → ``"parsed": null``. Redirecting
    Spark's noise is whack-a-mole; instead the whole benchmark runs in
    a CHILD process whose stdout/stderr are captured away, and the
    parent's stdout is exactly two copies of the one-line JSON summary
    (first line AND last line), with nothing before, between besides
    the duplicate, or after.
    """
    if os.environ.get("BENCH_CHILD") == "1":
        _run_suite()
        return
    import subprocess

    out_path = Path(__file__).resolve().parent / "BENCH_SUMMARY.json"
    out_path.unlink(missing_ok=True)  # never serve a stale summary
    env = dict(os.environ, BENCH_CHILD="1")
    proc = subprocess.run(
        [sys.executable, str(Path(__file__).resolve())],
        env=env,
        capture_output=True,
        text=True,
    )
    if proc.returncode != 0 or not out_path.exists():
        sys.stderr.write(proc.stdout[-4000:] + "\n" + proc.stderr[-8000:] + "\n")
        raise SystemExit(proc.returncode or 1)
    summary = out_path.read_text().strip()
    print(summary)
    print(summary)


if __name__ == "__main__":
    main()
