#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR.

Final stdout is a COMPACT one-line JSON summary (repeated twice, <300
chars — the driver keeps only a bounded tail of stdout, so the
per-query map must NOT be on stdout):

    {"metric": "suite_total_runtime", "value": N, "unit": "sec",
     "sf": ..., "n_queries": ..., "index_build_total": ...}

The full per-query map (plus methodology fields) is written to
``BENCH_SUMMARY.json`` next to this file.

Methodology:
* Each query is forced end-to-end with the noop sink (full
  computation, no collect/serialization cost) and timed as the MEDIAN
  of 3 runs.
* The suite is split across ``$BENCH_CHUNKS`` (default 4) sequential
  CHILD processes, each a fresh JVM: running 220+ queries through one
  JVM accrues GC/code-cache/catalog pressure that inflated the round-6
  suite ~1.5x vs isolated re-timings (VERDICT r6 "What's wrong" §2).
  Chunked fresh sessions keep round-over-round totals attributable to
  code, not JVM accretion. Each chunk warms up (codegen + parquet
  reader) before its first measured query.
* Shared one-time index builds (LSH candidate pairs, basket items)
  are pre-built cold in every chunk so per-query numbers are
  consumption-only; the BILLED build cost is chunk 0's timing, under
  ``index_builds`` (ADVICE r5 policy).

Round-9 additions (VERDICT r8 items 3+5):
* After the sf0.1 suite, the top-5 heaviest queries are re-timed SOLO
  (fresh JVM each) and appended to ``BENCH_ISOLATE.json`` (JSONL
  history) — regression adjudication as recorded data.
* A second billed line at a 10x (sf1) corpus: the 30 heaviest queries
  re-run against scale_smoke's replica build (``sf1_total`` /
  ``queries_sf1``), since the sf0.1 suite is saturated by session
  constants. ``BENCH_SF1=0`` disables.

Usage:
    python bench.py                 # full suite (+ isolates + sf1)
    python bench.py --isolate NAME  # one query, fresh session,
                                    # median-of-3 (perf-triage tool:
                                    # separates real plan regressions
                                    # from suite-context noise);
                                    # appends to BENCH_ISOLATE.json
    python bench.py --paired REV    # interleaved same-session A/B vs
                                    # the engine code at git rev REV
                                    # (r11, VERDICT r10 item 1): the
                                    # ONLY protocol under which
                                    # round-over-round perf claims
                                    # carry signal on this box;
                                    # appends to BENCH_PAIRED.json
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
]

#: Suite inclusion criterion (VERDICT r5 item 6): the suite is the
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
    "emb_ivf_probe_sweep": "O(n²) brute-force neighbor gold standard (3-arm sweep)",
    "emb_ivfpq_recall": "O(n²) brute-force neighbor gold standard",
    "emb_ivfpq_residual_recall": "O(n²) brute-force neighbor gold standard",
    "emb_sq8_recall": "O(n²) brute-force neighbor gold standard",
    "emb_ivfpq_filtered_recall": "O(n²) brute-force neighbor gold standard",
    "emb_ivfpq_filtered_sweep": (
        "O(n²) brute-force neighbor gold standard (9-arm "
        "selectivity × n_probe sweep)"
    ),
}

SUITE_CRITERION = (
    "entire registry minus O(n^2) gold-standard recall gates; median-of-3 "
    "per query via noop sink; suite split across fresh child JVMs "
    "(BENCH_CHUNKS, default 4) so totals measure code, not single-JVM "
    "accretion; query timings exclude the one-time shared-index builds, "
    "billed once under index_builds (rebuilt cold per chunk; billed "
    "per-index MEDIAN across chunks, since identical cold builds showed "
    "a 2.2x spread from JVM/page-cache context in r7 — the median is "
    "stable round-over-round where chunk 0 was not); r10 adds the PQ "
    "codebook train to the billed builds (VERDICT r9 item 4 — "
    "build-once-query-many, same class as the LSH memo), so PQ-family "
    "query lines measure encode/search/audit only from r10 on; r12 adds "
    "the IVF coarse codebook, residual sub-codebooks, SQ8 bounds, and "
    "the frozen 1k vocabulary to the billed builds on the same policy; "
    "r10 also "
    "adds box calibration (calib_cpu_s: 400 MiB single-thread sha256 in "
    "the parent; calib_scan_s: fixed lineitem scan-agg median across "
    "chunk JVMs) — same-code suite totals have ranged 0.92x-1.44x across "
    "sessions, so cross-round comparisons should normalize by the "
    "calibration constants carried in the same compact line; "
    "isolated re-timing of any query: bench.py --isolate NAME; "
    "r12 rotation (VERDICT r11 item 6): sf0.1 per-query medians are "
    "session constants, so each full run times HEADLINE + the current "
    "round's registrations + 1/BENCH_ROTATE (default 3) of the rest, "
    "rotating the slice via BENCH_ROTATION.json so 3 consecutive runs "
    "cover the registry; reclaimed wall-time funds the sf1 track where "
    "plan changes actually register; sf1 ranking uses queries_known "
    "(the cumulative last-known sf0.1 medians carried across runs), "
    "BENCH_ROTATE=1 restores the full sweep; r14 restores per-query "
    "round-over-round comparability (VERDICT r13 item 2): the compact "
    "stdout line carries a bounded prefix of the per-query medians "
    "(HEADLINE + force-includes first — timed every run, so rounds "
    "intersect on them; capped at BENCH_LINE_BUDGET chars because an "
    "unbounded map overflowed the driver's stdout tail in r04), the "
    "full map is appended per run to BENCH_QUERIES.jsonl, and scaling/"
    "diagnostic runs at a LOWER $SPARK_GRAFT_CPUS than the recorded "
    "main run re-time the SAME rotation slice without advancing it "
    "(BENCH_ROTATE_PIN=<slice> is the explicit override)"
)

SF1_CRITERION = (
    "second billed suite line (VERDICT r8 item 3): the BENCH_SF1_TOP "
    "(default 60 from r11 — VERDICT r10 item 5: sf0.1 medians are "
    "~0.6 s/query session constants while genuine plan changes only "
    "register at 10x, so the bench budget shifted toward sf1) heaviest "
    "queries by this run's sf0.1 medians, re-timed "
    "at a 10x corpus (scale_smoke's key-offset sf1 replica build, reused "
    "across runs via an in-dir stamp) with median-of-BENCH_SF1_RUNS "
    "(default 2) in BENCH_SF1_CHUNKS (default 3) fresh child JVMs; "
    "every query REGISTERED in the current round is force-included "
    "(one sf1 row minimum for new registrations, r11 policy); "
    "sf1 shared-index builds "
    "billed separately under index_builds_sf1; the sf1 top-5 heaviest "
    "get solo fresh-JVM isolate medians appended to BENCH_ISOLATE.json "
    "(VERDICT r9 item 5 — the sf1 line is the scaling signal and shows "
    "the same box-noise class as sf0.1). Disable: BENCH_SF1=0"
)

#: queries force-included in the sf1 list regardless of sf0.1 rank:
#: the scale story they carry IS their reason to exist (a twin whose
#: payoff only registers at 10x would otherwise be invisible to the
#: track that justifies it).
SF1_FORCE_INCLUDE = {
    "parts_copurchase_3hop_bfs": (
        "level-synchronous BFS twin registered (r10) to REPLACE "
        "parts_copurchase_3hop's sf1 exclusion — its sf1 row is the "
        "deliverable (VERDICT r9 item 3)"
    ),
    "docs_cdc_dedup_rewrite": (
        "registered r11 — every new registration gets an sf1 row "
        "from r11 on (VERDICT r10 item 5)"
    ),
    "events_value_qsketch": (
        "registered r11 — every new registration gets an sf1 row "
        "from r11 on (VERDICT r10 item 5)"
    ),
    "emb_ivfpq_topk": (
        "registered r12 (IVF-PQ composition, VERDICT r11 item 4) — "
        "new registrations get an sf1 row"
    ),
    "emb_ivfpq_residual_topk": (
        "registered r12 (residual IVF-PQ, the FAISS by_residual=true "
        "default) — new registrations get an sf1 row"
    ),
    "emb_sq8_topk": (
        "registered r12 (SQ8 scalar quantization, the 4x compression "
        "point) — new registrations get an sf1 row"
    ),
    "emb_ivfpq_filtered_topk": (
        "registered r12 (filtered vector search: predicate composed "
        "with the globally-trained index, filter-then-rank) — new "
        "registrations get an sf1 row"
    ),
    "docs_vocab_apply_fertility": (
        "registered r12 (vocab-scale tokenizer apply, VERDICT r11 "
        "item 5) — new registrations get an sf1 row"
    ),
    "emb_semantic_decontaminate": (
        "registered r12 post-gate, first bench rows r13 — the "
        "map-side eval-matrix fold's scale story is the point"
    ),
    "emb_incremental_decontaminate": (
        "registered r13 (crawl-over-crawl decontamination twin) — "
        "new registrations get an sf1 row"
    ),
    "docs_vocab8k_apply_fertility": (
        "registered r13 (18k-unit production-vocab apply; the "
        "json-literal decision it carries was measured at sf1) — "
        "new registrations get an sf1 row"
    ),
}

#: auto-isolate (VERDICT r8 item 5): after the suite, the top-N heaviest
#: queries are re-timed solo (fresh JVM each) and APPENDED to
#: BENCH_ISOLATE.json, so driver-box noise is adjudicated by recorded
#: data instead of git-diff argument.
AUTO_ISOLATE_TOP = 5

#: sf1-track exclusions beyond EXCLUDED (measured, not speculative):
SF1_EXCLUDED = {
    "parts_copurchase_3hop": (
        "UNION ALL recursion enumerates PATHS (O(deg^3) by its stated "
        "contract); the 10x-denser sf1 co-purchase graph exceeds "
        "Spark's 1M-row cteRecursionRowLimit (RECURSION_ROW_LIMIT_"
        "EXCEEDED, measured r9) — dense-graph transitive walks belong "
        "to the level-synchronous DataFrame BFS form, REGISTERED r10 "
        "as parts_copurchase_3hop_bfs (same oracle, force-included in "
        "the sf1 list); the CTE form stays correct at its documented "
        "sparse-graph scale"
    ),
}


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def _suite_list() -> list[str]:
    from ipeds_etl_spark import queries as q

    registered = q.queries()
    return HEADLINE + sorted(
        n for n in registered if n not in HEADLINE and n not in EXCLUDED
    )


#: Stdout-line budget. The driver keeps a ~2000-char tail of stdout and
#: parses the LAST JSON line in it; in round 4 an unbounded per-query
#: map pushed the line past the tail and the round lost its parsed
#: record entirely (BENCH_r04.json: parsed null). The per-query map on
#: the line is therefore a bounded PREFIX (see compact_query_map); the
#: full map lives in BENCH_SUMMARY.json and BENCH_QUERIES.jsonl.
BENCH_LINE_BUDGET = 1900


def compact_query_map(
    timings: dict[str, float], priority: list[str], room: int
) -> dict[str, float]:
    """Largest prefix of the per-query medians whose JSON encoding fits
    in ``room`` chars (VERDICT r13 item 2: the compact line must carry
    per-query numbers again so the driver's PERF can intersect common
    queries across rounds, without repeating the r04 tail overflow).

    Order: ``priority`` names first (HEADLINE + force-includes — timed
    EVERY run, so consecutive rounds intersect on them), then remaining
    queries heaviest-first. Stops at the first entry that does not fit
    (prefix rule keeps the emitted set deterministic round-over-round).
    Pure function, unit-pinned."""
    seen = set()
    order = [n for n in priority if n in timings and not (n in seen or seen.add(n))]
    order += sorted(
        (n for n in timings if n not in seen), key=lambda n: (-timings[n], n)
    )
    out: dict[str, float] = {}
    for n in order:
        cand = dict(out)
        cand[n] = timings[n]
        if len(json.dumps(cand)) > room:
            break
        out = cand
    return out


def resolve_rotation(
    state_path, rotate: int, cpus: int | None, pin: str | None
) -> tuple[int, bool]:
    """Which sf0.1 rotation slice this run times, and whether it may
    ADVANCE the shared rotation state (VERDICT r13 item 2 / What's-wrong
    3: the r13 low-core scaling run consumed and advanced the rotation,
    so the 8-core and 32-core runs timed DIFFERENT sf0.1 subsets and the
    next round's slice pointer moved).

    * ``pin`` (env BENCH_ROTATE_PIN) forces that slice, never advances —
      the explicit override for diagnostic runs.
    * A run at FEWER cpus than the recorded state's (the driver's
      scaling arm re-runs bench.py at a lower $SPARK_GRAFT_CPUS after
      the main run) re-times the SAME slice the main run just timed and
      does not advance — scaling ratios then compare identical subsets.
    * Otherwise: the successor slice, advancing state. Pure decision
      function, unit-pinned; the caller writes the state file."""
    if pin is not None:
        return int(pin) % rotate, False
    if cpus is not None and state_path.exists():
        try:
            state = json.loads(state_path.read_text())
            prev_cpus = int(state["cpus"])
            prev_slice = int(state["slice"])
        except (ValueError, KeyError, OSError, TypeError):
            prev_cpus = None
        if prev_cpus is not None and cpus < prev_cpus:
            return prev_slice % rotate, False
    return next_rotation_slice(state_path, rotate), True


def next_rotation_slice(state_path, rotate: int) -> int:
    """The slice the NEXT run must time: successor (mod ``rotate``) of
    the recorded slice, 0 when no/invalid state. Factored so the
    advance is unit-pinned (VERDICT r12 item 6: cumulative bench
    coverage closes over the registry only if consecutive runs really
    advance — a stuck slice re-times one third forever and silently
    looks complete)."""
    prev = -1
    if state_path.exists():
        try:
            prev = int(json.loads(state_path.read_text())["slice"])
        except (ValueError, KeyError, OSError):
            prev = -1
    return (prev + 1) % rotate


def rotation_plan(
    suite_all: list[str], always: set[str], rotate: int, slice_idx: int
) -> list[str]:
    """The sf0.1 suite slice for one full run (VERDICT r11 item 6):
    ``always`` (HEADLINE + this round's force-includes) every run, plus
    every ``rotate``-th remaining query by position — so ``rotate``
    consecutive runs cover the whole registry, each name landing in
    exactly one slice. Pure function, pinned by
    ``tests/test_bench_paired.py``."""
    tail = [n for n in suite_all if n not in always]
    keep = (always & set(suite_all)) | {
        n for i, n in enumerate(tail) if i % rotate == slice_idx
    }
    return [n for n in suite_all if n in keep]


def _warm_session(sf_dir: str):
    """Fresh session, generic warm-up (JVM codegen, shuffle machinery,
    parquet vectorized-reader classpath). Billing class loading to the
    first measured query would misstate its cost."""
    from ipeds_etl_spark.session import get_spark

    spark = get_spark("ipeds_etl_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").limit(1).collect()
    return spark


def _build_indexes(spark, sf_dir: str) -> dict[str, float]:
    """Cold-build the memoized shared indexes; returns build seconds."""
    from ipeds_etl_spark.operators import indexes as IDX

    builds: dict[str, float] = {}
    IDX.release_indexes(spark)
    for label, builder in (
        ("lsh_doc_pairs", IDX.lsh_doc_pairs),
        ("basket_items", IDX.basket_items),
    ):
        t0 = time.perf_counter()
        builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        builds[label] = round(time.perf_counter() - t0, 3)
    # PQ codebook: the one-time train cost of the PQ ANN family
    # (VERDICT r9 item 4 — ~10 s of emb_pq_codebook_balance's 11.8 s
    # sf1 smoke was codebook TRAINING, the same build-once-query-many
    # class as the LSH pair memo). Driver-side memo (a list, no
    # DataFrame sink), so timing the call is the build cost; PQ-family
    # query lines then measure encode/search/audit only.
    from ipeds_etl_spark import queries_ext as QE

    t0 = time.perf_counter()
    QE._pq_codebook(spark, sf_dir)
    builds["pq_codebook"] = round(time.perf_counter() - t0, 3)
    # r12 artifacts, same billed-build class (driver-side memos):
    # IVF coarse codebook (shared by the whole IVF/IVF-PQ family),
    # residual sub-codebooks, SQ8 bounds, the frozen 1k vocabulary —
    # so per-query lines measure search/apply only, not training.
    # The IVF build comes FIRST and unconditionally: paired ref arms
    # of pre-r12 revisions lack queries_wave15, and an import failure
    # before the IVF build would leave only ONE arm prebuilt — a
    # silent bias on every IVF-family common query.
    t0 = time.perf_counter()
    QE._ivf_codebook(spark, sf_dir)
    builds["ivf_codebook"] = round(time.perf_counter() - t0, 3)
    try:
        from ipeds_etl_spark import queries_wave15 as W15

        wave15_builders = (
            ("residual_pq_books", W15._res_books),
            ("sq8_bounds", W15._sq8_bounds),
            ("vocab_1k", W15._frozen_vocab),
        )
    except ImportError:  # pre-r12 engine (paired ref arm): no wave15
        wave15_builders = ()
    for label, builder in wave15_builders:
        t0 = time.perf_counter()
        builder(spark, sf_dir)
        builds[label] = round(time.perf_counter() - t0, 3)
    return builds


#: Box calibration (round 10): same-code full-suite totals have now
#: ranged 0.92x-1.44x across sessions (r9's three generations, r10's
#: two back-to-back runs at a uniform ~1.3-1.4x over r9 including
#: map-only constants and fresh-JVM isolates) — the box, not the code.
#: Two fixed probes, timed every run, turn that argument into a
#: recorded denominator: a single-thread CPU hash (pure CPython/
#: OpenSSL, no JVM — detects clock/steal differences) and a fixed
#: parquet scan-agg run in every chunk's JVM (detects IO/page-cache/
#: JVM differences; median across chunks). Both ride the COMPACT
#: stdout line, so the per-round BENCH_r{N}.json carries its own
#: normalization constants: compare suites as total/calib, not total.
_CALIB_HASH_ITERS = 400  # x 1 MiB = 400 MiB hashed


def _cpu_probe() -> float:
    """Seconds to sha256 400 MiB single-threaded (fixed workload)."""
    import hashlib

    buf = b"\x5a" * (1 << 20)
    t0 = time.perf_counter()
    for _ in range(_CALIB_HASH_ITERS):
        hashlib.sha256(buf).digest()
    return round(time.perf_counter() - t0, 3)


def _spark_probe(spark, sf_dir: str) -> float:
    """Seconds for a fixed lineitem scan-agg (3 runs, median)."""
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").selectExpr(
            "sum(l_extendedprice)", "sum(l_quantity)", "count(*)"
        ).write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 3)


def _time_query(spark, fn, sf_dir: str, n_runs: int) -> list[float]:
    samples = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    return samples


def _run_chunk() -> None:
    """Child-process body: run this chunk's slice, write a part file.

    Everything this function (and Spark) prints goes to the CAPTURED
    child stdout/stderr — none of it reaches the parent's stdout.
    """
    from ipeds_etl_spark import queries as q

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    idx = int(os.environ["BENCH_CHUNK_IDX"])
    total = int(os.environ["BENCH_CHUNK_TOTAL"])
    n_runs = int(os.environ.get("BENCH_RUNS", "3"))

    spark = _warm_session(sf_dir)
    index_builds = _build_indexes(spark, sf_dir)

    registered = q.queries()
    # parent passes the (possibly rotation-reduced) suite; round-robin
    # slice spreads each round's heavy additions evenly across chunks
    names_env = os.environ.get("BENCH_SUITE_LIST")
    suite = names_env.split(",") if names_env else _suite_list()
    chunk = suite[idx::total]
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in chunk:
        # one failing query must not void the other ~230 measurements
        # (a 25-minute suite dying at minute 24 leaves no artifact)
        try:
            timings[name] = round(
                statistics.median(
                    _time_query(spark, registered[name], sf_dir, n_runs)
                ),
                3,
            )
        except Exception as e:  # noqa: BLE001 - recorded, surfaced by parent
            errors[name] = str(e).split("\n")[0][:200]
    part = {
        "timings": timings,
        "index_builds": index_builds,
        "chunk": idx,
        "errors": errors,
        "calibration_scan_agg": _spark_probe(spark, sf_dir),
    }
    Path(__file__).resolve().parent.joinpath(f"BENCH_PART_{idx}.json").write_text(
        json.dumps(part) + "\n"
    )


def _run_isolate() -> None:
    """Child-process body for --isolate: one query, fresh session.
    Writes its entry to a part file; the parent APPENDS it to
    BENCH_ISOLATE.json (JSONL — the isolate record is history, each
    line stamped with its mode and wall-clock)."""
    from ipeds_etl_spark import queries as q

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    name = os.environ["BENCH_ISOLATE"]
    n_runs = int(os.environ.get("BENCH_RUNS", "3"))

    spark = _warm_session(sf_dir)
    _build_indexes(spark, sf_dir)  # consumption-only parity with the suite
    fn = q.queries()[name]
    samples = [round(s, 3) for s in _time_query(spark, fn, sf_dir, n_runs)]
    out = {
        "metric": "isolated_query_runtime",
        "query": name,
        "value": round(statistics.median(samples), 3),
        "unit": "sec",
        "sf": _sf_of(sf_dir),
        "samples": samples,
        "mode": os.environ.get("BENCH_ISOLATE_MODE", "manual"),
        "at": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    Path(__file__).resolve().parent.joinpath("BENCH_ISOLATE_PART.json").write_text(
        json.dumps(out) + "\n"
    )


def _append_isolate(here: Path, line: str) -> None:
    with open(here / "BENCH_ISOLATE.json", "a") as f:
        f.write(line.rstrip("\n") + "\n")


# ---------------------------------------------------------------------------
# Paired A/B mode (VERDICT r10 item 1): same-code suite totals have
# spanned 0.92x-1.44x ACROSS sessions and the r10 calibration probes
# proved the swing un-normalizable by a static constant — so
# cross-round deltas only carry signal when both arms run interleaved
# in ONE session. ``bench.py --paired <git-rev>`` checks the reference
# revision out into a git worktree and alternates fresh child JVMs
# between the two ENGINE trees (the harness — this file — is always
# the current one, so arms differ only in engine code), ABBA order to
# cancel drift, one pair per round, ratios computed WITHIN each round.
# ---------------------------------------------------------------------------
PAIRED_CRITERION = (
    "per-query ratio = current/ref within each ABBA round (fresh JVM "
    "per arm per round, BENCH_PAIRED_ROUNDS default 3, one noop-sink "
    "timing per query per JVM), reported as the median of per-round "
    "ratios; query list = top BENCH_PAIRED_TOP (default 20) sf0.1 "
    "queries of the last full run plus its entire sf1 track; ref arm "
    "imports engine code from a detached worktree pinned to the rev's "
    "RESOLVED SHA (recorded as ref_sha; a reused worktree is HEAD-"
    "verified and recreated on mismatch, so movable refs cannot bench "
    "a stale checkout). Every invocation PREPENDS a same-code A/A "
    "round set per track (BENCH_PAIRED_AA_ROUNDS, default 2, ABBA-"
    "counterbalanced: rounds alternate a-then-b / b-then-a, so the "
    "warm-cache arm-order bias — measured ~7% when a single "
    "un-counterbalanced round was the default in r12 — cancels in the "
    "null exactly as it does in the A/B arms; both arms = current "
    "tree, same ABBA child protocol): the per-query A/A ratios (each "
    "the median of its counterbalanced per-round ratios) span that "
    "track's MEASURED, order-neutral null band for this invocation, "
    "recorded as aa_band — an A/B ratio is a claimable delta only "
    "OUTSIDE the same-record aa_band (r11's inferred [0.85, 1.18] "
    "sf0.1 band is superseded by the measured one). "
    "Per-arm index-build failures are recorded in the errors map "
    "(arm:roundN:index_build) so a ref arm silently paying build cost "
    "inside query timings is identifiable, not invisible."
)


def _run_paired_chunk() -> None:
    """Child body for --paired: one timing pass over the given list,
    with ENGINE code imported from $BENCH_ENGINE_ROOT when set (the
    ref-revision worktree) and from this repo otherwise."""
    root = os.environ.get("BENCH_ENGINE_ROOT")
    if root:
        sys.path.insert(0, root)
    from ipeds_etl_spark import queries as q

    sf_dir = os.environ["BENCH_PAIRED_SF_DIR"]
    names = os.environ["BENCH_PAIRED_LIST"].split(",")
    n_runs = int(os.environ.get("BENCH_PAIRED_RUNS", "1"))

    spark = _warm_session(sf_dir)
    if not root and os.environ.get("BENCH_PAIRED_ENSURE_SF1") == "1":
        # current-arm child refreshes the sf1 replica corpus if the
        # stamp is stale (no-op when it matches); the ref arm never
        # builds data — both arms must read IDENTICAL bytes
        _ensure_sf1_corpus(
            spark,
            sf_dir,
            os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        )
    index_build_error: str | None = None
    try:
        _build_indexes(spark, sf_dir)  # consumption-only parity
    except Exception as e:  # noqa: BLE001 - older revs may lack an index
        # ADVICE r11: a swallowed ref-arm build failure means that arm
        # pays index-build cost INSIDE query timings, biasing ratios
        # toward "current faster" invisibly — record it in the part so
        # the parent surfaces it in the record's errors map
        index_build_error = str(e).split("\n")[0][:200]
        sys.stderr.write(f"paired: index build failed: {e}\n")

    registered = q.queries()
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        if name not in registered:
            errors[name] = "not registered in this revision"
            continue
        try:
            timings[name] = round(
                statistics.median(
                    _time_query(spark, registered[name], sf_dir, n_runs)
                ),
                3,
            )
        except Exception as e:  # noqa: BLE001 - recorded per query
            errors[name] = str(e).split("\n")[0][:200]
    Path(__file__).resolve().parent.joinpath("BENCH_PAIRED_PART.json").write_text(
        json.dumps(
            {
                "timings": timings,
                "errors": errors,
                "index_build_error": index_build_error,
            }
        )
        + "\n"
    )


def paired_ratios(
    samples_cur: dict[str, list[float | None]],
    samples_ref: dict[str, list[float | None]],
) -> tuple[dict[str, float], float | None]:
    """Per-query median of WITHIN-ROUND cur/ref ratios, plus the
    median across queries. Rounds where either arm is missing (query
    errored or not registered in that revision) are dropped pairwise —
    a ratio is only ever formed from two timings taken in the same
    ABBA round. Pure function so the protocol arithmetic is unit-
    testable without spawning JVMs."""
    ratios: dict[str, float] = {}
    for n, cur in samples_cur.items():
        ref = samples_ref.get(n, [])
        per_round = [
            round(c / r, 3)
            for c, r in zip(cur, ref)
            if c is not None and r is not None and r > 0
        ]
        if per_round:
            ratios[n] = round(statistics.median(per_round), 3)
    med = round(statistics.median(ratios.values()), 3) if ratios else None
    return ratios, med


def _paired_worktree(here: Path, rev: str) -> tuple[Path, str]:
    """Detached worktree of ``rev`` under /tmp, keyed and verified by
    the rev's RESOLVED commit SHA (ADVICE r11: keying on the raw rev
    string let a movable ref — branch, tag, ``HEAD~1`` after new
    commits — silently reuse a stale checkout and write wrong ratios
    into the claim-bearing record). Returns ``(dir, sha)``; a reused
    dir whose HEAD differs from the SHA is removed and recreated."""
    import shutil
    import subprocess

    def _git(args: list[str], cwd: Path) -> str:
        return subprocess.run(
            ["git", *args], cwd=cwd, check=True, capture_output=True, text=True
        ).stdout.strip()

    sha = _git(["rev-parse", f"{rev}^{{commit}}"], here)
    ref_dir = Path("/tmp") / f"ipeds_bench_ref_{sha[:16]}"
    if ref_dir.exists():
        try:
            head = _git(["rev-parse", "HEAD"], ref_dir)
        except subprocess.CalledProcessError:
            head = ""
        if head != sha:
            try:
                subprocess.run(
                    ["git", "worktree", "remove", "--force", str(ref_dir)],
                    cwd=here,
                    check=True,
                    capture_output=True,
                    text=True,
                )
            except subprocess.CalledProcessError:
                shutil.rmtree(ref_dir, ignore_errors=True)
                subprocess.run(
                    ["git", "worktree", "prune"],
                    cwd=here,
                    capture_output=True,
                    text=True,
                )
    if not ref_dir.exists():
        subprocess.run(
            ["git", "worktree", "add", "--detach", str(ref_dir), sha],
            cwd=here,
            check=True,
            capture_output=True,
            text=True,
        )
    return ref_dir, sha


def _paired_main(rev: str) -> None:
    here = Path(__file__).resolve().parent
    summary_path = here / "BENCH_SUMMARY.json"
    if not summary_path.exists():
        print(
            "bench --paired needs BENCH_SUMMARY.json from a prior full "
            "run (it defines the query lists)",
            file=sys.stderr,
        )
        sys.exit(2)
    summary = json.loads(summary_path.read_text())
    top = int(os.environ.get("BENCH_PAIRED_TOP", "20"))
    rounds = int(os.environ.get("BENCH_PAIRED_ROUNDS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1_dir = os.environ.get("BENCH_SF1_DIR", _SF1_DIR_DEFAULT)

    known = summary.get("queries_known") or summary["queries"]
    sf01_list = sorted(known, key=known.get, reverse=True)[:top]
    tracks: list[tuple[str, str, list[str]]] = [("sf0.1", sf_dir, sf01_list)]
    sf1_list = list(summary.get("queries_sf1", {}))
    if sf1_list and os.environ.get("BENCH_SF1", "1") != "0":
        tracks.append(("sf1", sf1_dir, sf1_list))

    ref_dir, ref_sha = _paired_worktree(here, rev)
    # Default 2: the A/A rounds MUST come in counterbalanced pairs
    # (round 0 a-then-b, round 1 b-then-a) or the null band inherits
    # the ~7% warm-cache arm-order bias the A/B's ABBA cancels
    # (VERDICT r12 What's-wrong 2 / ADVICE r12).
    aa_rounds = int(os.environ.get("BENCH_PAIRED_AA_ROUNDS", "2"))
    part_path = here / "BENCH_PAIRED_PART.json"
    record: dict = {
        "metric": "paired_bench",
        "ref_rev": rev,
        "ref_sha": ref_sha,
        "rounds": rounds,
        "aa_rounds": aa_rounds,
        "criterion": PAIRED_CRITERION,
        "at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "tracks": {},
    }
    compact_tracks: dict[str, dict] = {}
    for label, d, names in tracks:
        errors: dict[str, str] = {}

        def run_arm(
            root: str | None, tag: str, *, _d=d, _names=names, _label=label,
            _errors=errors,
        ) -> dict[str, float]:
            part_path.unlink(missing_ok=True)
            env = {
                "BENCH_CHILD": "pairedchunk",
                "BENCH_PAIRED_SF_DIR": _d,
                "BENCH_PAIRED_LIST": ",".join(_names),
            }
            if root:
                env["BENCH_ENGINE_ROOT"] = root
            elif _label == "sf1":
                env["BENCH_PAIRED_ENSURE_SF1"] = "1"
            _spawn_child(env)
            part = json.loads(part_path.read_text())
            part_path.unlink()
            for n, e in part.get("errors", {}).items():
                _errors[f"{tag}:{n}"] = e
            if part.get("index_build_error"):
                # ADVICE r11: an arm that failed its index build pays
                # build cost inside query timings — make it visible
                _errors[f"{tag}:index_build"] = part["index_build_error"]
            return part["timings"]

        def collect(
            rnd_timings: dict[str, dict[str, float]],
            samples: dict[str, dict[str, list[float | None]]],
            _names=names,
        ) -> None:
            for n in _names:
                for arm, t in rnd_timings.items():
                    samples[arm].setdefault(n, []).append(t.get(n))

        # --- A/A null arm (VERDICT r11 item 1): both arms = current
        # tree, same ABBA child protocol. The per-query ratio spread is
        # this track's MEASURED resolution for this invocation — the
        # claim gate, replacing the band inferred from r11's single
        # disagreement. ---
        aa_samples: dict[str, dict[str, list[float | None]]] = {
            "a": {}, "b": {}
        }
        for rnd in range(aa_rounds):
            order = ("a", "b") if rnd % 2 == 0 else ("b", "a")
            per_round = {
                arm: run_arm(None, f"aa-{arm}:round{rnd}") for arm in order
            }
            collect(per_round, aa_samples)
        aa_ratios, aa_med = paired_ratios(aa_samples["a"], aa_samples["b"])
        aa_band = (
            [min(aa_ratios.values()), max(aa_ratios.values())]
            if aa_ratios
            else None
        )

        samples: dict[str, dict[str, list[float | None]]] = {
            "ref": {}, "cur": {}
        }
        for rnd in range(rounds):
            arm_order = (
                ("cur", None), ("ref", str(ref_dir))
            ) if rnd % 2 == 0 else ((("ref", str(ref_dir)), ("cur", None)))
            per_round = {
                arm: run_arm(root, f"{arm}:round{rnd}")
                for arm, root in arm_order
            }
            collect(per_round, samples)
        ratios, med = paired_ratios(samples["cur"], samples["ref"])
        record["tracks"][label] = {
            "sf_dir": d,
            "queries": names,
            "samples_ref": samples["ref"],
            "samples_cur": samples["cur"],
            "ratios": ratios,
            "median_ratio": med,
            "aa_samples_a": aa_samples["a"],
            "aa_samples_b": aa_samples["b"],
            "aa_ratios": aa_ratios,
            "aa_median_ratio": aa_med,
            "aa_band": aa_band,
            "errors": errors,
        }
        compact_tracks[label] = {
            "median_ratio": med,
            "n": len(ratios),
            "aa_median": aa_med,
            "aa_band": aa_band,
        }

    with open(here / "BENCH_PAIRED.json", "a") as f:
        f.write(json.dumps(record) + "\n")
    line = json.dumps(
        {
            "metric": "paired_bench",
            "ref_rev": rev,
            "ref_sha": ref_sha[:12],
            "tracks": compact_tracks,
        }
    )
    print(line)
    print(line)


_SF1_DIR_DEFAULT = "/tmp/scale_smoke_sf1"


def _ensure_sf1_corpus(spark, sf1_dir: str, src_dir: str) -> None:
    """Build (or reuse) the 10x key-offset replica corpus via
    ``tools.scale_smoke.build_corpus``. A stamp INSIDE the corpus dir
    records the source files' identity + replica count; any mismatch
    (regenerated testdata, changed build) forces a rebuild — and
    scale_smoke's own unconditional rebuilds drop the stamp, which
    simply re-arms this check."""
    import tools.scale_smoke as SM

    stamp_path = Path(sf1_dir) / "_BENCH_STAMP.json"
    src = sorted(
        (p.name, p.stat().st_size, p.stat().st_mtime_ns)
        for p in Path(src_dir).glob("*.parquet")
    )
    want = {"replicas": SM.REPLICAS, "src": [list(t) for t in src]}
    if stamp_path.exists():
        try:
            if json.loads(stamp_path.read_text()) == want:
                return
        except (ValueError, OSError):
            pass
    SM.SF1_DIR = sf1_dir  # build into the bench-designated dir
    SM.build_corpus(spark)
    stamp_path.write_text(json.dumps(want))


def _run_sf1_chunk() -> None:
    """Child-process body for the sf1 track: time this chunk's slice of
    the heaviest-queries list against the 10x corpus."""
    from ipeds_etl_spark import queries as q

    src_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1_dir = os.environ.get("BENCH_SF1_DIR", _SF1_DIR_DEFAULT)
    names = os.environ["BENCH_SF1_LIST"].split(",")
    idx = int(os.environ["BENCH_CHUNK_IDX"])
    total = int(os.environ["BENCH_CHUNK_TOTAL"])
    n_runs = int(os.environ.get("BENCH_SF1_RUNS", "2"))

    spark = _warm_session(src_dir)
    _ensure_sf1_corpus(spark, sf1_dir, src_dir)
    index_builds = _build_indexes(spark, sf1_dir)

    registered = q.queries()
    chunk = names[idx::total]
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in chunk:
        try:
            timings[name] = round(
                statistics.median(
                    _time_query(spark, registered[name], sf1_dir, n_runs)
                ),
                3,
            )
        except Exception as e:  # noqa: BLE001 - recorded, surfaced by parent
            errors[name] = str(e).split("\n")[0][:200]
    part = {
        "timings": timings,
        "index_builds": index_builds,
        "chunk": idx,
        "errors": errors,
    }
    Path(__file__).resolve().parent.joinpath(f"BENCH_SF1_PART_{idx}.json").write_text(
        json.dumps(part) + "\n"
    )


def _spawn_child(extra_env: dict[str, str]) -> None:
    import subprocess

    env = dict(os.environ, **extra_env)
    proc = subprocess.run(
        [sys.executable, str(Path(__file__).resolve())],
        env=env,
        capture_output=True,
        text=True,
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-4000:] + "\n" + proc.stderr[-8000:] + "\n")
        raise SystemExit(proc.returncode or 1)


def main() -> None:
    """Parent: run captured children, merge parts, print ONLY a compact
    summary line (twice: first and last stdout line).

    BENCH_r04..r06 lesson: the driver keeps a ~2000-char tail of
    stdout. Child-process capture (r6) removed Spark's noise, but the
    full summary with 220 per-query entries is ~8 KB and can never fit
    — so stdout carries a ~200-char compact line and the per-query map
    lives ONLY in BENCH_SUMMARY.json.
    """
    role = os.environ.get("BENCH_CHILD")
    if role == "chunk":
        _run_chunk()
        return
    if role == "isolate":
        _run_isolate()
        return
    if role == "sf1chunk":
        _run_sf1_chunk()
        return
    if role == "pairedchunk":
        _run_paired_chunk()
        return

    here = Path(__file__).resolve().parent

    if len(sys.argv) >= 2 and sys.argv[1] == "--paired":
        if len(sys.argv) < 3:
            print("usage: python bench.py --paired <git-rev>", file=sys.stderr)
            sys.exit(2)
        _paired_main(sys.argv[2])
        return

    if len(sys.argv) >= 2 and sys.argv[1] == "--isolate" and len(sys.argv) < 3:
        # a typo'd invocation must not silently fall through to the
        # full multi-chunk suite (ADVICE r7)
        print("usage: python bench.py --isolate <query_name>", file=sys.stderr)
        sys.exit(2)
    if len(sys.argv) >= 3 and sys.argv[1] == "--isolate":
        part_path = here / "BENCH_ISOLATE_PART.json"
        part_path.unlink(missing_ok=True)
        _spawn_child({"BENCH_CHILD": "isolate", "BENCH_ISOLATE": sys.argv[2]})
        line = part_path.read_text().strip()
        part_path.unlink()
        _append_isolate(here, line)
        print(line)
        return

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_chunks = max(1, int(os.environ.get("BENCH_CHUNKS", "4")))
    out_path = here / "BENCH_SUMMARY.json"
    # cumulative last-known sf0.1 medians (for sf1 ranking under
    # rotation) must be carried BEFORE the stale summary is dropped
    prior_known: dict[str, float] = {}
    if out_path.exists():
        try:
            prior = json.loads(out_path.read_text())
            prior_known = dict(prior.get("queries_known") or prior["queries"])
        except (ValueError, KeyError, OSError):
            prior_known = {}
    out_path.unlink(missing_ok=True)  # never serve a stale summary

    # --- sf0.1 rotation (VERDICT r11 item 6): the sf0.1 loop is
    # saturated by session constants, so each run times HEADLINE + this
    # round's registrations + 1/BENCH_ROTATE of the remaining registry,
    # advancing the slice each run via BENCH_ROTATION.json ---
    suite_all = _suite_list()
    rotate = max(1, int(os.environ.get("BENCH_ROTATE", "3")))
    try:
        run_cpus: int | None = int(os.environ.get("SPARK_GRAFT_CPUS", ""))
    except ValueError:
        run_cpus = None
    rotation_slice = None
    rotation_advanced = False
    if rotate > 1:
        state_path = here / "BENCH_ROTATION.json"
        rotation_slice, rotation_advanced = resolve_rotation(
            state_path, rotate, run_cpus, os.environ.get("BENCH_ROTATE_PIN")
        )
        suite_run = rotation_plan(
            suite_all,
            set(HEADLINE) | set(SF1_FORCE_INCLUDE),
            rotate,
            rotation_slice,
        )
        if rotation_advanced:
            state_path.write_text(
                json.dumps(
                    {
                        "slice": rotation_slice,
                        "rotate": rotate,
                        "cpus": run_cpus,
                        "at": time.strftime("%Y-%m-%dT%H:%M:%S"),
                    }
                )
                + "\n"
            )
    else:
        suite_run = suite_all

    parts = []
    for i in range(n_chunks):
        part_path = here / f"BENCH_PART_{i}.json"
        part_path.unlink(missing_ok=True)
        _spawn_child({"BENCH_CHILD": "chunk", "BENCH_CHUNK_IDX": str(i),
                      "BENCH_CHUNK_TOTAL": str(n_chunks),
                      "BENCH_SUITE_LIST": ",".join(suite_run)})
        parts.append(json.loads(part_path.read_text()))
        part_path.unlink()

    merged: dict[str, float] = {}
    errors: dict[str, str] = {}
    for p in parts:
        merged.update(p["timings"])
        errors.update(p.get("errors", {}))
    timings = {name: merged[name] for name in suite_run if name in merged}
    # last-known medians: prior rounds' values overlaid with this run's
    # (restricted to the current registry so renamed/removed queries age
    # out instead of haunting the sf1 ranking)
    queries_known = {
        n: v for n, v in {**prior_known, **timings}.items() if n in suite_all
    }
    for name, err in errors.items():
        sys.stderr.write(f"bench: {name} FAILED: {err}\n")
    # Per-index MEDIAN across chunks (VERDICT r7 item 4): each chunk
    # rebuilds the shared indexes cold, but identical builds showed a
    # 2.2x spread across chunks (JVM warm-up / page-cache context).
    # Billing chunk 0 made the billed number a lottery; the median of
    # the four independent cold builds is stable round-over-round.
    import statistics

    build_names = {n for p in parts for n in p["index_builds"]}
    index_builds = {
        n: round(
            statistics.median(
                p["index_builds"][n] for p in parts if n in p["index_builds"]
            ),
            3,
        )
        for n in sorted(build_names)
    }
    total = round(sum(timings.values()), 3)

    # --- auto-isolate the heaviest queries (VERDICT r8 item 5): solo
    # fresh-JVM medians recorded as data, so a hot driver box can be
    # adjudicated from BENCH_ISOLATE.json instead of argued ---
    top_heavy = sorted(timings, key=timings.get, reverse=True)[:AUTO_ISOLATE_TOP]
    isolates: dict[str, float] = {}
    for name in top_heavy:
        # fail-soft: the isolate record is supplementary — a broken
        # isolate must never cost the run its primary suite line
        try:
            part_path = here / "BENCH_ISOLATE_PART.json"
            part_path.unlink(missing_ok=True)
            _spawn_child(
                {
                    "BENCH_CHILD": "isolate",
                    "BENCH_ISOLATE": name,
                    "BENCH_ISOLATE_MODE": "auto-top5",
                }
            )
            line = part_path.read_text().strip()
            part_path.unlink()
            _append_isolate(here, line)
            isolates[name] = json.loads(line)["value"]
        except SystemExit:
            sys.stderr.write(f"bench: isolate {name} child failed; continuing\n")
        except Exception as e:  # noqa: BLE001
            sys.stderr.write(f"bench: isolate {name} failed: {e}\n")

    # --- sf1 track (VERDICT r8 item 3): re-time the heaviest queries
    # at the 10x corpus, where plan changes register above the session
    # constants that saturate sf0.1 ---
    sf1_timings: dict[str, float] = {}
    sf1_builds: dict[str, float] = {}
    sf1_on = os.environ.get("BENCH_SF1", "1") != "0" and _sf_of(sf_dir) == 0.1
    if sf1_on:
        # fail-soft like the isolates: the sf1 line is the second
        # billed metric, but losing it must not lose the first
        try:
            sf1_top = int(os.environ.get("BENCH_SF1_TOP", "60"))
            sf1_chunks = max(1, int(os.environ.get("BENCH_SF1_CHUNKS", "3")))
            # rank by the CUMULATIVE last-known medians — under
            # rotation this run's timings only cover ~1/3 of the
            # registry, which would otherwise skew the sf1 pick
            sf1_list = [
                n
                for n in sorted(
                    queries_known, key=queries_known.get, reverse=True
                )
                if n not in SF1_EXCLUDED
            ][:sf1_top]
            sf1_list += [
                n
                for n in SF1_FORCE_INCLUDE
                if n in queries_known and n not in sf1_list
            ]
            sf1_parts = []
            for i in range(sf1_chunks):
                part_path = here / f"BENCH_SF1_PART_{i}.json"
                part_path.unlink(missing_ok=True)
                _spawn_child(
                    {
                        "BENCH_CHILD": "sf1chunk",
                        "BENCH_SF1_LIST": ",".join(sf1_list),
                        "BENCH_CHUNK_IDX": str(i),
                        "BENCH_CHUNK_TOTAL": str(sf1_chunks),
                    }
                )
                sf1_parts.append(json.loads(part_path.read_text()))
                part_path.unlink()
            sf1_merged: dict[str, float] = {}
            for p in sf1_parts:
                sf1_merged.update(p["timings"])
                for name, err in p.get("errors", {}).items():
                    errors[f"sf1:{name}"] = err
                    sys.stderr.write(f"bench sf1: {name} FAILED: {err}\n")
            sf1_timings = {n: sf1_merged[n] for n in sf1_list if n in sf1_merged}
            sf1_build_names = {n for p in sf1_parts for n in p["index_builds"]}
            sf1_builds = {
                n: round(
                    statistics.median(
                        p["index_builds"][n]
                        for p in sf1_parts
                        if n in p["index_builds"]
                    ),
                    3,
                )
                for n in sorted(sf1_build_names)
            }
        except SystemExit:
            sys.stderr.write("bench: sf1 chunk child failed; continuing\n")
        except Exception as e:  # noqa: BLE001
            sys.stderr.write(f"bench: sf1 track failed: {e}\n")

    # --- sf1 auto-isolates (VERDICT r9 item 5): the sf1 line is the
    # scaling signal and shows the same same-code box-noise band as
    # sf0.1 (0.92-1.25x across r9's three generations); solo fresh-JVM
    # medians for its top-5 make that adjudicable from recorded data ---
    sf1_isolates: dict[str, float] = {}
    if sf1_timings:
        sf1_dir = os.environ.get("BENCH_SF1_DIR", _SF1_DIR_DEFAULT)
        for name in sorted(sf1_timings, key=sf1_timings.get, reverse=True)[
            :AUTO_ISOLATE_TOP
        ]:
            try:
                part_path = here / "BENCH_ISOLATE_PART.json"
                part_path.unlink(missing_ok=True)
                _spawn_child(
                    {
                        "BENCH_CHILD": "isolate",
                        "BENCH_ISOLATE": name,
                        "BENCH_ISOLATE_MODE": "auto-top5-sf1",
                        "SPARK_GRAFT_SF_DIR": sf1_dir,
                        # sample-count parity with the billed sf1 line
                        "BENCH_RUNS": os.environ.get("BENCH_SF1_RUNS", "2"),
                    }
                )
                line = part_path.read_text().strip()
                part_path.unlink()
                _append_isolate(here, line)
                sf1_isolates[name] = json.loads(line)["value"]
            except SystemExit:
                sys.stderr.write(
                    f"bench: sf1 isolate {name} child failed; continuing\n"
                )
            except Exception as e:  # noqa: BLE001
                sys.stderr.write(f"bench: sf1 isolate {name} failed: {e}\n")

    compact = {
        "metric": "suite_total_runtime",
        "value": total,
        "unit": "sec",
        "sf": _sf_of(sf_dir),
        "n_queries": len(timings),
        "index_build_total": round(sum(index_builds.values()), 3),
        # per-query fail-soft means errored queries silently SHRINK the
        # headline totals (ADVICE r9): a nonzero n_errors flags that
        # this run's totals are not comparable to a clean run's
        "n_errors": len(errors),
        # sf0.1 rotation slice of this run (None = full sweep)
        "rotation": f"{rotation_slice}/{rotate}" if rotate > 1 else None,
        # box calibration (see _cpu_probe/_spark_probe): fixed-workload
        # denominators for cross-session suite-total comparisons
        "calib_cpu_s": _cpu_probe(),
        "calib_scan_s": round(
            statistics.median(
                p["calibration_scan_agg"]
                for p in parts
                if "calibration_scan_agg" in p
            ),
            3,
        )
        if any("calibration_scan_agg" in p for p in parts)
        else None,
    }
    if sf1_timings:
        compact["sf1_total"] = round(sum(sf1_timings.values()), 3)
        compact["sf1_n_queries"] = len(sf1_timings)
    # Bounded per-query map on the line itself (VERDICT r13 item 2:
    # PERF round-over-round intersection needs per-query numbers in the
    # driver-parsed artifact; the r04 lesson caps the line size).
    # HEADLINE + force-includes lead — they are timed every run, so the
    # same names appear round after round regardless of rotation.
    line_priority = HEADLINE + sorted(SF1_FORCE_INCLUDE)
    compact["queries"] = compact_query_map(
        timings,
        line_priority,
        BENCH_LINE_BUDGET - len(json.dumps(compact)) - len(', "queries": '),
    )
    full = dict(
        compact,
        queries=timings,
        queries_known=queries_known,
        runs_per_query=int(os.environ.get("BENCH_RUNS", "3")),
        aggregation="median",
        n_chunks=n_chunks,
        index_builds=index_builds,
        index_builds_per_chunk={str(p["chunk"]): p["index_builds"] for p in parts},
        suite_criterion=SUITE_CRITERION,
        excluded=sorted(EXCLUDED),
        isolates_top5=isolates,
        isolates_top5_sf1=sf1_isolates,
        sf1_force_include=dict(SF1_FORCE_INCLUDE),
        queries_sf1=sf1_timings,
        index_builds_sf1=sf1_builds,
        sf1_runs_per_query=int(os.environ.get("BENCH_SF1_RUNS", "2")),
        sf1_criterion=SF1_CRITERION,
        sf1_excluded=dict(SF1_EXCLUDED),
        errors=errors,
    )
    out_path.write_text(json.dumps(full) + "\n")
    # Per-run per-query history (VERDICT r13 item 2): BENCH_SUMMARY.json
    # is overwritten each run, so round-over-round per-query
    # comparability needs an append-only record keyed by timestamp —
    # the judge/driver can intersect any two rounds' medians from here
    # even when the bounded stdout line could not carry every entry.
    with open(here / "BENCH_QUERIES.jsonl", "a") as f:
        f.write(
            json.dumps(
                {
                    "at": time.strftime("%Y-%m-%dT%H:%M:%S"),
                    "sf": _sf_of(sf_dir),
                    "cpus": run_cpus,
                    "rotation": compact["rotation"],
                    "rotation_advanced": rotation_advanced,
                    "n_errors": len(errors),
                    "queries": timings,
                    "queries_sf1": sf1_timings,
                    "index_builds": index_builds,
                    "index_builds_sf1": sf1_builds,
                }
            )
            + "\n"
        )

    line = json.dumps(compact)
    print(line)
    print(line)


if __name__ == "__main__":
    main()
