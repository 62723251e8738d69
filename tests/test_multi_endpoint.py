"""Multi-endpoint pipeline: directory + admissions loaded through the
same registry-driven path, then the reference's documented serving
views built over the cores (reference ``architecture.md:53-55`` —
``admissions_enriched``, ``yearly_kpis``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ipeds_etl_spark import pipeline
from ipeds_etl_spark.plans.views import enrich_join


DIR_PAGES = [
    [
        {"unitid": 1, "year": 2022, "inst_name": "Alpha U", "state_abbr": "OR", "sector": 1},
        {"unitid": 2, "year": 2022, "inst_name": "Beta C", "state_abbr": "CA", "sector": 2},
    ]
]
ADM_PAGES = [
    [
        {"unitid": 1, "year": 2022, "applied": 1000, "admitted": 400, "enrolled": 200},
        {"unitid": 2, "year": 2022, "applied": "500", "admitted": "-1", "enrolled": 50},
        # unknown institution (no directory row) — left join keeps it
        {"unitid": 9, "year": 2022, "applied": 10, "admitted": 5, "enrolled": 1},
    ]
]


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh"))
    pipeline.run_load(spark, "directory", 2022, DIR_PAGES, wh)
    pipeline.run_load(spark, "admissions", 2022, ADM_PAGES, wh)
    return wh


def test_admissions_core_typed_and_cleaned(spark, warehouse):
    adm = {r["unitid"]: r for r in spark.read.parquet(f"{warehouse}/core/admissions").collect()}
    assert adm[1]["applied"] == 1000
    assert adm[2]["applied"] == 500       # string -> int
    assert adm[2]["admitted"] is None     # sentinel "-1" -> NULL
    assert set(adm) == {1, 2, 9}


def test_admissions_enriched_view(spark, warehouse):
    adm = spark.read.parquet(f"{warehouse}/core/admissions")
    d = spark.read.parquet(f"{warehouse}/core/directory").select(
        "unitid", "year", "inst_name", "state_abbr", "sector"
    )
    enriched = enrich_join(adm, d, on=["unitid", "year"])
    rows = {r["unitid"]: r for r in enriched.collect()}
    assert rows[1]["inst_name"] == "Alpha U" and rows[1]["state_abbr"] == "OR"
    assert rows[9]["inst_name"] is None  # left join preserves orphan facts
    assert enriched.count() == 3


def test_yearly_kpis_from_admissions(spark, warehouse):
    adm = spark.read.parquet(f"{warehouse}/core/admissions")
    kpis = adm.groupBy("year").agg(
        (F.sum("admitted").cast("double") / F.sum("applied")).alias("accept_rate"),
        (F.sum("enrolled").cast("double") / F.sum("admitted")).alias("yield_rate"),
        F.sum("applied").alias("total_applied"),
    )
    [r] = kpis.collect()
    # admitted: 400 + NULL + 5 = 405; applied: 1000+500+10 = 1510
    assert r["total_applied"] == 1510
    assert abs(r["accept_rate"] - 405 / 1510) < 1e-12
    assert abs(r["yield_rate"] - 251 / 405) < 1e-12


COMP_PAGES = [
    [
        {"unitid": 1, "year": 2022, "cipcode": "11.0701", "award_level": 5, "completions": 120},
        {"unitid": 1, "year": 2022, "cipcode": "14.0901", "award_level": 5, "completions": 45},
        {"unitid": 2, "year": 2022, "cipcode": "11.0701", "award_level": 7, "completions": 30},
    ]
]


def test_completions_by_cip_view(spark, warehouse):
    """Reference architecture.md:54 — program facts ⋈ tiny CIP-title
    dim (broadcast), rolled up by title. 4-part composite PK endpoint."""
    from ipeds_etl_spark.plans.views import dim_lookup

    pipeline.run_load(spark, "completions", 2022, COMP_PAGES, wh := warehouse)
    comp = spark.read.parquet(f"{wh}/core/completions")
    assert comp.count() == 3  # composite PK (unitid,year,cipcode,award_level)

    cip_dim = spark.createDataFrame(
        [("11.0701", "Computer Science"), ("14.0901", "Computer Engineering")],
        "cipcode string, cip_title string",
    )
    by_cip = (
        dim_lookup(comp, cip_dim, code_col="cipcode", label_cols=["cip_title"])
        .groupBy("cip_title")
        .agg(F.sum("completions").alias("total"))
    )
    out = {r["cip_title"]: r["total"] for r in by_cip.collect()}
    assert out["Computer Science"] == 150
    assert out["Computer Engineering"] == 45


def test_gold_rebuild_generalizes_to_admissions(spark, warehouse):
    out = pipeline.rebuild_gold(spark, "admissions", warehouse)
    assert out["institutions_latest"] == 3  # one latest row per unitid
    counts = spark.read.parquet(f"{warehouse}/vw/admissions_yearly_counts")
    assert "state_abbr" not in counts.columns  # no geography on admissions
    [r] = counts.collect()
    assert (r["year"], r["n_rows"]) == (2022, 3)


def test_lineage_tracks_both_endpoints(spark, warehouse):
    log = spark.read.parquet(f"{warehouse}/meta/load_log")
    by_ep = {r["endpoint"]: r for r in log.collect()}
    assert by_ep["directory"]["rows_inserted"] == 2
    assert by_ep["admissions"]["rows_inserted"] == 3


def test_write_core_txn_backend(spark, tmp_path):
    """Opt-in transactional core writes: same merge semantics, manifest
    layout, readable via txn.read_table."""
    from ipeds_etl_spark.operators import txn
    from ipeds_etl_spark.plans.core_pipeline import write_core

    core = str(tmp_path / "core_txn")
    rows = [
        {"unitid": "1", "year": "2020", "instnm": "Alpha U", "stabbr": "CA"},
        {"unitid": "2", "year": "2020", "instnm": "Beta C", "stabbr": "NY"},
    ]
    recs = spark.createDataFrame(
        [(2020, 1, r) for r in rows],
        "page_year int, page_number int, rec map<string,string>",
    )
    from ipeds_etl_spark.plans.core_pipeline import map_records

    mapped = map_records("directory", recs)
    write_core(spark, "directory", mapped, core, backend="txn")
    # re-run: idempotent under the txn backend too
    write_core(spark, "directory", mapped, core, backend="txn")
    out = txn.read_table(spark, core)
    got = {r["unitid"]: r["inst_name"] for r in out.collect()}
    assert got == {1: "Alpha U", 2: "Beta C"}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        write_core(spark, "directory", mapped, core, backend="bogus")


# ---------------------------------------------------------------------------
# SURVEY §3 E3 over a FILE-DECLARED endpoint (VERDICT r7 item 5): the
# flatten-in-engine vs flatten-in-driver symmetry must hold for an
# endpoint the registry has never seen in code — declared only via
# ``registry.load_endpoints_config`` (the reference's doc-only
# ``config/endpoints.yaml`` path, README.md:46-55) — proving the
# registry compiler (mapper_select_stages and friends) is truly
# endpoint-generic, not specialized to the built-ins.
# ---------------------------------------------------------------------------

GRAD_CONFIG = {
    "graduation": {
        "path": "ipeds/grad-rates/{year}/",
        "pk": ["unitid", "year"],
        "fields": [
            "unitid:i",
            "year:i",
            "cohort_size:i:cohort|grcohort",
            "completers_150:i",
            "grad_rate:d",
            "notes:s",
        ],
    }
}

GRAD_PAGES = [
    [
        # alias fallback (grcohort), whitespace strip, plain values
        {"unitid": 1, "year": 2022, "grcohort": "850",
         "completers_150": 510, "grad_rate": "0.6", "notes": "  ok  "},
        # year MISSING -> backfilled from the page row (E3's explicit
        # edge, reference etl/core_io.py:87-89); sentinels -> NULL;
        # malformed double -> NULL; empty string -> NULL
        {"unitid": 2, "cohort": "-2", "completers_150": "-1",
         "grad_rate": "bad", "notes": ""},
    ],
    [
        {"unitid": 3, "year": 2022, "cohort": "430",
         "completers_150": "120", "grad_rate": "0.279"},
    ],
]


def test_config_endpoint_flatten_symmetry(spark, tmp_path):
    import json as _json

    from ipeds_etl_spark import registry
    from ipeds_etl_spark.plans.core_pipeline import map_records

    cfg = tmp_path / "endpoints.json"
    cfg.write_text(_json.dumps(GRAD_CONFIG))
    # registration inside the try: if any assert below fails, the
    # finally still unregisters, keeping the global registry pristine
    # for later tests in the same session (ADVICE r8)
    try:
        loaded = registry.load_endpoints_config(str(cfg))
        assert set(loaded) == {"graduation"}
        assert "graduation" in registry.list_endpoints()
        # --- flatten-in-engine: raw pages -> explode payload JSON ->
        # registry mapper -> core table (the E2/pipeline path) ---
        wh = str(tmp_path / "wh")
        metrics = pipeline.run_load(spark, "graduation", 2022, GRAD_PAGES, wh)
        assert metrics["rows_inserted"] == 3
        engine_core = spark.read.parquet(f"{wh}/core/graduation")

        # --- flatten-in-driver: expand the SAME page lists in Python
        # on the driver (the reference notebook's lateral-unnest twin,
        # 20_load_core_directory.ipynb:226-230), stringify values the
        # way the JSON payload round-trip does, then apply the SAME
        # registry contract ---
        recs = [
            ({k: None if v is None else str(v) for k, v in rec.items()}, 2022)
            for page in GRAD_PAGES
            for rec in page
        ]
        driver_df = spark.createDataFrame(
            recs, "rec map<string,string>, page_year int"
        )
        driver_core = map_records("graduation", driver_df).filter(
            F.col("unitid").isNotNull()
        )

        # partitionBy("year") moves year to the end on read-back; the
        # symmetry contract is same columns + same types + same rows,
        # independent of that physical ordering
        assert {f.name: f.dataType for f in engine_core.schema.fields} == {
            f.name: f.dataType for f in driver_core.schema.fields
        }
        engine_core = engine_core.select(*driver_core.columns)
        assert engine_core.exceptAll(driver_core).count() == 0
        assert driver_core.exceptAll(engine_core).count() == 0

        # semantics spot-checks (same on both paths by the above)
        rows = {r["unitid"]: r for r in engine_core.collect()}
        assert rows[1]["cohort_size"] == 850          # alias grcohort
        assert rows[1]["notes"] == "ok"               # whitespace strip
        assert rows[2]["year"] == 2022                # page-year backfill
        assert rows[2]["cohort_size"] is None         # sentinel -2
        assert rows[2]["completers_150"] is None      # sentinel -1
        assert rows[2]["grad_rate"] is None           # malformed double
        assert rows[2]["notes"] is None               # empty string
        assert rows[3]["grad_rate"] == 0.279
    finally:
        registry.REGISTRY.pop("graduation", None)     # keep registry pristine
