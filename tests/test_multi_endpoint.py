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
