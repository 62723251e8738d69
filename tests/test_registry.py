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
