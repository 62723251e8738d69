"""Catalog introspection (S8) + credential masking (P15)."""

from __future__ import annotations

from ipeds_etl_spark.sources import catalog
from ipeds_etl_spark.sources.tables import register_views


def test_ping(spark):
    info = catalog.ping(spark)
    assert info["version"].startswith("4.")
    assert info["default_parallelism"] >= 1


def test_table_inventory_sees_registered_views(spark):
    register_views(spark, "/root/testdata/sf0.001", ("region", "nation"))
    inv = catalog.table_inventory(spark)
    names = {r["name"] for r in inv.collect()}
    assert {"region", "nation"}.issubset(names)
    assert "default" in catalog.list_namespaces(spark)


def test_mask_credentials():
    assert (
        catalog.mask_credentials("postgresql://bob:hunter2@db:5432/ipeds")
        == "postgresql://bob:***@db:5432/ipeds"
    )
    assert catalog.mask_credentials("https://api.example/v1") == "https://api.example/v1"
    assert catalog.mask_credentials("s3://key@bucket/x") == "s3://key:***@bucket/x"
