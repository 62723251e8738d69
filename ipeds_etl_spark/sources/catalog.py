"""Catalog introspection (≅ reference ``etl/db.py:107-132`` ping /
schema listing and the env-check notebook probes)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


def mask_credentials(url: str) -> str:
    """Hide user:password in a connection-style URL for logs
    (≅ reference env-check notebook ``mask``)."""
    return re.sub(r"://([^:/@]+)(:[^@]*)?@", "://\\1:***@", url)


def ping(spark: SparkSession) -> dict:
    """Liveness + identity probe (≅ reference ``ping()``)."""
    return {
        "version": spark.version,
        "app": spark.sparkContext.appName,
        "master": spark.sparkContext.master,
        "default_parallelism": spark.sparkContext.defaultParallelism,
    }


def list_namespaces(spark: SparkSession) -> list[str]:
    return [db.name for db in spark.catalog.listDatabases()]


def table_inventory(spark: SparkSession) -> DataFrame:
    """All tables/views visible in the current catalog, as a DataFrame."""
    rows = [
        (t.namespace[0] if t.namespace else None, t.name, t.tableType, t.isTemporary)
        for t in spark.catalog.listTables()
    ]
    return spark.createDataFrame(
        rows, "namespace string, name string, table_type string, is_temporary boolean"
    )
