"""Sources & sinks: testdata table loader, raw page layer, HTTP ingest, catalog."""

from ipeds_etl_spark.sources.tables import load_table

__all__ = ["load_table"]
