"""Incremental medallion: stream raw pages into the typed core table.

The batch pipeline (``plans/core_pipeline.py``) reloads whole years;
this job consumes newly-landed raw page files as a stream and merges
each micro-batch into core with the same PK-keyed upsert — so the core
table converges to exactly the batch result, incrementally.

Why ``foreachBatch``: the merge is not an append (it rewrites rows on
PK conflict), which no streaming sink expresses natively — per
micro-batch we drop to the batch merge operator, the standard Spark
pattern for streaming MERGE. Each micro-batch costs one merge bounded
to the years it touches (staged partition swap), so steady-state work
is proportional to the arriving data, not the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ipeds_etl_spark import registry
from ipeds_etl_spark.plans.core_pipeline import map_records, write_core
from ipeds_etl_spark.sources import raw as raw_io


def stream_raw_pages(spark: SparkSession, raw_path: str) -> DataFrame:
    """Raw page dir as an append stream (new files = new pages)."""
    return spark.readStream.schema(raw_io.RAW_SCHEMA).parquet(raw_path)


def incremental_core_load(
    spark: SparkSession,
    endpoint: str,
    raw_path: str,
    core_path: str,
    checkpoint: str,
):
    """Start the raw→core incremental job; returns the StreamingQuery.
    Use ``trigger(availableNow=True)`` semantics: the caller awaits
    termination for catch-up runs, or leaves it running for tail."""
    pages = stream_raw_pages(spark, raw_path)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        ep = registry.get_endpoint(endpoint)
        mapped = map_records(endpoint, raw_io.scan_records(batch_df))
        mapped = mapped.filter(mapped[ep.pk[0]].isNotNull())
        write_core(spark, endpoint, mapped, core_path)

    return (
        pages.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
