"""Streaming raw→core convergence: incremental merges == batch load."""

from __future__ import annotations

from ipeds_etl_spark.sources import raw as raw_io
from ipeds_etl_spark.streaming.incremental_load import incremental_core_load

PAGES_T1 = [
    [{"unitid": 1, "year": 2022, "inst_name": "Alpha U", "sector": 1}],
    [{"unitid": 2, "year": 2022, "inst_name": "Beta C", "sector": -1}],
]
PAGES_T2 = [
    # revision of unitid 2 + a new institution
    [{"unitid": 2, "year": 2022, "inst_name": "Beta College", "sector": 2},
     {"unitid": 3, "year": 2022, "instnm": "Gamma I", "stabbr": "WA"}],
]


def _land(spark, raw_path, year, page_lists, first_page):
    import json

    rows = []
    for i, recs in enumerate(page_lists, start=first_page):
        payload = json.dumps(recs, sort_keys=True, separators=(",", ":"))
        rows.append((year, i, f"test://p{i}", None, None, len(recs), payload))
    df = spark.createDataFrame(
        rows,
        "year int, page_number int, source_url string, source_hash string, "
        "ingested_at timestamp, record_count int, payload string",
    )
    from pyspark.sql import functions as F

    (
        df.withColumn("source_hash", F.sha2("payload", 256))
        .withColumn("ingested_at", F.current_timestamp())
        .write.mode("append")
        .partitionBy("year")
        .parquet(raw_path)
    )


def test_streaming_core_converges(spark, tmp_path):
    raw_path = str(tmp_path / "raw")
    core_path = str(tmp_path / "core")
    ckpt = str(tmp_path / "ckpt")

    # T1: two pages land; catch-up run merges them
    _land(spark, raw_path, 2022, PAGES_T1, first_page=1)
    q = incremental_core_load(spark, "directory", raw_path, core_path, ckpt)
    q.awaitTermination()
    core = {r["unitid"]: r for r in spark.read.parquet(core_path).collect()}
    assert set(core) == {1, 2}
    assert core[2]["sector"] is None  # sentinel cleaned

    # T2: a later page revises unitid 2 and adds 3; only the new file
    # is processed (checkpointed offsets), merge converges
    _land(spark, raw_path, 2022, PAGES_T2, first_page=3)
    q = incremental_core_load(spark, "directory", raw_path, core_path, ckpt)
    q.awaitTermination()
    core = {r["unitid"]: r for r in spark.read.parquet(core_path).collect()}
    assert set(core) == {1, 2, 3}
    assert core[2]["inst_name"] == "Beta College" and core[2]["sector"] == 2
    assert core[3]["inst_name"] == "Gamma I" and core[3]["state_abbr"] == "WA"
    assert core[1]["inst_name"] == "Alpha U"  # untouched row survives
