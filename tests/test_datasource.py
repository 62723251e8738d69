"""Spark 4 Python DataSource: distributed paginated ingest (fixture mode)."""

from __future__ import annotations

import json

import pytest

from ipeds_etl_spark.sources.datasource import PaginatedJsonDataSource


@pytest.fixture(scope="module")
def fixture_api(tmp_path_factory):
    root = tmp_path_factory.mktemp("api")
    for year, n_pages in ((2019, 2), (2020, 3), (2021, 1)):
        d = root / str(year)
        d.mkdir()
        for p in range(1, n_pages + 1):
            body = {
                "results": [
                    {"unitid": 100 * year + 10 * p + i, "year": year} for i in range(3)
                ],
                "next": f"?page={p + 1}" if p < n_pages else None,
            }
            (d / f"page{p}.json").write_text(json.dumps(body))
    return str(root)


def test_partition_per_year_read(spark, fixture_api):
    spark.dataSource.register(PaginatedJsonDataSource)
    df = (
        spark.read.format("paginated_json")
        .option("base_url", f"file://{fixture_api}")
        .option("year_start", "2019")
        .option("year_end", "2021")
        .load()
    )
    rows = df.collect()
    # 2+3+1 pages, 3 records each
    assert len(rows) == 6
    by_year = {}
    for r in rows:
        by_year.setdefault(r["year"], []).append(r)
        assert r["record_count"] == 3
        assert json.loads(r["payload"])[0]["year"] == r["year"]
    assert {y: len(v) for y, v in by_year.items()} == {2019: 2, 2020: 3, 2021: 1}
    # parallelism contract: one input partition per year
    assert df.rdd.getNumPartitions() == 3


def test_datasource_feeds_raw_layer(spark, fixture_api, tmp_path):
    from pyspark.sql import functions as F

    from ipeds_etl_spark.sources import raw as raw_io

    spark.dataSource.register(PaginatedJsonDataSource)
    pages = (
        spark.read.format("paginated_json")
        .option("base_url", f"file://{fixture_api}")
        .option("year_start", "2019")
        .option("year_end", "2020")
        .load()
        .select(
            "year",
            "page_number",
            "source_url",
            F.sha2("payload", 256).alias("source_hash"),
            F.current_timestamp().alias("ingested_at"),
            "record_count",
            "payload",
        )
    )
    raw_path = str(tmp_path / "raw")
    raw_io.write_pages(spark, pages, raw_path)
    back = raw_io.scan_records(raw_io.scan_pages(spark, raw_path))
    assert back.count() == (2 + 3) * 3


def test_stream_reader_delivers_every_page_exactly_once(spark, fixture_api, tmp_path):
    """readStream over the paginated source: all 6 pages arrive across
    microbatches with no duplicates, in offset order, and the batch
    read of the same fixture is reproduced exactly."""
    spark.dataSource.register(PaginatedJsonDataSource)
    stream = (
        spark.readStream.format("paginated_json")
        .option("base_url", f"file://{fixture_api}")
        .option("year_start", "2019")
        .option("year_end", "2021")
        .load()
    )
    (
        stream.writeStream.format("memory")
        .queryName("pages_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = [
        (r["year"], r["page_number"], r["record_count"])
        for r in spark.sql(
            "SELECT * FROM pages_stream ORDER BY year, page_number"
        ).collect()
    ]
    want = [
        (r["year"], r["page_number"], r["record_count"])
        for r in spark.read.format("paginated_json")
        .option("base_url", f"file://{fixture_api}")
        .option("year_start", "2019")
        .option("year_end", "2021")
        .load()
        .orderBy("year", "page_number")
        .collect()
    ]
    assert got == want and len(got) == 6


def test_stream_reader_resumes_from_checkpoint(spark, fixture_api, tmp_path):
    """Restarting against the same checkpoint re-reads NOTHING (the
    offset dict advanced past every page)."""
    spark.dataSource.register(PaginatedJsonDataSource)
    out = str(tmp_path / "pages_out")

    def run():
        (
            spark.readStream.format("paginated_json")
            .option("base_url", f"file://{fixture_api}")
            .option("year_start", "2019")
            .option("year_end", "2021")
            .load()
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    run()
    assert spark.read.parquet(out).count() == 6
    run()
    # second run resumes from the committed offset: nothing re-read,
    # nothing duplicated in the sink
    assert spark.read.parquet(out).count() == 6
