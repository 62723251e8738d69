"""Bucketed co-located joins: same results, zero join shuffles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ipeds_etl_spark.operators.bucketing import (
    exchange_count,
    read_table,
    write_bucketed,
)
from ipeds_etl_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(orders, "orders_b", str(root / "orders"), ["o_orderkey"], 8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        str(root / "lineitem"),
        ["o_orderkey"],
        8,
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_is_shuffle_free(bucketed):
    spark = bucketed
    # disable AQE broadcast demotion noise: plain plan inspection
    joined = read_table(spark, "orders_b").join(
        read_table(spark, "lineitem_b").hint("merge"), "o_orderkey"
    )
    assert exchange_count(joined) == 0  # co-located: scan is pre-hashed


def test_bucketed_join_matches_plain(bucketed):
    spark = bucketed
    plain = (
        load_table(spark, SF, "orders")
        .join(
            load_table(spark, SF, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey"),
            "o_orderkey",
        )
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    )
    bucked = (
        read_table(spark, "orders_b")
        .join(read_table(spark, "lineitem_b"), "o_orderkey")
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    )
    p = {r["o_orderkey"]: (r["n"], r["q"]) for r in plain.collect()}
    b = {r["o_orderkey"]: (r["n"], r["q"]) for r in bucked.collect()}
    assert p == b and len(p) > 0


def test_bucketed_agg_skips_shuffle(bucketed):
    spark = bucketed
    agg = read_table(spark, "lineitem_b").groupBy("o_orderkey").agg(
        F.sum("l_quantity").alias("q")
    )
    assert exchange_count(agg) == 0


def test_load_table_parallelism_floor_is_conditional(spark, tmp_path):
    """The scan-widening floor only fires on degenerate (narrower-than-
    requested) scans: an already-wide input keeps its partitioning, so
    on a real multi-split table the floor is a no-op and adds no
    exchange."""
    from ipeds_etl_spark.sources.tables import load_table

    import pyspark.sql.functions as F

    p = str(tmp_path / "docs.parquet")
    spark.range(1000).select(
        F.col("id").alias("doc_id"), F.lit("x y z").alias("text")
    ).repartition(8).write.parquet(p)
    sf_dir = str(tmp_path)
    wide = load_table(spark, sf_dir, "docs", min_partitions=4)
    assert "Exchange" not in wide._jdf.queryExecution().executedPlan().toString()
    floored = load_table(spark, sf_dir, "docs", min_partitions=64)
    assert floored.rdd.getNumPartitions() == 64
