"""Z-order layout: per-file min-max rectangles must localize BOTH key
columns, where a single-column sort localizes only one — the property
parquet data skipping actually uses."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest

from ipeds_etl_spark.operators.layout import z_value, zorder_write
from ipeds_etl_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def _file_ranges(path: str, col_a: str, col_b: str):
    spans = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.read_metadata(f)
        lo_a = hi_a = lo_b = hi_b = None
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                name = c.path_in_schema
                st = c.statistics
                if st is None:
                    continue
                if name == col_a:
                    lo_a = st.min if lo_a is None else min(lo_a, st.min)
                    hi_a = st.max if hi_a is None else max(hi_a, st.max)
                elif name == col_b:
                    lo_b = st.min if lo_b is None else min(lo_b, st.min)
                    hi_b = st.max if hi_b is None else max(hi_b, st.max)
        if lo_a is not None and lo_b is not None:
            spans.append(((hi_a - lo_a), (hi_b - lo_b)))
    return spans


def _avg_norm_span(spans, idx, full):
    vals = [s[idx] / full for s in spans]
    return sum(vals) / len(vals)


def test_zorder_localizes_both_dimensions(spark, tmp_path):
    li = load_table(spark, SF, "lineitem").select("l_partkey", "l_suppkey")
    stats = li.agg(
        {"l_partkey": "max", "l_suppkey": "max"}
    ).first()
    full_a, full_b = stats["max(l_partkey)"], stats["max(l_suppkey)"]

    z_path = str(tmp_path / "zorder")
    naive_path = str(tmp_path / "naive")
    zorder_write(li, "l_partkey", "l_suppkey", z_path, n_files=16)
    (
        li.repartitionByRange(16, "l_partkey")
        .write.mode("overwrite")
        .parquet(naive_path)
    )

    z_spans = _file_ranges(z_path, "l_partkey", "l_suppkey")
    n_spans = _file_ranges(naive_path, "l_partkey", "l_suppkey")
    assert len(z_spans) >= 8 and len(n_spans) >= 8

    # naive-by-a: a localized, b spans ~everything
    assert _avg_norm_span(n_spans, 0, full_a) < 0.2
    assert _avg_norm_span(n_spans, 1, full_b) > 0.8
    # z-order: BOTH dimensions localized (≈ sqrt(1/files) rectangles)
    assert _avg_norm_span(z_spans, 0, full_a) < 0.5
    assert _avg_norm_span(z_spans, 1, full_b) < 0.5


def test_z_value_is_monotone_in_rectangles(spark):
    """Morton codes of quadrants order correctly: all z values of the
    low/low quadrant are below the high/high quadrant's."""
    from pyspark.sql import functions as F

    df = spark.range(0, 256).select(
        (F.col("id") % 16).alias("a"), (F.col("id") / 16).cast("long").alias("b")
    )
    rows = df.select("a", "b", z_value(F.col("a"), F.col("b")).alias("z")).collect()
    lowlow = [r["z"] for r in rows if r["a"] < 8 and r["b"] < 8]
    highhigh = [r["z"] for r in rows if r["a"] >= 8 and r["b"] >= 8]
    assert max(lowlow) < min(highhigh)
    # bijectivity on the 16x16 grid
    assert len({r["z"] for r in rows}) == 256
