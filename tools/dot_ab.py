#!/usr/bin/env python
"""A/B the per-pair dot-product spelling inside the fused in-bucket
verify (opt r14, guide §1.4 in-process A/B): zip_with+aggregate (an
intermediate product array per pair) vs an index fold over a
CONSTANT-FOLDED ``sequence(1, dim)`` literal (two element_at lookups
per term, no per-pair allocation). Same IEEE op order — products in
index order, left-fold adds from 0.0 — so the cosine doubles are
bit-identical by construction; the script verifies that on the full
sf0.01 pair set before timing.

Usage: python tools/dot_ab.py SF_DIR_SMALL SF_DIR_BIG [--runs N]
"""
from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def main() -> int:
    sf_small, sf_big = sys.argv[1], sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    from ipeds_etl_spark.session import get_spark
    from ipeds_etl_spark.operators import similarity as SIM
    from ipeds_etl_spark.operators import dedup as DD
    from ipeds_etl_spark.sources.tables import load_table

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    def dot_idx(a: Column, b: Column, dim: int) -> Column:
        idx = F.sequence(F.lit(1), F.lit(dim))
        return F.aggregate(
            idx,
            F.lit(0.0),
            lambda acc, i: acc
            + F.element_at(a, i).cast("double")
            * F.element_at(b, i).cast("double"),
        )

    def hits_frame(sf_dir: str, spelling: str):
        from ipeds_etl_spark.queries_ext import _emb_count, _ivf_codebook

        e = load_table(spark, sf_dir, "embeddings")
        cent_rows = _ivf_codebook(spark, sf_dir)
        assigned = SIM.assign_centroids(
            e, "vec_id", "embedding", None, cent_rows=cent_rows
        )
        payload = F.struct(
            F.col("vec_id").alias("id"),
            F.col("embedding").alias("vec"),
            SIM.norm(F.col("embedding")).alias("nrm"),
        )
        d = (
            (lambda a, b: SIM.dot(a, b))
            if spelling == "zip"
            else (lambda a, b: dot_idx(a, b, 64))
        )
        hits = DD.fused_pair_hits_within_buckets(
            assigned.select("centroid_id", "vec_id", "embedding"),
            ["centroid_id"],
            payload,
            pair_hit=lambda a, b: F.struct(
                a["id"].alias("id_a"),
                b["id"].alias("id_b"),
                (d(a["vec"], b["vec"]) / (a["nrm"] * b["nrm"])).alias("cos_sim"),
            ),
            keep=lambda h: h["cos_sim"] >= 0.30,
        )
        return hits.select("h.id_a", "h.id_b", "h.cos_sim")

    # ---- bit-identity on the small SF ----
    za = {(r[0], r[1]): r[2] for r in hits_frame(sf_small, "zip").collect()}
    ia = {(r[0], r[1]): r[2] for r in hits_frame(sf_small, "idx").collect()}
    assert za.keys() == ia.keys(), (len(za), len(ia))
    diffs = [k for k in za if za[k] != ia[k]]
    assert not diffs, diffs[:5]
    print(f"bit-identity OK on {len(za)} pairs at {sf_small}", flush=True)

    # ---- timing on the big SF, interleaved ABAB ----
    timings: dict[str, list[float]] = {"zip": [], "idx": []}
    for r in range(runs):
        for sp in ("zip", "idx") if r % 2 == 0 else ("idx", "zip"):
            df = hits_frame(sf_big, sp)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            timings[sp].append(time.perf_counter() - t0)
    for sp, ts in timings.items():
        print(
            f"{sp}: median {statistics.median(ts):.2f}s "
            f"{[round(t, 2) for t in ts]}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
