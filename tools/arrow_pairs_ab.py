#!/usr/bin/env python
"""Prototype A/B (opt r14, guide §4.2): compute the fused in-bucket
pair verification in a ``mapInArrow`` stage with numpy doing the SAME
IEEE arithmetic, vs the current JVM higher-order-function fold.

Bit-parity argument: the JVM dot is products in index order left-folded
from 0.0 (each product rounded, each add rounded). The numpy spelling
``for d in range(64): C += M[:, d:d+1] * M[None, :, d]`` performs, per
cell, exactly the same sequence: one rounded multiply, one rounded add,
in the same index order (no FMA in numpy elementwise ops). The cosine
is then one rounded multiply (na*nb) and one rounded divide — same as
the JVM expression. float32 -> float64 casts are exact. So every
cos_sim double is bit-identical; the script ASSERTS that on the full
sf0.01 near-dup pair set before timing.

Timed workload: the emb_dup_threshold_sweep per-member stats at sf1
(floor 0.30) — current member-fold kernel vs the Arrow stage.

Usage: python tools/arrow_pairs_ab.py SF_SMALL SF_BIG [--runs N]
"""
from __future__ import annotations

import statistics
import sys
import time
from typing import Iterator

sys.path.insert(0, "/root/repo")

import numpy as np
import pyarrow as pa

from pyspark.sql import functions as F

SWEEP_T = [30, 35, 40, 45, 50]
FLOOR = 0.30


def member_stats_arrow(chunked_df, chunk: int):
    """(bucket, xs, __c) -> per-member sweep stats via mapInArrow."""
    out_schema = (
        "id long, "
        + ", ".join(f"pnp_{t} long" for t in SWEEP_T)
        + ", mc double"
    )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        ts = [float(t) / 100.0 for t in SWEEP_T]
        for batch in batches:
            xs = batch.column("xs")
            cs = batch.column("__c")
            ids_out = []
            cnts_out = [[] for _ in ts]
            mcs_out = []
            for r in range(batch.num_rows):
                members = xs[r].values  # StructArray
                ids = members.field("id").to_numpy(zero_copy_only=False)
                vecs = members.field("vec")
                n = len(ids)
                dim = len(vecs[0])
                M = (
                    vecs.flatten()
                    .to_numpy(zero_copy_only=False)
                    .astype(np.float64)
                    .reshape(n, dim)
                )
                nrm = members.field("nrm").to_numpy(zero_copy_only=False)
                c = cs[r].as_py()
                lo = c * chunk + 1  # first j (0-based sorted position)
                hi = min(lo + chunk - 1, n - 1)
                if hi < lo:
                    continue
                # C[i, jj] = dot(M[i], M[lo+jj]) in exact index order
                A = M[:hi]  # i ranges over 0..hi-1 (superset; masked below)
                B = M[lo : hi + 1]
                C = np.zeros((A.shape[0], B.shape[0]), dtype=np.float64)
                for d in range(dim):
                    C += A[:, d : d + 1] * B[None, :, d]
                N = nrm[:hi, None] * nrm[None, lo : hi + 1]
                cos = C / N
                # mask: only i < j contribute
                jidx = np.arange(lo, hi + 1)
                mask = np.arange(hi)[:, None] < jidx[None, :]
                for k, t in enumerate(ts):
                    cnts_out[k].extend(
                        ((cos >= t) & mask).sum(axis=0).tolist()
                    )
                mc = np.where(mask & (cos >= FLOOR), cos, -1.0).max(axis=0)
                mcs_out.extend(mc.tolist())
                ids_out.extend(ids[jidx].tolist())
            arrays = [pa.array(ids_out, pa.int64())]
            arrays += [pa.array(c_, pa.int64()) for c_ in cnts_out]
            arrays += [pa.array(mcs_out, pa.float64())]
            yield pa.RecordBatch.from_arrays(
                arrays,
                ["id"] + [f"pnp_{t}" for t in SWEEP_T] + ["mc"],
            )

    return chunked_df.mapInArrow(fn, out_schema)


def build_chunked(spark, sf_dir, chunk):
    from ipeds_etl_spark.operators import similarity as SIM
    from ipeds_etl_spark.operators.dedup import capped_bucket_arrays
    from ipeds_etl_spark.queries_ext import _ivf_codebook
    from ipeds_etl_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    assigned = SIM.assign_centroids(
        e, "vec_id", "embedding", None, cent_rows=_ivf_codebook(spark, sf_dir)
    )
    payload = F.struct(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("vec"),
        SIM.norm(F.col("embedding")).alias("nrm"),
    )
    grouped = capped_bucket_arrays(
        assigned.select("centroid_id", "vec_id", "embedding"),
        ["centroid_id"],
        payload,
        None,
    )
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32") or 32)
    n_chunks = F.floor((F.size("xs") - F.lit(2)) / F.lit(chunk)).cast("int")
    return grouped.select(
        "xs", F.explode(F.sequence(F.lit(0), n_chunks)).alias("__c")
    ).repartition(n_part)


def jvm_member_stats(spark, sf_dir):
    """The shipped member-fold spelling (registered sweep internals)."""
    from ipeds_etl_spark.operators import dedup as DD
    from ipeds_etl_spark.operators import similarity as SIM
    from ipeds_etl_spark.queries_ext import _ivf_codebook
    from ipeds_etl_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    assigned = SIM.assign_centroids(
        e, "vec_id", "embedding", None, cent_rows=_ivf_codebook(spark, sf_dir)
    )
    payload = F.struct(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("vec"),
        SIM.norm(F.col("embedding")).alias("nrm"),
    )
    zero = F.struct(
        *[F.lit(0).cast("long").alias(f"pnp_{t}") for t in SWEEP_T],
        F.lit(-1.0).alias("mc"),
    )

    def merge(acc, a, b):
        cos = SIM.dot(a["vec"], b["vec"]) / (a["nrm"] * b["nrm"])

        def upd(cs):
            fields = [
                (
                    acc[f"pnp_{t}"]
                    + F.when(cs >= F.lit(float(t)) / 100.0, 1).otherwise(0)
                ).alias(f"pnp_{t}")
                for t in SWEEP_T
            ]
            fields.append(
                F.greatest(
                    acc["mc"],
                    F.when(cs >= F.lit(FLOOR), cs).otherwise(F.lit(-1.0)),
                ).alias("mc")
            )
            return F.struct(*fields)

        return F.element_at(F.transform(F.array(cos), upd), 1)

    return DD.fused_member_folds_within_buckets(
        assigned.select("centroid_id", "vec_id", "embedding"),
        ["centroid_id"],
        payload,
        zero,
        merge,
        max_bucket_size=None,
    ).select(
        F.col("m.id").alias("id"),
        *[F.col(f"acc.pnp_{t}").alias(f"pnp_{t}") for t in SWEEP_T],
        F.col("acc.mc").alias("mc"),
    )


def main() -> int:
    sf_small, sf_big = sys.argv[1], sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    chunk = 128

    from ipeds_etl_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    # ---- bit-parity on the small SF ----
    jvm = {
        r["id"]: (r["mc"], *[r[f"pnp_{t}"] for t in SWEEP_T])
        for r in jvm_member_stats(spark, sf_small).collect()
    }
    arw = {
        r["id"]: (r["mc"], *[r[f"pnp_{t}"] for t in SWEEP_T])
        for r in member_stats_arrow(
            build_chunked(spark, sf_small, chunk), chunk
        ).collect()
    }
    assert jvm.keys() == arw.keys(), (len(jvm), len(arw))
    bad = [k for k in jvm if jvm[k] != arw[k]]
    assert not bad, [(k, jvm[k], arw[k]) for k in bad[:3]]
    print(f"bit-parity OK on {len(jvm)} members at {sf_small}", flush=True)

    # ---- timing ----
    t = {"jvm": [], "arrow": []}
    for r in range(runs):
        order = ("jvm", "arrow") if r % 2 == 0 else ("arrow", "jvm")
        for v in order:
            df = (
                jvm_member_stats(spark, sf_big)
                if v == "jvm"
                else member_stats_arrow(build_chunked(spark, sf_big, chunk), chunk)
            )
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t[v].append(time.perf_counter() - t0)
    for v, ts in t.items():
        if ts:
            print(
                f"{v}: median {statistics.median(ts):.2f}s "
                f"{[round(x, 2) for x in ts]}",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
