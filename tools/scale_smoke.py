#!/usr/bin/env python
"""Scale smoke for the ROUND-MULTIPLIED operators (VERDICT r3 item 3).

`dedup_components`, `dedup_components_star`, and `dedup_graph_stats`
are the only queries whose cost is multiplied by an iteration count, so
they are the ones where "fast at sf0.1" could hide "slow at sf1": if
the ROUND COUNT grew with corpus size, total cost would be
O(rounds × corpus) and the sf0.1 bench would extrapolate wrong.

This harness materializes an sf1-scale documents corpus (10× sf0.1) by
replicating the sf0.1 corpus with per-replica id offsets and a
per-replica text prefix. The prefix keeps replicas from colliding into
10×-hot LSH buckets, so the candidate-pair graph is ~10 disjoint copies
of the sf0.1 graph — exactly the shape a 10× real corpus with the same
duplication rate would have. Cluster DIAMETER (what label-propagation
rounds follow) and the star O(log² n) bound are both corpus-size-free
for this graph family, so the expectation is: same rounds, ~linear
time. The smoke measures both and fails loudly if rounds grew.

Writes the corpus under /tmp (NOT /root/testdata — that dir is
read-only driver property) and prints one JSON line for SCALE.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from ipeds_etl_spark.operators import dedup as DD  # noqa: E402
from ipeds_etl_spark.operators.components import (  # noqa: E402
    connected_components,
    connected_components_star,
    graph_stats,
)
from ipeds_etl_spark.session import get_spark  # noqa: E402
from ipeds_etl_spark.sources.tables import load_table  # noqa: E402

REPLICAS = 10
CORPUS = "/tmp/scale_smoke_sf1_documents.parquet"


def build_corpus(spark) -> None:
    if Path(CORPUS).exists():
        shutil.rmtree(CORPUS)
    d = load_table(spark, "/root/testdata/sf0.1", "documents").select("doc_id", "text")
    replicas = [
        d.select(
            (F.col("doc_id") + F.lit(r * 10_000_000)).alias("doc_id"),
            F.concat(F.lit(f"replica{r} "), F.col("text")).alias("text"),
        )
        for r in range(REPLICAS)
    ]
    out = replicas[0]
    for rep in replicas[1:]:
        out = out.unionByName(rep)
    # 32 files so the scan starts wide (the point is operator scaling,
    # not the single-row-group scan degeneracy measured elsewhere)
    out.repartition(32).write.parquet(CORPUS)


def main() -> None:
    spark = get_spark("scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    build_corpus(spark)
    docs = spark.read.parquet(CORPUS)
    n_docs = docs.count()

    t0 = time.perf_counter()
    pairs = DD.lsh_candidate_pairs(docs, "text", "doc_id").localCheckpoint()
    n_pairs = pairs.count()
    t_pairs = time.perf_counter() - t0

    results: dict = {"n_docs": n_docs, "n_pairs": n_pairs, "pairs_sec": round(t_pairs, 2)}

    st: dict = {}
    t0 = time.perf_counter()
    connected_components(pairs, stats=st).write.format("noop").mode("overwrite").save()
    results["label"] = {"sec": round(time.perf_counter() - t0, 2), "rounds": st["rounds"]}

    st = {}
    t0 = time.perf_counter()
    connected_components_star(pairs, stats=st).write.format("noop").mode(
        "overwrite"
    ).save()
    results["star"] = {"sec": round(time.perf_counter() - t0, 2), "rounds": st["rounds"]}

    t0 = time.perf_counter()
    graph_stats(pairs).write.format("noop").mode("overwrite").save()
    results["graph_stats_sec"] = round(time.perf_counter() - t0, 2)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
