"""Similarity search over embedding columns (``array<float>``).

Kernels are pure Column expressions (``zip_with`` + ``aggregate`` —
JVM-side, no Python): the dot product folds left in index order with
double precision, so DuckDB's oracle (``list_transform`` + index-order
``list_reduce``-style sum) produces bit-identical IEEE results.

* ``brute_force_topk`` — exact top-k neighbors for a set of query
  vectors: broadcast the (small) query side, cross-join against the
  corpus, rank per query with a window. At 100 TB corpus scale the
  scan dominates and parallelizes perfectly; the shuffle is only
  (n_queries × corpus_partitions) partial top-k rows when ranked via
  window over query_id — Spark's TakeOrderedAndProject-style partial
  ordering keeps executor memory flat.
* ``ivf_topk`` — the scale path: IVF (inverted-file) with
  deterministic seed centroids. Corpus vectors are assigned to their
  nearest centroid once (a narrow map over a broadcast centroid list);
  queries probe only the ``n_probe`` nearest centroid buckets, so the
  pairing join touches ~n_probe/n_centroids of the corpus. Same
  shape as FAISS IVF-Flat, expressed relationally.
* ``embedding_near_dups`` — corpus self-pairs with cosine ≥ threshold,
  bucketed by centroid (pairs must share a bucket) to avoid the n²
  product.

Determinism: centroids are the first ``n_centroids`` vectors by id —
a published (if crude) seeding; k-means refinement would drop in here
without changing the query shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Index-order fold-left double dot product (DuckDB-reproducible)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _collect_centroids(
    centroids: DataFrame, id_col: str, vec_col: str
) -> list[tuple[int, list[float]]]:
    """One driver collect of the (tiny) centroid list."""
    return [
        (r["cid"], list(r["cvec"]))
        for r in centroids.select(
            F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")
        ).collect()
    ]


def _centroid_literal(cent_rows: list[tuple[int, list[float]]]) -> Column:
    """Centroid list as a literal array column (broadcast-by-plan)."""
    return F.array(
        *[
            F.struct(
                F.lit(cid).alias("cid"),
                F.array(*[F.lit(float(v)) for v in vec]).alias("cvec"),
            )
            for cid, vec in cent_rows
        ]
    )


def assign_centroids(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    cent_rows: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """Nearest-centroid assignment: embed the centroid list as a plan
    literal, argmax cosine inside a single projection (no join, no
    shuffle — the corpus scan stays embarrassingly parallel). Callers
    holding an already-collected centroid list pass ``cent_rows`` to
    avoid a second driver job."""
    if cent_rows is None:
        cent_rows = _collect_centroids(centroids, id_col, vec_col)
    cents = _centroid_literal(cent_rows)
    scored = F.transform(
        cents,
        lambda c: F.struct(
            cosine(F.col(vec_col), c["cvec"]).alias("sim"), c["cid"].alias("cid")
        ),
    )
    best = F.array_max(scored)
    return corpus.select(
        F.col(id_col), F.col(vec_col), best["cid"].alias("centroid_id")
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k per query vector. Query side is broadcast;
    ranking is a per-query window (ties broken by corpus id for full
    determinism). Self-matches (same id) are excluded."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qvec"), F.col("nvec")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
) -> DataFrame:
    """Approximate top-k: probe only the ``n_probe`` nearest centroid
    buckets per query. Join key is centroid_id, so the shuffle moves
    each query to ~n_probe buckets instead of the whole corpus."""
    centroids = corpus.orderBy(F.col(id_col)).limit(n_centroids)
    cent_rows = _collect_centroids(centroids, id_col, vec_col)
    assigned = assign_centroids(corpus, id_col, vec_col, centroids, cent_rows=cent_rows)
    cents = _centroid_literal(cent_rows)
    probes = F.slice(
        F.reverse(
            F.array_sort(
                F.transform(
                    cents,
                    lambda c: F.struct(
                        cosine(F.col(vec_col), c["cvec"]).alias("sim"),
                        c["cid"].alias("cid"),
                    ),
                )
            )
        ),
        1,
        n_probe,
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(F.transform(probes, lambda p: p["cid"])).alias("centroid_id"),
    )
    paired = q.join(
        assigned.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec"), "centroid_id"
        ),
        "centroid_id",
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = paired.select(
        "query_id", "neighbor_id", cosine(F.col("qvec"), F.col("nvec")).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def rp_planes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic random-hyperplane family: ±1 (Rademacher) entries
    from sha256 of (plane, dim) — a published SimHash-for-vectors
    construction (Charikar 2002), derandomized so the DuckDB oracle
    can embed the identical planes as literals."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.sha256(f"rp:{p}:{d}".encode()).hexdigest(), 16) & 1
            else -1.0
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def rp_lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """LSH bucket id: bit p = sign of the projection onto plane p."""
    bucket = None
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(v) for v in plane])
        bit = F.when(dot(vec_col, lit_plane) > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("int")


def rp_lsh_near_dups(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_planes: int = 8,
    dim: int = 64,
    threshold: float = 0.3,
) -> DataFrame:
    """Near-dup pairs via random-hyperplane LSH: vectors sharing a
    sign-pattern bucket (cosine-similar vectors collide with
    probability (1 - θ/π)^n_planes) are paired and verified by exact
    cosine. The alternative bucketing to IVF: no centroids to pick,
    collision probability directly controlled by n_planes."""
    planes = rp_planes(n_planes, dim)
    bucketed = corpus.select(
        F.col(id_col), F.col(vec_col), rp_lsh_bucket(F.col(vec_col), planes).alias("bucket")
    )
    L, R = bucketed.alias("l"), bucketed.alias("r")
    return (
        L.join(
            R,
            on=[
                F.col("l.bucket") == F.col("r.bucket"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            cosine(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def embedding_near_dups(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_centroids: int = 8,
) -> DataFrame:
    """Near-duplicate vector pairs (cosine ≥ threshold) within shared
    centroid buckets — linear-ish at scale; recall bounded by bucketing
    (near-identical vectors land in the same bucket)."""
    centroids = corpus.orderBy(F.col(id_col)).limit(n_centroids)
    assigned = assign_centroids(corpus, id_col, vec_col, centroids)
    L, R = assigned.alias("l"), assigned.alias("r")
    return (
        L.join(
            R,
            on=[
                F.col("l.centroid_id") == F.col("r.centroid_id"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            cosine(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
