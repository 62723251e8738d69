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

Determinism: centroids are seeded as the first ``n_centroids``
vectors by id, then refined with ``kmeans_refine`` — deterministic
Lloyd iterations whose means run in quantized integer space (scale by
2^20, floor, exact BIGINT sums, one IEEE division back), so the final
centroids are bit-identical regardless of engine or partitioning and
the DuckDB oracle replays the refinement exactly. ``emb_ivf_recall``
value-checks recall@k of the refined IVF against brute force.
"""

from __future__ import annotations

import json
import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ipeds_etl_spark.operators.dedup import (
    MAX_BUCKET_SIZE_DEFAULT,
    fused_pair_hits_within_buckets,
    pairs_within_buckets,
)

#: Decompressed-size ceiling for broadcasting the corpus side of the
#: pair-verify re-attach join (see ``_verified_pairs_within_buckets``):
#: the decision is made from known row counts, NOT the optimizer's
#: compressed-bytes estimate, which repetitive embedding data skews by
#: 30x+ (measured: 27 MB zstd parquet → ~1 GB of rows, an AQE runtime
#: broadcast that aborted on spark.driver.maxResultSize). 64 MB keeps
#: the broadcast well under default driver/executor headroom.
REATTACH_BROADCAST_MAX_BYTES = 64 << 20


def suggest_rp_planes(
    corpus_count: int,
    target_bucket_size: int = 1024,
    min_planes: int = 4,
    max_planes: int = 24,
) -> int:
    """Hyperplane count sized from corpus stats: ``2^p`` buckets, so
    ``p = ceil(log2(n / target_bucket_size))`` keeps the EXPECTED
    bucket population ≈ ``target_bucket_size`` as the corpus grows —
    the per-bucket pair expansion stays bounded at any scale instead
    of exploding quadratically with fixed sf-sized constants. The
    plane family itself stays the derandomized sha256 construction."""
    if corpus_count <= target_bucket_size:
        return min_planes
    return max(
        min_planes, min(max_planes, math.ceil(math.log2(corpus_count / target_bucket_size)))
    )


def suggest_n_centroids(
    corpus_count: int,
    target_bucket_size: int = 4096,
    min_centroids: int = 8,
    max_centroids: int = 1 << 16,
) -> int:
    """IVF centroid count sized from corpus stats: ``n / target`` keeps
    the expected inverted-list length ≈ ``target_bucket_size``.
    Centroid seeding/refinement stays deterministic; the cap bounds the
    plan-literal centroid list the assignment broadcasts."""
    if corpus_count <= target_bucket_size * min_centroids:
        return min_centroids
    return min(max_centroids, math.ceil(corpus_count / target_bucket_size))


def _matrix_lit(rows: list[list[float]]) -> Column:
    """A nested-array constant (centroid table / plane family) as ONE
    JSON string literal: a single Py4J call, and Catalyst
    constant-folds the foldable ``from_json`` into a plain Literal at
    optimize time (verified in the optimized plan) — so runtime never
    parses JSON. The element-wise ``F.lit`` alternative costs ~n×dim
    Py4J round-trips per expression build (~0.35 s for 8×64, built
    several times per IVF query). ``json.dumps`` emits shortest-repr
    doubles, which Jackson parses back bit-exactly."""
    return F.from_json(F.lit(json.dumps(rows)), "array<array<double>>")


def argmin_sqdist_int(v: Column, cents: list[tuple[int, list[int]]]) -> Column:
    """``struct(dist, cid)`` of the nearest INTEGER centroid by squared
    euclidean distance, ties to the LOWER cid — the Lloyd assignment
    argmin, spelled as ONE matrix-literal loop instead of k unrolled
    ``zip_with``+``aggregate`` chains (opt r13: the unrolled spelling
    re-ran Catalyst analysis + codegen over an O(k·dim)-node tree for
    every Lloyd round — 5.2 s of the 5.5 s sf0.1 emb_kmeans_lloyd run
    was driver-side plan work, 0.3 s execution). The matrix rides as
    one constant-folded ``from_json`` literal (`_matrix_lit` trick);
    distances, fold order, and the (dist, cid) struct-min tie-break
    are bit-identical to the unrolled form (integer adds are
    associative; cid stays INT)."""
    m = F.from_json(
        F.lit(json.dumps([[int(x) for x in c] for _, c in cents])),
        "array<array<bigint>>",
    )
    cids = F.from_json(
        F.lit(json.dumps([int(cid) for cid, _ in cents])), "array<int>"
    )
    def one(i: Column) -> Column:
        cw = F.element_at(m, i.cast("int"))
        d = F.aggregate(
            F.zip_with(v, cw, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        return F.struct(
            d.alias("dist"), F.element_at(cids, i.cast("int")).alias("cid")
        )
    return F.array_min(
        F.transform(F.sequence(F.lit(1), F.lit(len(cents))), one)
    )


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


def eval_max_cosine(vec: Column, eval_vecs: list[list[float]]) -> Column:
    """Max cosine of ``vec`` against a FROZEN eval matrix embedded as
    one plan-literal (`_matrix_lit`) — the semantic-decontamination
    primitive shared by the batch gate (`emb_semantic_decontaminate`)
    and its incremental crawl-over-crawl twin.

    Scale contract: the eval set is a bounded artifact (tens to low
    thousands of vectors), so it constant-folds into the plan and the
    per-row max is a MAP-SIDE fold — a 100 TB corpus (or an unbounded
    incoming stream) is scanned once with no join and no shuffle. The
    naive corpus × eval join would materialize |corpus| × |eval| rows.

    Same norm hoist as ``_scored_centroids`` (opt r13): eval-row norms
    precomputed driver-side, ``norm(vec)`` bound once per row — the
    per-eval-row body is one dot fold; values bit-identical."""
    m = _matrix_lit([[float(v) for v in row] for row in eval_vecs])
    nrs = F.lit([_pynorm([float(v) for v in row]) for row in eval_vecs])
    return F.array_max(
        F.element_at(
            F.transform(
                F.array(norm(vec)),
                lambda nv: F.transform(
                    F.sequence(F.lit(1), F.lit(len(eval_vecs))),
                    lambda i: dot(vec, F.element_at(m, i.cast("int")))
                    / (nv * F.element_at(nrs, i.cast("int"))),
                ),
            ),
            1,
        )
    )


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


def _pynorm(vec_: list[float]) -> float:
    """Driver-side replica of ``norm`` with the same IEEE op order
    (left-fold sum of x·x in double, then one correctly-rounded sqrt)
    — bit-identical to evaluating ``norm`` on the same literal."""
    acc = 0.0
    for x in vec_:
        fx = float(x)
        acc = acc + fx * fx
    return math.sqrt(acc)


def _scored_centroids(
    vec: Column, cent_rows: list[tuple[int, list[float]]]
) -> Column:
    """``array<struct<sim,cid>>`` of cosine scores of ``vec`` against
    every centroid. The centroid table embeds as TWO flat literals
    (ids, vectors) — single Literal plan nodes — instead of an
    array-of-struct tree of n_centroids × dim individual ``lit`` calls:
    the values and IEEE op order are identical, but Catalyst analyzes
    ~2 nodes instead of ~500, which measurably cuts per-query driver
    time for every assignment/probe expression (this projection is
    built 3× per IVF query: two Lloyd refinements + final).

    The two norms in ``cosine`` are hoisted out of the per-centroid
    loop (opt r13): centroid norms are precomputed driver-side into a
    literal (``_pynorm`` replicates the fold order, so the doubles are
    bit-identical), and ``norm(vec)`` is bound ONCE per row via a
    1-element transform so the per-centroid body is a single dot fold
    instead of three. The score stays ``dot / (nv * ncw)`` — the same
    operands and op order as ``cosine``."""
    cids = F.lit([int(cid) for cid, _ in cent_rows])
    cvecs = _matrix_lit([[float(v) for v in vec_] for _, vec_ in cent_rows])
    ncws = F.lit([_pynorm(vec_) for _, vec_ in cent_rows])
    idx = F.sequence(F.lit(1), F.lit(len(cent_rows)))
    return F.element_at(
        F.transform(
            F.array(norm(vec)),
            lambda nv: F.transform(
                idx,
                lambda i: F.struct(
                    (
                        dot(vec, F.element_at(cvecs, i.cast("int")))
                        / (nv * F.element_at(ncws, i.cast("int")))
                    ).alias("sim"),
                    F.element_at(cids, i.cast("int")).cast("int").alias("cid"),
                ),
            ),
        ),
        1,
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
    best = F.array_max(_scored_centroids(F.col(vec_col), cent_rows))
    return corpus.select(
        F.col(id_col), F.col(vec_col), best["cid"].alias("centroid_id")
    )


#: Quantization scale for the deterministic k-means mean: a power of
#: two, so ``v * SCALE`` is EXACT in binary floating point (no
#: rounding), making the whole refinement bit-reproducible across
#: engines. 2^20 keeps |v|≤512 embeddings-sum well inside 2^53.
KMEANS_SCALE = 1 << 20


def kmeans_refine(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    cent_rows: list[tuple[int, list[float]]],
    n_iters: int = 2,
) -> list[tuple[int, list[float]]]:
    """Deterministic Lloyd iterations over the seed centroids.

    Each iteration: assign every corpus vector to its nearest centroid
    (cosine argmax, a map over a plan-literal centroid list — no join),
    then recompute each centroid as the **quantized mean** of its
    members: components are scaled by 2^20 (exact), floor(x+0.5)
    rounded to BIGINT (exact), summed exactly, and divided back in one
    IEEE step — so the refined centroids are bit-identical on any
    engine/partitioning, which is what lets the DuckDB oracle replay
    the refinement and value-check IVF end-to-end.

    Scale: the mean aggregate is map-side combinable into
    n_centroids × dim groups (512 here), so the shuffle is a few
    hundred rows per input partition regardless of corpus size; the
    driver collects only the (n_centroids × dim) sums per iteration.
    Clusters that lose all members are dropped (mirroring the
    relational formulation, where an empty group simply vanishes).
    """
    for _ in range(n_iters):
        assigned = assign_centroids(corpus, id_col, vec_col, None, cent_rows=cent_rows)
        comp = assigned.select("centroid_id", F.posexplode(F.col(vec_col)))
        sums = comp.groupBy("centroid_id", "pos").agg(
            F.sum(
                F.floor(F.col("col").cast("double") * KMEANS_SCALE + F.lit(0.5)).cast(
                    "long"
                )
            ).alias("s"),
            F.count("*").alias("n"),
        )
        by_cid: dict[int, dict[int, tuple[int, int]]] = {}
        for r in sums.collect():  # ≤ n_centroids × dim rows (metadata-sized)
            by_cid.setdefault(r["centroid_id"], {})[r["pos"]] = (r["s"], r["n"])
        cent_rows = [
            (
                cid,
                [float(s) / n / KMEANS_SCALE for _, (s, n) in sorted(d.items())],
            )
            for cid, d in sorted(by_cid.items())
        ]
    return cent_rows


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


def build_ivf_centroids(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int | None = 8,
    n_iters: int = 2,
) -> list[tuple[int, list[float]]]:
    """Build the IVF codebook (the index-training step): seed the first
    ``n_centroids`` vectors by id, then refine with ``n_iters``
    deterministic Lloyd iterations. The result is a small driver-side
    artifact (≤ n_centroids × dim floats) that callers persist/reuse
    across every query against the same corpus version — index build is
    amortized, per-query cost is probe + bucket join only."""
    if n_centroids is None:
        n_centroids = suggest_n_centroids(corpus.count())
    centroids = corpus.orderBy(F.col(id_col)).limit(n_centroids)
    cent_rows = _collect_centroids(centroids, id_col, vec_col)
    if n_iters:
        cent_rows = kmeans_refine(corpus, id_col, vec_col, cent_rows, n_iters=n_iters)
    return cent_rows


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_centroids: int | None = 8,
    n_probe: int = 2,
    n_iters: int = 2,
    cent_rows: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """Approximate top-k: probe only the ``n_probe`` nearest centroid
    buckets per query. Join key is centroid_id, so the shuffle moves
    each query to ~n_probe buckets instead of the whole corpus.
    Centroids are seeded first-N-by-id then refined with ``n_iters``
    deterministic Lloyd iterations (``kmeans_refine``).
    ``n_centroids=None`` sizes the codebook from the corpus count
    (``suggest_n_centroids`` — inverted-list length stays ≈ constant
    as the corpus grows).

    ``cent_rows`` takes a prebuilt codebook (``build_ivf_centroids``)
    and skips seeding/refinement entirely — IVF is build-once-query-
    many: the index artifact is computed once per corpus version and
    amortized over every query against it, exactly as FAISS separates
    ``train``/``add`` from ``search``."""
    if cent_rows is None:
        cent_rows = build_ivf_centroids(
            corpus, id_col, vec_col, n_centroids=n_centroids, n_iters=n_iters
        )
    assigned = assign_centroids(corpus, id_col, vec_col, None, cent_rows=cent_rows)
    probes = F.slice(
        F.reverse(F.array_sort(_scored_centroids(F.col(vec_col), cent_rows))),
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


def _verified_pairs_within_buckets(
    corpus: DataFrame,
    bucketed: DataFrame,
    bucket_cols: list[str],
    id_col: str,
    vec_col: str,
    threshold: float,
    max_bucket_size: int | None,
    dedup_pairs: bool = False,
    corpus_rows: int | None = None,
    vec_dim: int = 64,
    expand_slices: int | None = None,
    engine: str | None = None,
) -> DataFrame:
    """Cosine-verified unordered pairs sharing a bucket, via the SAME
    capped in-bucket expansion the dedup side uses
    (``pairs_within_buckets``): groupBy bucket → rank-capped payload
    array → inline pair expansion. No self-join of the bucketed input,
    and one pathological hot bucket (boilerplate embeddings all hashing
    together) expands at most ``max_bucket_size`` members per task
    instead of quadratically OOM-ing it. Pairs keep ``id_a < id_b``.

    Two spellings, chosen by ``dedup_pairs``:

    * ``dedup_pairs=False`` (single-bucketing callers — IVF centroids,
      single-family RP-LSH): the FUSED expand+verify (opt r13, guide
      §3.1 "the fastest join is no join"). The capped bucket array
      carries ``struct(id, vec, nrm)``; a-positions are chunked
      (``FUSED_PAIR_CHUNK`` per row) and each chunk row computes its
      qualifying pairs inside one nested higher-order expression —
      the threshold filter runs BEFORE anything materializes, so only
      hits are ever emitted as rows. This deletes the id-pair
      repartition AND both vector re-attach joins from the old plan
      (measured at sf1: 20.7 → 17.3 s median interleaved, and the
      25M-row pair stream + 2 hash probes/pair are gone); at scale it
      also removes the corpus-side broadcast/shuffle-hash decision
      entirely on this path. Memory stays bounded by construction:
      per chunk row the generated hit array is ≤ FUSED_PAIR_CHUNK × cap
      structs worst-case, and the bucket array itself is the only
      wide value (cap × (8·dim+overhead) bytes). Chunk rows are
      round-robin repartitioned so the quadratic work runs
      n_buckets × B/FUSED_PAIR_CHUNK wide — scale-adaptive without a
      tuned slice count (the old ``expand_slices`` knob is not needed
      here and ignored).

    * ``dedup_pairs=True`` (banded LSH): id-only expansion, cross-band
      ``distinct`` (each candidate verifies ONCE, not once per
      colliding band), then vectors re-attach by an equi-join whose
      STRATEGY IS CHOSEN EXPLICITLY from known stats, never left to
      the optimizer's size estimate. Why: AQE sizes join sides from
      COMPRESSED shuffle bytes, and embedding corpora compress
      brutally (the sf10 smoke's ~1 GB of decompressed vectors was
      27 MB of zstd parquet) — AQE converted this join to broadcast
      at runtime and the broadcast build blew
      ``spark.driver.maxResultSize`` collecting the decompressed rows.
      With ``corpus_rows`` supplied (callers memoize one count per
      corpus version), the DECOMPRESSED build size
      ``rows × (8·dim + overhead)`` decides: under
      ``REATTACH_BROADCAST_MAX_BYTES`` the corpus side broadcasts,
      otherwise the join is pinned shuffle-hash. Norms ride the
      corpus side, computed once per vector (``sqrt(dot(v,v))`` —
      bit-identical cosine).

    Both spellings emit the identical pair set with identical
    ``cos_sim`` values: same capped sorted member arrays (the cap
    window orders by a struct whose FIRST field is the unique id, so
    widening the payload with vec/nrm does not reorder it), same
    left-fold dot, same ``>= threshold`` comparison.

    ``engine`` (opt r14, fused path only): ``"arrow"`` runs the
    per-pair cosine vectorized in a ``mapInArrow`` stage with the same
    IEEE op order (``operators/arrowverify.py`` — bit-identical,
    parity-pinned, measured 1.5-3× faster at sf1); ``"jvm"`` is the
    fused higher-order-function reference spelling; ``None`` (default)
    dispatches by ``corpus_rows`` against
    ``arrowverify.ARROW_VERIFY_MIN_ROWS`` (the Arrow stage's
    worker-spawn constant loses on toy corpora — measured in the r14
    paired record)."""
    if not dedup_pairs:
        if engine is None:
            # size dispatch (opt r14): the Arrow stage's per-session
            # constant loses on toy corpora; see ARROW_VERIFY_MIN_ROWS
            from ipeds_etl_spark.operators.arrowverify import use_arrow_verify

            engine = "arrow" if use_arrow_verify(corpus_rows) else "jvm"
        if engine == "arrow":
            # Arrow-batched verify (opt r14, guide §4.2): identical
            # pair enumeration and cap selection (same payload struct,
            # same capped arrays, same chunked expansion), but the
            # ~B²/2 per-bucket cosine folds run vectorized in numpy
            # with the same IEEE op order — bit-identical cos_sim,
            # measured ~2-10× faster than the interpreted HOF fold at
            # sf1 (see arrowverify module docstring; parity pinned by
            # test_arrow_pair_cos_matches_fused).
            from ipeds_etl_spark.operators.arrowverify import (
                pair_cos_hits_within_buckets,
            )

            return pair_cos_hits_within_buckets(
                bucketed.select(*bucket_cols, id_col, vec_col),
                bucket_cols,
                id_col,
                vec_col,
                threshold,
                max_bucket_size=max_bucket_size,
            )
        payload = F.struct(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("vec"),
            norm(F.col(vec_col)).alias("nrm"),
        )
        hits = fused_pair_hits_within_buckets(
            bucketed.select(*bucket_cols, id_col, vec_col),
            bucket_cols,
            payload,
            pair_hit=lambda a, b: F.struct(
                a["id"].alias("id_a"),
                b["id"].alias("id_b"),
                (dot(a["vec"], b["vec"]) / (a["nrm"] * b["nrm"])).alias(
                    "cos_sim"
                ),
            ),
            keep=lambda h: h["cos_sim"] >= threshold,
            max_bucket_size=max_bucket_size,
        )
        return hits.select("h.id_a", "h.id_b", "h.cos_sim")

    payload = F.struct(F.col(id_col).alias("id"))
    id_pairs = pairs_within_buckets(
        bucketed.select(*bucket_cols, id_col),
        bucket_cols,
        payload,
        max_bucket_size=max_bucket_size,
        expand_slices=expand_slices,
    ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    id_pairs = id_pairs.distinct()
    vecs = corpus.select(
        F.col(id_col).alias("__vid"),
        F.col(vec_col).alias("__vvec"),
        norm(F.col(vec_col)).alias("__vnrm"),
    )
    est_bytes = None if corpus_rows is None else corpus_rows * (8 * vec_dim + 64)
    if est_bytes is not None and est_bytes <= REATTACH_BROADCAST_MAX_BYTES:
        vecs = F.broadcast(vecs)
    else:
        vecs = vecs.hint("shuffle_hash")
    a = vecs.select(
        F.col("__vid").alias("id_a"),
        F.col("__vvec").alias("__avec"),
        F.col("__vnrm").alias("__anrm"),
    )
    b = vecs.select(
        F.col("__vid").alias("id_b"),
        F.col("__vvec").alias("__bvec"),
        F.col("__vnrm").alias("__bnrm"),
    )
    cos = dot(F.col("__avec"), F.col("__bvec")) / (
        F.col("__anrm") * F.col("__bnrm")
    )
    return (
        id_pairs.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
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
    """LSH bucket id: bit p = sign of the projection onto plane p.

    The plane family embeds as ONE flat nested-array literal (a single
    plan node) with bits folded via higher-order functions, instead of
    n_planes × dim individual ``lit`` calls — same projections, same
    bucket ids, a fraction of the Catalyst tree. ``pow(2, p)`` is exact
    in double for p ≤ 23 (``suggest_rp_planes`` caps at 24 planes)."""
    planes_lit = _matrix_lit([[float(v) for v in p] for p in planes])
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(len(planes) - 1)),
        lambda p: F.when(
            dot(vec_col, F.element_at(planes_lit, (p + 1).cast("int"))) > 0,
            F.pow(F.lit(2.0), p).cast("int"),
        ).otherwise(F.lit(0)),
    )
    return F.aggregate(bits, F.lit(0), lambda acc, b: acc + b).cast("int")


def rp_planes_banded(
    n_bands: int, planes_per_band: int, dim: int
) -> list[list[list[float]]]:
    """Independent Rademacher plane families per band (seeded
    ``rpb:{band}:{plane}:{dim}``, disjoint from the single-band
    family)."""
    import hashlib

    return [
        [
            [
                1.0
                if int(hashlib.sha256(f"rpb:{b}:{p}:{d}".encode()).hexdigest(), 16) & 1
                else -1.0
                for d in range(dim)
            ]
            for p in range(planes_per_band)
        ]
        for b in range(n_bands)
    ]


def rp_lsh_banded_pairs(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_bands: int = 6,
    planes_per_band: int = 4,
    dim: int = 64,
    threshold: float = 0.3,
    max_bucket_size: int | None = MAX_BUCKET_SIZE_DEFAULT,
) -> DataFrame:
    """Banded (amplified) RP-LSH near-dup pairs: vectors pair if they
    collide in ANY of ``n_bands`` independent ``planes_per_band``-bit
    sign buckets, then verify by exact cosine.

    Why: one k-plane band has collision probability p^k with
    p = 1 − θ/π — measured 0.018 recall at cos ≥ 0.3 with k = 8
    (``emb_rp_lsh_recall``). OR-ing L independent bands amplifies to
    1 − (1 − p^k)^L: smaller k per band + several bands trades a
    constant factor of candidate pairs for orders of magnitude of
    recall (``emb_rp_lsh_banded_recall`` measures it). Same knobs as
    MinHash band amplification — this is LSH theory's standard
    construction, relational form: explode each vector into its L
    (band, bucket) keys, expand pairs INSIDE each bucket
    (``pairs_within_buckets`` — no self-join, rank-capped at
    ``max_bucket_size`` so one boilerplate bucket cannot become a
    quadratic task), dedup pairs across bands, verify.
    """
    fams = rp_planes_banded(n_bands, planes_per_band, dim)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                rp_lsh_bucket(F.col(vec_col), fams[b]).alias("bucket"),
            )
            for b in range(n_bands)
        ]
    )
    bucketed = corpus.select(
        F.col(id_col), F.explode(bands).alias("bb")
    ).select(id_col, "bb.band", "bb.bucket")
    return _verified_pairs_within_buckets(
        corpus, bucketed, ["band", "bucket"], id_col, vec_col, threshold,
        max_bucket_size, dedup_pairs=True,
    )


def rp_lsh_near_dups(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_planes: int | None = 8,
    dim: int = 64,
    threshold: float = 0.3,
    max_bucket_size: int | None = MAX_BUCKET_SIZE_DEFAULT,
    corpus_rows: int | None = None,
) -> DataFrame:
    """Near-dup pairs via random-hyperplane LSH: vectors sharing a
    sign-pattern bucket (cosine-similar vectors collide with
    probability (1 - θ/π)^n_planes) are paired and verified by exact
    cosine. The alternative bucketing to IVF: no centroids to pick,
    collision probability directly controlled by n_planes.

    ``n_planes=None`` sizes the family from the corpus count
    (``suggest_rp_planes`` — expected bucket population stays bounded
    as the corpus grows instead of freezing an sf-sized constant).
    Pair expansion happens inside each bucket via the rank-capped
    ``pairs_within_buckets`` — no self-join, and a pathological hot
    bucket is bounded at ``max_bucket_size`` members per task."""
    if n_planes is None:
        n_planes = suggest_rp_planes(
            corpus.count() if corpus_rows is None else corpus_rows
        )
    planes = rp_planes(n_planes, dim)
    bucketed = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        rp_lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    return _verified_pairs_within_buckets(
        corpus, bucketed, ["bucket"], id_col, vec_col, threshold, max_bucket_size,
        corpus_rows=corpus_rows, vec_dim=dim,
    )


def expand_slices_for(spark, n_buckets: int) -> int | None:
    """a-side expansion fan-out for FEW-bucket pair expansions (see
    ``pairs_within_buckets`` ``expand_slices``): enough slices that
    n_buckets × slices ≈ 2× the shuffle partition count, so the
    quadratic expansion and the pipelined verify work use the full
    task space instead of n_buckets tasks. Scale-adaptive by
    construction — on a cluster with thousands of shuffle partitions
    AND thousands of centroids this returns None (no fan-out needed);
    it only engages when the bucket count is the parallelism limiter."""
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32") or 32)
    slices = -(-2 * n_part // max(1, n_buckets))  # ceil
    return slices if slices > 1 else None


def embedding_near_dups(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_centroids: int | None = 8,
    n_iters: int = 2,
    max_bucket_size: int | None = MAX_BUCKET_SIZE_DEFAULT,
    cent_rows: list[tuple[int, list[float]]] | None = None,
    corpus_rows: int | None = None,
) -> DataFrame:
    """Near-duplicate vector pairs (cosine ≥ threshold) within shared
    centroid buckets — linear-ish at scale; recall bounded by bucketing
    (near-identical vectors land in the same bucket).
    ``n_centroids=None`` sizes the codebook from the corpus count
    (``suggest_n_centroids``); in-bucket pair expansion is rank-capped
    (``pairs_within_buckets``), so one overfull centroid cannot become
    a quadratic task. ``cent_rows`` takes a prebuilt codebook
    (``build_ivf_centroids``) so the index build is amortized across
    the queries sharing it."""
    if cent_rows is None:
        cent_rows = build_ivf_centroids(
            corpus, id_col, vec_col, n_centroids=n_centroids, n_iters=n_iters
        )
    assigned = assign_centroids(corpus, id_col, vec_col, None, cent_rows=cent_rows)
    # NOTE (opt r13): this path now takes the FUSED expand+verify in
    # _verified_pairs_within_buckets (no re-attach join at all); the
    # earlier expand_slices experiment against the join form is moot.
    return _verified_pairs_within_buckets(
        corpus, assigned, ["centroid_id"], id_col, vec_col, threshold,
        max_bucket_size, corpus_rows=corpus_rows,
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): compressed-domain ANN for 100 TB corpora
# ---------------------------------------------------------------------------
def build_pq_codebooks(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_subspaces: int = 4,
    sub_dim: int = 16,
    n_centroids: int = 8,
    n_iters: int = 2,
) -> list[list[tuple[int, list[float]]]]:
    """Train one codebook per vector SUBSPACE (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011): slice every
    vector into ``n_subspaces`` contiguous blocks of ``sub_dim`` dims
    and run the SAME deterministic seed+Lloyd pipeline as IVF
    (``build_ivf_centroids``) on each block independently. The full
    codebook is n_subspaces × n_centroids × sub_dim floats — a
    driver-side artifact measured in KB, built once per corpus version
    and reused by every query (FAISS train/add vs search).

    Why this matters at 100 TB: a 64-dim float32 vector is 256 bytes;
    its PQ code is n_subspaces small ints (4 bytes here). The
    compressed corpus fits in a fraction of the memory/IO, and
    distance evaluation never touches the original vectors — the scan
    reads the codes column only (column pruning drops the embedding).

    All subspaces train in ONE pass per step instead of running the
    seed + Lloyd pipeline per subspace (which scanned the corpus
    n_subspaces × (1 + n_iters) times): one seed collect slices every
    subspace from the same first-n_centroids rows, and each Lloyd
    iteration computes every subspace's assignment argmax in a single
    projection, explodes (subspace, cid, component) and aggregates the
    quantized sums map-side into n_subspaces × n_centroids × sub_dim
    groups. Member sets, exact integer sums, and the final division
    order are identical per subspace, so the refined codebooks are
    bit-identical to the per-subspace pipeline's."""
    seed_rows = (
        corpus.orderBy(F.col(id_col))
        .limit(n_centroids)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
        .collect()
    )
    books: list[list[tuple[int, list[float]]]] = [
        [
            (r["cid"], list(r["cvec"])[s * sub_dim : (s + 1) * sub_dim])
            for r in seed_rows
        ]
        for s in range(n_subspaces)
    ]
    for _ in range(n_iters):
        entries = []
        for s, book in enumerate(books):
            sub = F.slice(F.col(vec_col), s * sub_dim + 1, sub_dim)
            best = F.array_max(_scored_centroids(sub, book))
            entries.append(
                F.struct(
                    F.lit(s).alias("s"),
                    best["cid"].alias("centroid_id"),
                    sub.alias("v"),
                )
            )
        exploded = (
            corpus.select(F.explode(F.array(*entries)).alias("e"))
            .select("e.s", "e.centroid_id", F.posexplode("e.v"))
        )
        sums = exploded.groupBy("s", "centroid_id", "pos").agg(
            F.sum(
                F.floor(F.col("col").cast("double") * KMEANS_SCALE + F.lit(0.5)).cast(
                    "long"
                )
            ).alias("sm"),
            F.count("*").alias("n"),
        )
        by_sub: list[dict[int, dict[int, tuple[int, int]]]] = [
            {} for _ in range(n_subspaces)
        ]
        for r in sums.collect():  # ≤ n_subspaces × n_centroids × sub_dim rows
            by_sub[r["s"]].setdefault(r["centroid_id"], {})[r["pos"]] = (
                r["sm"],
                r["n"],
            )
        books = [
            [
                (
                    cid,
                    [float(sm) / n / KMEANS_SCALE for _, (sm, n) in sorted(d.items())],
                )
                for cid, d in sorted(by_cid.items())
            ]
            for by_cid in by_sub
        ]
    return books


def pq_encode(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    books: list[list[tuple[int, list[float]]]],
    sub_dim: int = 16,
) -> DataFrame:
    """Encode every vector as one small int per subspace (its nearest
    sub-codeword by cosine, ties to the higher cid — the same argmax
    convention as ``assign_centroids``). Map-only over the corpus scan:
    the codebooks ride along as plan literals, no join, no shuffle."""
    cols = [F.col(id_col)]
    for s, book in enumerate(books):
        sub = F.slice(F.col(vec_col), s * sub_dim + 1, sub_dim)
        best = F.array_max(_scored_centroids(sub, book))
        cols.append(best["cid"].alias(f"code_{s}"))
    return corpus.select(*cols)


def adc_cosine(
    qvec: Column,
    books: list[list[tuple[int, list[float]]]],
    sub_dim: int = 16,
    code_prefix: str = "code_",
) -> Column:
    """The ADC (asymmetric-distance) scoring expression shared by
    ``pq_topk`` and ``ivfpq_topk``: cosine of the exact query against
    the corpus vector RECONSTRUCTED from its per-subspace codewords.
    Every float op is order-pinned (left-fold dot products, left-fold
    subspace sums, one division) so DuckDB replays it bit-identically.
    Expects ``{code_prefix}{s}`` columns in scope (see ``pq_encode``)."""
    partial_dots, partial_n2 = [], []
    for s, book in enumerate(books):
        cids = F.lit([int(cid) for cid, _ in book])
        cvecs = _matrix_lit([[float(v) for v in vec_] for _, vec_ in book])
        pos = F.array_position(cids, F.col(f"{code_prefix}{s}")).cast("int")
        cw = F.element_at(cvecs, pos)
        qsub = F.slice(qvec, s * sub_dim + 1, sub_dim)
        partial_dots.append(dot(qsub, cw))
        partial_n2.append(dot(cw, cw))
    approx_dot = partial_dots[0]
    for p in partial_dots[1:]:
        approx_dot = approx_dot + p
    recon2 = partial_n2[0]
    for p in partial_n2[1:]:
        recon2 = recon2 + p
    return approx_dot / (F.sqrt(dot(qvec, qvec)) * F.sqrt(recon2))


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    books: list[list[tuple[int, list[float]]]],
    k: int = 5,
    sub_dim: int = 16,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: the query stays exact, every
    corpus vector is replaced by its per-subspace codewords, and the
    similarity is computed query-slice × codeword — so ranking touches
    only the (id, codes) table plus the literal codebooks.

    approx_cos = Σ_s dot(q_s, cw_s) / (‖q‖ · sqrt(Σ_s ‖cw_s‖²)) — the
    cosine of the query against the RECONSTRUCTED corpus vector. Every
    float op is order-pinned (left-fold dot products, left-fold
    subspace sums, one division), so a SQL engine replays it
    bit-identically and the DuckDB oracle can value-hash the result.

    Scale shape: queries broadcast; the corpus side is a map over the
    pruned (id, codes) columns; per-query top-k is one window. At real
    scale the per-(query, subspace) distance TABLE (n_centroids
    entries) would be precomputed once — with codebooks this small the
    fold against the literal matrix is the same arithmetic."""
    codes = pq_encode(corpus, id_col, vec_col, books, sub_dim=sub_dim)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    pairs = (
        F.broadcast(q)
        .crossJoin(codes.withColumnRenamed(id_col, "neighbor_id"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    approx_cos = adc_cosine(F.col("qvec"), books, sub_dim=sub_dim)
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.select("query_id", "neighbor_id", approx_cos.alias("approx_cos"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "approx_cos", "rank")
    )


def pq_topk_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    books: list[list[tuple[int, list[float]]]],
    k: int = 5,
    n_short: int = 100,
    sub_dim: int = 16,
) -> DataFrame:
    """The production two-stage ANN pipeline: ADC over the compressed
    codes produces an ``n_short`` shortlist per query (cheap — reads
    only the codes column), then the EXACT cosine re-ranks just the
    shortlisted vectors (the only rows whose full embedding is ever
    fetched). Recall is set by the shortlist depth, cost by the
    compression — the standard quality/price dial (FAISS
    ``IndexPQ`` + refine). The vector re-fetch is an equi-join on the
    corpus id, so at scale it is a shuffle of n_queries × n_short rows,
    never a corpus scan of full vectors."""
    shortlist = pq_topk(
        corpus, queries, id_col, vec_col, books, k=n_short, sub_dim=sub_dim
    ).select("query_id", "neighbor_id")
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    n = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec"))
    rer = (
        shortlist.join(F.broadcast(q), "query_id")
        .join(n, "neighbor_id")
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
        rer.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


# ---------------------------------------------------------------------------
# IVF-PQ: the composed production index (FAISS IndexIVFPQ shape)
# ---------------------------------------------------------------------------
def ivfpq_encode(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    cent_rows: list[tuple[int, list[float]]],
    books: list[list[tuple[int, list[float]]]],
    sub_dim: int = 16,
) -> DataFrame:
    """The IVF-PQ index table: ``(id, centroid_id, code_0..code_{M-1})``
    in ONE map-only projection over the corpus scan — coarse cell
    argmax plus per-subspace codeword argmax, both against plan-literal
    codebooks (no join, no shuffle). This is the ``add`` step of
    FAISS's train/add/search split: at 100 TB the persisted index table
    is 1+M small ints per vector (~8 bytes vs 256 for raw float32),
    and every search reads ONLY this table plus the probed queries."""
    best = F.array_max(_scored_centroids(F.col(vec_col), cent_rows))
    cols = [F.col(id_col), best["cid"].alias("centroid_id")]
    for s, book in enumerate(books):
        sub = F.slice(F.col(vec_col), s * sub_dim + 1, sub_dim)
        cols.append(
            F.array_max(_scored_centroids(sub, book))["cid"].alias(f"code_{s}")
        )
    return corpus.select(*cols)


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    cent_rows: list[tuple[int, list[float]]],
    books: list[list[tuple[int, list[float]]]],
    k: int = 5,
    n_probe: int = 2,
    n_short: int = 50,
    sub_dim: int = 16,
) -> DataFrame:
    """IVF-PQ search — the composition production ANN actually runs at
    100 TB (Jégou et al. 2011 §V; FAISS ``IndexIVFPQ`` with
    ``by_residual=false``): the IVF coarse quantizer prunes WHICH rows
    are scored (each query touches only its ``n_probe`` nearest cells,
    ~n_probe/n_cells of the corpus), PQ compresses WHAT is read to
    score them (ADC over the codes — the raw vectors never enter the
    candidate stage), and the exact re-rank touches full vectors for
    only ``n_short`` shortlisted ids per query. Both building blocks
    are this module's existing deterministic seed+quantized-Lloyd
    codebooks, so a SQL engine replays training, encoding, probing,
    ADC, and re-rank end-to-end and value-hashes the ranking.

    Plan shape: one corpus map (``ivfpq_encode``), one equi-join on
    centroid_id (queries exploded to n_probe rows each — the shuffle
    moves queries to cells, never the corpus), a per-query window over
    the ADC scores, then an equi-join re-fetch of n_queries × n_short
    full vectors. Nothing is corpus × queries and no stage reads the
    embedding column for non-shortlisted rows."""
    enc = ivfpq_encode(corpus, id_col, vec_col, cent_rows, books, sub_dim=sub_dim)
    probes = F.slice(
        F.reverse(F.array_sort(_scored_centroids(F.col(vec_col), cent_rows))),
        1,
        n_probe,
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(F.transform(probes, lambda p: p["cid"])).alias("centroid_id"),
    )
    pairs = F.broadcast(q).join(
        enc.withColumnRenamed(id_col, "neighbor_id"), "centroid_id"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        adc_cosine(F.col("qvec"), books, sub_dim=sub_dim).alias("approx_cos"),
    )
    return _shortlist_exact_rerank(
        scored, corpus, queries, id_col, vec_col, k=k, n_short=n_short
    )


def _shortlist_exact_rerank(
    scored: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    n_short: int,
) -> DataFrame:
    """Shared tail of the two-stage pipelines: rank the approximate
    scores per query, keep the ``n_short`` shortlist, re-fetch ONLY
    those ids' full vectors by equi-join, exact-cosine re-rank to
    top-``k``. At scale the re-fetch shuffles n_queries × n_short rows,
    never a full-vector corpus scan."""
    w_short = Window.partitionBy("query_id").orderBy(
        F.col("approx_cos").desc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        scored.withColumn("rn", F.row_number().over(w_short))
        .filter(F.col("rn") <= n_short)
        .select("query_id", "neighbor_id")
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    nv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec")
    )
    rer = (
        shortlist.join(F.broadcast(qv), "query_id")
        .join(nv, "neighbor_id")
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
        rer.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


# ---------------------------------------------------------------------------
# Scalar quantization (SQ8): int8-per-dimension compressed ANN
# ---------------------------------------------------------------------------
def sq8_train(corpus: DataFrame, vec_col: str) -> list[tuple[float, float]]:
    """Train the SQ8 quantizer (FAISS ``IndexScalarQuantizer``/QT_8bit
    shape): per-DIMENSION [min, max] bounds — one map-combinable
    posexplode aggregate whose output is dim rows, collected as the
    driver-side artifact (dim × 2 doubles, build-once-query-many like
    the IVF/PQ codebooks). min/max are pure SELECTIONS of input floats
    (no arithmetic), so the artifact is bit-identical on any engine or
    partitioning and the oracle re-derives it exactly."""
    rows = (
        corpus.select(F.posexplode(F.col(vec_col)))
        .groupBy("pos")
        .agg(
            F.min(F.col("col").cast("double")).alias("mn"),
            F.max(F.col("col").cast("double")).alias("mx"),
        )
        .collect()  # dim rows — metadata-sized
    )
    by_pos = {r["pos"]: (r["mn"], r["mx"]) for r in rows}
    return [by_pos[i] for i in range(len(by_pos))]


def sq8_encode(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    bounds: list[tuple[float, float]],
) -> DataFrame:
    """``(id, codes array<int>)``: each component linearly quantized to
    0..255 within its dimension's trained bounds —
    ``clamp(floor(((x − mn) / (mx − mn)) · 256))``, a flat-dim (mx=mn)
    encoding to 0. Map-only over the scan; the persisted codes column
    is 1 byte/dim of information (64 B vs 256 B float32 — the 4×
    compression point between raw vectors and PQ's 64×). floor-then-
    clamp runs in integer domain after one pinned IEEE chain, so codes
    are engine-exact (house rule: never CAST an unfloored double to
    INT — DuckDB rounds where Spark truncates)."""
    mns = F.lit([float(mn) for mn, _ in bounds])
    mxs = F.lit([float(mx) for _, mx in bounds])
    idx = F.sequence(F.lit(1), F.lit(len(bounds)))
    codes = F.transform(
        idx,
        lambda i: F.when(
            F.element_at(mxs, i.cast("int")) == F.element_at(mns, i.cast("int")),
            F.lit(0),
        ).otherwise(
            F.least(
                F.lit(255),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (
                            F.element_at(F.col(vec_col), i.cast("int")).cast("double")
                            - F.element_at(mns, i.cast("int"))
                        )
                        / (
                            F.element_at(mxs, i.cast("int"))
                            - F.element_at(mns, i.cast("int"))
                        )
                        * F.lit(256.0)
                    ).cast("int"),
                ),
            )
        ),
    )
    return corpus.select(F.col(id_col), codes.alias("codes"))


def sq8_dequant(codes: Column, bounds: list[tuple[float, float]]) -> Column:
    """Reconstructed vector from SQ8 codes: ``mn + (((c + 0.5) ·
    (mx − mn)) / 256)`` per dimension — the bin-center dequantization,
    op order pinned to the oracle."""
    mns = F.lit([float(mn) for mn, _ in bounds])
    mxs = F.lit([float(mx) for _, mx in bounds])
    return F.transform(
        codes,
        lambda c, i: F.element_at(mns, (i + 1).cast("int"))
        + (
            (c.cast("double") + F.lit(0.5))
            * (
                F.element_at(mxs, (i + 1).cast("int"))
                - F.element_at(mns, (i + 1).cast("int"))
            )
        )
        / F.lit(256.0),
    )


def sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    bounds: list[tuple[float, float]],
    k: int = 5,
) -> DataFrame:
    """SQ8 asymmetric top-k: exact query against dequantized corpus
    codes — the ranking reads ONLY the codes column (column pruning
    drops the embedding from the scan, as with PQ/ADC). Same broadcast-
    queries × codes-scan shape as ``pq_topk``; every float op is
    order-pinned so DuckDB value-hashes the ranking."""
    enc = sq8_encode(corpus, id_col, vec_col, bounds)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    pairs = (
        F.broadcast(q)
        .crossJoin(enc.withColumnRenamed(id_col, "neighbor_id"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    dq = sq8_dequant(F.col("codes"), bounds)
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        (
            dot(F.col("qvec"), dq)
            / (F.sqrt(dot(F.col("qvec"), F.col("qvec"))) * F.sqrt(dot(dq, dq)))
        ).alias("approx_cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "approx_cos", "rank")
    )


def residual_frame(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    cent_rows: list[tuple[int, list[float]]],
) -> DataFrame:
    """``(id, centroid_id, vec_col = v − coarse_centroid(v))`` — the
    residual view PQ trains and encodes on in FAISS's default
    ``by_residual=true`` IVF-PQ (Jégou et al. 2011 §V.B: residuals
    concentrate near zero, so the same codeword budget spends its
    resolution on the part the coarse quantizer didn't explain).
    Map-only: assignment argmax + one exact-IEEE subtraction per
    component against the plan-literal centroid, no join."""
    assigned = assign_centroids(corpus, id_col, vec_col, None, cent_rows=cent_rows)
    cids = F.lit([int(cid) for cid, _ in cent_rows])
    cvecs = _matrix_lit([[float(v) for v in vec_] for _, vec_ in cent_rows])
    cvec = F.element_at(
        cvecs, F.array_position(cids, F.col("centroid_id")).cast("int")
    )
    res = F.zip_with(
        F.col(vec_col), cvec, lambda x, y: x.cast("double") - y
    )
    return assigned.select(
        F.col(id_col), F.col("centroid_id"), res.alias(vec_col)
    )


def ivfpq_residual_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    cent_rows: list[tuple[int, list[float]]],
    books: list[list[tuple[int, list[float]]]],
    k: int = 5,
    n_probe: int = 2,
    n_short: int = 50,
    sub_dim: int = 16,
) -> DataFrame:
    """Residual IVF-PQ search (FAISS ``IndexIVFPQ`` with its DEFAULT
    ``by_residual=true``): identical plan shape to ``ivfpq_topk`` —
    probe n_probe cells, ADC over codes, exact re-rank of the
    shortlist — but the codes quantize RESIDUALS (``books`` must come
    from ``build_pq_codebooks`` over ``residual_frame``), and ADC
    reconstructs ``centroid + codeword`` before scoring, so the
    codeword budget refines around each cell's centroid instead of
    re-describing the whole space. Every reconstruction component is
    one exact-IEEE addition and the fold order matches the oracle
    bit-for-bit."""
    res = residual_frame(corpus, id_col, vec_col, cent_rows)
    enc_cols = [F.col(id_col), F.col("centroid_id")]
    for s, book in enumerate(books):
        sub = F.slice(F.col(vec_col), s * sub_dim + 1, sub_dim)
        enc_cols.append(
            F.array_max(_scored_centroids(sub, book))["cid"].alias(f"code_{s}")
        )
    enc = res.select(*enc_cols)
    probes = F.slice(
        F.reverse(F.array_sort(_scored_centroids(F.col(vec_col), cent_rows))),
        1,
        n_probe,
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(F.transform(probes, lambda p: p["cid"])).alias("centroid_id"),
    )
    pairs = F.broadcast(q).join(
        enc.withColumnRenamed(id_col, "neighbor_id"), "centroid_id"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    coarse_cids = F.lit([int(cid) for cid, _ in cent_rows])
    coarse_vecs = _matrix_lit([[float(v) for v in vec_] for _, vec_ in cent_rows])
    cvec = F.element_at(
        coarse_vecs, F.array_position(coarse_cids, F.col("centroid_id")).cast("int")
    )
    partial_dots, partial_n2 = [], []
    for s, book in enumerate(books):
        bcids = F.lit([int(cid) for cid, _ in book])
        bvecs = _matrix_lit([[float(v) for v in vec_] for _, vec_ in book])
        cw = F.element_at(
            bvecs, F.array_position(bcids, F.col(f"code_{s}")).cast("int")
        )
        recon = F.zip_with(
            F.slice(cvec, s * sub_dim + 1, sub_dim), cw, lambda x, y: x + y
        )
        qsub = F.slice(F.col("qvec"), s * sub_dim + 1, sub_dim)
        partial_dots.append(dot(qsub, recon))
        partial_n2.append(dot(recon, recon))
    approx_dot = partial_dots[0]
    for p in partial_dots[1:]:
        approx_dot = approx_dot + p
    recon2 = partial_n2[0]
    for p in partial_n2[1:]:
        recon2 = recon2 + p
    approx_cos = approx_dot / (
        F.sqrt(dot(F.col("qvec"), F.col("qvec"))) * F.sqrt(recon2)
    )
    scored = pairs.select(
        "query_id", "neighbor_id", approx_cos.alias("approx_cos")
    )
    return _shortlist_exact_rerank(
        scored, corpus, queries, id_col, vec_col, k=k, n_short=n_short
    )
