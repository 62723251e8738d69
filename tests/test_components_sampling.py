"""Connected components (min-label fixpoint) and deterministic
sampling operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from ipeds_etl_spark.operators.components import connected_components, dedup_clusters


def test_components_resolves_paths_triangles_and_pairs(spark):
    # path 1-2-3-4-5 (diameter 4), triangle 10-11-12 (+ chord), pair 20-21
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)]
    pairs = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got = {
        r["id"]: r["component_id"]
        for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_components_edge_order_invariant(spark):
    edges = [(5, 4), (1, 2), (3, 2), (3, 4)]  # shuffled path, reversed ends
    pairs = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got = {r["id"]: r["component_id"] for r in connected_components(pairs).collect()}
    assert set(got.values()) == {1}


def test_components_nonconvergence_raises(spark):
    # a 12-node path has diameter 11 — 3 rounds cannot converge; the
    # partially-propagated labels must never be returned silently
    import pytest as _pytest

    edges = [(i, i + 1) for i in range(11)]
    pairs = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iters=3).collect()
    got = {
        r["id"]: r["component_id"]
        for r in connected_components(pairs, max_iters=25).collect()
    }
    assert set(got.values()) == {0}


def test_dedup_clusters_verdicts(spark):
    pairs = spark.createDataFrame([(7, 3), (3, 9), (50, 60)], "id_a bigint, id_b bigint")
    rows = {r["id"]: r for r in dedup_clusters(pairs).collect()}
    assert rows[3]["keep"] and rows[3]["component_size"] == 3
    assert not rows[7]["keep"] and not rows[9]["keep"]
    assert rows[50]["keep"] and rows[50]["component_size"] == 2


def test_hash_sample_deterministic_and_stable(spark):
    from ipeds_etl_spark.operators.sampling import hash_sample

    df = spark.range(10_000).withColumnRenamed("id", "k")
    a = {r["k"] for r in hash_sample(df, "k", 20, salt="s").collect()}
    b = {r["k"] for r in hash_sample(df.repartition(13), "k", 20, salt="s").collect()}
    assert a == b  # partitioning-independent
    # membership is per-row stable: sampling a subset keeps the same keys
    sub = {r["k"] for r in hash_sample(df.filter("k < 5000"), "k", 20, salt="s").collect()}
    assert sub == {k for k in a if k < 5000}
    # rate is approximately honored
    assert 0.17 < len(a) / 10_000 < 0.23
    # different salt re-rolls
    c = {r["k"] for r in hash_sample(df, "k", 20, salt="other").collect()}
    assert c != a


def test_split_column_partitions_disjoint_exhaustive(spark):
    from ipeds_etl_spark.operators.sampling import split_column

    import pyspark.sql.functions as SF

    df = spark.range(5_000).select(
        SF.col("id"), split_column(SF.col("id"), {"train": 90, "valid": 5, "test": 5}).alias("s")
    )
    counts = {r["s"]: r["n"] for r in df.groupBy("s").agg(SF.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "valid", "test"}  # exhaustive, no nulls
    assert sum(counts.values()) == 5_000
    assert counts["train"] > 8 * (counts["valid"] + counts["test"])


def test_null_keys_get_deterministic_bucket_not_dropped(spark):
    """A NULL key must not silently vanish from every split/sample:
    it hashes via a sentinel to one real deterministic bucket."""
    from ipeds_etl_spark.operators.sampling import hash_sample, split_column

    import pyspark.sql.functions as SF

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (4, None)], "id int, k string"
    )
    # split is exhaustive: NULL keys land in exactly one named split
    out = df.select("id", split_column(SF.col("k"), {"train": 50, "test": 50}).alias("s"))
    rows = {r["id"]: r["s"] for r in out.collect()}
    assert None not in rows.values()
    assert rows[2] == rows[4]  # both NULL keys share the sentinel bucket
    # hash_sample at 100% keeps every row, including NULL keys
    assert hash_sample(df, "k", 100).count() == 4
    # ...and at 0% keeps none
    assert hash_sample(df, "k", 0).count() == 0


def test_stratified_rates_and_validation(spark):
    import pytest as _pytest

    from ipeds_etl_spark.operators.sampling import (
        hash_sample,
        split_column,
        stratified_hash_sample,
    )
    import pyspark.sql.functions as SF

    df = spark.range(4_000).select(
        SF.col("id"), (SF.col("id") % 2 == 0).cast("string").alias("g")
    )
    out = stratified_hash_sample(df, "id", "g", {"true": 100, "false": 0})
    got = out.groupBy("g").count().collect()
    assert {r["g"]: r["count"] for r in got} == {"true": 2_000}
    with _pytest.raises(ValueError):
        hash_sample(df, "id", 101)
    with _pytest.raises(ValueError):
        split_column(SF.col("id"), {"a": 50, "b": 40})


def test_star_contraction_equals_label_propagation(spark):
    """large-star/small-star must be observationally identical to the
    min-label fixpoint on arbitrary graphs — the two are interchangeable
    by contract. Seeded pseudo-random edge sets with multiple
    components, chains, triangles, and isolated pairs."""
    from ipeds_etl_spark.operators.components import connected_components_star

    import hashlib

    def h(i):
        return int(hashlib.sha256(f"e{i}".encode()).hexdigest()[:8], 16)

    edges = [(h(i) % 60, h(i + 1000) % 60) for i in range(90)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    want = {
        (r["id"], r["component_id"])
        for r in connected_components(df).collect()
    }
    got = {
        (r["id"], r["component_id"])
        for r in connected_components_star(df).collect()
    }
    assert got == want


def test_star_contraction_handles_chain_beyond_label_budget(spark):
    """A 300-node path has diameter 299: min-label propagation cannot
    finish inside its default round budget (it raises rather than
    returning wrong labels), while star contraction converges in
    O(log n) rounds and labels every node with the chain minimum."""
    from ipeds_etl_spark.operators.components import connected_components_star

    import pytest as _pytest

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(300)], ["id_a", "id_b"]
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iters=10)
    out = connected_components_star(chain).collect()
    assert len(out) == 301
    assert {r["component_id"] for r in out} == {0}


def test_graph_stats_on_known_graph(spark):
    """K4 on {1,2,3,4} (4 triangles... C(4,3)=4) plus a pendant edge
    and a disconnected pair: every statistic is hand-checkable."""
    from ipeds_etl_spark.operators.components import graph_stats

    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = k4 + [(4, 5), (10, 11), (2, 1)]  # dup reversed edge collapses
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    r = graph_stats(df).collect()[0]
    assert r["n_nodes"] == 7
    assert r["n_edges"] == 8          # 6 in K4 + pendant + island pair
    assert r["max_degree"] == 4       # node 4: three K4 edges + pendant
    assert r["n_triangles"] == 4      # C(4,3) in K4


def test_quota_cap_exact_and_matches_naive_window(spark):
    from pyspark.sql import Window

    from ipeds_etl_spark.functions.hashing import parity_hash
    from ipeds_etl_spark.operators.sampling import quota_cap

    rows = [(i, f"g{i % 3}") for i in range(90)] + [(1000, "tiny")]
    df = spark.createDataFrame(rows, ["k", "g"])
    got = quota_cap(df, key_col="k", group_col="g", cap=5).collect()
    assert len(got) == 3 * 5 + 1  # tiny group kept whole (n < cap)

    h = parity_hash(F.concat(F.lit(""), F.col("k").cast("string")))
    w = Window.partitionBy("g").orderBy(h, F.col("k").cast("string"))
    naive = (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .drop("rn")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, naive))


def test_quota_cap_fallback_rescues_undershot_groups(spark):
    # margin so small the prefilter keeps (almost) nothing: every group
    # undershoots, the verification pass must rescue them all, and the
    # result must STILL equal the naive window exactly.
    from pyspark.sql import Window

    from ipeds_etl_spark.functions.hashing import parity_hash
    from ipeds_etl_spark.operators.sampling import quota_cap

    rows = [(i, f"g{i % 2}") for i in range(100)]
    df = spark.createDataFrame(rows, ["k", "g"])
    got = quota_cap(df, key_col="k", group_col="g", cap=3, margin=1e-9)
    h = parity_hash(F.concat(F.lit(""), F.col("k").cast("string")))
    w = Window.partitionBy("g").orderBy(h, F.col("k").cast("string"))
    naive = (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, naive.collect())
    )


def test_quota_cap_null_group_and_null_key(spark):
    from ipeds_etl_spark.operators.sampling import quota_cap

    rows = [(None, None), (1, None), (2, "a"), (None, "a"), (3, "a")]
    df = spark.createDataFrame(rows, "k int, g string")
    got = quota_cap(df, key_col="k", group_col="g", cap=2).collect()
    by_g = {}
    for r in got:
        by_g.setdefault(r["g"], []).append(r["k"])
    assert len(by_g[None]) == 2  # null group capped like any other
    assert len(by_g["a"]) == 2
