"""Shared-index lifecycle (operators/indexes.py, VERDICT r6 item 7):
memoized localCheckpoint indexes must be buildable, reused within a
session, and RELEASABLE — release_indexes must actually free the
pinned executor storage and leave the builders able to rebuild."""

from __future__ import annotations

from ipeds_etl_spark.operators import indexes as IDX

SF = "/root/testdata/sf0.001"


def _tracked_ids():
    return [
        rid
        for memo in (IDX._LSH_DOC_PAIRS, IDX._BASKET_ITEMS)
        for (_df, ids) in memo.values()
        for rid in ids
    ]


def test_build_memoize_release_rebuild(spark):
    IDX.release_indexes(spark)
    assert not _tracked_ids()

    pairs1 = IDX.lsh_doc_pairs(spark, SF)
    items1 = IDX.basket_items(spark, SF)
    n_pairs, n_items = pairs1.count(), items1.count()
    assert n_items > 0

    # memo hit: same session + same corpus -> the same plan object
    assert IDX.lsh_doc_pairs(spark, SF) is pairs1
    assert IDX.basket_items(spark, SF) is items1

    # build-time tracking recorded the pinned JVM RDD ids, and they are
    # live in the context's persistent-RDD map
    ids = _tracked_ids()
    assert ids
    live = IDX._persistent_ids(spark)
    assert set(ids) <= live

    # release: memos cleared, every tracked block unpersisted
    freed = IDX.release_indexes(spark)
    assert freed == len(ids)
    assert not IDX._LSH_DOC_PAIRS and not IDX._BASKET_ITEMS
    assert not (set(ids) & IDX._persistent_ids(spark))

    # rebuild after release works and reproduces the same result sizes
    assert IDX.lsh_doc_pairs(spark, SF).count() == n_pairs
    assert IDX.basket_items(spark, SF).count() == n_items
    IDX.release_indexes(spark)


def test_release_idempotent_and_empty_safe(spark):
    IDX.release_indexes(spark)
    assert IDX.release_indexes(spark) == 0
