"""Round-6 coda: survivorship-bias audit and keyword taxonomy tagging."""

from __future__ import annotations

from collections import Counter

import pyarrow.parquet as pq

from ipeds_etl_spark.queries_wave9 import (
    _TAXONOMY,
    q_docs_dedup_survivorship,
    q_docs_keyword_tagging,
)

SF = "/root/testdata/sf0.001"


def test_survivorship_conservation_and_bounds(spark):
    """Per-source counts partition the corpus; kept <= total; the
    corpus-wide kept count equals the resolution query's keepers."""
    from ipeds_etl_spark.queries_analytics import q_docs_dedup_resolution

    rows = q_docs_dedup_survivorship(spark, SF).collect()
    tbl = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    per_source = Counter(tbl["source"])
    assert {r.source: r.n_docs for r in rows} == dict(per_source)
    for r in rows:
        assert 0 < r.n_kept <= r.n_docs
        assert r.kept_x1000 == (1000 * r.n_kept) // r.n_docs
        assert 0 <= r.q_kept_x1000 <= 1000
        assert 0 <= r.q_all_x1000 <= 1000
    res = q_docs_dedup_resolution(spark, SF).collect()
    assert sum(r.n_kept for r in rows) == sum(1 for x in res if x.keep)


def test_keyword_tagging_matches_python_replay(spark):
    rows = q_docs_keyword_tagging(spark, SF).collect()
    tbl = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    want: dict[tuple, list[int]] = {}
    for src, text in zip(tbl["source"], tbl["text"]):
        toks = [t for t in text.split() if t]
        for tag, words in _TAXONOMY:
            hits = sum(1 for t in toks if t in words)
            if (src, tag) not in want:
                want[(src, tag)] = [0, 0]
            want[(src, tag)][0] += 1 if hits > 0 else 0
            want[(src, tag)][1] += hits
    want = {k: v for k, v in want.items() if v[0] > 0}
    got = {(r.source, r.tag): [r.n_docs_tagged, r.n_hits] for r in rows}
    assert got == want
    assert len(got) > 0
