"""Round-6 final wave: LPA communities, CUSUM changepoint, Cohen's
kappa — each checked against an independent single-machine replay
(pure-Python LPA / numpy CUSUM / hand contingency), the same property
style as the k-center and k-means trajectory tests."""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np
import pyarrow.parquet as pq

from ipeds_etl_spark.queries_ext import _lsh_doc_pairs
from ipeds_etl_spark.queries_wave8 import (
    _LPA_ROUNDS,
    q_dedup_lpa_communities,
    q_docs_rater_agreement_kappa,
    q_events_cusum_changepoint,
)

SF = "/root/testdata/sf0.001"


def test_lpa_matches_sync_replay(spark):
    """Synchronous LPA with (count DESC, label ASC) tie-break is a
    pure function of the edge set — a dict-based replay over the same
    LSH pairs must produce identical community sizes."""
    pairs = [
        (r.id_a, r.id_b) for r in _lsh_doc_pairs(spark, SF).collect()
    ]
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    lab = {v: v for v in adj}
    for _ in range(_LPA_ROUNDS):
        nxt = {}
        for v, nbrs in adj.items():
            cnt = Counter(lab[u] for u in nbrs)
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[v] = best[0]
        lab = nxt
    want = sorted(Counter(lab.values()).items())

    got = sorted(
        (r.community_id, r.n_members)
        for r in q_dedup_lpa_communities(spark, SF).collect()
    )
    assert got == want
    # conservation: every graph node lands in exactly one community
    assert sum(n for _, n in got) == len(adj)


def test_cusum_matches_numpy_replay(spark):
    """Scaled-integer CUSUM peak/argmax per type equals the numpy
    replay over the same daily counts (ties to earliest day)."""
    rows = q_events_cusum_changepoint(spark, SF).collect()
    tbl = pq.read_table(f"{SF}/events.parquet").to_pandas()
    tbl["d"] = tbl["ts"].dt.date
    for r in rows:
        sub = tbl[tbl["event_type"] == r.event_type]
        daily = sub.groupby("d").size().sort_index()
        c = daily.to_numpy(dtype=np.int64)
        nd, total = len(c), int(c.sum())
        cusum = np.cumsum(c * nd - total)
        peak = int(np.max(np.abs(cusum)))
        cp = daily.index[int(np.argmax(np.abs(cusum)))]  # first argmax = earliest
        assert r.n_days == nd
        assert r.peak_abs_cusum == peak
        assert r.cp_date == cp.isoformat()
        before = c[: int(np.argmax(np.abs(cusum))) + 1]
        after = c[int(np.argmax(np.abs(cusum))) + 1 :]
        assert r.mean_before_x1000 == (1000 * int(before.sum())) // len(before)
        if len(after) == 0:
            assert r.mean_after_x1000 is None
        else:
            assert r.mean_after_x1000 == (1000 * int(after.sum())) // len(after)
    # full cusum over all days telescopes to exactly zero, so the last
    # day can never be the (unique-peak) changepoint of a >1-day series
    assert all(r.mean_after_x1000 is not None for r in rows if r.n_days > 1)


def test_kappa_contingency_and_identity(spark):
    """The 2×2 cells sum to the corpus size and kappa satisfies the
    single-division identity on the reported exact cells."""
    (r,) = q_docs_rater_agreement_kappa(spark, SF).collect()
    n = r.yes_yes + r.yes_no + r.no_yes + r.no_no
    assert n == 500
    e = (r.yes_yes + r.yes_no) * (r.yes_yes + r.no_yes) + (
        r.no_yes + r.no_no
    ) * (r.yes_no + r.no_no)
    assert r.kappa == float(n * (r.yes_yes + r.no_no) - e) / float(n * n - e)
    assert r.po_x1000 == (1000 * (r.yes_yes + r.no_no)) // n
    assert -1.0 <= r.kappa <= 1.0
