"""Pure-arithmetic tests for the paired-bench protocol (r11): the
ratio rules that round-over-round perf claims now rest on must be
pinned — pairwise-dropped missing rounds, within-round pairing,
median-of-medians."""

from __future__ import annotations

from bench import paired_ratios


def test_within_round_pairing_and_median():
    cur = {"q1": [2.0, 4.0, 2.0], "q2": [1.0, 1.0, 1.0]}
    ref = {"q1": [4.0, 4.0, 1.0], "q2": [2.0, 1.0, 0.5]}
    ratios, med = paired_ratios(cur, ref)
    # q1 per-round: 0.5, 1.0, 2.0 -> median 1.0; q2: 0.5, 1.0, 2.0 -> 1.0
    assert ratios == {"q1": 1.0, "q2": 1.0}
    assert med == 1.0


def test_missing_rounds_dropped_pairwise():
    # query errored in ref round 2 and cur round 3: only round 1 pairs
    cur = {"q": [3.0, 5.0, None]}
    ref = {"q": [2.0, None, 4.0]}
    ratios, med = paired_ratios(cur, ref)
    assert ratios == {"q": 1.5}
    assert med == 1.5


def test_query_absent_in_ref_revision_excluded():
    # a query not registered in the ref rev must not fabricate a ratio
    cur = {"new_q": [1.0, 1.0], "old_q": [2.0, 2.0]}
    ref = {"new_q": [None, None], "old_q": [2.0, 4.0]}
    ratios, med = paired_ratios(cur, ref)
    assert "new_q" not in ratios
    assert ratios["old_q"] == 0.75
    assert med == 0.75


def test_zero_ref_timing_never_divides():
    cur = {"q": [1.0]}
    ref = {"q": [0.0]}
    ratios, med = paired_ratios(cur, ref)
    assert ratios == {} and med is None
