"""Manifest-committed partitioned tables: atomic multi-partition commits.

The reference gets merge atomicity for free from Postgres — a whole
upsert batch lands in one transaction (reference ``etl/core_io.py:146-153``).
A filesystem table has no transactions, and the in-place swap in
``operators.merge`` can only promise crash-*recoverable* (roll forward/
back on next touch), not reader-isolated. This module closes that gap
with the log-pointer protocol every transactional table format
(Delta/Iceberg/Hive-ACID) uses, in its minimal form:

Layout::

    table/
      _manifest/v00000001.json   # {"partitions": {"year=2010": "gen-ab12", ...}}
      _manifest/v00000002.json   # later generations; highest version wins
      _gen-ab12/year=2010/*.parquet
      _gen-9f31/year=2011/*.parquet

* A **generation dir** (``_gen-<txid>``) holds the freshly-written
  partitions of one commit. It is written completely before the commit
  and is invisible to readers until referenced (``_``-prefixed names
  are hidden from Hadoop listings).
* The **manifest** maps every live partition to the generation that
  owns it. Commit = write ``_manifest/.tmp-<txid>`` then a single
  atomic rename to the next version number. Readers resolve the highest
  version; a crash anywhere before that rename leaves only garbage
  dirs (cleaned by ``vacuum``), a crash after it leaves the new
  generation fully visible. Old-or-new, never mixed — and concurrent
  readers are isolated too, because nothing they can see is ever
  renamed or deleted out from under them (until ``vacuum``).
* Optimistic concurrency: if the version rename loses a race (target
  exists), the writer re-reads the latest manifest, re-merges its
  partition map, and retries at the next number — writers serialize on
  the version counter without locks.

Scale: a commit's cost is one staged write of the touched partitions +
one small file rename, independent of table size; reads prune to
manifest-listed partition dirs, so partition pruning works exactly as
on a plain layout.
"""

from __future__ import annotations

import json
import random
import time
import uuid
from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession

from ipeds_etl_spark import fsutil

_MANIFEST_DIR = "_manifest"


class CommitConflict(Exception):
    """A touched partition's generation changed between the merge read
    and the commit attempt — the merged data is stale and committing it
    would silently drop the concurrent writer's rows. Callers re-read
    and re-merge (``upsert_into_txn_table`` does so automatically)."""


class FencedOut(Exception):
    """A ``fence`` key's committed value has already advanced past the
    version this commit carries: a NEWER writer instance (or a replayed
    later batch) committed first, so applying this commit would roll
    newer data back. Deliberately NOT a :class:`CommitConflict` —
    re-merging cannot make a superseded batch current; the caller must
    DROP the commit (an idempotent sink treats it as already applied).
    This is the in-transaction ``txnVersion`` check Delta runs for
    idempotent writes, evaluated against the same manifest listing the
    atomic version rename proves was current."""


def _manifest_versions(spark: SparkSession, table_path: str) -> list[str]:
    return sorted(
        n
        for n in fsutil.list_names(spark, f"{table_path}/{_MANIFEST_DIR}")
        if n.startswith("v") and n.endswith(".json")
    )


def _latest_manifest(
    spark: SparkSession, table_path: str
) -> tuple[int, dict[str, str], dict]:
    """(version number, partition→generation map, meta dict) from ONE
    directory listing — base manifest and next version MUST come from
    the same listing, or a commit landing between two listings is
    silently based on a stale map (its partitions dropped). Returns
    (0, {}, {}) for an empty table. ``meta`` carries commit-scoped
    key-values (e.g. streaming batch fences) that every later commit
    preserves by merge."""
    versions = _manifest_versions(spark, table_path)
    if not versions:
        return 0, {}, {}
    pick = versions[-1]
    text = fsutil.read_text(spark, f"{table_path}/{_MANIFEST_DIR}/{pick}")
    doc = json.loads(text)
    return int(pick[1:-5]), doc["partitions"], doc.get("meta", {})


def latest_version(spark: SparkSession, table_path: str) -> int:
    """Current committed version number (0 for an empty/new table).

    Public pin-point for multi-read consistency: a caller that needs
    the manifest AND the data of "latest" must resolve the version
    number ONCE here and pass it explicitly to both
    :func:`read_manifest` and :func:`read_table` — two separate
    ``version=None`` reads each re-list the directory, and a commit
    landing between them makes the pair internally inconsistent
    (the same-listing discipline :func:`_latest_manifest` mandates
    for commits, applied to readers)."""
    return _latest_manifest(spark, table_path)[0]


def read_manifest(
    spark: SparkSession, table_path: str, version: int | None = None
) -> dict[str, str]:
    """partition entry (``year=2010``) → generation dir name, or {} for
    an empty/new table. ``version`` pins a historical manifest (time
    travel); default is the latest."""
    versions = _manifest_versions(spark, table_path)
    if not versions:
        return {}
    if version is None:
        pick = versions[-1]
    else:
        pick = f"v{version:08d}.json"
        if pick not in versions:
            raise ValueError(
                f"version {version} not found; available: "
                f"{[int(v[1:-5]) for v in versions]} (older versions are "
                "dropped by vacuum)"
            )
    text = fsutil.read_text(spark, f"{table_path}/{_MANIFEST_DIR}/{pick}")
    return json.loads(text)["partitions"]


def commit_overwrite_partitions(
    spark: SparkSession,
    df: DataFrame,
    table_path: str,
    partition_col: str = "year",
    expected: dict[str, str | None] | None = None,
    files_per_partition: int = 1,
    meta: dict | None = None,
    fence: dict[str, int] | None = None,
) -> str:
    """Atomically replace the partitions ``df`` touches. Returns the
    committed manifest version name.

    ``expected`` enables data-level conflict detection (the check
    Delta/Iceberg run at commit): a map of partition entry → the
    generation the caller READ when it computed ``df`` (``None`` = the
    partition did not exist). If, at commit time, any touched
    partition's current generation differs from the expected one, a
    concurrent writer has replaced data this ``df`` was merged from —
    the commit raises :class:`CommitConflict` (after deleting its
    orphaned generation dir) instead of silently dropping the winner's
    rows. Without ``expected`` the commit is a blind overwrite (correct
    for full-partition replacement semantics, e.g. a re-load of a
    year's source data).

    ``fence`` declares monotonic meta keys (key → this commit's
    version, e.g. a streaming sink's ``{sink_id: batch_id}``): the
    commit validates, inside the optimistic loop and against the SAME
    listing the version rename serializes on, that no committed value
    for the key is already ≥ the one being applied — otherwise it
    deletes its generation dir and raises :class:`FencedOut`. A
    check-then-act fence read OUTSIDE the commit cannot give this
    guarantee: a zombie instance holding a stale fence would re-read
    expected generations fresh, match, and overwrite newer data.
    Fence keys are merged into the manifest meta like ``meta`` entries.
    """
    txid = uuid.uuid4().hex[:8]
    gen = f"_gen-{txid}"
    gen_path = f"{table_path}/{gen}"
    if files_per_partition > 1:
        # deterministic content salt spreads one partition's rows over
        # ~files_per_partition write tasks — without it, hashing on the
        # partition column alone funnels a whole (possibly 100 TB)
        # partition through ONE task and one file
        from pyspark.sql import functions as F

        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns]),
            F.lit(files_per_partition),
        )
        # explicit task count: a bare repartition(cols...) lets AQE
        # coalesce small shuffles back to one task, silently undoing
        # the layout hint (observed); pinning the count is the hint
        staged = df.repartition(files_per_partition, salt)
    else:
        staged = df.repartition(partition_col)
    (
        staged.write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(gen_path)
    )
    touched = {
        e: gen
        for e in fsutil.list_names(spark, gen_path)
        if e.startswith(f"{partition_col}=")
    }
    fsutil.makedirs(spark, f"{table_path}/{_MANIFEST_DIR}")
    while True:
        # ONE listing drives both the base manifest and the version we
        # claim: next_v == base version + 1, so a successful rename
        # proves no commit landed after the base we merged on top of.
        base_v, current, cur_meta = _latest_manifest(spark, table_path)
        if fence:
            for key, version in fence.items():
                committed = cur_meta.get(key)
                if committed is not None and committed >= version:
                    fsutil.delete(spark, gen_path)
                    raise FencedOut(
                        f"fence {key!r}: committed value {committed} >= "
                        f"{version} being applied — this batch is "
                        "superseded; drop it, do not re-merge"
                    )
        if expected is not None:
            for part in touched:
                if current.get(part) != expected.get(part):
                    fsutil.delete(spark, gen_path)
                    raise CommitConflict(
                        f"partition {part}: generation changed from "
                        f"{expected.get(part)!r} to {current.get(part)!r} "
                        "since the merge read — re-read and re-merge"
                    )
        next_v = base_v + 1
        merged = {**current, **touched}
        # meta survives every commit: later writers merge their keys
        # over the current map instead of replacing it, so a streaming
        # sink's batch fence is never lost to an unrelated upsert
        merged_meta = {**cur_meta, **(meta or {}), **(fence or {})}
        doc: dict = {"partitions": merged}
        if merged_meta:
            doc["meta"] = merged_meta
        tmp = f"{table_path}/{_MANIFEST_DIR}/.tmp-{txid}"
        fsutil.write_text(spark, tmp, json.dumps(doc, sort_keys=True))
        final = f"{table_path}/{_MANIFEST_DIR}/v{next_v:08d}.json"
        # atomic commit point: rename_no_replace guarantees EXACTLY ONE
        # winner per version even on local filesystems, where a plain
        # FileSystem.rename is check-then-replace and two racers can
        # both "succeed" (measured; see fsutil.rename_no_replace)
        if fsutil.rename_no_replace(spark, tmp, final):
            spark.catalog.refreshByPath(table_path)
            return f"v{next_v:08d}.json"
        # lost the race: another writer took this version — retry on top
        fsutil.delete(spark, tmp)


def read_table(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """Manifest-resolved read: one pruned scan per live generation,
    unioned. ``version`` reads the table as of that commit (time
    travel — generations are immutable, so any un-vacuumed version
    reconstructs exactly). Falls back to a plain parquet read for
    tables without a manifest (compat with the in-place layout)."""
    manifest = read_manifest(spark, table_path, version=version)
    if not manifest:
        return spark.read.parquet(table_path)
    by_gen: dict[str, list[str]] = defaultdict(list)
    for part, gen in manifest.items():
        by_gen[gen].append(part)
    scans = [
        spark.read.option("basePath", f"{table_path}/{gen}").parquet(
            *[f"{table_path}/{gen}/{part}" for part in sorted(parts)]
        )
        for gen, parts in sorted(by_gen.items())
    ]
    out = scans[0]
    for s in scans[1:]:
        # schema evolution across generations: a commit may add (or
        # drop) columns; older generations null-fill the missing ones
        out = out.unionByName(s, allowMissingColumns=True)
    return out


def vacuum(
    spark: SparkSession, table_path: str, keep_last: int = 1
) -> dict[str, int]:
    """Garbage-collect: drop superseded manifest versions and any
    generation dir no retained manifest references (crashed commits,
    fully-overwritten generations). Run when no reader still holds
    plans over old generations.

    Retention policy: the newest ``keep_last`` manifest versions (≥1)
    survive, and with them every generation any of them references —
    time travel works for exactly those versions afterwards; reading an
    older version raises ``ValueError`` (tested). ``keep_last=1`` (the
    default) keeps only the current version: maximal space reclaim,
    no history."""
    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    versions = _manifest_versions(spark, table_path)
    retained = versions[-keep_last:]
    live: set[str] = set()
    for v in retained:
        text = fsutil.read_text(spark, f"{table_path}/{_MANIFEST_DIR}/{v}")
        live |= set(json.loads(text)["partitions"].values())
    dropped_gens = dropped_manifests = 0
    for entry in fsutil.list_names(spark, table_path):
        if entry.startswith("_gen-") and entry not in live:
            fsutil.delete(spark, f"{table_path}/{entry}")
            dropped_gens += 1
    for v in versions[: len(versions) - len(retained)]:
        fsutil.delete(spark, f"{table_path}/{_MANIFEST_DIR}/{v}")
        dropped_manifests += 1
    for n in fsutil.list_names(spark, f"{table_path}/{_MANIFEST_DIR}"):
        if n.startswith(".tmp-"):
            fsutil.delete(spark, f"{table_path}/{_MANIFEST_DIR}/{n}")
    return {"generations_removed": dropped_gens, "manifests_removed": dropped_manifests}


def upsert_into_txn_table(
    spark: SparkSession,
    table_path: str,
    source: DataFrame,
    pk: list[str],
    partition_col: str = "year",
    max_retries: int = 10,
    meta: dict | None = None,
    fence: dict[str, int] | None = None,
) -> str:
    """PK-keyed merge with an atomic commit: read the committed table,
    merge the touched partitions (anti-join + union, same relational
    form as ``operators.merge.upsert_on_pk``), commit as one new
    generation. The reference's single-transaction upsert semantics
    (``etl/core_io.py:146-153``) on a filesystem table.

    Data-level conflict detection: the generation of every touched
    partition is recorded at merge-read time and passed to the commit
    as ``expected`` — if a concurrent upsert replaced one of those
    partitions in the meantime, the commit raises
    :class:`CommitConflict` and the merge is REDONE on top of the
    winner's data (up to ``max_retries`` times), so no writer's rows
    are ever silently dropped. This is the re-merge-on-conflict
    behavior Delta/Iceberg implement for MERGE.

    ``fence`` (monotonic meta keys, see
    :func:`commit_overwrite_partitions`) propagates :class:`FencedOut`
    to the caller UNRETRIED: a superseded batch must be dropped, not
    re-merged onto the newer data it would roll back."""
    from pyspark.sql import functions as F

    from ipeds_etl_spark.operators.merge import _dedup_source, upsert_on_pk

    parts = [r[0] for r in source.select(partition_col).distinct().collect()]
    part_entries = [f"{partition_col}={p}" for p in parts]
    last_conflict: CommitConflict | None = None
    for attempt in range(max_retries):
        if attempt:
            # Jittered exponential backoff between re-merges: a merge
            # takes whole Spark jobs, so under N-writer contention a
            # loser that retries immediately keeps re-reading mid-burst
            # and can starve through every retry (seen in the 6-writer
            # hammer test). Waiting out the burst makes the optimistic
            # loop livelock-free in practice — the same backoff-on-
            # conflict policy Delta's commit protocol applies.
            time.sleep(min(2.0, 0.1 * (2 ** (attempt - 1))) * (0.5 + random.random()))
        manifest = read_manifest(spark, table_path)
        expected: dict[str, str | None] = {e: manifest.get(e) for e in part_entries}
        if manifest:
            target = read_table(spark, table_path)
            touched = target.filter(F.col(partition_col).isin(parts))
            merged = upsert_on_pk(touched, source, pk)
        else:
            merged = _dedup_source(source, pk)
        try:
            return commit_overwrite_partitions(
                spark,
                merged,
                table_path,
                partition_col,
                expected=expected,
                meta=meta,
                fence=fence,
            )
        except CommitConflict as exc:  # concurrent upsert won — re-merge
            last_conflict = exc
    raise CommitConflict(
        f"gave up after {max_retries} re-merge attempts: {last_conflict}"
    )


def compact(
    spark: SparkSession,
    table_path: str,
    partition_col: str = "year",
    target_files_per_partition: int = 1,
    min_files: int = 2,
    max_retries: int = 10,
) -> dict[str, int]:
    """Small-file compaction as a TRANSACTION (Delta ``OPTIMIZE`` /
    Iceberg ``rewrite_data_files`` in minimal form): rewrite each
    fragmented partition's rows into ``target_files_per_partition``
    files and commit the rewrite as a new generation. The data is
    bit-identical — only the file layout changes — and the commit goes
    through the SAME optimistic protocol as upserts (``expected``
    generations + re-read on conflict), so a concurrent writer can
    never be clobbered by maintenance: if an upsert lands first, the
    compaction re-reads the new generation and rewrites THAT.

    Only partitions with ≥ ``min_files`` data files are rewritten
    (compacting a compact partition is wasted IO). Returns
    {"partitions_compacted": n, "files_before": b, "files_after": a}.
    Run ``vacuum`` afterwards to reclaim the superseded generations.

    Scale: per-partition cost is one read+write of that partition —
    the rewrite set is chosen by file COUNT, so a well-sized table
    costs nothing; the classic cadence is compact-after-N-streaming-
    commits (each micro-batch commit writes one small file per touched
    partition)."""
    from pyspark.sql import functions as F

    for _ in range(max_retries):
        manifest = read_manifest(spark, table_path)
        if not manifest:
            return {"partitions_compacted": 0, "files_before": 0, "files_after": 0}
        frag: dict[str, int] = {}
        for entry, gen in manifest.items():
            files = [
                n
                for n in fsutil.list_names(spark, f"{table_path}/{gen}/{entry}")
                if n.endswith(".parquet")
            ]
            if len(files) >= min_files:
                frag[entry] = len(files)
        if not frag:
            return {"partitions_compacted": 0, "files_before": 0, "files_after": 0}
        parts = [e.split("=", 1)[1] for e in frag]
        # read exactly the fragmented partitions at their read-time
        # generations; commit checks those generations are still live
        expected = {e: manifest[e] for e in frag}
        rows = read_table(spark, table_path).filter(
            F.col(partition_col).cast("string").isin(parts)
        )
        try:
            commit_overwrite_partitions(
                spark,
                rows,
                table_path,
                partition_col,
                expected=expected,
                files_per_partition=target_files_per_partition,
            )
        except CommitConflict:
            continue  # a writer landed mid-rewrite: re-plan on new data
        new_manifest = read_manifest(spark, table_path)
        after = sum(
            1
            for e in frag
            for n in fsutil.list_names(
                spark, f"{table_path}/{new_manifest[e]}/{e}"
            )
            if n.endswith(".parquet")
        )
        return {
            "partitions_compacted": len(frag),
            "files_before": sum(frag.values()),
            "files_after": after,
        }
    raise CommitConflict(f"compaction lost {max_retries} straight commit races")


def read_meta(spark: SparkSession, table_path: str) -> dict:
    """The latest manifest's commit-scoped metadata map ({} if none):
    streaming batch fences, pipeline markers — anything a writer asked
    a commit to carry. Preserved across unrelated commits by merge."""
    _, _, meta = _latest_manifest(spark, table_path)
    return meta
