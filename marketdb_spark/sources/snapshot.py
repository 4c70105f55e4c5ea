"""Snapshot table: a minimal transactional table format over Parquet —
the "Parquet (+ optionally Delta)" sink SURVEY §1.4 promises, built from
first principles so it runs with no extra jars.

Layout::

    <table>/
      _log/
        00000000000000000000.json   # one commit per version
        00000000000000000001.json
      data/
        <commit-uuid>/part-*.parquet

Each commit file is a single JSON document::

    {"version": N, "action": "append" | "overwrite",
     "files": ["data/<uuid>/part-...parquet", ...],
     "num_rows": M}

A snapshot at version V is the file set obtained by replaying commits
0..V: an ``overwrite`` resets the set, an ``append`` extends it. Readers
list only ``_log`` (tiny JSON, one driver read per query) and then scan
exactly the live data files — stale files from overwritten versions stay
on disk for time travel until ``vacuum``.

Transactionality (the Delta model, scaled to what a filesystem gives us):
- Data files are written FIRST, into a fresh per-commit directory —
  a crashed writer leaves orphan data but never a visible half-commit.
- The commit is a single ``O_CREAT | O_EXCL`` create of the next version's
  log file: concurrent committers race on the create and exactly one wins;
  the loser re-reads the log and retries or raises (optimistic
  concurrency). Readers never lock: a snapshot is immutable by
  construction.
- At 100 TB the log is still KBs (file lists, not data) and the data
  write is an ordinary distributed parquet write; only the final create
  is driver-side. On object stores the EXCL create maps to
  put-if-absent, which is exactly how Delta/Iceberg commit.

Reference analog: the reference's store is idempotent-by-key puts with no
multi-row atomicity (marketdb-core/.../model/Trade.scala:56-57); this adds
the atomic-batch and time-travel semantics a training-data pipeline needs
(reproducible corpus snapshots keyed by version).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_LOG_DIR = "_log"
_DATA_DIR = "data"
_VERSION_DIGITS = 20


class CommitConflict(Exception):
    """Another writer committed this version first — re-read and retry."""


def _log_path(table: str, version: int) -> str:
    return os.path.join(table, _LOG_DIR, f"{version:0{_VERSION_DIGITS}d}.json")


def _list_versions(table: str) -> list[int]:
    logdir = os.path.join(table, _LOG_DIR)
    if not os.path.isdir(logdir):
        return []
    return sorted(
        int(f[:-5])
        for f in os.listdir(logdir)
        if f.endswith(".json") and f[:-5].isdigit()
    )


def latest_version(table: str) -> int | None:
    """Highest committed version, or None for a nonexistent/empty table."""
    versions = _list_versions(table)
    return versions[-1] if versions else None


def _read_commit(table: str, version: int) -> dict:
    with open(_log_path(table, version)) as f:
        return json.load(f)


def _publish_commit(table: str, version: int, entry: dict) -> bool:
    """Atomically publish ``entry`` as ``version``'s commit file: write
    the full JSON to a hidden temp name, fsync, then claim the version
    via ``os.link`` — put-if-absent (False when another writer owns the
    version) AND all-or-nothing, so a concurrent log replayer can never
    open a commit file whose content isn't fully on disk yet. (A bare
    ``O_CREAT|O_EXCL`` create makes the NAME visible before the JSON
    body exists, breaking the 'readers never see a half-commit' claim.)
    On object stores this maps to a single put-if-absent of the final
    object, which is atomic by construction."""
    tmp = os.path.join(table, _LOG_DIR, f".tmp_{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        json.dump(entry, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, _log_path(table, version))
    except FileExistsError:
        return False
    finally:
        os.unlink(tmp)
    return True


def snapshot_files(table: str, version: int | None = None) -> list[str]:
    """Absolute paths of the data files live at ``version`` (default:
    latest). Replays the commit log — overwrite resets, append extends."""
    versions = _list_versions(table)
    if not versions:
        raise FileNotFoundError(f"no snapshot table at {table}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise ValueError(
            f"version {version} not in table {table} (have {versions})"
        )
    live: list[str] = []
    for v in versions:
        if v > version:
            break
        commit = _read_commit(table, v)
        if commit["action"] == "overwrite":
            live = list(commit["files"])
        else:
            live.extend(commit["files"])
    return [os.path.join(table, f) for f in live]


def write_snapshot(
    df: DataFrame,
    table: str,
    mode: str = "append",
    max_retries: int = 5,
    expected_version: int | None = None,
) -> int:
    """Commit ``df`` to the snapshot table atomically; returns the new
    version. ``mode`` is 'append' or 'overwrite'. Safe under concurrent
    writers: data lands in a private directory first, then the commit
    races on an exclusive create of the next log file.

    ``expected_version`` makes the commit CONDITIONAL (true optimistic
    concurrency for read-modify-write callers like merge_snapshot): the
    write commits as ``expected_version + 1`` or raises CommitConflict —
    it never retries onto a later version, because a blind retry would
    publish a result computed against a base the table has moved past
    (the lost-update anomaly). Blind appends keep the retry loop: an
    append is order-independent, so racing to the next free version is
    safe for them."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    commit_id = uuid.uuid4().hex
    rel_dir = os.path.join(_DATA_DIR, commit_id)
    out_dir = os.path.join(table, rel_dir)
    df.write.mode("error").parquet(out_dir)
    files = sorted(
        os.path.join(rel_dir, f)
        for f in os.listdir(out_dir)
        if f.endswith(".parquet")
    )
    os.makedirs(os.path.join(table, _LOG_DIR), exist_ok=True)
    if expected_version is not None:
        version = expected_version + 1
        entry = {"version": version, "action": mode, "files": files}
        if not _publish_commit(table, version, entry):
            raise CommitConflict(
                f"table {table} advanced past version {expected_version}; "
                f"re-read and re-apply the merge"
            )
        return version
    for _ in range(max_retries):
        prev = latest_version(table)
        version = 0 if prev is None else prev + 1
        entry = {"version": version, "action": mode, "files": files}
        if _publish_commit(table, version, entry):
            return version
        # lost the race — recompute next version and retry
    raise CommitConflict(
        f"lost the commit race {max_retries} times on {table}"
    )


def read_snapshot(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame:
    """Read the table as of ``version`` (default: latest) — time travel.
    The returned frame scans exactly the snapshot's live files; schema
    and stats pushdown work as for any parquet read."""
    files = snapshot_files(table, version)
    if not files:
        raise ValueError(f"version has no data files in {table}")
    return spark.read.parquet(*files)


def vacuum(
    table: str,
    keep_versions: int = 1,
    min_file_age_seconds: float = 3600.0,
) -> list[str]:
    """Delete data files unreachable from the last ``keep_versions``
    snapshots (and drop the older log entries). Returns deleted paths.
    The irreversible step of the format — time travel beyond the kept
    window is gone after this.

    Unreferenced files YOUNGER than ``min_file_age_seconds`` are kept
    (Delta's retention-check approach): an in-flight write_snapshot
    stages its data files BEFORE creating the log entry, so without the
    age gate a concurrent vacuum could delete files whose commit then
    succeeds — a committed version pointing at vanished data. Pass
    ``min_file_age_seconds=0`` only when writers are quiesced."""
    versions = _list_versions(table)
    if not versions:
        return []
    kept = versions[-keep_versions:]
    keep_files: set[str] = set()
    base_manifest: list[str] | None = None
    for v in kept:
        live = snapshot_files(table, v)
        keep_files.update(os.path.relpath(p, table) for p in live)
        if base_manifest is None:
            base_manifest = [os.path.relpath(p, table) for p in live]
    # the oldest kept version becomes a self-contained overwrite manifest
    # (a checkpoint): replay must not depend on the log entries deleted
    # below. os.replace keeps the swap atomic for concurrent readers.
    base = kept[0]
    tmp = _log_path(table, base) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"version": base, "action": "overwrite", "files": base_manifest}, f
        )
    os.replace(tmp, _log_path(table, base))
    deleted = []
    data_root = os.path.join(table, _DATA_DIR)
    cutoff = time.time() - min_file_age_seconds
    for dirpath, _, filenames in os.walk(data_root):
        for fname in filenames:
            full = os.path.join(dirpath, fname)
            rel = os.path.relpath(full, table)
            if (
                fname.endswith(".parquet")
                and rel not in keep_files
                and os.path.getmtime(full) <= cutoff
            ):
                os.remove(full)
                deleted.append(full)
    for v in versions:
        if v not in kept:
            os.remove(_log_path(table, v))
    return deleted


def write_snapshot_batch(
    df: DataFrame, table: str, batch_id: int, mode: str = "append"
) -> int | None:
    """Idempotent micro-batch commit — the foreachBatch sink body that
    upgrades Structured Streaming's at-least-once replay to EXACTLY-ONCE
    table commits: each commit records its ``batch_id``, and a replayed
    batch (same id already in the log) is skipped without writing.
    Returns the committed version, or None for a skipped replay.

    This is the reference's OfferOnce/ack-once contract (marketdb-app
    MarketLoader.scala:119) expressed as table-format metadata instead of
    idempotent row keys: the dedup unit is the whole batch, so the data
    needs no natural key. Scale shape: one log read + one exclusive
    create per micro-batch, both driver-side and O(versions), while the
    data write stays fully distributed."""
    for v in reversed(_list_versions(table)):
        commit = _read_commit(table, v)
        if commit.get("batch_id") == batch_id:
            return None  # replayed micro-batch: already committed
    commit_id = uuid.uuid4().hex
    rel_dir = os.path.join(_DATA_DIR, commit_id)
    out_dir = os.path.join(table, rel_dir)
    df.write.mode("error").parquet(out_dir)
    files = sorted(
        os.path.join(rel_dir, f)
        for f in os.listdir(out_dir)
        if f.endswith(".parquet")
    )
    os.makedirs(os.path.join(table, _LOG_DIR), exist_ok=True)
    while True:
        prev = latest_version(table)
        version = 0 if prev is None else prev + 1
        entry = {
            "version": version,
            "action": mode,
            "files": files,
            "batch_id": batch_id,
        }
        if _publish_commit(table, version, entry):
            return version
        # racing writer took this version — if it was OUR batch (a
        # concurrent replay), drop out; otherwise take the next slot.
        # The losing probe reads a FULLY-written commit: _publish_commit
        # only makes a version name visible with complete content.
        if _read_commit(table, version).get("batch_id") == batch_id:
            return None


def snapshot_sink(table: str):
    """foreachBatch callable: ``stream.writeStream.foreachBatch(
    snapshot_sink(path))`` — exactly-once streaming ingest into the
    snapshot table (checkpoint replays dedup on batch_id)."""

    def _sink(batch: DataFrame, batch_id: int) -> None:
        write_snapshot_batch(batch, table, batch_id)

    return _sink


def read_changes(
    spark: SparkSession,
    table: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Incremental (CDC-append) read: the rows ADDED by commits in
    ``(from_version, to_version]`` — the consumer pattern for downstream
    incremental processing (tokenize/embed only the new documents instead
    of rescanning the corpus). Overwrite commits in the range are
    rejected: an overwrite is not expressible as an append delta, and
    silently returning its files would double-count rows that existed
    before ``from_version``."""
    versions = _list_versions(table)
    if to_version is None:
        to_version = versions[-1] if versions else from_version
    new_files: list[str] = []
    for v in versions:
        if from_version < v <= to_version:
            commit = _read_commit(table, v)
            if commit["action"] == "overwrite":
                raise ValueError(
                    f"version {v} is an overwrite — incremental reads are "
                    "only defined over append-only ranges"
                )
            new_files.extend(os.path.join(table, f) for f in commit["files"])
    if not new_files:
        return read_snapshot(spark, table).limit(0)
    return spark.read.parquet(*new_files)


def merge_snapshot(
    spark: SparkSession,
    table: str,
    source: DataFrame,
    key_cols: list[str],
    delete_col: str | None = None,
) -> int:
    """MERGE INTO the snapshot table: upsert ``source`` rows by
    ``key_cols`` (a source row replaces any base row sharing its key; an
    unmatched source row inserts), and rows whose ``delete_col`` is true
    delete their key instead. Returns the committed version.

    Copy-on-write: base rows NOT touched by the merge are carried via a
    left anti-join on the key, unioned with the surviving source rows,
    and committed as one atomic OVERWRITE — readers see the pre- or
    post-merge snapshot, never a mix, and time travel keeps the old
    version. This is the Delta MERGE model reduced to the formats this
    table has; at 100 TB the anti-join prunes to the partitions the
    source keys touch (the idempotent_append pattern in store.py) and
    the rewrite would commit per-partition file replacements rather than
    a full overwrite — the commit protocol is unchanged, only the file
    list shrinks.

    Two Delta-MERGE invariants are enforced, not assumed:
    - CONFLICT SAFETY: the commit is conditional on the version the base
      was read at (write_snapshot expected_version) — if any writer
      committed in between, this raises CommitConflict instead of
      silently publishing a merge computed against a stale base (the
      lost-update anomaly a blind read-modify-write has).
    - SOURCE KEY UNIQUENESS: duplicate keys in one source batch raise
      ValueError (Delta's 'multiple source rows matched'); letting both
      rows land would silently break the upsert-by-key invariant, and
      an update+delete pair for one key has no defined winner."""
    from pyspark.sql import functions as F

    base_version = latest_version(table)
    if base_version is None:
        raise ValueError(f"{table} has no committed version to merge into")
    base = read_snapshot(spark, table, version=base_version)
    dup = (
        source.groupBy(*key_cols)
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"merge source has multiple rows for key "
            f"{tuple(dup[0][k] for k in key_cols)!r}; one row per key "
            f"per batch (Delta 'multiple source rows matched')"
        )
    keys = source.select(*key_cols)
    kept = base.join(keys, on=key_cols, how="left_anti")
    if delete_col is not None:
        survivors = source.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
    else:
        survivors = source
    merged = kept.unionByName(survivors)
    return write_snapshot(
        merged, table, mode="overwrite", expected_version=base_version
    )
