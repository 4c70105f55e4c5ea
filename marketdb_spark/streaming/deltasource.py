"""Delta table as a STREAMING SOURCE — incremental, exactly-once
consumption of the table `sources/deltalog.delta_sink` writes, with no
delta jars: ``spark.readStream.format("deltastream").load(table)``.

This is the read side of the Delta lifecycle loop (delta-spark's own
streaming source, re-expressed over the public protocol): a fresh query
first emits the table's CURRENT SNAPSHOT (the live file set at the
latest version — checkpoint-anchored replay, so log retention is fine),
then tails the transaction log version by version, emitting each new
commit's ``add`` actions.

Offsets are FILE-GRANULAR: ``{"v": U, "i": I, "snap": S}`` means "all
units before U fully consumed, plus the first I files of unit U", where
a *unit* is either the pinned initial snapshot (unit number = the
snapshot version S, files = the sorted live set at S) or one tail
commit (files = its adds in commit order). Two legacy spellings are
still parsed for checkpoint compatibility: ``{"v": -1, "snap": S}``
(nothing consumed, snapshot pinned at S) and ``{"v": N}`` (units ≤ N
fully consumed). Unit file lists are deterministic functions of the
immutable log, so Spark's offset checkpoint replays any committed range
bit-identically — including ranges that stop mid-snapshot.

ADMISSION CONTROL (delta-spark's ``maxFilesPerTrigger`` /
``maxBytesPerTrigger``, ≙ the reference consumer's buffered(1000) bound,
MarketLoader.scala:49,55): with a cap set, ``latestOffset`` advances at
most N files (or a soft byte budget — at least one file always admits,
so an oversized file cannot stall the stream) past the planning
reference per trigger, so a fresh start against a large table or a
burst of commits drains as bounded micro-batches instead of one
unbounded one — the initial snapshot itself drains in capped slices.
Uncapped (the default) keeps the legacy whole-version offsets.

``dataChange`` is honored the way the protocol intends: a commit whose
adds all carry ``dataChange: false`` (OPTIMIZE/compaction — our
optimize_delta, or delta-spark's OPTIMIZE) rearranges bytes without
changing contents, so the tail SKIPS it instead of re-emitting rewritten
rows — exactly-once survives compaction. A ``remove`` with
``dataChange: true`` (overwrite/delete) after the stream started is NOT
an append and RAISES by default; the delta-spark-parity opt-ins relax
it:

- ``ignoreDeletes``   — a commit that only deletes (dataChange removes,
  no dataChange adds) is skipped; delete+rewrite commits still raise.
- ``ignoreChanges``   — a commit's dataChange adds are emitted even when
  it also removes (rewritten files re-deliver their surviving rows:
  AT-LEAST-ONCE for updated data, exactly delta-spark's semantics).
  Implies ignoreDeletes.
- ``skipChangeCommits`` — any commit carrying a dataChange remove is
  skipped entirely (its adds too): exactly-once for untouched rows,
  rewrites silently dropped.

Tail commits are also GATED against mid-stream table upgrades (same
policy as the batch reader's _replay, deltalog.py): a ``protocol``
action declaring features this engine cannot consume raises, and a
``metaData`` action
whose schema, partitionColumns, or column-mapping mode differ from the
stream's pinned state raises instead of misreading new files with the
old schema. Deletion-vector-carrying adds emit the file MINUS its
vector (positions masked executor-side, in the snapshot AND the tail);
a DV rewrite pairs with a dataChange remove, so it needs the same
ignoreChanges opt-in as any rewrite. Column-mapped tables stream natively in BOTH modes: data
files and partitionValues speak physical names, the emitted schema is
logical (mapping metadata stripped), nested struct fields are renamed
executor-side on the Arrow buffers (positionally in name mode, by the
nested PARQUET:field_id in id mode), and id mode resolves data columns
by the file's parquet field id (PARQUET:field_id metadata).

``startingVersion`` / ``startingTimestamp`` (delta-spark parity) skip
the initial snapshot entirely and tail the log FROM that version — the
CDC-style entry point; startingTimestamp resolves to the FIRST commit
at-or-after the instant (the opposite bound from batch read_delta's
timestampAsOf), and a startingVersion past the table's next version is
rejected at open.

Tail replay needs the JSON commits ABOVE the initial snapshot to still
exist — clean_log'ing them out from under a running stream raises at
the next plan rather than dropping data (documented scope; the initial
snapshot itself is checkpoint-anchored and immune to retention).

Executors read each file with pyarrow and return Arrow record batches
(zero row-at-a-time Python); partition columns ride back in from
add.partitionValues (authoritative per the protocol) as constant
columns cast to the table schema's type.

Reference anchor: the Kestrel consumer's replayable-journal contract
(MarketLoader.scala:33-55) with the Delta log as the journal — same
offsets-not-acks model as streaming/queuesource.py, one level up the
storage stack.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from marketdb_spark.sources.deltalog import (
    _LOG,
    _arrow_field_ids,
    _check_reader_protocol,
    _decode_path,
    _field_id,
    _mapping_mode,
    _physical_name,
    _replay,
)

try:  # pyspark >= 4.0
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    HAS_PYTHON_STREAM_SOURCE = True
except ImportError:  # pragma: no cover - older pyspark
    HAS_PYTHON_STREAM_SOURCE = False

    class DataSource:  # type: ignore[no-redef]
        pass

    class DataSourceStreamReader:  # type: ignore[no-redef]
        pass

    class InputPartition:  # type: ignore[no-redef]
        pass


# reserved partitionValues key carrying a file's deletion-vector
# descriptor (JSON) from the planner to read() — the same tagging
# device the CDF reader uses (__cdf_*); readers pop it before any
# partition-value lookup
_DV_TAG = "__dv_descriptor"
_DV_KEEP_TAG = "__dv_keep_descriptors"


class DeltaFilePartition(InputPartition):
    """One task = one data file (+ its partitionValues)."""

    def __init__(self, table: str, rel: str, pvals: dict):
        self.table = table
        self.rel = rel
        self.pvals = pvals


def _commit_path(table: str, version: int) -> str:
    return os.path.join(table, _LOG, f"{version:020d}.json")


def _latest_version(table: str) -> int:
    from marketdb_spark.sources.deltalog import (
        _checkpoint_versions,
        _log_entries,
    )

    entries = _log_entries(table)
    ckpts = _checkpoint_versions(table)
    return max(
        entries[-1][0] if entries else -1, ckpts[-1] if ckpts else -1
    )


def _parse_cap(options: dict, camel: str) -> int | None:
    """A positive-int admission option — Spark lower-cases DataSource
    option keys; direct construction in tests uses camelCase."""
    raw = options.get(camel.lower(), options.get(camel))
    if raw is None:
        return None
    cap = int(raw)
    if cap <= 0:
        raise ValueError(f"{camel} must be positive, got {raw}")
    return cap


def _parse_flag(options: dict, camel: str) -> bool:
    raw = options.get(camel.lower(), options.get(camel))
    if raw is None:
        return False
    if str(raw).lower() in ("true", "1"):
        return True
    if str(raw).lower() in ("false", "0"):
        return False
    raise ValueError(f"{camel} must be true|false, got {raw!r}")


def _first_version_at_or_after(table: str, timestamp_ms: int) -> int:
    """startingTimestamp resolution (delta-spark semantics): the SMALLEST
    retained version whose (monotone-repaired) commit timestamp is
    ≥ ``timestamp_ms``; past the newest commit raises, exactly as
    delta-spark does."""
    from marketdb_spark.sources.deltalog import delta_history

    rows = delta_history(table)[::-1]  # oldest first
    if not rows:
        raise ValueError(f"no retained JSON commits in {table}/{_LOG}")
    mono = []
    last = None
    for r in rows:
        ts = r["timestamp"]
        if ts is None:
            ts = int(
                os.path.getmtime(_commit_path(table, r["version"])) * 1000
            )
        if last is not None and ts < last:
            ts = last
        last = ts
        mono.append((r["version"], ts))
    for v, ts in mono:
        if ts >= timestamp_ms:
            return v
    raise ValueError(
        f"startingTimestamp {timestamp_ms} is after the newest commit of "
        f"{table} (version {mono[-1][0]} at {mono[-1][1]})"
    )


def _parse_mode(options: dict) -> str:
    """Change-commit policy, precedence per delta-spark: skipChangeCommits
    wins, ignoreChanges implies ignoreDeletes."""
    if _parse_flag(options, "skipChangeCommits"):
        return "skipChangeCommits"
    if _parse_flag(options, "ignoreChanges"):
        return "ignoreChanges"
    if _parse_flag(options, "ignoreDeletes"):
        return "ignoreDeletes"
    return "strict"


def _tail_adds(
    table: str,
    version: int,
    *,
    mode: str = "strict",
    pinned_schema_json: str | None = None,
    pinned_parts: list[str] | None = None,
    pinned_cmode: str | None = None,
) -> list[tuple[str, dict, int]]:
    """The (path, partitionValues, size) adds of ONE tail commit,
    honoring dataChange under ``mode`` (module docstring), and gating on
    mid-stream table upgrades: a protocol bump declaring unconsumable
    features or a metaData action that changes the pinned
    schema/partitioning raises — same policy as the batch reader
    (deltalog._replay) — so an external writer remapping columns
    mid-tail fails loudly instead of misreading files. DV-carrying adds
    emit the file MINUS its vector (descriptor tagged through
    partitionValues, applied in read()); a DV rewrite pairs with a
    dataChange remove and therefore still needs the ignoreChanges
    opt-in like any rewrite."""
    path = _commit_path(table, version)
    if not os.path.exists(path):
        raise ValueError(
            f"deltastream cannot replay version {version} of {table}: "
            f"its JSON commit was removed by log retention while the "
            f"stream was tailing (clean_log the prefix below the "
            f"stream's start only)"
        )
    adds: list[tuple[str, dict, int]] = []
    has_change_remove = False
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            action = json.loads(line)
            if "add" in action:
                a = action["add"]
                if a.get("dataChange") is not False:
                    pv = dict(a.get("partitionValues") or {})
                    if a.get("deletionVector"):
                        # the tail emits the file MINUS its vector
                        # (read() masks the positions, like the
                        # snapshot leg): a fresh DV-carrying add
                        # appends exactly its live rows; a DV REWRITE
                        # (paired with a dataChange remove) re-delivers
                        # surviving rows under ignoreChanges —
                        # delta-spark's at-least-once — and still
                        # raises without the opt-in via the
                        # change-remove gate below
                        pv[_DV_TAG] = json.dumps(a["deletionVector"])
                    adds.append(
                        (
                            _decode_path(a["path"]),
                            pv,
                            int(a.get("size") or 0),
                        )
                    )
            elif "remove" in action:
                if action["remove"].get("dataChange") is not False:
                    has_change_remove = True
            elif "protocol" in action:
                # same policy as the batch reader: v2 (column mapping)
                # and v3-with-supported-features pass; DV and friends
                # raise. A mid-stream mapping ENABLE still trips the
                # metaData gate below (enabling it rewrites metaData).
                _check_reader_protocol(
                    {
                        k: v
                        for k, v in action["protocol"].items()
                        if v is not None
                    },
                    f"deltastream tail of {table} at version {version}",
                )
            elif "metaData" in action:
                meta = action["metaData"]
                if pinned_schema_json is None:
                    raise ValueError(
                        f"deltastream: version {version} of {table} "
                        f"carries a metaData action and the stream has "
                        f"no pinned schema to verify it against — "
                        f"restart the stream to adopt the new schema"
                    )
                same_schema = T.StructType.fromJson(
                    json.loads(meta["schemaString"])
                ) == T.StructType.fromJson(json.loads(pinned_schema_json))
                same_parts = list(meta.get("partitionColumns") or []) == list(
                    pinned_parts or []
                )
                same_cmode = pinned_cmode is None or _mapping_mode(
                    meta.get("configuration") or {},
                    f"deltastream tail of {table} at version {version}",
                ) == pinned_cmode
                if not (same_schema and same_parts and same_cmode):
                    raise ValueError(
                        f"deltastream: version {version} of {table} "
                        f"changes the table schema or partitioning "
                        f"mid-stream — restart the stream from a fresh "
                        f"checkpoint to adopt it"
                    )
    if has_change_remove:
        if mode == "skipChangeCommits":
            return []
        if mode == "ignoreChanges":
            return adds  # re-emit rewrites: at-least-once, delta-spark parity
        if mode == "ignoreDeletes" and not adds:
            return []  # delete-only commit: nothing to re-deliver
        hint = (
            "ignoreChanges/skipChangeCommits"
            if adds
            else "ignoreDeletes (or ignoreChanges/skipChangeCommits)"
        )
        raise ValueError(
            f"deltastream: version {version} of {table} removes data "
            f"(overwrite/delete) — not an append-only change; restart "
            f"the stream from a fresh checkpoint to re-snapshot, or opt "
            f"in with {hint}"
        )
    return adds


def _column_by_field_id(tbl, fid: int, logical: str, table: str):
    """Resolve a data column by its parquet field id (column-mapping id
    mode): pyarrow surfaces the file's field ids as PARQUET:field_id
    field metadata. A missing id ABOVE the file's own maximum means the
    file predates the column (ids are assigned monotonically and never
    reused) — returns None so the caller null-fills, the
    schema-evolution contract; a missing id at-or-below the maximum is
    a malformed file → loud error, never a name-guessed column."""
    for i, fld in enumerate(tbl.schema):
        raw = (fld.metadata or {}).get(b"PARQUET:field_id")
        if raw is not None and int(raw) == fid:
            return tbl.column(i)
    present = _arrow_field_ids(tbl.schema)  # all nesting levels
    if present and fid > max(present):
        return None  # file predates the column: null-fill
    raise ValueError(
        f"id-mode table {table}: no parquet column carries field id "
        f"{fid} (logical column {logical!r}) — file written without "
        f"field ids?"
    )


def _arrow_rename(arr, target):
    """Rebuild ``arr`` with the field NAMES of arrow type ``target``
    (identical layout/types — column mapping is a pure rename). Executor
    side, zero-copy for the leaf buffers: structs re-wrap their children,
    lists/maps re-wrap offsets + renamed values."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_struct(t):
        children = [
            _arrow_rename(arr.field(i), target.field(i).type)
            for i in range(t.num_fields)
        ]
        names = [target.field(i).name for i in range(target.num_fields)]
        mask = arr.is_null() if arr.null_count else None
        return pa.StructArray.from_arrays(children, names=names, mask=mask)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        values = _arrow_rename(arr.values, target.value_type)
        cls = pa.LargeListArray if pa.types.is_large_list(t) else pa.ListArray
        mask = arr.is_null() if arr.null_count else None
        return cls.from_arrays(arr.offsets, values, mask=mask)
    if pa.types.is_map(t):
        keys = _arrow_rename(arr.keys, target.key_type)
        items = _arrow_rename(arr.items, target.item_type)
        # MapArray.from_arrays has no mask parameter (pyarrow 16) and
        # would drop the validity bitmap — a NULL map would come back as
        # an empty map. Rebuild via from_buffers, re-wrapping the
        # original validity + offsets buffers around the renamed entries
        # (keys/items of a sliced parent are the FULL child arrays, so
        # offset=arr.offset stays correct).
        kf = pa.field(target.key_field.name, keys.type, nullable=False)
        vf = pa.field(
            target.item_field.name,
            items.type,
            nullable=target.item_field.nullable,
        )
        entries = pa.StructArray.from_arrays([keys, items], fields=[kf, vf])
        return pa.Array.from_buffers(
            pa.map_(kf, vf),
            len(arr),
            arr.buffers()[:2],
            offset=arr.offset,
            children=[entries],
        )
    return arr


def _arrow_resolve_by_id(arr, dt: T.DataType, table: str):
    """Resolve NESTED struct fields by parquet field id (column-mapping
    id mode): ``dt`` is the PINNED Delta datatype whose StructFields
    carry delta.columnMapping.id metadata under their LOGICAL names;
    children are matched against the arrow type's PARQUET:field_id
    metadata — never positionally — so foreign id-mode files with
    reordered or physically-renamed nested fields resolve correctly,
    and a missing nested id raises by name instead of shipping a
    misattributed column. Zero-copy re-wrap, like _arrow_rename."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if isinstance(dt, T.StructType):
        if not pa.types.is_struct(t):
            raise ValueError(
                f"id-mode table {table}: expected a struct column, file "
                f"has {t}"
            )
        by_id = {}
        for i in range(t.num_fields):
            raw = (t.field(i).metadata or {}).get(b"PARQUET:field_id")
            if raw is not None:
                by_id[int(raw)] = i
        children, names = [], []
        for f in dt.fields:
            fid = _field_id(f)
            if fid not in by_id:
                raise ValueError(
                    f"id-mode table {table}: nested field {f.name!r} "
                    f"(field id {fid}) carries no matching "
                    f"PARQUET:field_id in the file's struct — file "
                    f"written without nested field ids?"
                )
            children.append(
                _arrow_resolve_by_id(arr.field(by_id[fid]), f.dataType, table)
            )
            names.append(f.name)
        mask = arr.is_null() if arr.null_count else None
        return pa.StructArray.from_arrays(children, names=names, mask=mask)
    if isinstance(dt, T.ArrayType) and (
        pa.types.is_list(t) or pa.types.is_large_list(t)
    ):
        values = _arrow_resolve_by_id(arr.values, dt.elementType, table)
        cls = pa.LargeListArray if pa.types.is_large_list(t) else pa.ListArray
        mask = arr.is_null() if arr.null_count else None
        return cls.from_arrays(arr.offsets, values, mask=mask)
    if isinstance(dt, T.MapType) and pa.types.is_map(t):
        keys = _arrow_resolve_by_id(arr.keys, dt.keyType, table)
        items = _arrow_resolve_by_id(arr.items, dt.valueType, table)
        kf = pa.field("key", keys.type, nullable=False)
        vf = pa.field("value", items.type, nullable=dt.valueContainsNull)
        entries = pa.StructArray.from_arrays([keys, items], fields=[kf, vf])
        return pa.Array.from_buffers(
            pa.map_(kf, vf),
            len(arr),
            arr.buffers()[:2],
            offset=arr.offset,
            children=[entries],
        )
    return arr


def _apply_dv(tbl, dv_json: str | None, table: str, rel: str):
    """Drop a file's deletion-vector positions from its arrow table —
    executor-side, one boolean mask over the row count (positions are
    file-local row indexes per the protocol). No-op without a tag."""
    if dv_json is None:
        return tbl
    import numpy as np
    import pyarrow as pa

    from marketdb_spark.sources.deltadv import decode_dv

    positions = decode_dv(json.loads(dv_json), table, rel)
    if not positions:
        return tbl
    if positions[-1] >= tbl.num_rows:
        raise ValueError(
            f"deletion vector for {rel} in {table}: position "
            f"{positions[-1]} is out of range for a {tbl.num_rows}-row "
            f"file"
        )
    mask = np.ones(tbl.num_rows, dtype=bool)
    mask[np.asarray(positions, dtype=np.int64)] = False
    return tbl.filter(pa.array(mask))


def _apply_dv_keep(tbl, keep_json: str | None, table: str, rel: str):
    """Keep ONLY the rows a DV-growing re-add newly soft-deleted:
    positions(DV_new) − positions(DV_prev) — the row-level DELETE rows
    of a tailed foreign DV DELETE. The tag carries the two descriptors
    (tiny); positions decode executor-side. No-op without a tag."""
    if keep_json is None:
        return tbl
    import numpy as np
    import pyarrow as pa

    from marketdb_spark.sources.deltadv import decode_dv

    new_desc, prev_desc = json.loads(keep_json)
    keep = set(decode_dv(new_desc, table, rel))
    if prev_desc is not None:
        keep -= set(decode_dv(prev_desc, table, rel))
    positions = sorted(keep)
    if positions and positions[-1] >= tbl.num_rows:
        raise ValueError(
            f"deletion vector for {rel} in {table}: position "
            f"{positions[-1]} is out of range for a {tbl.num_rows}-row "
            f"file"
        )
    mask = np.zeros(tbl.num_rows, dtype=bool)
    if positions:
        mask[np.asarray(positions, dtype=np.int64)] = True
    return tbl.filter(pa.array(mask))


def _contains_struct(dt: T.DataType) -> bool:
    if isinstance(dt, T.StructType):
        return True
    if isinstance(dt, T.ArrayType):
        return _contains_struct(dt.elementType)
    if isinstance(dt, T.MapType):
        return _contains_struct(dt.keyType) or _contains_struct(dt.valueType)
    return False


class DeltaStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, schema: T.StructType):
        self.table = options["path"]
        self.schema = schema
        from marketdb_spark.sources.deltalog import _contains_variant

        if schema is not None and any(
            _contains_variant(f.dataType) for f in schema.fields
        ):
            # the arrow streaming lane reassembles columns from raw
            # parquet reads; VARIANT's binary group is consumable by
            # the BATCH reader but this lane's per-column arrow
            # handling does not reproduce Spark's variant assembly —
            # refuse by name rather than emit misbound binaries
            raise ValueError(
                f"delta streaming of {self.table}: VARIANT columns are "
                f"unsupported in the streaming lanes (read_delta "
                f"handles them in batch)"
            )
        self.part_cols = list(
            json.loads(options.get("partcols") or "[]")
        )
        # the schemaString pinned at stream open (None only under direct
        # test construction) — tail metaData actions verify against it
        self.pinned_schema_json = options.get("schemajson")
        # column mapping: data files and partitionValues speak PHYSICAL
        # names in BOTH modes; under id mode data columns additionally
        # resolve by the file's parquet field id (PARQUET:field_id arrow
        # metadata), not by name — Iceberg-converted files may carry
        # arbitrary column names
        config = json.loads(options.get("configjson") or "{}")
        self.cmode = _mapping_mode(config, self.table)
        if self.cmode in ("name", "id"):
            pinned = T.StructType.fromJson(
                json.loads(self.pinned_schema_json)
            )
            self.phys_of = {f.name: _physical_name(f) for f in pinned.fields}
            self.fid_of = (
                {f.name: _field_id(f) for f in pinned.fields}
                if self.cmode == "id"
                else {}
            )
            # id mode keeps the PINNED datatypes (metadata carries the
            # nested fields' delta.columnMapping.ids) so read() can
            # resolve nested struct fields by field id, not position
            self.pinned_dt = (
                {f.name: f.dataType for f in pinned.fields}
                if self.cmode == "id"
                else {}
            )
        else:
            self.phys_of = {}
            self.fid_of = {}
            self.pinned_dt = {}
        self.mode = _parse_mode(options)
        self.max_files = _parse_cap(options, "maxFilesPerTrigger")
        self.max_bytes = _parse_cap(options, "maxBytesPerTrigger")
        # startingVersion / startingTimestamp (delta-spark parity): tail
        # the log FROM a version, no initial snapshot — the CDC-style
        # entry point. startingTimestamp resolves to the FIRST commit
        # at-or-after the instant (delta-spark's semantics — note this
        # is the opposite bound from batch timestampAsOf).
        sv = options.get("startingversion", options.get("startingVersion"))
        st_ = options.get(
            "startingtimestamp", options.get("startingTimestamp")
        )
        if sv is not None and st_ is not None:
            raise ValueError(
                "pass startingVersion OR startingTimestamp, not both"
            )
        if st_ is not None:
            sv = _first_version_at_or_after(self.table, int(st_))
        self._start_version = int(sv) if sv is not None else None
        if self._start_version is not None:
            if self._start_version < 0:
                raise ValueError(
                    f"startingVersion must be >= 0, got "
                    f"{self._start_version}"
                )
            nxt = _latest_version(self.table) + 1
            if self._start_version > nxt:
                # same validation as delta-spark: anything past the NEXT
                # version would silently re-emit earlier commits once the
                # log catches up through an offset regression
                raise ValueError(
                    f"startingVersion {self._start_version} is beyond the "
                    f"table's next version {nxt}"
                )
        # Driver-side caches/state (the reader instance lives for the
        # query; all best-effort — recomputed deterministically from the
        # immutable log after a restart):
        #   _units[u]  = the unit's file list [(rel, pvals, size)]
        #   _snap      = the pinned snapshot version (learned from any
        #                offset carrying "snap", or pinned fresh)
        #   _planned   = (unit, idx) admission reference: the furthest
        #                position this reader planned or saw planned/
        #                committed. Call-order facts (traced against the
        #                engine, same as queuesource.py): fresh query →
        #                latestOffset first, initialOffset after; restart
        #                → the engine reconstructs the last batch via
        #                partitions(start, end) BEFORE the first
        #                latestOffset, so the reference is re-learned
        #                from the offset log and a capped plan can never
        #                regress below the checkpoint.
        self._units: dict[int, list[tuple[str, dict, int]]] = {}
        self._snap: int | None = None
        self._planned: tuple[int, int] | None = None

    # -- offset plumbing ------------------------------------------------

    def _norm(self, off: dict) -> tuple[int, int]:
        """Normalize any offset spelling to (unit, files_consumed_of_unit),
        learning the snapshot pin from offsets that carry it."""
        if off.get("snap") is not None and self._snap is None:
            self._snap = int(off["snap"])
        if "i" in off:
            return int(off["v"]), int(off["i"])
        v = int(off["v"])
        if v < 0:
            return int(off["snap"]), 0
        return v + 1, 0

    def _observe(self, unit: int, idx: int) -> None:
        if self._planned is None or (unit, idx) > self._planned:
            self._planned = (unit, idx)

    def _unit_files(self, unit: int) -> list[tuple[str, dict, int]]:
        """The unit's immutable file list: the sorted live set for the
        snapshot unit, the commit's adds for a tail unit. Snapshot file
        sizes are stat'd only when a byte cap needs them."""
        fl = self._units.get(unit)
        if fl is None:
            if self._snap is not None and unit == self._snap:
                snap = _replay(self.table, unit)
                # DV-carrying snapshot files are readable: the decoded
                # positions drop executor-side in read(); the descriptor
                # rides the partition under a reserved pvals key (the
                # CDF reader's tagging device). Tail commits that ADD a
                # DV-carrying file still raise in _tail_adds — that is
                # a row-level change an append-only tail can't represent.
                dvs = getattr(snap, "dvs", None) or {}
                live = snap.live
                fl = [
                    (
                        rel,
                        (
                            {**pvals, _DV_TAG: json.dumps(dvs[rel])}
                            if rel in dvs
                            else pvals
                        ),
                        os.path.getsize(os.path.join(self.table, rel))
                        if self.max_bytes is not None
                        else 0,
                    )
                    for rel, pvals in sorted(live.items())
                ]
            else:
                fl = _tail_adds(
                    self.table,
                    unit,
                    mode=self.mode,
                    pinned_schema_json=self.pinned_schema_json,
                    pinned_parts=self.part_cols,
                    pinned_cmode=(
                        self.cmode if self.pinned_schema_json else None
                    ),
                )
            self._units[unit] = fl
        return fl

    # -- engine surface -------------------------------------------------

    def initialOffset(self) -> dict:
        if self._start_version is not None:
            # startingVersion: no snapshot — the stream is the tail of
            # commits ≥ start, spelled in the extended offset form
            # ("units before start fully consumed, zero files of it")
            if self._planned is None:
                self._planned = (self._start_version, 0)
            return {"v": self._start_version, "i": 0}
        # snapshot boundary pinned at stream start: everything live at
        # `snap` arrives as batch 0 (or capped slices of it), the tail
        # starts above it
        if self._snap is None:
            self._snap = _latest_version(self.table)
        if self._planned is None:
            self._planned = (self._snap, 0)
        return {"v": -1, "snap": self._snap}

    def latestOffset(self) -> dict:
        latest = _latest_version(self.table)
        if self.max_files is None and self.max_bytes is None:
            return {"v": latest}
        if self._planned is None:
            # genuinely fresh capped query (a restart would have taught
            # _planned via partitions()/commit() first): pin the
            # snapshot here — the engine calls latestOffset before
            # initialOffset on a fresh query. NEVER pin when a plan
            # reference exists: a restart from legacy whole-version
            # offsets has _snap unknown (the snapshot is long consumed),
            # and pinning `latest` then would make _unit_files misread a
            # future tail commit numbered `latest` as a full snapshot —
            # re-emitting the live set.
            if self._start_version is not None:
                self._planned = (self._start_version, 0)  # no snapshot
            else:
                if self._snap is None:
                    self._snap = latest
                self._planned = (self._snap, 0)
        unit, idx = self._planned
        files_left = self.max_files if self.max_files is not None else float("inf")
        bytes_left = self.max_bytes if self.max_bytes is not None else float("inf")
        while unit <= latest:
            fl = self._unit_files(unit)
            # soft byte budget: admit while any budget remains, so a
            # single file larger than maxBytesPerTrigger still advances
            while idx < len(fl) and files_left > 0 and bytes_left > 0:
                files_left -= 1
                bytes_left -= fl[idx][2]
                idx += 1
            if idx < len(fl) or unit >= latest:
                break  # budget exhausted mid-unit, or fully caught up
            if files_left <= 0 or bytes_left <= 0:
                break  # budget exhausted exactly at a unit boundary
            unit, idx = unit + 1, 0  # roll into the next commit
        self._planned = (unit, idx)
        off = {"v": unit, "i": idx}
        if self._snap is not None:
            off["snap"] = self._snap
        return off

    def partitions(self, start: dict, end: dict):
        su, si = self._norm(start)
        eu, ei = self._norm(end)
        # a replayed batch (restart recovery) teaches the admission
        # reference where the checkpoint already reached
        self._observe(su, si)
        # REGRESSION GUARD (capped mode only, same rationale as
        # queuesource.py): an end below the checkpointed start means a
        # capped plan from a stale reference — the failure mode is
        # SILENT duplicate delivery once the regressed end lands in the
        # offset log, so fail loudly instead.
        if (self.max_files is not None or self.max_bytes is not None) and (
            eu,
            ei,
        ) < (su, si):
            raise RuntimeError(
                f"deltastream offset regression: planned end "
                f"({eu},{ei}) < checkpointed start ({su},{si}) — "
                f"refusing to plan a batch whose offset would "
                f"re-deliver consumed files"
            )
        files: list[tuple[str, dict, int]] = []
        for unit in range(su, eu + 1):
            lo = si if unit == su else 0
            if unit == eu and ei == 0:
                break  # end-boundary unit contributes nothing (it may
                #        not even exist yet under the legacy spelling)
            fl = self._unit_files(unit)
            hi = ei if unit == eu else len(fl)
            if hi > lo:
                files.extend(fl[lo:hi])
        self._observe(eu, ei)
        return [
            DeltaFilePartition(self.table, rel, pvals)
            for rel, pvals, _size in files
        ] or [DeltaFilePartition(self.table, "", {})]

    def read(self, partition: DeltaFilePartition):
        if not partition.rel:
            return iter(())
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_type

        pvals = dict(partition.pvals)
        dv_json = pvals.pop(_DV_TAG, None)
        tbl = pq.read_table(os.path.join(partition.table, partition.rel))
        tbl = _apply_dv(tbl, dv_json, partition.table, partition.rel)
        n = tbl.num_rows
        cols, names = [], []
        for f in self.schema.fields:
            phys = self.phys_of.get(f.name, f.name)
            if (
                f.name in self.part_cols
                or phys in pvals
                or f.name in pvals
            ):
                # partitionValues are keyed by PHYSICAL names under
                # column mapping (logical otherwise) and are strings per
                # the protocol; cast to the table-schema type through
                # arrow
                raw = pvals.get(phys, pvals.get(f.name))
                at = to_arrow_type(f.dataType)
                const = pa.array([raw] * n, pa.string()).cast(at)
                cols.append(const)
            else:
                if self.cmode == "id":
                    col = _column_by_field_id(
                        tbl, self.fid_of[f.name], f.name, self.table
                    )
                    if col is None:  # file predates the evolved column
                        col = pa.nulls(n, to_arrow_type(f.dataType))
                    else:
                        col = col.combine_chunks()
                        if _contains_struct(f.dataType):
                            # nested struct fields resolve by field id
                            # too (matching the batch lane), never
                            # positionally
                            col = _arrow_resolve_by_id(
                                col, self.pinned_dt[f.name], self.table
                            )
                elif phys not in tbl.schema.names:
                    # mergeSchema evolution: pre-evolution files lack
                    # the column entirely — null-fill by design
                    col = pa.nulls(n, to_arrow_type(f.dataType))
                else:
                    col = tbl.column(phys).combine_chunks()
                    if self.cmode == "name" and _contains_struct(
                        f.dataType
                    ):
                        # nested struct fields rename POSITIONALLY (file
                        # schema order = schemaString order for delta
                        # writers in name mode)
                        col = _arrow_rename(col, to_arrow_type(f.dataType))
                at = to_arrow_type(f.dataType)
                if col.type != at:
                    # pre-widening files carry the NARROWER physical
                    # type (delta typeWidening); an impossible cast
                    # raises loudly, never a silent misread
                    col = col.cast(at)
                cols.append(col)
            names.append(f.name)
        yield from pa.table(dict(zip(names, cols))).to_batches()

    def commit(self, end: dict) -> None:
        # log retention belongs to the table owner; the committed offset
        # still feeds the admission reference (restart path)
        eu, ei = self._norm(end)
        self._observe(eu, ei)
        # drop file-list cache entries for fully-committed units — a
        # long-running tail otherwise accumulates one entry per commit
        # ever consumed (recomputable from the log if a replay needs one)
        for u in [u for u in self._units if u < eu]:
            del self._units[u]


class DeltaStreamDataSource(DataSource):
    """``spark.readStream.format("deltastream").load(table)`` — snapshot
    + append tail of a Delta table, compaction-aware, no jars."""

    @classmethod
    def name(cls) -> str:
        return "deltastream"

    def schema(self) -> T.StructType:
        # a StructType (not DDL text — toDDL needs a SparkContext, and
        # this runs inside the sessionless planner worker). LOGICAL
        # names, mapping metadata stripped — physical names are a
        # storage detail the stream's consumers never see.
        from marketdb_spark.sources.deltalog import _strip_field_metadata

        snap = _replay(self.options["path"], None)
        return _strip_field_metadata(
            T.StructType.fromJson(json.loads(snap.schema_json))
        )

    def streamReader(self, schema) -> DeltaStreamReader:
        opts = dict(self.options)
        snap = _replay(self.options["path"], None)
        opts["partcols"] = json.dumps(snap.part_cols)
        opts["schemajson"] = snap.schema_json
        opts["configjson"] = json.dumps(snap.config)
        return DeltaStreamReader(opts, schema)


def register_delta_stream_source(spark: SparkSession) -> None:
    """Idempotent format registration."""
    spark.dataSource.register(DeltaStreamDataSource)


def _logical_schema(table: str) -> T.StructType:
    """The table's logical schema, computed DRIVER-side (one in-process
    log replay). Passing it to ``.schema(...)`` lets ``load()`` skip the
    engine's schema-resolution worker spawn — measured ~0.1 s per query
    start on the Python DataSource lane — instead of round-tripping to a
    fresh Python worker that runs the same replay."""
    from marketdb_spark.sources.deltalog import _strip_field_metadata

    snap = _replay(table, None)
    return _strip_field_metadata(
        T.StructType.fromJson(json.loads(snap.schema_json))
    )


def read_delta_stream(spark: SparkSession, table: str, **options):
    """Convenience: register + open the stream on ``table``. Keyword
    options pass through (maxFilesPerTrigger, maxBytesPerTrigger,
    ignoreDeletes, ignoreChanges, skipChangeCommits)."""
    register_delta_stream_source(spark)
    reader = spark.readStream.format("deltastream").schema(
        _logical_schema(table)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(table)


# -- Change Data Feed as a STREAMING SOURCE ------------------------------
# ``spark.readStream.format("deltacdf").load(table)`` — the streaming
# form of sources/deltalog.read_change_feed (delta-spark's
# ``readChangeFeed`` stream): emits each commit's row-level changes as
# they land, with _change_type / _commit_version / _commit_timestamp.
#
# Reuses DeltaStreamReader's entire offset/admission machinery by
# subclassing: the same file-granular {"v", "i", "snap"} offsets, the
# same maxFilesPerTrigger/maxBytesPerTrigger caps, the same
# startingVersion/startingTimestamp entry, the same restart recovery.
# Only the UNITS differ — a fresh stream's unit 0 is the current
# snapshot AS INSERTS (delta-spark's initial batch for a CDF stream),
# and every tail unit is the commit's CHANGE SET: its cdc files when it
# recorded any (the protocol rule: cdc actions are authoritative and
# the add/remove actions are ignored for CDF), else inserts derived
# from dataChange adds and deletes derived by reading dataChange
# removes' files (vacuumed derivation inputs raise by name). The
# ignoreDeletes/ignoreChanges/skipChangeCommits opt-ins do NOT apply —
# a CDF consumer wants the changes; compaction commits still
# contribute nothing.

_CDF_TAG_TYPE = "__cdf_change_type"
_CDF_TAG_VERSION = "__cdf_version"
_CDF_TAG_TS = "__cdf_ts"

_CDF_EXTRA_FIELDS = [
    T.StructField("_change_type", T.StringType(), False),
    T.StructField("_commit_version", T.LongType(), False),
    T.StructField("_commit_timestamp", T.TimestampType(), True),
]


class DeltaCDFStreamReader(DeltaStreamReader):
    def __init__(self, options: dict, schema: T.StructType):
        super().__init__(options, schema)
        if self.mode != "strict":
            raise ValueError(
                "deltacdf: ignoreDeletes/ignoreChanges/skipChangeCommits "
                "do not apply to a change-feed stream — it EMITS the "
                "changes those flags would hide"
            )
        config = json.loads(options.get("configjson") or "{}")
        if str(
            config.get("delta.enableChangeDataFeed", "")
        ).lower() != "true":
            raise ValueError(
                f"change data was not recorded for {self.table}: "
                f"delta.enableChangeDataFeed is not set"
            )
        self._stamps: dict[int, int | None] | None = None

    def _commit_ts(self, version: int) -> int | None:
        if self._stamps is None:
            from marketdb_spark.sources.deltalog import delta_history

            self._stamps = {
                r["version"]: r["timestamp"]
                for r in delta_history(self.table)
            }
        return self._stamps.get(version)

    def _tag(self, pvals: dict, ctype: str | None, version: int) -> dict:
        out = dict(pvals)
        out[_CDF_TAG_TYPE] = ctype
        out[_CDF_TAG_VERSION] = version
        out[_CDF_TAG_TS] = self._commit_ts(version)
        return out

    def _unit_files(self, unit: int):
        fl = self._units.get(unit)
        if fl is not None:
            return fl
        if self._snap is not None and unit == self._snap:
            # fresh stream: the current snapshot arrives as INSERTS
            # (delta-spark's initial CDF batch), capped like any unit
            snap = _replay(self.table, unit)
            # DV-carrying snapshot files read minus their deleted
            # positions (descriptor tagged through pvals, applied in
            # read()); DV adds in TAILED commits derive by DV diff in
            # _cdf_tail
            dvs = getattr(snap, "dvs", None) or {}
            live = snap.live
            fl = [
                (
                    rel,
                    self._tag(
                        {**pvals, _DV_TAG: json.dumps(dvs[rel])}
                        if rel in dvs
                        else pvals,
                        "insert",
                        unit,
                    ),
                    os.path.getsize(os.path.join(self.table, rel))
                    if self.max_bytes is not None
                    else 0,
                )
                for rel, pvals in sorted(live.items())
            ]
        else:
            fl = self._cdf_tail(unit)
        self._units[unit] = fl
        return fl

    def _prior_dv_map(self, version: int) -> dict:
        """{live path: DV descriptor or None} as of ``version - 1``,
        maintained INCREMENTALLY across the stream's monotone version
        walk (ADVICE r13): one full _replay anchors the map (version 0
        anchors empty — nothing precedes it), then each later call
        rolls it forward by reading only the commit JSONs in the gap —
        O(new commits) per micro-batch, not O(log length) per
        DV-carrying version. Falls back to a fresh replay if the walk
        ever goes backwards (restart replaying an old unit)."""
        from marketdb_spark.sources.deltalog import _decode_path, _replay

        cur = getattr(self, "_dv_prior", None)
        cur_v = getattr(self, "_dv_prior_version", None)
        if cur is None or cur_v is None or cur_v > version - 1:
            if version == 0:
                cur, cur_v = {}, -1
            else:
                ps = _replay(self.table, version - 1)
                ps_dvs = getattr(ps, "dvs", None) or {}
                cur = {p: ps_dvs.get(p) for p in ps.live}
                cur_v = version - 1
        for v in range(cur_v + 1, version):
            path = _commit_path(self.table, v)
            try:
                with open(path) as f:
                    lines = [l.strip() for l in f if l.strip()]
            except OSError:
                # gap commit expired mid-walk: re-anchor with a replay
                ps = _replay(self.table, version - 1)
                ps_dvs = getattr(ps, "dvs", None) or {}
                cur, cur_v = (
                    {p: ps_dvs.get(p) for p in ps.live},
                    version - 1,
                )
                break
            rm: list[str] = []
            ad: dict = {}
            for line in lines:
                action = json.loads(line)
                if "add" in action:
                    ad[_decode_path(action["add"]["path"])] = action[
                        "add"
                    ].get("deletionVector")
                elif "remove" in action:
                    rm.append(_decode_path(action["remove"]["path"]))
            for p in rm:
                cur.pop(p, None)
            cur.update(ad)
            cur_v = v
        self._dv_prior, self._dv_prior_version = cur, version - 1
        return cur

    def _cdf_tail(self, version: int):
        """One tail commit's CHANGE-SET file list, protocol rules applied
        (cdc authoritative; else derive), with the same mid-stream
        protocol/metaData gates as the parent reader."""
        from marketdb_spark.sources.deltalog import _check_reader_protocol

        path = _commit_path(self.table, version)
        if not os.path.exists(path):
            raise ValueError(
                f"deltacdf cannot replay version {version} of "
                f"{self.table}: its JSON commit was removed by log "
                f"retention while the stream was tailing"
            )
        cdcs: list[tuple[str, dict]] = []
        adds: list[tuple[str, dict]] = []
        removes: list[tuple[str, dict]] = []
        dv_adds: dict[str, dict] = {}
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "cdc" in action:
                    c = action["cdc"]
                    cdcs.append(
                        (_decode_path(c["path"]), c.get("partitionValues") or {})
                    )
                elif "add" in action:
                    a = action["add"]
                    if a.get("dataChange") is not False:
                        if a.get("deletionVector"):
                            # derived after the parse via DV diff —
                            # unless the commit recorded cdc files
                            # (cdc wins, matching read_change_feed)
                            dv_adds[_decode_path(a["path"])] = a[
                                "deletionVector"
                            ]
                        adds.append(
                            (
                                _decode_path(a["path"]),
                                a.get("partitionValues") or {},
                            )
                        )
                elif "remove" in action:
                    r = action["remove"]
                    if r.get("dataChange") is not False:
                        pv = dict(r.get("partitionValues") or {})
                        if r.get("deletionVector"):
                            # the tombstone's descriptor IS the file's
                            # row set at removal time — the delete rows
                            # derive as file minus vector (read() masks
                            # the positions, same as the snapshot leg)
                            pv[_DV_TAG] = json.dumps(r["deletionVector"])
                        removes.append((_decode_path(r["path"]), pv))
                elif "protocol" in action:
                    _check_reader_protocol(
                        {
                            k: v
                            for k, v in action["protocol"].items()
                            if v is not None
                        },
                        f"deltacdf tail of {self.table} at version {version}",
                    )
                elif "metaData" in action:
                    meta = action["metaData"]
                    if self.pinned_schema_json is not None:
                        same = T.StructType.fromJson(
                            json.loads(meta["schemaString"])
                        ) == T.StructType.fromJson(
                            json.loads(self.pinned_schema_json)
                        )
                        if not same:
                            raise ValueError(
                                f"deltacdf: version {version} of "
                                f"{self.table} changes the table schema "
                                f"mid-stream — restart to adopt it"
                            )
        out: list[tuple[str, dict, int]] = []
        if cdcs:
            for rel, pvals in cdcs:
                full = os.path.join(self.table, rel)
                out.append(
                    (
                        rel,
                        self._tag(pvals, None, version),  # in-band type
                        os.path.getsize(full)
                        if self.max_bytes is not None
                        else 0,
                    )
                )
            return out
        dv_deletes: list[tuple[str, dict]] = []
        if dv_adds:
            # DV-carrying adds without cdc: derive row-level changes by
            # DV diff against the prior version, exactly like batch
            # read_change_feed — a re-added live file's delete rows are
            # positions(DV_new) − positions(DV_prev) (tag carries both
            # descriptors; read() masks executor-side), a fresh DV add
            # inserts the file minus its vector, a SHRINKING vector
            # (un-delete/RESTORE) raises by name.
            from marketdb_spark.sources.deltadv import decode_dv

            prior = self._prior_dv_map(version)
            re_added: set[str] = set()
            tagged_adds: list[tuple[str, dict]] = []
            for rel, pvals in adds:
                desc = dv_adds.get(rel)
                if desc is None:
                    tagged_adds.append((rel, pvals))
                    continue
                try:
                    new_pos = set(decode_dv(desc, self.table, rel))
                    old_pos = (
                        set(decode_dv(prior[rel], self.table, rel))
                        if prior.get(rel) is not None
                        else set()
                    )
                except ValueError as e:
                    raise ValueError(
                        f"deltacdf: cannot derive changes for version "
                        f"{version} of {self.table}: {e}"
                    ) from None
                if rel not in prior:
                    pv = dict(pvals)
                    pv[_DV_TAG] = json.dumps(desc)
                    tagged_adds.append((rel, pv))
                    continue
                if old_pos - new_pos:
                    raise ValueError(
                        f"deltacdf: cannot derive changes for version "
                        f"{version} of {self.table}: {rel}'s deletion "
                        f"vector SHRANK (rows un-deleted, e.g. "
                        f"RESTORE) — row-level un-deletes are not "
                        f"derivable and the commit recorded no cdc "
                        f"files"
                    )
                re_added.add(rel)
                if new_pos - old_pos:
                    pv = dict(pvals)
                    pv[_DV_KEEP_TAG] = json.dumps(
                        [desc, prior.get(rel)]
                    )
                    dv_deletes.append((rel, pv))
            adds = tagged_adds
            # a re-added file's paired tombstone is not a whole-file
            # delete
            removes = [x for x in removes if x[0] not in re_added]
        for rel, pvals in dv_deletes:
            full = os.path.join(self.table, rel)
            out.append(
                (
                    rel,
                    self._tag(pvals, "delete", version),
                    os.path.getsize(full)
                    if self.max_bytes is not None
                    else 0,
                )
            )
        for rel, pvals in removes:
            full = os.path.join(self.table, rel)
            if not os.path.exists(full):
                raise ValueError(
                    f"deltacdf: cannot derive deletes for version "
                    f"{version} of {self.table}: removed file {rel} is "
                    f"no longer on disk (vacuumed) and the commit "
                    f"recorded no cdc files"
                )
            out.append(
                (
                    rel,
                    self._tag(pvals, "delete", version),
                    os.path.getsize(full)
                    if self.max_bytes is not None
                    else 0,
                )
            )
        for rel, pvals in adds:
            full = os.path.join(self.table, rel)
            out.append(
                (
                    rel,
                    self._tag(pvals, "insert", version),
                    os.path.getsize(full)
                    if self.max_bytes is not None
                    else 0,
                )
            )
        return out

    def read(self, partition: DeltaFilePartition):
        if not partition.rel:
            return iter(())
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_type

        pvals = dict(partition.pvals)
        ctype = pvals.pop(_CDF_TAG_TYPE)
        version = pvals.pop(_CDF_TAG_VERSION)
        ts = pvals.pop(_CDF_TAG_TS)
        dv_json = pvals.pop(_DV_TAG, None)
        dv_keep_json = pvals.pop(_DV_KEEP_TAG, None)
        tbl = pq.read_table(
            os.path.join(partition.table, partition.rel)
        )
        tbl = _apply_dv(tbl, dv_json, partition.table, partition.rel)
        tbl = _apply_dv_keep(
            tbl, dv_keep_json, partition.table, partition.rel
        )
        n = tbl.num_rows
        cols, names = [], []
        for f in self.schema.fields:
            if f.name == "_change_type":
                if ctype is None:  # cdc file: the column is in-band
                    cols.append(tbl.column("_change_type").combine_chunks())
                else:
                    cols.append(pa.array([ctype] * n, pa.string()))
            elif f.name == "_commit_version":
                cols.append(pa.array([version] * n, pa.int64()))
            elif f.name == "_commit_timestamp":
                at = to_arrow_type(f.dataType)
                cols.append(
                    pa.array(
                        [None if ts is None else int(ts) * 1000] * n,
                        pa.int64(),
                    ).cast(at)
                )
            else:
                phys = self.phys_of.get(f.name, f.name)
                if (
                    f.name in self.part_cols
                    or phys in pvals
                    or f.name in pvals
                ):
                    raw = pvals.get(phys, pvals.get(f.name))
                    at = to_arrow_type(f.dataType)
                    cols.append(pa.array([raw] * n, pa.string()).cast(at))
                else:
                    if self.cmode == "id":
                        col = _column_by_field_id(
                            tbl, self.fid_of[f.name], f.name, self.table
                        )
                        if col is None:  # pre-evolution file
                            col = pa.nulls(n, to_arrow_type(f.dataType))
                        else:
                            col = col.combine_chunks()
                            if _contains_struct(f.dataType):
                                col = _arrow_resolve_by_id(
                                    col, self.pinned_dt[f.name], self.table
                                )
                    elif phys not in tbl.schema.names:
                        col = pa.nulls(n, to_arrow_type(f.dataType))
                    else:
                        col = tbl.column(phys).combine_chunks()
                        if self.cmode == "name" and _contains_struct(
                            f.dataType
                        ):
                            col = _arrow_rename(
                                col, to_arrow_type(f.dataType)
                            )
                    at = to_arrow_type(f.dataType)
                    if col.type != at:
                        col = col.cast(at)  # typeWidening promotion
                    cols.append(col)
            names.append(f.name)
        yield from pa.table(dict(zip(names, cols))).to_batches()


class DeltaCDFDataSource(DataSource):
    """``spark.readStream.format("deltacdf").load(table)`` — streaming
    Change Data Feed over the public protocol, no jars."""

    @classmethod
    def name(cls) -> str:
        return "deltacdf"

    def schema(self) -> T.StructType:
        from marketdb_spark.sources.deltalog import _strip_field_metadata

        snap = _replay(self.options["path"], None)
        logical = _strip_field_metadata(
            T.StructType.fromJson(json.loads(snap.schema_json))
        )
        return T.StructType(list(logical.fields) + _CDF_EXTRA_FIELDS)

    def streamReader(self, schema) -> DeltaCDFStreamReader:
        opts = dict(self.options)
        snap = _replay(self.options["path"], None)
        opts["partcols"] = json.dumps(snap.part_cols)
        opts["schemajson"] = snap.schema_json
        opts["configjson"] = json.dumps(snap.config)
        return DeltaCDFStreamReader(opts, schema)


def read_delta_cdf_stream(spark: SparkSession, table: str, **options):
    """Convenience: register + open a CDF stream on ``table``. Options
    pass through (startingVersion, startingTimestamp,
    maxFilesPerTrigger, maxBytesPerTrigger)."""
    spark.dataSource.register(DeltaCDFDataSource)
    reader = spark.readStream.format("deltacdf").schema(
        T.StructType(
            list(_logical_schema(table).fields) + _CDF_EXTRA_FIELDS
        )
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(table)
