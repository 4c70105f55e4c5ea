"""Row-level Delta DML — DELETE / UPDATE / MERGE as file-granular
commits over the public transaction-log protocol
(https://github.com/delta-io/delta/blob/master/PROTOCOL.md), no delta
jars. The missing third of the table lifecycle next to the writer
(deltalog.write_delta) and the maintenance ops (optimize/vacuum/
checkpoint): what delta-spark's ``DELETE FROM`` / ``UPDATE`` /
``MERGE INTO`` compile to, re-expressed Spark-first.

Two write shapes, exactly delta-spark's:

- On tables with ``delta.enableDeletionVectors=true`` (and the feature
  declared), the clause-affected positions join each touched file's
  DELETION VECTOR (``add(file, DV')`` + descriptor-carrying remove, one
  shared on-disk .bin per commit) and only modified rows + inserts
  write data bytes — a metadata-sized commit instead of rewriting the
  touched files wholesale at 100 TB. ``dv_max_fraction`` falls
  heavily-affected files back to copy-on-write.
- Otherwise, copy-on-write:

1. ONE scan of the live file set finds the files that contain any row
   matching the predicate / join keys (``input_file_name()`` per row —
   stays in the scan stage, no shuffle). Files without a match are
   never touched: a DELETE of one day from a 100 TB table rewrites
   that day's files only.
2. The matched files are re-read and rewritten WITHOUT the deleted
   rows (with updated rows, with merged rows), staged under fresh
   names; MERGE's not-matched inserts stage as additional new files.
3. One commit claims the next version: ``remove`` for every matched
   file, ``add`` for every rewritten/new file (all ``dataChange:
   true``), plus ``cdc`` actions when the table has
   ``delta.enableChangeDataFeed`` — DELETE records 'delete' rows,
   UPDATE records 'update_preimage'/'update_postimage' pairs, MERGE
   records all of insert/delete/preimage/postimage per clause, which
   is precisely what read_change_feed replays to downstream
   incremental consumers.

Concurrency follows optimize_delta's discipline: the put-if-absent
commit race retries only while every matched file is still live; a
concurrent commit that removed one makes this DML stale →
CommitConflict (delta-spark resolves the same conflicts the same way).
Column-mapped tables work throughout — the row-level ops speak the
LOGICAL schema, staging re-speaks physical names.

Reference anchor: the reference's store is append-only puts + bulk
loads (MarketDB.scala put/bulk paths); row-level repair there means
re-putting corrected rows over old row keys. Delta DML is the
lakehouse generalization this engine adds on top: the same
"correct in place, atomically, without rewriting the world" contract,
with provenance (commitInfo + CDF) the HBase path never had.
"""

from __future__ import annotations

import json
import os
import typing as _t
from urllib.parse import quote, unquote, urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from marketdb_spark.sources.deltalog import (
    _CDF_DIR,
    _CDF_FLAG,
    _LOG,
    _Snapshot,
    _check_writer_protocol,
    _checkpoint_versions,
    _enforce_write_obligations,
    _commit_info,
    _field_id,
    _log_entries,
    _mapping_mode,
    _PARQUET_FID,
    _physical_datatype,
    _physical_name,
    _publish_commit,
    _replay,
    _scan_files,
    _stage_files,
    _strip_field_metadata,
    _unstage,
)

_FILE_COL = "__dml_file"
_DV_FLAG = "delta.enableDeletionVectors"


def _dv_write_enabled(snap: _Snapshot, table: str) -> bool:
    """True when DML may CREATE deletion vectors for this table:
    ``delta.enableDeletionVectors=true`` AND the protocol declares the
    feature (delta-spark's rule — the config alone never upgrades a
    protocol). Column-mapped tables qualify too (the modern
    Databricks/delta-rs default shape): DV descriptors key PHYSICAL
    file paths and positions are parquet row indexes — mapping-blind —
    while the position scans speak physical column names via
    _phys_read."""
    if str((snap.config or {}).get(_DV_FLAG, "")).lower() != "true":
        return False
    return "deletionVectors" in set(
        (snap.protocol or {}).get("writerFeatures") or ()
    )


def _phys_read(
    spark: SparkSession,
    snap: _Snapshot,
    table: str,
    subset: dict,
    extra_fields: list[T.StructField] | None = None,
) -> tuple[T.StructType, list, dict[str, str]]:
    """(read schema over the DATA columns AS STORED, logical rename
    list, logical→physical partitionValues key) for a direct parquet
    read of this table's files — the same mapped-table kernel
    _scan_files uses, shared by the DML position scans: under column
    mapping the data files store ``col-<uuid>`` physical names (id mode
    additionally resolves by parquet field id — the session conf is
    set and the footer preflight runs here too), and
    add.partitionValues are keyed by physical names. ``extra_fields``
    (the row-tracking materialized columns) are stored VERBATIM — never
    name-mapped, per the protocol."""
    from marketdb_spark.sources.deltalog import _require_field_ids

    schema = T.StructType.fromJson(json.loads(snap.schema_json))
    part_cols = snap.part_cols
    cmode = _mapping_mode(snap.config, table)
    mapped = cmode in ("name", "id")
    with_ids = cmode == "id"
    data_fields = [f for f in schema.fields if f.name not in part_cols]
    if with_ids:
        spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
        _require_field_ids(table, subset, data_fields)
    if mapped:
        data_schema = T.StructType(
            [
                T.StructField(
                    _physical_name(f),
                    _physical_datatype(f.dataType, with_ids),
                    f.nullable,
                    {_PARQUET_FID: _field_id(f)} if with_ids else None,
                )
                for f in data_fields
            ]
        )
        renames = []
        for f in data_fields:
            phys_dt = _physical_datatype(f.dataType, with_ids)
            col = F.col(_physical_name(f))
            if phys_dt != f.dataType:
                col = col.cast(_strip_field_metadata(f.dataType))
            renames.append(col.alias(f.name))
        pv_key = {
            f.name: _physical_name(f)
            for f in schema.fields
            if f.name in part_cols
        }
    else:
        data_schema = T.StructType(
            [
                T.StructField(f.name, f.dataType, f.nullable)
                for f in data_fields
            ]
        )
        renames = [F.col(f.name) for f in data_fields]
        pv_key = {c: c for c in part_cols}
    for f in extra_fields or []:
        data_schema = T.StructType(data_schema.fields + [f])
        renames = renames + [F.col(f.name)]
    return data_schema, renames, pv_key


def _matched_hits(
    spark: SparkSession,
    table: str,
    snap: _Snapshot,
    subset: dict,
    cond,
) -> DataFrame:
    """(``__dml_f`` file URI, ``__dml_ri`` row index) of every PHYSICAL
    row of ``subset``'s files matching ``cond`` — the raw per-file
    coordinates a deletion vector speaks (PROTOCOL.md: DV positions are
    file-local row indexes). One scan per distinct partition tuple
    (literals attached so the predicate can reference partition
    columns); rows a prior DV already soft-deleted may match again (the
    caller unions with the prior vector, so they change nothing).
    Column-mapped tables read under physical names and rename back to
    logical before the predicate applies (_phys_read) — DV positions
    are mapping-blind, so nothing downstream changes. NOTHING row-sized
    is collected from this frame — the DV write path aggregates it into
    per-file roaring bitmaps executor-side (_dv_bitmap_blobs)."""
    schema = T.StructType.fromJson(json.loads(snap.schema_json))
    part_cols = snap.part_cols
    data_schema, renames, pv_key = _phys_read(spark, snap, table, subset)
    types = {f.name: _strip_field_metadata(f.dataType) for f in schema.fields}
    by_part: dict[tuple, list[str]] = {}
    for rel, pvals in subset.items():
        key = tuple((pvals or {}).get(pv_key[c]) for c in part_cols)
        by_part.setdefault(key, []).append(rel)
    parts: list[DataFrame] = []
    for key, rels in by_part.items():
        df = spark.read.schema(data_schema).parquet(
            *[os.path.join(table, r) for r in rels]
        )
        df = df.select(
            *renames,
            F.col("_metadata.file_path").alias("__dml_f"),
            F.col("_metadata.row_index").alias("__dml_ri"),
        )
        for c, raw in zip(part_cols, key):
            df = df.withColumn(
                c,
                (F.lit(None) if raw is None else F.lit(raw)).cast(types[c]),
            )
        parts.append(
            df.filter(F.coalesce(cond, F.lit(False))).select(
                "__dml_f", "__dml_ri"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _dv_bitmap_blobs(
    table: str,
    hits: DataFrame,
    prior_descs: dict,
    uri: bool = True,
) -> dict[str, tuple[bytes, int, int]]:
    """rel → (serialized union DV, union cardinality, NEW cardinality)
    from a (``__dml_f``/rel, ``__dml_ri``) frame: groupBy file →
    applyInPandas builds each file's roaring bitmap IN THE TASK (a
    prior on-disk/inline DV decodes executor-side and unions in), so
    the driver receives one KB-sized blob per file — never O(matched
    rows) positions (delta-spark's DV writer shape; VERDICT r13 item 2
    / ADVICE r13 medium). Per-file memory is bounded by one file's
    matched positions — the same bound delta-spark's per-file bitmap
    aggregation carries. ``uri``: the file column holds percent-encoded
    ``file:`` URIs (_metadata.file_path) rather than table-relative
    paths."""
    import pandas as _pd

    table_abs = os.path.abspath(table)
    descs = {r: d for r, d in (prior_descs or {}).items() if d is not None}
    out_schema = T.StructType(
        [
            T.StructField("__dml_f", T.StringType()),
            T.StructField("__dv", T.BinaryType()),
            T.StructField("__card", T.LongType()),
            T.StructField("__new", T.LongType()),
        ]
    )

    def _agg(pdf: "_pd.DataFrame") -> "_pd.DataFrame":
        from marketdb_spark.sources.deltadv import decode_dv, serialize_dv

        f = pdf["__dml_f"].iloc[0]
        rel = _rel_of_uri(table_abs, f) if uri else f
        pos = set(int(v) for v in pdf["__dml_ri"].unique())
        desc = descs.get(rel)
        old = (
            set(decode_dv(desc, table_abs, rel)) if desc is not None else set()
        )
        new = pos - old
        union = old | new
        return _pd.DataFrame(
            {
                "__dml_f": [rel],
                "__dv": [serialize_dv(union)],
                "__card": [len(union)],
                "__new": [len(new)],
            }
        )

    out: dict[str, tuple[bytes, int, int]] = {}
    for row in hits.groupBy("__dml_f").applyInPandas(_agg, out_schema).collect():
        out[row["__dml_f"]] = (
            bytes(row["__dv"]),
            int(row["__card"]),
            int(row["__new"]),
        )
    return out


def _discover_and_count(
    spark: SparkSession, table: str, snap: _Snapshot, cond
) -> dict[str, tuple[int, int]]:
    """ONE DV-filtered pass over the live set: {rel: (live rows, live
    MATCHED rows)} per file. File discovery, the DV-vs-rewrite policy
    and the new-vector cardinalities all read off this single aggregate
    — the pre-r14-optimization shape was two scans (a distinct-file
    collect for discovery, then a per-file counts aggregate inside
    _dv_split), i.e. one redundant full pass per predicate DML commit.
    Soft-deleted rows never reach this scan, so ``m`` IS the exact new
    cardinality a DV for that file would add."""
    stats_rows = (
        _tagged_scan(spark, table, snap)
        .groupBy(_FILE_COL)
        .agg(
            F.count(F.lit(1)).alias("__live"),
            F.sum(F.coalesce(cond, F.lit(False)).cast("long")).alias("__m"),
        )
        .collect()
    )
    return {
        _rel_of_uri(table, r[0]): (int(r[1]), int(r[2] or 0))
        for r in stats_rows
    }


def _dv_split(
    spark: SparkSession,
    table: str,
    snap: _Snapshot,
    subset: dict,
    cond,
    snap_dvs: dict,
    dv_max_fraction: float,
    full_to_rewrite: bool,
    stats: dict[str, tuple[int, int]],
) -> tuple[dict[str, dict], list[str], str | None]:
    """DV-vs-rewrite policy for a predicate DML over ``subset``
    ({rel: partitionValues}, every file known to hold ≥1 live matching
    row): returns (dv_descs, rewrite_rels, dv_file_abs).

    1. COUNTS — ``stats`` ({rel: (live, matched)}) comes from the
       caller's single discovery aggregate (_discover_and_count): live
       rows and live MATCHED rows per file (exact new-DV cardinalities,
       since soft-deleted rows never reach that scan). Fully-matched
       files become plain removes (``full_to_rewrite`` False — DELETE)
       or rewrites (True — UPDATE transforms every row); files above
       ``dv_max_fraction`` rewrite. The copy-on-write fallback
       therefore never pays a position pass, and no parquet footer is
       read (live counts replace pq.read_metadata).
    2. BITMAPS — only the files that WILL carry a vector scan again for
       positions, aggregated into per-file roaring blobs executor-side
       (_dv_bitmap_blobs) and framed into one shared .bin
       (write_dv_frames)."""
    from marketdb_spark.sources.deltadv import dv_file_path, write_dv_frames

    rewrite_rels: list[str] = []
    dv_rels: list[str] = []
    for rel in sorted(subset):
        live, m = stats.get(rel, (0, 0))
        if m >= live:
            # every live row matched: whole-file op
            if full_to_rewrite:
                rewrite_rels.append(rel)
            continue  # DELETE: plain remove, no re-add
        if m / max(live, 1) > dv_max_fraction:
            rewrite_rels.append(rel)  # too dead to soft-delete
            continue
        dv_rels.append(rel)
    dv_descs: dict[str, dict] = {}
    dv_file: str | None = None
    if dv_rels:
        hits = _matched_hits(
            spark, table, snap, {r: subset[r] for r in dv_rels}, cond
        )
        blobs = _dv_bitmap_blobs(
            table, hits, {r: snap_dvs.get(r) for r in dv_rels}
        )
        dv_descs = write_dv_frames(
            table, {r: (b, card) for r, (b, card, _) in blobs.items()}
        )
        dv_file = dv_file_path(next(iter(dv_descs.values())), table)
    return dv_descs, rewrite_rels, dv_file


def _table_state(table: str) -> _Snapshot:
    if not os.path.isdir(os.path.join(table, _LOG)) or not (
        _log_entries(table) or _checkpoint_versions(table)
    ):
        raise ValueError(f"no Delta table at {table}")
    return _replay(table, None)


def _latest_version(table: str) -> int:
    entries = _log_entries(table)
    ckpts = _checkpoint_versions(table)
    return max(
        entries[-1][0] if entries else -1, ckpts[-1] if ckpts else -1
    )


def _rel_of_uri(table: str, uri: str) -> str:
    """input_file_name() returns a percent-encoded file URI; map it back
    to the table-relative path the log speaks."""
    path = unquote(urlparse(uri).path)
    return os.path.relpath(path, os.path.abspath(table))


def _tagged_scan(
    spark: SparkSession, table: str, snap: _Snapshot
) -> DataFrame:
    """The live rows in LOGICAL columns plus the source file of each row
    (percent-decoded, table-relative). input_file_name() is evaluated in
    the scan stage — valid because _scan_files' plan is scan → project →
    union, no shuffle below the projection."""
    df = _scan_files(spark, table, snap, snap.live)
    return df.withColumn(_FILE_COL, F.input_file_name())


def _stage_logical(
    df: DataFrame,
    table: str,
    snap: _Snapshot,
    extra_cols: list[str] | None = None,
    prefix: str = "",
) -> list[tuple[str, dict]]:
    """Stage a LOGICAL-schema DataFrame into the table's storage layout:
    physical names under column mapping, Hive dirs on the (physical)
    partition columns. ``extra_cols`` ride through verbatim (the CDF
    stager's ``_change_type``)."""
    schema = T.StructType.fromJson(json.loads(snap.schema_json))
    if not prefix:
        # data files only (CDF frames carry preimages that predate the
        # batch): DML-rewritten and merge-inserted rows must satisfy the
        # table's CHECK constraints / invariants like any other write
        _enforce_write_obligations(df.select(*[f.name for f in schema.fields]), snap, table)
    cmode = _mapping_mode(snap.config, table)
    with_ids = cmode == "id"
    cols = []
    for f in schema.fields:
        if cmode in ("name", "id"):
            phys_dt = _physical_datatype(f.dataType, with_ids)
            col = F.col(f.name)
            if phys_dt != _strip_field_metadata(f.dataType):
                col = col.cast(phys_dt)
            cols.append(
                col.alias(
                    _physical_name(f),
                    metadata={_PARQUET_FID: _field_id(f)}
                    if with_ids
                    else None,
                )
            )
        else:
            cols.append(F.col(f.name))
    for c in extra_cols or []:
        cols.append(F.col(c))
    if cmode in ("name", "id"):
        phys_of = {f.name: _physical_name(f) for f in schema.fields}
        stage_cols = [phys_of[c] for c in snap.part_cols]
    else:
        stage_cols = list(snap.part_cols)
    return _stage_files(df.select(cols), table, stage_cols, prefix=prefix)


def _rt_preservation(
    snap: _Snapshot, table: str
) -> tuple[tuple[str, str] | None, dict | None]:
    """((rid_col, rcv_col), metaData config updates) when the table has
    delta.enableRowTracking=true and this DML must materialize row ids
    through its rewrite; (None, None) otherwise. Tables enabled before
    any names were assigned get fresh ones, re-emitted in the DML's own
    commit (delta-spark's lazy assignment). Column mapping composes:
    the materialized names are the STORED parquet names by definition
    (they live in table config, not the mapped schema), so the scan
    reads them verbatim next to the physical data columns and the
    stager appends them verbatim after the physical rename
    (_stage_logical's extra_cols)."""
    import uuid as _uuid

    from marketdb_spark.sources.deltalog import (
        _RT_RCV_KEY,
        _RT_RID_KEY,
        _materialized_rt_cols,
        _row_tracking_state,
    )

    _, enabled, _ = _row_tracking_state(snap)
    if not enabled:
        return None, None
    cols = _materialized_rt_cols(snap)
    if cols is not None:
        return cols, None
    cols = (
        f"_row-id-col-{_uuid.uuid4()}",
        f"_row-commit-version-col-{_uuid.uuid4()}",
    )
    return cols, {_RT_RID_KEY: cols[0], _RT_RCV_KEY: cols[1]}


def _scan_with_row_ids(
    spark: SparkSession,
    table: str,
    snap: _Snapshot,
    subset: dict,
    rid_col: str | None = None,
    rcv_col: str | None = None,
    pos_cols: tuple[str, str] | None = None,
) -> DataFrame:
    """The files of ``subset`` in LOGICAL columns PLUS, when asked,
    their rows' stable row ids / commit versions under
    (``rid_col``, ``rcv_col``) (PROTOCOL.md "Row Tracking":
    materialized value when non-null, else baseRowId + row position /
    defaultRowCommitVersion) and/or their provenance under ``pos_cols``
    = (rel-path column, row-index column) — the coordinates a
    deletion-vector-emitting MERGE needs. One scan per file — each
    needs its own literals; the DML matched set bounds the union
    width. Deletion vectors apply (a soft-deleted row never reaches a
    rewrite). Column-mapped tables read under physical names and
    rename back to logical (_phys_read); the row-tracking materialized
    columns are stored VERBATIM (their configured names ARE the parquet
    names, mapped or not)."""
    import pandas as _pd

    from marketdb_spark.sources.deltadv import decode_dv

    schema = T.StructType.fromJson(json.loads(snap.schema_json))
    part_cols = snap.part_cols
    logical = _t.cast(T.StructType, _strip_field_metadata(schema))
    rt_fields = (
        [
            T.StructField(rid_col, T.LongType(), True),
            T.StructField(rcv_col, T.LongType(), True),
        ]
        if rid_col is not None
        else []
    )
    data_schema, renames, pv_key = _phys_read(
        spark, snap, table, subset, extra_fields=rt_fields
    )
    types = {f.name: _strip_field_metadata(f.dataType) for f in schema.fields}
    dvs = getattr(snap, "dvs", None) or {}
    row_meta = getattr(snap, "row_meta", None) or {}
    out_cols = [f.name for f in logical.fields] + [
        f.name for f in rt_fields
    ]
    if pos_cols is not None:
        out_cols = out_cols + list(pos_cols)
    parts: list[DataFrame] = []
    for rel in sorted(subset):
        pvals = subset[rel] or {}
        meta = row_meta.get(rel) or {}
        base = meta.get("baseRowId")
        drcv = meta.get("defaultRowCommitVersion")
        df = (
            spark.read.schema(data_schema)
            .parquet(os.path.join(table, rel))
            .select(*renames, F.col("_metadata.row_index").alias("__ri"))
        )
        if rid_col is not None:
            rid = F.col(rid_col)
            if base is not None:
                rid = F.coalesce(
                    rid, (F.lit(int(base)) + F.col("__ri")).cast("long")
                )
            rcv = F.col(rcv_col)
            if drcv is not None:
                rcv = F.coalesce(rcv, F.lit(int(drcv)).cast("long"))
            df = df.withColumn(rid_col, rid).withColumn(rcv_col, rcv)
        if rel in dvs:
            positions = decode_dv(dvs[rel], table, rel)
            if positions:
                pos_df = spark.createDataFrame(
                    _pd.DataFrame(
                        {"__ri": _pd.array(positions, dtype="int64")}
                    )
                )
                df = df.join(F.broadcast(pos_df), "__ri", "left_anti")
        if pos_cols is not None:
            df = df.withColumn(pos_cols[0], F.lit(rel)).withColumn(
                pos_cols[1], F.col("__ri")
            )
        df = df.drop("__ri")
        for c in part_cols:
            raw = pvals.get(pv_key[c])
            df = df.withColumn(
                c,
                (F.lit(None) if raw is None else F.lit(raw)).cast(types[c]),
            )
        parts.append(df.select(out_cols))
    if not parts:
        empty_fields = list(logical.fields) + list(rt_fields)
        if pos_cols is not None:
            empty_fields += [
                T.StructField(pos_cols[0], T.StringType(), True),
                T.StructField(pos_cols[1], T.LongType(), True),
            ]
        return spark.createDataFrame([], T.StructType(empty_fields))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _commit_dml(
    table: str,
    op: str,
    params: dict,
    matched_rels: list[str],
    staged: list[tuple[str, dict]],
    cdc_staged: list[tuple[str, dict]],
    read_dvs: dict | None = None,
    dv_adds: dict | None = None,
    rows_preserved: bool = False,
    config_updates: dict | None = None,
    add_extras: dict | None = None,
) -> int:
    """The shared commit tail: remove every matched file, add every
    staged file (+ cdc actions), with optimize_delta's staleness rule —
    retry the race only while every matched file is still live AND
    (``read_dvs``, the deletion vectors the rewrite was READ under)
    still carries the same DV per matched file — a concurrent DV commit
    would have soft-deleted rows this rewrite already materialized.
    ``dv_adds`` ({rel: new DV descriptor}) re-ADDS those matched files
    with the descriptor instead of dropping them — the DV-emitting
    DELETE shape (add(file, DV') + descriptor-carrying remove in one
    commit); the re-add keeps the file's row-tracking fields verbatim
    (same file, same baseRowId — ids are trivially preserved).
    ``add_extras`` ({rel: action fields}) merges verbatim into a
    staged rel's add action LAST — RESTORE uses it to re-attach the
    HISTORICAL deletionVector / baseRowId / defaultRowCommitVersion to
    re-referenced files (overriding any fresh rowTracking
    allocation)."""
    from marketdb_spark.sources.snapshot import CommitConflict

    for _ in range(5):
        latest = _latest_version(table)
        cur = _replay(table, None)
        # writer-protocol gate (mirror of the reader gate): unknown
        # writerFeatures / generated columns raise; removing files
        # from an appendOnly table is forbidden (constraints/invariants
        # were enforced on the staged rows in _stage_logical)
        _check_writer_protocol(
            cur, table, data_removing=bool(matched_rels)
        )
        if any(p not in cur.live for p in matched_rels):
            raise CommitConflict(
                f"{op} of {table} is stale: a concurrent commit removed "
                f"a file this operation rewrote"
            )
        if read_dvs is not None:
            from marketdb_spark.sources.deltadv import dv_descriptor_key

            cur_dvs_chk = getattr(cur, "dvs", None) or {}
            # 5-field protocol projection: a checkpoint landing between
            # the read and the commit strips writer extras (uniqueId)
            # from replayed descriptors — verbatim dict compare would
            # raise a spurious conflict for an unchanged DV
            if any(
                dv_descriptor_key(cur_dvs_chk.get(p))
                != dv_descriptor_key(read_dvs.get(p))
                for p in matched_rels
            ):
                raise CommitConflict(
                    f"{op} of {table} is stale: a concurrent commit "
                    f"changed a rewritten file's deletion vector"
                )
        from marketdb_spark.sources.deltalog import _row_tracking_actions

        # the rowTracking ENABLED refusal applies only when surviving
        # rows are REWRITTEN into fresh files (matched removes + staged
        # adds): a whole-file delete touches no surviving row, and a
        # DV re-add keeps the file (and its baseRowId) verbatim
        rt_extras, rt_domain = _row_tracking_actions(
            table,
            cur,
            [rel for rel, _ in staged],
            latest + 1,
            data_removing=bool(matched_rels) and bool(staged),
            rows_preserved=rows_preserved,
        )
        actions: list[dict] = [_commit_info(op, params)]
        if config_updates:
            # lazy materialized-column-name assignment (rowTracking):
            # re-emit metaData with the new keys in this same commit; a
            # concurrent writer having assigned DIFFERENT names makes
            # the staged files speak the wrong columns — loud conflict
            stale = {
                k: v
                for k, v in config_updates.items()
                if (cur.config or {}).get(k) not in (None, v)
            }
            if stale:
                raise CommitConflict(
                    f"{op} of {table} is stale: a concurrent commit "
                    f"assigned different values for {sorted(stale)}"
                )
            import uuid as _uuid

            actions.append(
                {
                    "metaData": {
                        "id": _uuid.uuid4().hex,
                        "format": {
                            "provider": "parquet",
                            "options": {},
                        },
                        "schemaString": cur.schema_json,
                        "partitionColumns": cur.part_cols,
                        "configuration": {
                            **dict(cur.config or {}),
                            **config_updates,
                        },
                    }
                }
            )
        if rt_domain is not None:
            actions.append(rt_domain)
        cur_dvs = getattr(cur, "dvs", None) or {}
        cur_rm = getattr(cur, "row_meta", None) or {}
        for p in sorted(matched_rels):
            rm: dict = {"path": quote(p, safe="/="), "dataChange": True}
            if p in cur_dvs:  # the descriptor rides the tombstone
                rm["deletionVector"] = cur_dvs[p]
            rm.update(cur_rm.get(p) or {})
            actions.append({"remove": rm})
        for p in sorted(dv_adds or {}):
            full = os.path.join(table, p)
            actions.append(
                {
                    "add": {
                        "path": quote(p, safe="/="),
                        "partitionValues": cur.live[p],
                        "size": os.path.getsize(full),
                        "modificationTime": int(
                            os.path.getmtime(full) * 1000
                        ),
                        "dataChange": True,
                        "deletionVector": dv_adds[p],
                        **(cur_rm.get(p) or {}),
                    }
                }
            )
        for rel, pvals in staged:
            full = os.path.join(table, rel)
            actions.append(
                {
                    "add": {
                        "path": quote(rel, safe="/="),
                        "partitionValues": pvals,
                        "size": os.path.getsize(full),
                        "modificationTime": int(
                            os.path.getmtime(full) * 1000
                        ),
                        "dataChange": True,
                        **(rt_extras.get(rel) or {}),
                        **((add_extras or {}).get(rel) or {}),
                    }
                }
            )
        for rel, pvals in cdc_staged:
            full = os.path.join(table, rel)
            actions.append(
                {
                    "cdc": {
                        "path": quote(rel, safe="/="),
                        "partitionValues": pvals,
                        "size": os.path.getsize(full),
                        "dataChange": False,
                    }
                }
            )
        if not _publish_commit(table, latest + 1, actions):
            continue
        return latest + 1
    raise CommitConflict(f"lost the commit race 5 times on {table}")


def _cdf_on(snap: _Snapshot) -> bool:
    return str(snap.config.get(_CDF_FLAG, "")).lower() == "true"


def delete_delta(
    spark: SparkSession,
    table: str,
    condition: str,
    dv_max_fraction: float = 1.0,
) -> int | None:
    """``DELETE FROM table WHERE condition`` — on a table with
    ``delta.enableDeletionVectors=true`` (and the feature declared),
    soft-delete by EMITTING deletion vectors: each partially-matched
    file re-adds with a grown vector (old positions ∪ matched
    positions, one shared on-disk DV file per commit — delta-spark's
    ``add(file, DV') + descriptor-carrying remove`` shape, a
    metadata-sized commit instead of a terabyte rewrite at 100 TB);
    fully-matched files drop as plain removes. ``dv_max_fraction``
    caps the policy: a file whose matched fraction exceeds it is
    copy-on-write rewritten instead (read-amplification guard; 1.0 =
    always soft-delete partial files, delta-spark's behavior).
    Column-mapped tables soft-delete the same way — descriptors key
    physical paths, the position scan renames physical→logical before
    the predicate (_phys_read). Otherwise: rewrite exactly the live
    files containing a matching row, without those rows. Returns the
    committed version, or None when nothing matched (delta-spark also
    commits nothing then). ``condition`` is a Spark SQL boolean
    expression over the LOGICAL columns; NULL evaluates as no-match,
    exactly SQL's DELETE semantics. With CDF enabled the commit stages
    the deleted rows as 'delete' change rows (cdc wins over derivation
    for CDF readers, so our own DV deletes never need the DV diff)."""
    snap = _table_state(table)
    cond = F.expr(condition)
    # one pass discovers the matched files AND their per-file live/
    # matched counts (_discover_and_count) — discovery and the DV policy
    # used to be two separate scans
    stats = _discover_and_count(spark, table, snap, cond)
    matched_rels = sorted(r for r, (_l, m) in stats.items() if m > 0)
    if not matched_rels:
        return None
    subset = {p: snap.live[p] for p in matched_rels}
    logical_cols = [
        f.name
        for f in T.StructType.fromJson(json.loads(snap.schema_json)).fields
    ]
    snap_dvs = getattr(snap, "dvs", None) or {}
    dv_descs: dict[str, dict] = {}
    rewrite_rels = matched_rels
    dv_file: str | None = None
    if _dv_write_enabled(snap, table):
        # counts came with discovery (the rewrite fallback never pays a
        # position pass), then per-file bitmaps aggregated EXECUTOR-side
        # — the driver never holds row positions (_dv_split)
        dv_descs, rewrite_rels, dv_file = _dv_split(
            spark, table, snap, subset, cond, snap_dvs,
            dv_max_fraction, full_to_rewrite=False, stats=stats,
        )
    rt_cols, rt_updates = _rt_preservation(snap, table)
    rewrite_subset = {p: snap.live[p] for p in rewrite_rels}
    # keep = NOT (cond IS TRUE): null-condition rows survive, per SQL
    if rt_cols is not None and rewrite_rels:
        # stable row ids: surviving rows carry their materialized
        # id/commit-version through the rewrite (PROTOCOL.md "Row
        # Tracking" — a DELETE never changes a surviving row, so both
        # materialize verbatim)
        rows = _scan_with_row_ids(
            spark, table, snap, rewrite_subset, *rt_cols
        )
        kept = rows.filter(~F.coalesce(cond, F.lit(False))).select(
            logical_cols + list(rt_cols)
        )
        staged = _stage_logical(
            kept, table, snap, extra_cols=list(rt_cols)
        )
    else:
        rows = _scan_files(spark, table, snap, rewrite_subset)
        kept = rows.filter(~F.coalesce(cond, F.lit(False))).select(
            logical_cols
        )
        staged = _stage_logical(kept, table, snap) if rewrite_rels else []
    cdc_staged: list[tuple[str, dict]] = []
    try:
        if _cdf_on(snap):
            deleted = (
                _scan_files(spark, table, snap, subset)
                .filter(F.coalesce(cond, F.lit(False)))
                .select(logical_cols)
                .withColumn("_change_type", F.lit("delete"))
            )
            cdc_staged = _stage_logical(
                deleted, table, snap,
                extra_cols=["_change_type"], prefix=_CDF_DIR,
            )
        return _commit_dml(
            table,
            "DELETE",
            {"predicate": condition},
            matched_rels,
            staged,
            cdc_staged,
            read_dvs=snap_dvs,
            dv_adds=dv_descs or None,
            rows_preserved=rt_cols is not None,
            config_updates=rt_updates if staged else None,
        )
    except BaseException:
        _unstage(table, [r for r, _ in staged])
        _unstage(table, [r for r, _ in cdc_staged])
        if dv_file is not None and os.path.exists(dv_file):
            os.remove(dv_file)  # orphaned vector file
        raise


def update_delta(
    spark: SparkSession,
    table: str,
    condition: str,
    set: dict[str, str],
    dv_max_fraction: float = 1.0,
) -> int | None:
    """``UPDATE table SET col = expr, ... WHERE condition`` — on a
    table with ``delta.enableDeletionVectors=true`` (and the feature
    declared), each partially-matched file keeps its UNTOUCHED rows in
    place: the matched positions join the file's deletion vector
    (add(file, DV') + descriptor-carrying remove) and only the UPDATED
    rows stage as new files — at 100 TB an update of 0.1% of rows
    writes 0.1% of bytes, not the touched files wholesale.
    ``dv_max_fraction`` caps the policy as in delete_delta; fully- or
    heavily-matched files copy-on-write rewrite as before. Otherwise:
    rewrite exactly the files containing a matching row, with the
    matching rows transformed. Each set expression is cast back to the
    column's existing type (UPDATE never changes the schema). Returns
    the committed version, or None when nothing matched. With CDF
    enabled the commit stages 'update_preimage'/'update_postimage' row
    pairs."""
    snap = _table_state(table)
    schema = T.StructType.fromJson(json.loads(snap.schema_json))
    types = {f.name: _strip_field_metadata(f.dataType) for f in schema.fields}
    bad = [c for c in set if c not in types]
    if bad:
        raise ValueError(f"UPDATE of unknown columns {bad} on {table}")
    from marketdb_spark.sources.deltalog import _identity_fields

    bad_id = sorted(
        {f.name for f in _identity_fields(schema)} & set.keys()
    )
    if bad_id:
        # delta-spark's rule: identity values are sequence-owned
        raise ValueError(
            f"UPDATE cannot set identity column(s) {bad_id} on {table}"
        )
    # updating a PARTITION column is supported: the rewritten rows simply
    # stage into their new Hive dirs with new partitionValues
    cond = F.expr(condition)
    # one pass: matched files + per-file live/matched counts
    stats = _discover_and_count(spark, table, snap, cond)
    matched_rels = sorted(r for r, (_l, m) in stats.items() if m > 0)
    if not matched_rels:
        return None
    subset = {p: snap.live[p] for p in matched_rels}
    logical_cols = [f.name for f in schema.fields]
    hit = F.coalesce(cond, F.lit(False))
    snap_dvs = getattr(snap, "dvs", None) or {}
    dv_descs: dict[str, dict] = {}
    rewrite_rels = matched_rels
    dv_file: str | None = None
    if _dv_write_enabled(snap, table):
        # counts came with discovery, bitmaps executor-side (_dv_split);
        # a fully-matched file is a whole-file UPDATE → copy-on-write
        # rewrite
        dv_descs, rewrite_rels, dv_file = _dv_split(
            spark, table, snap, subset, cond, snap_dvs,
            dv_max_fraction, full_to_rewrite=True, stats=stats,
        )
    rt_cols, rt_updates = _rt_preservation(snap, table)
    rewrite_subset = {p: snap.live[p] for p in rewrite_rels}
    rows = (
        _scan_with_row_ids(spark, table, snap, rewrite_subset, *rt_cols)
        if rt_cols is not None
        else _scan_files(spark, table, snap, rewrite_subset)
    )
    updated_cols = [
        (
            F.when(hit, F.expr(e).cast(types[c]))
            .otherwise(F.col(c))
            .alias(c)
            if c in set
            else F.col(c)
        )
        for c, e in ((c, set.get(c)) for c in logical_cols)
    ]
    post_cols = [
        F.expr(set[c]).cast(types[c]).alias(c) if c in set else F.col(c)
        for c in logical_cols
    ]
    if rt_cols is not None:
        # stable row ids: every surviving row keeps its id; an UPDATED
        # row's materialized commit version nulls out so it falls back
        # to the new add's defaultRowCommitVersion (= this commit), an
        # untouched row keeps its old version verbatim
        rid_col, rcv_col = rt_cols
        updated_cols = updated_cols + [
            F.col(rid_col),
            F.when(hit, F.lit(None).cast("long"))
            .otherwise(F.col(rcv_col))
            .alias(rcv_col),
        ]
        post_cols_rt = post_cols + [
            F.col(rid_col),
            F.lit(None).cast("long").alias(rcv_col),
        ]
    pieces = [rows.select(updated_cols)] if rewrite_rels else []
    if dv_descs:
        # soft-deleted originals: stage ONLY the transformed matches
        dv_subset = {p: snap.live[p] for p in dv_descs}
        if rt_cols is not None:
            dv_src = _scan_with_row_ids(
                spark, table, snap, dv_subset, *rt_cols
            )
            pieces.append(dv_src.filter(hit).select(post_cols_rt))
        else:
            dv_src = _scan_files(spark, table, snap, dv_subset)
            pieces.append(dv_src.filter(hit).select(post_cols))
    to_stage = pieces[0] if pieces else None
    for p in pieces[1:]:
        to_stage = to_stage.unionByName(p)
    staged = (
        _stage_logical(
            to_stage,
            table,
            snap,
            extra_cols=list(rt_cols) if rt_cols is not None else None,
        )
        if to_stage is not None
        else []
    )
    cdc_staged: list[tuple[str, dict]] = []
    try:
        if _cdf_on(snap):
            all_rows = _scan_files(spark, table, snap, subset)
            pre = (
                all_rows.filter(hit)
                .select(logical_cols)
                .withColumn("_change_type", F.lit("update_preimage"))
            )
            post = (
                all_rows.filter(hit)
                .select(post_cols)
                .withColumn("_change_type", F.lit("update_postimage"))
            )
            cdc_staged = _stage_logical(
                pre.unionByName(post), table, snap,
                extra_cols=["_change_type"], prefix=_CDF_DIR,
            )
        return _commit_dml(
            table,
            "UPDATE",
            {"predicate": condition, "set": set},
            matched_rels,
            staged,
            cdc_staged,
            read_dvs=snap_dvs,
            dv_adds=dv_descs or None,
            rows_preserved=rt_cols is not None,
            config_updates=rt_updates if staged else None,
        )
    except BaseException:
        _unstage(table, [r for r, _ in staged])
        _unstage(table, [r for r, _ in cdc_staged])
        if dv_file is not None and os.path.exists(dv_file):
            os.remove(dv_file)  # orphaned vector file
        raise


def merge_delta(
    spark: SparkSession,
    table: str,
    source: DataFrame,
    on: list[str],
    when_matched: str | dict[str, str] | None = "update",
    when_not_matched: str | None = "insert",
    when_not_matched_by_source: str | dict[str, str] | None = None,
    matched_condition: str | None = None,
    not_matched_condition: str | None = None,
    not_matched_by_source_condition: str | None = None,
    dv_max_fraction: float = 1.0,
) -> int | None:
    """``MERGE INTO table USING source ON keys`` — the upsert primitive
    (delta-spark's MERGE, ≙ the reference's bulk-put upsert path in
    sources/store.merge_upsert, here protocol-native). ``on`` names the
    join key columns (present in both sides). Clauses:

    - ``when_matched``: ``"update"`` (replace the whole row with the
      source row — source must carry the full target schema), a
      ``{col: sql_expr}`` dict (delta's UPDATE SET form; expressions
      may reference target columns and ``src.<col>`` for source
      values), ``"delete"``, or None (leave matched rows alone).
    - ``when_not_matched``: ``"insert"`` (source rows with no target
      match append as new files — full-schema source required) or None.
    - ``when_not_matched_by_source``: delta's WHEN NOT MATCHED BY SOURCE
      clause over TARGET rows with no source match — ``"delete"``, a
      ``{col: sql_expr}`` SET dict (target columns only; there is no
      source row to reference), or None (the default: leave them alone).
      The classic full-sync shape is ``when_matched="update",
      when_not_matched="insert", when_not_matched_by_source="delete"``
      — after which the table equals the source on the keyed universe.

    Each clause takes an optional PER-CLAUSE CONDITION (delta-spark's
    ``whenMatchedUpdate(condition=...)`` / ``whenMatchedDelete(
    condition=...)`` / ``whenNotMatchedInsert(condition=...)`` /
    ``whenNotMatchedBySource*(condition=...)``): a Spark SQL boolean that
    gates the clause row-by-row. Rows the clause matches but the
    condition does NOT evaluate TRUE for (false or NULL, standard SQL
    filter semantics) fall through UNCHANGED — this engine's surface is
    one clause of each kind, so there is no next clause to try, matching
    delta with a single conditional clause. Reference columns QUALIFIED:
    ``tgt.<col>`` / ``src.<col>`` (the SET-dict convention);
    ``matched_condition`` may use both sides, ``not_matched_condition``
    sees only the source row, and ``not_matched_by_source_condition``
    only target columns (a ``src.`` reference raises — there is no
    source row). Files where the condition filters out every otherwise-
    matching row are NOT rewritten, and CDF records changes only for
    rows the clause actually touched.

    Matching is by equality on ``on``; a source with DUPLICATE keys that
    match a target row raises (delta-spark's
    ``multipleSourceRowMatchingTargetRowInMergeException``) — a
    nondeterministic merge must fail loudly. Only files containing a
    row some active clause touches are rewritten (matched files for
    when_matched, unmatched-row files for when_not_matched_by_source);
    inserts stage as new files. With CDF: matched updates record
    preimage/postimage pairs, deletes record 'delete', inserts record
    'insert'. Returns the committed version, or None when the merge is
    a no-op."""
    if when_matched not in ("update", "delete", None) and not isinstance(
        when_matched, dict
    ):
        raise ValueError(
            f"when_matched must be 'update'|'delete'|dict|None, got "
            f"{when_matched!r}"
        )
    if when_not_matched not in ("insert", None):
        raise ValueError(
            f"when_not_matched must be 'insert'|None, got "
            f"{when_not_matched!r}"
        )
    nmbs = when_not_matched_by_source
    if nmbs not in ("delete", None) and not isinstance(nmbs, dict):
        raise ValueError(
            f"when_not_matched_by_source must be 'delete'|dict|None, got "
            f"{nmbs!r}"
        )
    for cond, clause, cname in (
        (matched_condition, when_matched, "matched_condition"),
        (not_matched_condition, when_not_matched, "not_matched_condition"),
        (not_matched_by_source_condition, nmbs,
         "not_matched_by_source_condition"),
    ):
        if cond is not None and clause is None:
            raise ValueError(
                f"{cname} given but its clause is None: a condition "
                f"gates a clause, it cannot stand alone"
            )

    def _true(cond: str | None):
        """Clause gate: TRUE-only filter semantics (false/NULL → the
        clause does not apply), None → the clause is unconditional."""
        if cond is None:
            return F.lit(True)
        return F.coalesce(F.expr(cond).cast("boolean"), F.lit(False))

    snap = _table_state(table)
    schema = T.StructType.fromJson(json.loads(snap.schema_json))
    from marketdb_spark.sources.deltalog import _identity_fields

    idents = _identity_fields(schema)
    if idents and when_not_matched is not None:
        # a MERGE insert would have to allocate identity values (or
        # admit explicit ones) with high-water-mark bookkeeping this
        # DML path does not do — refuse by name; matched-only merges
        # rewrite existing values and are fine
        raise ValueError(
            f"MERGE with when_not_matched='insert' on {table}: identity "
            f"column(s) {[f.name for f in idents]} need high-water-mark "
            f"allocation — insert through write_delta, or pass "
            f"when_not_matched=None"
        )
    for clause in (when_matched, when_not_matched_by_source):
        if idents and isinstance(clause, dict):
            bad_id = sorted(
                {f.name for f in idents} & set(clause.keys())
            )
            if bad_id:
                raise ValueError(
                    f"MERGE cannot set identity column(s) {bad_id} on "
                    f"{table}"
                )
    logical_cols = [f.name for f in schema.fields]
    types = {f.name: _strip_field_metadata(f.dataType) for f in schema.fields}
    bad = [k for k in on if k not in logical_cols or k not in source.columns]
    if bad:
        raise ValueError(
            f"merge keys {bad} must exist in both the table "
            f"({logical_cols}) and the source ({source.columns})"
        )
    # delta's nondeterminism guard: no duplicate source keys. The guard
    # job OVERLAPS the discovery aggregate below (guide §2.6) — both are
    # side-effect-free reads, nothing commits until both return, and the
    # guard's raise still precedes any USE of the stats (a dup-key source
    # inflates __live, but that result is discarded by the raise).
    dup = (
        source.groupBy(*on).count().filter(F.col("count") > 1).limit(1)
    )
    src = source.alias("src")
    tagged = _tagged_scan(spark, table, snap).alias("tgt")
    key_cond = [F.col(f"tgt.{k}") == F.col(f"src.{k}") for k in on]
    if not_matched_by_source_condition is not None:
        # target-only: resolve against the target frame alone so a
        # src.<col> reference raises here instead of silently evaluating
        # against the all-NULL unmatched source side (the SET-dict
        # device below, applied to the clause gate)
        try:
            tagged.select(F.expr(not_matched_by_source_condition))
        except Exception:
            raise ValueError(
                f"not_matched_by_source_condition references non-target "
                f"columns in {not_matched_by_source_condition!r}: there "
                f"is no source row in a NOT MATCHED BY SOURCE clause"
            ) from None
    # ONE pass tags every live file with its per-clause applied-row
    # COUNTS (rows the clause kind + its CONDITION lets through) — file
    # discovery for both clause kinds AND the DV-vs-rewrite policy read
    # off this single aggregate (the pre-r14-optimization shape was a
    # discovery join plus a second counts join over the matched subset).
    # NOT MATCHED BY SOURCE may touch files the matched clause never
    # would. The source side stays key-only unless the matched
    # condition needs source columns; the dup-key guard above makes the
    # left join row-preserving, so __live is the per-file live count.
    is_m_tag = F.col(f"src.{on[0]}").isNotNull()
    tag_src = (
        src if matched_condition is not None
        else source.select(on).alias("src")
    )
    apply_m_tag = is_m_tag & _true(matched_condition)
    apply_u_tag = (~is_m_tag) & _true(not_matched_by_source_condition)
    stats_df = (
        tagged.join(tag_src, key_cond, "left")
        .groupBy(_FILE_COL)
        .agg(
            F.count(F.lit(1)).alias("__live"),
            F.sum(apply_m_tag.cast("long")).alias("__m"),
            F.sum(apply_u_tag.cast("long")).alias("__u"),
        )
    )
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        dup_f = pool.submit(dup.count)
        stats_f = pool.submit(stats_df.collect)
        n_dup = dup_f.result()
        stats_rows = stats_f.result()
    if n_dup > 0:
        raise ValueError(
            f"MERGE source has duplicate keys on {on}: multiple source "
            f"rows would match one target row (nondeterministic merge)"
        )
    stats = {
        _rel_of_uri(table, r[0]): (
            int(r[1]), int(r[2] or 0), int(r[3] or 0)
        )
        for r in stats_rows
    }
    matched_rels = sorted(r for r, (_l, m, _u) in stats.items() if m > 0)
    unmatched_rels = (
        sorted(r for r, (_l, _m, u) in stats.items() if u > 0)
        if nmbs is not None
        else []
    )
    inserts = (
        src.join(
            _scan_files(spark, table, snap, snap.live)
            .select(on)
            .alias("tgt"),
            key_cond,
            "left_anti",
        )
        if when_not_matched == "insert"
        else None
    )
    if inserts is not None and not_matched_condition is not None:
        # the anti-join result is the bare source frame (alias 'src'),
        # so the condition sees exactly the source row, per delta
        inserts = inserts.filter(_true(not_matched_condition))
    if inserts is not None:
        missing = [c for c in logical_cols if c not in source.columns]
        if missing:
            raise ValueError(
                f"when_not_matched='insert' needs the full table schema "
                f"in the source; missing {missing}"
            )
        inserts = inserts.select([F.col(c).cast(types[c]).alias(c) for c in logical_cols])
    rewrite_rels: list[str] = sorted(
        (set(matched_rels) if when_matched is not None else set())
        | (set(unmatched_rels) if nmbs is not None else set())
    )
    if not rewrite_rels and (
        inserts is None or inserts.limit(1).count() == 0
    ):
        return None

    rt_cols, rt_updates = _rt_preservation(snap, table)
    dv_on = _dv_write_enabled(snap, table)
    snap_dvs = getattr(snap, "dvs", None) or {}
    dv_descs: dict[str, dict] = {}
    dv_file: str | None = None
    staged: list[tuple[str, dict]] = []
    cdc_staged: list[tuple[str, dict]] = []
    try:
        cdc_parts: list[DataFrame] = []
        if rewrite_rels:
            subset = {p: snap.live[p] for p in rewrite_rels}
            if dv_on:
                # DV-emitting merge needs each target row's file
                # coordinates to vector exactly the clause-affected
                # positions (untouched rows stay in place)
                rows = _scan_with_row_ids(
                    spark,
                    table,
                    snap,
                    subset,
                    *(rt_cols or (None, None)),
                    pos_cols=("__dml_rel", "__dml_ri"),
                ).alias("tgt")
            elif rt_cols is not None:
                rows = _scan_with_row_ids(
                    spark, table, snap, subset, *rt_cols
                ).alias("tgt")
            else:
                rows = _scan_files(spark, table, snap, subset).alias(
                    "tgt"
                )
            joined = rows.join(src, key_cond, "left")
            is_matched = F.col(f"src.{on[0]}").isNotNull()
            # per-row clause gates: clause kind AND its condition holds
            apply_m = is_matched & _true(matched_condition)
            apply_u = (~is_matched) & _true(
                not_matched_by_source_condition
            )
            old = [F.col(f"tgt.{c}") for c in logical_cols]

            def _set_vals(clause, allow_src: bool):
                """Per-column value expressions for an 'update'-shaped
                clause (whole-row 'update' or a SET dict)."""
                if clause == "update":
                    missing = [
                        c for c in logical_cols if c not in source.columns
                    ]
                    if missing:
                        raise ValueError(
                            f"when_matched='update' needs the full table "
                            f"schema in the source; missing {missing}"
                        )
                    return [
                        F.col(f"src.{c}").cast(types[c])
                        for c in logical_cols
                    ]
                bad = [c for c in clause if c not in logical_cols]
                if bad:
                    raise ValueError(
                        f"MERGE SET of unknown columns {bad} on {table}"
                    )
                if not allow_src:
                    # NOT MATCHED BY SOURCE has no source row: a SET
                    # expression referencing src.<col> would silently
                    # evaluate against the all-NULL unmatched side, so
                    # resolve each expression against a target-only
                    # frame and raise on anything it can't resolve
                    for c, e in clause.items():
                        try:
                            rows.select(F.expr(e))
                        except Exception:
                            raise ValueError(
                                f"when_not_matched_by_source SET for "
                                f"{c!r} references non-target columns "
                                f"in {e!r}: there is no source row in "
                                f"a NOT MATCHED BY SOURCE clause"
                            ) from None
                return [
                    F.expr(clause[c]).cast(types[c])
                    if c in clause
                    else F.col(f"tgt.{c}")
                    for c in logical_cols
                ]

            wm_vals = (
                _set_vals(when_matched, allow_src=True)
                if when_matched not in (None, "delete")
                else None
            )
            nmbs_vals = (
                _set_vals(nmbs, allow_src=False)
                if isinstance(nmbs, dict)
                else None
            )
            # survivors: a row drops only when its clause APPLIES
            # (kind + condition) and that clause is a delete; rows a
            # condition filters out copy through unchanged
            keep = ~(
                (apply_m & F.lit(when_matched == "delete"))
                | (apply_u & F.lit(nmbs == "delete"))
            )
            # a row is MODIFIED when an update-shaped clause applies,
            # AFFECTED when any clause applies (modified or deleted) —
            # the positions a DV-emitting merge vectors out of the
            # original file
            modified = F.lit(False)
            if wm_vals is not None:
                modified = modified | apply_m
            if nmbs_vals is not None:
                modified = modified | apply_u
            affected = modified
            if when_matched == "delete":
                affected = affected | apply_m
            if nmbs == "delete":
                affected = affected | apply_u
            out_vals = []
            for i, (o, n) in enumerate(zip(old, logical_cols)):
                m_val = wm_vals[i] if wm_vals is not None else o
                u_val = nmbs_vals[i] if nmbs_vals is not None else o
                out_vals.append(
                    F.when(apply_m, m_val)
                    .when(apply_u, u_val)
                    .otherwise(o)
                    .alias(n)
                )
            if rt_cols is not None:
                # stable row ids: kept rows carry their id; a row an
                # update-shaped clause MODIFIED nulls its materialized
                # commit version (falls back to this commit's
                # defaultRowCommitVersion), untouched rows keep theirs
                rid_col, rcv_col = rt_cols
                out_vals = out_vals + [
                    F.col(f"tgt.{rid_col}").alias(rid_col),
                    F.when(modified, F.lit(None).cast("long"))
                    .otherwise(F.col(f"tgt.{rcv_col}"))
                    .alias(rcv_col),
                ]
            stage_pred = keep
            if dv_on:
                # per-file affected positions: files below the
                # threshold soft-delete those positions and stage ONLY
                # their modified rows; the rest copy-on-write rewrite.
                # The policy counts come from the discovery aggregate
                # above (the scans are both DV-filtered, so the
                # clause-applied count IS the new vector's cardinality
                # and the per-file row count IS the live count, no
                # footer reads); then the DV files' positions aggregate
                # into roaring bitmaps EXECUTOR-side — the driver never
                # collects row-level coordinates (_dv_bitmap_blobs).
                from marketdb_spark.sources.deltadv import (
                    dv_file_path,
                    write_dv_frames,
                )

                dv_rels: list[str] = []
                classic_rels: list[str] = []
                for rel in rewrite_rels:
                    live, m_cnt, u_cnt = stats.get(rel, (0, 0, 0))
                    # rows an active clause applies to (modified or
                    # deleted) — apply_m/apply_u are disjoint, and a
                    # clause that is None never applies
                    new = (m_cnt if when_matched is not None else 0) + (
                        u_cnt if nmbs is not None else 0
                    )
                    if (
                        not new
                        or new >= live
                        or new / max(live, 1) > dv_max_fraction
                    ):
                        classic_rels.append(rel)
                        continue
                    dv_rels.append(rel)
                if dv_rels:
                    hits = joined.filter(
                        affected & F.col("__dml_rel").isin(dv_rels)
                    ).select(
                        F.col("__dml_rel").alias("__dml_f"),
                        F.col("__dml_ri"),
                    )
                    blobs = _dv_bitmap_blobs(
                        table,
                        hits,
                        {rel: snap_dvs.get(rel) for rel in dv_rels},
                        uri=False,
                    )
                    dv_descs = write_dv_frames(
                        table,
                        {
                            rel: (b, card)
                            for rel, (b, card, _) in blobs.items()
                        },
                    )
                    dv_file = dv_file_path(
                        next(iter(dv_descs.values())), table
                    )
                    in_dv = F.col("__dml_rel").isin(list(dv_descs))
                    in_classic = (
                        F.col("__dml_rel").isin(classic_rels)
                        if classic_rels
                        else F.lit(False)
                    )
                    # DV files contribute only their MODIFIED survivors
                    # (untouched rows stay in the original file)
                    stage_pred = keep & (
                        in_classic | (modified & in_dv)
                    )
            rewritten = joined.filter(stage_pred).select(out_vals)
            staged.extend(
                _stage_logical(
                    rewritten,
                    table,
                    snap,
                    extra_cols=(
                        list(rt_cols) if rt_cols is not None else None
                    ),
                )
            )
            if _cdf_on(snap):

                def _pair(rows_f, vals, kind):
                    if kind == "delete":
                        cdc_parts.append(
                            rows_f.select(
                                [c.alias(n) for c, n in zip(old, logical_cols)]
                            ).withColumn("_change_type", F.lit("delete"))
                        )
                    else:
                        cdc_parts.append(
                            rows_f.select(
                                [c.alias(n) for c, n in zip(old, logical_cols)]
                            ).withColumn(
                                "_change_type", F.lit("update_preimage")
                            )
                        )
                        cdc_parts.append(
                            rows_f.select(
                                [
                                    v.alias(n)
                                    for v, n in zip(vals, logical_cols)
                                ]
                            ).withColumn(
                                "_change_type", F.lit("update_postimage")
                            )
                        )

                if when_matched is not None:
                    _pair(
                        joined.filter(apply_m),
                        wm_vals,
                        "delete" if when_matched == "delete" else "update",
                    )
                if nmbs is not None:
                    _pair(
                        joined.filter(apply_u),
                        nmbs_vals,
                        "delete" if nmbs == "delete" else "update",
                    )
        if inserts is not None:
            ins_df = inserts
            if rt_cols is not None:
                # fresh rows: null materialized columns — their ids
                # derive from the add's fresh baseRowId + position
                ins_df = inserts.withColumn(
                    rt_cols[0], F.lit(None).cast("long")
                ).withColumn(rt_cols[1], F.lit(None).cast("long"))
            ins_staged = _stage_logical(
                ins_df,
                table,
                snap,
                extra_cols=list(rt_cols) if rt_cols is not None else None,
            )
            staged.extend(ins_staged)
            if _cdf_on(snap) and ins_staged:
                cdc_parts.append(
                    inserts.withColumn("_change_type", F.lit("insert"))
                )
        if cdc_parts:
            cdc = cdc_parts[0]
            for p in cdc_parts[1:]:
                cdc = cdc.unionByName(p)
            cdc_staged = _stage_logical(
                cdc, table, snap,
                extra_cols=["_change_type"], prefix=_CDF_DIR,
            )
        op_params = {
            "on": on,
            "matched": "dict" if isinstance(when_matched, dict) else when_matched,
            "notMatched": when_not_matched,
            "notMatchedBySource": "dict" if isinstance(nmbs, dict) else nmbs,
        }
        for key, cond in (
            ("matchedCondition", matched_condition),
            ("notMatchedCondition", not_matched_condition),
            ("notMatchedBySourceCondition", not_matched_by_source_condition),
        ):
            if cond is not None:
                op_params[key] = cond
        return _commit_dml(
            table,
            "MERGE",
            op_params,
            rewrite_rels,
            staged,
            cdc_staged,
            read_dvs=snap_dvs,
            dv_adds=dv_descs or None,
            rows_preserved=rt_cols is not None,
            config_updates=rt_updates if staged else None,
        )
    except BaseException:
        _unstage(table, [r for r, _ in staged])
        _unstage(table, [r for r, _ in cdc_staged])
        if dv_file is not None and os.path.exists(dv_file):
            os.remove(dv_file)  # orphaned vector file
        raise


def restore_delta(
    spark: SparkSession, table: str, version: int
) -> int | None:
    """``RESTORE TABLE ... TO VERSION AS OF v`` (delta-spark's RESTORE):
    one commit that makes the LIVE SET equal the historical snapshot's —
    ``remove`` for every file live now but not at ``v``, ``add``
    re-referencing every file live at ``v`` but not now (no data
    movement: the old files are still on disk unless vacuumed — a
    vacuumed restore target raises BY NAME before committing anything).
    History is preserved: the restore is a NEW version on top, so the
    pre-restore state remains time-travelable — this is the undo
    primitive for a bad overwrite/DML on a 100 TB table, at log cost.

    With CDF enabled the commit stages the full row-level diff
    ('delete' rows for what the restore removes, 'insert' rows for what
    it brings back), so incremental consumers see the restore as the
    data change it is. Returns the committed version, or None when the
    table is already at the target state.

    Deletion vectors restore too: a path live in BOTH snapshots whose
    descriptor differs (e.g. undoing a DV-emitting DELETE) re-adds with
    the HISTORICAL descriptor — the un-delete delta-spark's RESTORE
    performs — and re-referenced files carry their historical
    baseRowId/defaultRowCommitVersion, so stable row ids survive a
    restore on delta.enableRowTracking=true tables (the r12 refusal is
    lifted: the historical fields ARE the preservation)."""
    from marketdb_spark.sources.deltadv import dv_descriptor_key

    snap = _table_state(table)
    target = _replay(table, version)
    if _strip_field_metadata(
        T.StructType.fromJson(json.loads(target.schema_json))
    ) != _strip_field_metadata(
        T.StructType.fromJson(json.loads(snap.schema_json))
    ) or target.part_cols != snap.part_cols:
        raise ValueError(
            f"cannot restore {table} to version {version}: the schema or "
            f"partitioning changed since — restore across schema changes "
            f"is unsupported"
        )
    cur_dvs = getattr(snap, "dvs", None) or {}
    tgt_dvs = getattr(target, "dvs", None) or {}
    tgt_rm = getattr(target, "row_meta", None) or {}
    # a path live in both snapshots restores only when its DV changed:
    # remove (current descriptor rides the tombstone) + re-add with the
    # historical one — the row-set change a path-set diff would miss
    dv_changed = sorted(
        p
        for p in set(snap.live) & set(target.live)
        if dv_descriptor_key(cur_dvs.get(p))
        != dv_descriptor_key(tgt_dvs.get(p))
    )
    path_removes = sorted(set(snap.live) - set(target.live))
    path_readds = sorted(set(target.live) - set(snap.live))
    removes = path_removes + dv_changed
    readds = path_readds + dv_changed
    if not removes and not readds:
        return None
    gone = [
        p for p in readds if not os.path.exists(os.path.join(table, p))
    ]
    if gone:
        raise ValueError(
            f"cannot restore {table} to version {version}: files {gone} "
            f"were vacuumed — the snapshot is no longer materializable"
        )
    gone_dv = []
    for p in readds:
        if p in tgt_dvs:
            from marketdb_spark.sources.deltadv import decode_dv

            try:
                decode_dv(tgt_dvs[p], table, p)
            except ValueError:
                gone_dv.append(p)
    if gone_dv:
        raise ValueError(
            f"cannot restore {table} to version {version}: the deletion "
            f"vectors of {gone_dv} are no longer decodable (vacuumed or "
            f"corrupt) — the snapshot is no longer materializable"
        )
    # "staged" adds are the EXISTING historical files re-referenced with
    # their original partitionValues — never unstage these on failure
    # (they belong to retained history), only the cdc files we created
    readd_staged = [(p, target.live[p]) for p in readds]
    add_extras = {
        p: {
            **(tgt_rm.get(p) or {}),
            **({"deletionVector": tgt_dvs[p]} if p in tgt_dvs else {}),
        }
        for p in readds
    }
    cdc_staged: list[tuple[str, dict]] = []
    try:
        if _cdf_on(snap):
            from marketdb_spark.sources.deltadv import decode_dv

            parts: list[DataFrame] = []
            if path_removes:
                parts.append(
                    _scan_files(
                        spark, table, snap,
                        {p: snap.live[p] for p in path_removes},
                    ).withColumn("_change_type", F.lit("delete"))
                )
            if path_readds:
                parts.append(
                    _scan_files(
                        spark, table, target,
                        {p: target.live[p] for p in path_readds},
                    ).withColumn("_change_type", F.lit("insert"))
                )
            # a DV-changed path restores rows in place: the change feed
            # must carry ONLY the DV-diff rows (ADVICE r13) — 'insert'
            # for positions vectored now but not historically (the
            # un-deletes), 'delete' for the reverse — never a phantom
            # whole-file delete+insert pair for rows live in both
            # snapshots. keep_positions inverts the scan's DV filter to
            # exactly those positions; decode cost is DV-cardinality-
            # bounded, the same metadata scale every DV read pays.
            ins_pos: dict[str, list[int]] = {}
            del_pos: dict[str, list[int]] = {}
            for p in dv_changed:
                cur_set = (
                    set(decode_dv(cur_dvs[p], table, p))
                    if p in cur_dvs
                    else set()
                )
                tgt_set = (
                    set(decode_dv(tgt_dvs[p], table, p))
                    if p in tgt_dvs
                    else set()
                )
                undel = sorted(cur_set - tgt_set)
                redel = sorted(tgt_set - cur_set)
                if undel:
                    ins_pos[p] = undel
                if redel:
                    del_pos[p] = redel
            if ins_pos:
                parts.append(
                    _scan_files(
                        spark, table, target,
                        {p: target.live[p] for p in ins_pos},
                        keep_positions=ins_pos,
                    ).withColumn("_change_type", F.lit("insert"))
                )
            if del_pos:
                parts.append(
                    _scan_files(
                        spark, table, snap,
                        {p: snap.live[p] for p in del_pos},
                        keep_positions=del_pos,
                    ).withColumn("_change_type", F.lit("delete"))
                )
            if parts:  # re-encoded same-position DVs diff to no rows
                cdc = parts[0]
                for p in parts[1:]:
                    cdc = cdc.unionByName(p)
                cdc_staged = _stage_logical(
                    cdc, table, snap,
                    extra_cols=["_change_type"], prefix=_CDF_DIR,
                )
        return _commit_dml(
            table,
            "RESTORE",
            {"version": version},
            removes,
            readd_staged,
            cdc_staged,
            read_dvs=cur_dvs,
            rows_preserved=True,
            add_extras=add_extras,
        )
    except BaseException:
        _unstage(table, [r for r, _ in cdc_staged])
        raise
