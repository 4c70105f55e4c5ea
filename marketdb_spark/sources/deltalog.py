"""Delta Lake transaction-log reader — no delta jars, pure log replay.

Reads tables written by ANY Delta writer (Spark+delta-spark, delta-rs,
DataBricks) by replaying the public transaction-log protocol
(https://github.com/delta-io/delta/blob/master/PROTOCOL.md):

    <table>/_delta_log/00000000000000000000.json   # newline-delimited
    <table>/_delta_log/00000000000000000010.checkpoint.parquet (optional)
    <table>/part-*.parquet                          # data files

Each log entry is one JSON action per line: ``metaData`` (schema +
partition columns), ``add`` (file becomes live, with partitionValues),
``remove`` (file leaves the live set), ``protocol``/``commitInfo``
(ignored beyond a reader-version check). A snapshot at version V is the
file set after replaying 0..V — same replay model as our own snapshot
table (sources/snapshot.py), which is why the implementation is ~100
lines: Delta's log IS a superset of that design.

Scope (documented, not hidden): JSON commits + classic parquet
checkpoints — single-part AND complete multi-part sets
(``n.checkpoint.o.p.parquet``, what stock delta-spark writes for large
tables) — are replayed (located by filename; checkpoint-only tables
whose JSON commits expired under log retention read fine; incomplete
multi-part sets from a crashed writer are ignored per the protocol).
Column mapping in NAME and ID modes is supported end-to-end (read,
write, stream): data files speak per-field physical names from the
schemaString metadata, partition values are keyed by physical names,
and the user-facing surface stays logical; id mode additionally
resolves data columns by parquet FIELD ID (Spark's fieldId.read/write
lanes batch-side, PARQUET:field_id arrow metadata stream-side), so
Iceberg-converted / UniForm-style files with foreign column names read
correctly. V2/UUID checkpoints (sidecar-less and sidecar layouts,
JSON and parquet) replay natively. Deletion vectors and truncated logs
with no covering checkpoint RAISE instead of returning wrong rows;
add/remove paths are percent-decoded per the protocol and absolute
(shallow-clone) paths are rejected. Partition values ride back in as
literal columns per add — the directory layout is NOT trusted (the
protocol says partitionValues is authoritative).

At 100 TB the replay cost is the log size (KBs per commit, one
checkpoint parquet), not the data; the returned DataFrame scans exactly
the live files, so partition pruning and pushdown behave as for any
parquet read.
"""

from __future__ import annotations

import json
import os
import typing as _t

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_LOG = "_delta_log"

# Actions per checkpoint part before write_checkpoint splits into a
# classic multi-part set — the analog of delta-spark's
# spark.databricks.delta.checkpoint.partSize. 100k actions ≈ a 100 TB
# table of 1 GB files; below it a single parquet stays the cheapest.
DEFAULT_CHECKPOINT_PART_SIZE = 100_000


def _log_entries(table: str) -> list[tuple[int, str]]:
    """(version, path) for every JSON commit, sorted by version."""
    log_dir = os.path.join(table, _LOG)
    out = []
    for name in os.listdir(log_dir):
        stem, ext = os.path.splitext(name)
        if ext == ".json" and stem.isdigit():
            out.append((int(stem), os.path.join(log_dir, name)))
    return sorted(out)


def delta_versions(table: str) -> list[int]:
    """All commit versions present in the log (JSON commits)."""
    return [v for v, _ in _log_entries(table)]


_UUID_RE = r"[0-9a-fA-F]{8}(?:-[0-9a-fA-F]{4}){3}-[0-9a-fA-F]{12}"


def _checkpoints(table: str) -> dict[int, list[str]]:
    """version → ordered part paths for every READABLE checkpoint:

    - classic single-part (``n.checkpoint.parquet``);
    - multi-part classic sets (``n.checkpoint.o.p.parquet``, part o of
      p, 1-based — what stock delta-spark writes past
      ~spark.databricks.delta.checkpoint.partSize actions) with ALL p
      parts present — an INCOMPLETE multi-part set is skipped per the
      protocol (a crashed checkpoint writer leaves partial sets that no
      ``_last_checkpoint`` references; readers must ignore them, and
      the JSON log still covers the range);
    - V2 / UUID-named checkpoints (``n.checkpoint.<uuid>.{json,
      parquet}``, PROTOCOL.md "V2 Spec Checkpoints" — what newer
      Databricks / delta-kernel writers emit): the file carries the
      non-file actions plus a ``checkpointMetadata`` marker, and either
      the file actions inline (sidecar-less) or ``sidecar`` references
      into ``_delta_log/_sidecars/`` — expanded in _checkpoint_rows.
      Several UUID checkpoints may coexist at one version (each is
      complete by itself); the lexicographically greatest name is
      chosen for determinism. A classic checkpoint at the same version
      wins (cheaper: no sidecar hop).

    Any OTHER ``*.checkpoint.*`` spelling remains an explicit ERROR,
    not a silent skip — ignoring one and replaying JSON alone can
    return a partial file set once log cleanup has removed the
    pre-checkpoint commits."""
    import re

    log_dir = os.path.join(table, _LOG)
    out: dict[int, list[str]] = {}
    multi: dict[tuple[int, int], dict[int, str]] = {}
    v2: dict[int, list[str]] = {}
    unsupported = []
    for name in os.listdir(log_dir):
        m = re.fullmatch(r"(\d{20})\.checkpoint\.parquet", name)
        if m:
            out[int(m.group(1))] = [os.path.join(log_dir, name)]
            continue
        m = re.fullmatch(
            r"(\d{20})\.checkpoint\.(\d{10})\.(\d{10})\.parquet", name
        )
        if m:
            v, part, total = (int(g) for g in m.groups())
            multi.setdefault((v, total), {})[part] = os.path.join(
                log_dir, name
            )
            continue
        m = re.fullmatch(
            rf"(\d{{20}})\.checkpoint\.{_UUID_RE}\.(?:json|parquet)", name
        )
        if m:
            v2.setdefault(int(m.group(1)), []).append(
                os.path.join(log_dir, name)
            )
            continue
        if re.fullmatch(r"\d+\.checkpoint\..+", name):
            unsupported.append(name)
    if unsupported:
        raise ValueError(
            f"unsupported checkpoint layout {sorted(unsupported)} "
            f"(classic, multi-part and v2/UUID layouts are readable)"
        )
    # classic (single- or complete multi-part) wins over v2/UUID at the
    # same version — no sidecar hop — so multi-part sets resolve FIRST
    for (v, total), parts in multi.items():
        if set(parts) == set(range(1, total + 1)):
            # a single-part checkpoint at the same version is equivalent
            # (both fully describe the snapshot); keep whichever came
            out.setdefault(v, [parts[i] for i in range(1, total + 1)])
    for v, cands in v2.items():
        out.setdefault(v, [max(cands)])
    return out


def _checkpoint_versions(table: str) -> list[int]:
    """Versions with a complete, readable checkpoint."""
    return sorted(_checkpoints(table))


def _checkpoint_rows(
    table: str, version: int, ckpts: dict[int, list[str]] | None = None
) -> list[dict]:
    """Every action row of the checkpoint at ``version`` — all parts
    concatenated (part order is irrelevant: a checkpoint is an unordered
    action SET per the protocol), with V2/UUID checkpoints expanded:
    their ``sidecar`` references are replaced by the referenced sidecar
    files' add/remove rows. Pass the already-computed ``_checkpoints``
    map to skip a redundant log-directory listing."""
    import re

    import pyarrow.parquet as pq

    rows: list[dict] = []
    for path in (ckpts if ckpts is not None else _checkpoints(table))[version]:
        name = os.path.basename(path)
        if re.fullmatch(
            rf"\d{{20}}\.checkpoint\.{_UUID_RE}\.(?:json|parquet)", name
        ):
            rows.extend(_v2_checkpoint_rows(table, path, version))
        else:
            rows.extend(pq.read_table(path).to_pylist())
    return rows


def _v2_checkpoint_rows(table: str, path: str, version: int) -> list[dict]:
    """Expand one V2 checkpoint file (PROTOCOL.md "V2 Spec Checkpoints"):
    JSON (line-delimited actions) or parquet, REQUIRED to carry a
    ``checkpointMetadata`` action whose version matches the filename —
    a mismatch means a corrupt or misnamed file and raises. ``sidecar``
    actions are replaced by the add/remove rows of the referenced
    parquet files under ``_delta_log/_sidecars/`` (sidecars are written
    BEFORE the checkpoint file per the protocol, so a visible
    checkpoint with a missing sidecar is corruption, not a crashed
    writer's leftovers — loud error, never a partial file set)."""
    import pyarrow.parquet as pq

    if path.endswith(".json"):
        with open(path) as f:
            raw = [json.loads(line) for line in f if line.strip()]
    else:
        raw = pq.read_table(path).to_pylist()
    cms = [
        r["checkpointMetadata"]
        for r in raw
        if isinstance(r, dict) and r.get("checkpointMetadata")
    ]
    if not cms or cms[0].get("version") is None:
        raise ValueError(
            f"malformed v2 checkpoint {os.path.basename(path)} in "
            f"{table}: no checkpointMetadata action"
        )
    if int(cms[0]["version"]) != version:
        raise ValueError(
            f"corrupt v2 checkpoint {os.path.basename(path)} in {table}: "
            f"checkpointMetadata.version {cms[0]['version']} != filename "
            f"version {version}"
        )
    out: list[dict] = []
    for r in raw:
        sc = r.get("sidecar") if isinstance(r, dict) else None
        if sc and sc.get("path"):
            sp = os.path.join(table, _LOG, "_sidecars", sc["path"])
            if not os.path.exists(sp):
                raise ValueError(
                    f"v2 checkpoint {os.path.basename(path)} in {table} "
                    f"references missing sidecar {sc['path']}"
                )
            out.extend(pq.read_table(sp).to_pylist())
        else:
            out.append(r)
    return out


class _Snapshot(_t.NamedTuple):
    """The replayed table state at one version. ``part_cols`` are the
    LOGICAL partition-column names (metaData.partitionColumns); with
    column mapping active, ``live``'s partitionValues are keyed by
    PHYSICAL names per the protocol's column-mapping rules. ``dvs``
    maps the subset of live paths that carry a deletion vector (inline
    or on-disk) to its descriptor; decode happens at scan time."""

    schema_json: str
    part_cols: list
    live: dict
    config: dict
    protocol: dict
    dvs: dict = {}
    domains: dict = {}
    # per live path: {"baseRowId": long, "defaultRowCommitVersion": long}
    # for files whose add carried row-tracking fields (PROTOCOL.md "Row
    # Tracking") — re-emitted by checkpoints and carried on tombstones
    row_meta: dict = {}


# Reader features this engine can consume under protocol v3
# (PROTOCOL.md "Table Features"). v2Checkpoint is READ-supported
# (_v2_checkpoint_rows) and WRITE-granted: write_checkpoint emits the
# sidecar-less v2 layout on tables declaring the feature, so the
# maintain-v2-checkpoints writer obligation is honored.
# deletionVectors is READ-supported for all three storage types —
# inline 'i' plus the on-disk 'u'/'p' file framing (sources/deltadv.py,
# every framing field verified) — but write-ungranted. Anything else
# stays a loud error — wrong rows are worse.
_SUPPORTED_READER_FEATURES = {
    "columnMapping",
    "v2Checkpoint",
    "deletionVectors",
    # TIMESTAMP_NTZ is a native Spark type: the schemaString round-trips
    # through StructType.fromJson and parquet stores INT64
    # isAdjustedToUTC=false — nothing engine-side to add
    "timestampNtz",
    # a no-op for readers by definition: the feature only obliges
    # VACUUM to run the writer-protocol gate first (vacuum_delta does)
    "vacuumProtocolCheck",
    # files written before an ALTER COLUMN TYPE widening carry the
    # NARROWER physical type; Spark 4's parquet readers promote
    # int8→…→long, float→double and decimal-precision widenings
    # natively against the (wider) read schema, and the arrow streaming
    # lanes cast per column — an unsupported conversion (e.g. a foreign
    # date→timestampNtz widening) fails loudly at scan, never silently
    "typeWidening",
    "typeWidening-preview",
    # the Variant data type is native in Spark 4 (VariantType): the
    # schemaString round-trips through StructType.fromJson and parquet
    # stores the spec's (metadata, value) binary group, which Spark's
    # vectorized reader assembles natively; variant_get/to_json work on
    # the scanned column.
    "variantType",
    "variantType-preview",
    # SHREDDED variants (the parquet variant-shredding spec): files
    # store a metadata/value/typed_value group with typed subcolumns,
    # and Spark 4's vectorized reader REASSEMBLES them into variant
    # values natively when the read schema asks for VariantType
    # (spark.sql.variant.allowReadingShredded, default true) — the
    # explicit-schema scans _scan_files issues take exactly that path,
    # so foreign shredded tables read losslessly
    # (store_delta_variant_shredded pins the round trip).
    "variantShredding",
    "variantShredding-preview",
}


def _check_reader_protocol(proto: dict, where: str) -> None:
    """Gate on the reader protocol: v1 plain, v2 column mapping (name
    and id modes both read; the mode is validated where the schema maps),
    v3 only when every declared readerFeature is in
    _SUPPORTED_READER_FEATURES. Anything else raises rather than
    returning wrong rows (a feature-blind replay of a DV table would
    emit deleted rows)."""
    v = int(proto.get("minReaderVersion") or 1)
    if v <= 2:
        return
    if v == 3:
        feats = proto.get("readerFeatures")
        if feats is None:
            # v3 REQUIRES readerFeatures per the protocol; a v3 action
            # without it is malformed — the needed features are unknown
            raise ValueError(
                f"malformed Delta protocol in {where}: minReaderVersion 3 "
                f"without readerFeatures"
            )
        extra = sorted(set(feats) - _SUPPORTED_READER_FEATURES)
        if not extra:
            return
        raise ValueError(
            f"unsupported Delta readerFeatures {extra} in {where} "
            f"(this reader supports {sorted(_SUPPORTED_READER_FEATURES)})"
        )
    raise ValueError(
        f"unsupported Delta minReaderVersion {v} in {where} "
        f"(this reader supports protocol versions 1-3)"
    )


# Writer features this engine can honor under protocol v7 (PROTOCOL.md
# "Table Features"). invariants / checkConstraints / generatedColumns are
# ENFORCED/VALIDATED row-by-row (_enforce_write_obligations);
# identityColumns allocate above the recorded high water mark and re-emit
# the bookkeeping (write_delta._apply_identity); rowTracking etc. stay
# unsupported.
_SUPPORTED_WRITER_FEATURES = {
    "appendOnly",
    "invariants",
    "checkConstraints",
    "changeDataFeed",
    "columnMapping",
    "generatedColumns",
    "identityColumns",
    "timestampNtz",
    # domain metadata is PRESERVED: replay tracks the latest action per
    # domain and write_checkpoint re-emits live domains, so clean_log
    # never strips a foreign writer's domains (the v7 obligation)
    "domainMetadata",
    "vacuumProtocolCheck",
    # honored in _publish_commit: once the previous commit carries an
    # inCommitTimestamp, every commit we publish continues the chain
    # monotonically (max(now, prev+1)) — the feature's one writer rule
    "inCommitTimestamp",
    # granted via MATERIALIZE-ON-REWRITE (never creates a DV): DML
    # copy-on-write reads touched files through the DV-applying scan
    # and stages plain rewrites; OPTIMIZE applies DVs when compacting
    # (and treats any DV-carrying file as rewrite-eligible — the PURGE
    # path); write_checkpoint persists descriptors in add rows;
    # remove actions of DV-carrying files carry the descriptor;
    # vacuum never deletes deletion_vector_*.bin (it only reclaims
    # *.parquet, the same conservative rule as _change_data)
    "deletionVectors",
    # honored in write_checkpoint: tables declaring the feature get the
    # sidecar-less UUID-named v2 layout (checkpointMetadata marker +
    # inline actions) instead of a classic checkpoint
    "v2Checkpoint",
    # honored natively: Spark 4's parquet writer emits the variant
    # spec's (metadata, value) binary group for VariantType columns —
    # the writer obligation is writing valid variant binaries, which
    # the engine's own type system guarantees
    "variantType",
    "variantType-preview",
    # the shredding obligation is conditional: a writer MAY stage
    # unshredded variant binaries into a shredding-enabled table (the
    # spec's value-only shape), and when Spark's shredded writer IS on
    # (spark.sql.variant.writeShredding.enabled) the files it stages
    # follow the spec's typed_value layout — either way the obligation
    # holds
    "variantShredding",
    "variantShredding-preview",
    # honored in clean_log (PROTOCOL.md "Checkpoint Protection"): the
    # feature's one writer obligation is the metadata-cleanup rule —
    # history before delta.requireCheckpointProtectionBeforeVersion
    # may only vanish in a truncation reaching the boundary, which
    # clean_log enforces by refusing an anchor inside the protected
    # range; ordinary commits carry no extra obligation
    "checkpointProtection",
    # honored via domain preservation (PROTOCOL.md "Clustered Table"):
    # the writer obligation is to keep the clustering implementation's
    # delta.clustering domainMetadata intact — replay tracks it,
    # write_checkpoint re-emits it, clean_log never strips it. This
    # writer never REORGANIZES data by the clustering columns (appends
    # land unclustered, legal best-effort per the spec; OPTIMIZE
    # zorder_by is the explicit reclustering path).
    "clusteredTable",
    # vacuously honored: the obligation is to RECORD delta.typeChanges
    # when widening a column's type, and this writer never changes
    # types (appends require structural schema equality) — it only
    # reads tables other writers widened
    "typeWidening",
    "typeWidening-preview",
    # honored via _row_tracking_actions: every new add gets a fresh
    # baseRowId above the delta.rowTracking domain's rowIdHighWaterMark
    # plus defaultRowCommitVersion, and the domain re-emits with the
    # bumped mark; checkpoints re-emit both fields; tombstones carry
    # them. Tables with delta.enableRowTracking=true additionally
    # oblige ROW-ID PRESERVATION across rewrites: DML and OPTIMIZE
    # materialize the surviving rows' ids/commit versions into the
    # configured materialized columns (deltadml._scan_with_row_ids /
    # optimize_delta's per-file reads), assigning the column names
    # lazily when missing; RESTORE re-attaches the historical
    # baseRowId/defaultRowCommitVersion verbatim.
    "rowTracking",
}

# Schema field-metadata keys that carry writer obligations this engine
# does not evaluate: writing around them would corrupt state other
# readers rely on, so their presence blocks writes. (delta.invariants
# and delta.generationExpression are NOT here — invariants are ENFORCED
# at write time and generated columns are VALIDATED value-for-value,
# see _enforce_write_obligations; delta.identity.* is not here either —
# write_delta allocates above the recorded high water mark and re-emits
# the bookkeeping, DML refuses the identity-touching shapes by name.)
_WRITER_OBLIGATION_META = ()


def _check_writer_protocol(
    snap: _Snapshot, where: str, data_removing: bool = False
) -> None:
    """Gate on the WRITER protocol before committing to a foreign table —
    the mirror of _check_reader_protocol (a reader that gates carefully
    but writes blindly can corrupt invariants other readers rely on).

    Raises on: minWriterVersion above 7; v7 without writerFeatures
    (malformed per the protocol) or with features outside
    _SUPPORTED_WRITER_FEATURES; and ``delta.appendOnly=true`` when the
    operation removes data (delta-spark's
    DeltaUnsupportedOperationException for DML on append-only tables).
    Identity columns (``delta.identity.*``, writer v6) do NOT block:
    write_delta allocates above the recorded high water mark / checks
    allowExplicitInsert and re-emits the bookkeeping (_apply_identity);
    the DML shapes that would mint values without bookkeeping refuse
    by name in deltadml. CHECK constraints
    (``delta.constraints.*``, writer v3), column invariants
    (``delta.invariants``, writer v2) and generated columns
    (``delta.generationExpression``, writer v4) do NOT block writes:
    constraints/invariants are ENFORCED row-by-row and generated
    columns VALIDATED value-for-value against their expression
    (_enforce_write_obligations) — delta-spark's own behavior when the
    caller supplies the column explicitly."""
    v = int((snap.protocol or {}).get("minWriterVersion") or 1)
    if v > 7:
        raise ValueError(
            f"unsupported Delta minWriterVersion {v} in {where} "
            f"(this writer supports protocol versions 1-7)"
        )
    if v == 7:
        feats = (snap.protocol or {}).get("writerFeatures")
        if feats is None:
            raise ValueError(
                f"malformed Delta protocol in {where}: minWriterVersion 7 "
                f"without writerFeatures"
            )
        extra = sorted(set(feats) - _SUPPORTED_WRITER_FEATURES)
        if extra:
            raise ValueError(
                f"unsupported Delta writerFeatures {extra} in {where} "
                f"(this writer supports "
                f"{sorted(_SUPPORTED_WRITER_FEATURES)})"
            )
    cfg = snap.config or {}
    offenders: list[str] = []

    def _walk(fields: list, prefix: str) -> None:
        for f in fields:
            md = f.metadata or {}
            for k in md:
                if k in _WRITER_OBLIGATION_META:
                    offenders.append(f"{prefix}{f.name}:{k}")
            dt = f.dataType
            if isinstance(dt, T.ArrayType):
                dt = dt.elementType
            if isinstance(dt, T.StructType):
                _walk(dt.fields, f"{prefix}{f.name}.")

    _walk(
        T.StructType.fromJson(json.loads(snap.schema_json)).fields, ""
    )
    if offenders:
        raise ValueError(
            f"cannot write {where}: columns carry writer obligations this "
            f"writer does not evaluate ({sorted(offenders)})"
        )
    if data_removing and str(cfg.get("delta.appendOnly", "")).lower() == (
        "true"
    ):
        raise ValueError(
            f"{where} is append-only (delta.appendOnly=true): "
            f"data-removing operations are forbidden"
        )


def _write_obligations(snap: _Snapshot) -> list[tuple[str, str]]:
    """(label, sql_expr) for every CHECK constraint
    (``delta.constraints.<name>`` table config, writer v3) and column
    invariant (``delta.invariants`` field metadata at any nesting
    level, writer v2 — the value is delta's
    ``{"expression": {"expression": "<sql>"}}`` JSON, tolerating a bare
    SQL string) the table declares."""
    out: list[tuple[str, str]] = []
    for k in sorted(snap.config or {}):
        if k.startswith("delta.constraints."):
            out.append(
                (f"CHECK constraint {k[len('delta.constraints.'):]}",
                 snap.config[k])
            )

    def _walk(fields, prefix: str) -> None:
        for f in fields:
            md = f.metadata or {}
            inv = md.get("delta.invariants")
            if inv:
                expr = inv
                try:
                    expr = json.loads(inv)["expression"]["expression"]
                except (ValueError, TypeError, KeyError):
                    pass
                out.append((f"invariant on column {prefix}{f.name}", expr))
            gen = md.get("delta.generationExpression")
            if gen and not prefix:
                # generated column: the supplied value must EQUAL the
                # generation expression (null-safe — delta validates the
                # same equality when the column is provided explicitly)
                out.append(
                    (
                        f"generation expression of column {f.name}",
                        f"{f.name} <=> ({gen})",
                    )
                )
            dt = f.dataType
            if isinstance(dt, T.ArrayType):
                dt = dt.elementType
            if isinstance(dt, T.StructType):
                _walk(dt.fields, f"{prefix}{f.name}.")

    _walk(T.StructType.fromJson(json.loads(snap.schema_json)).fields, "")
    return out


def _enforce_write_obligations(
    df: DataFrame, snap: _Snapshot, where: str
) -> None:
    """Enforce the table's CHECK constraints and column invariants on a
    LOGICAL-schema batch about to be written — the delta writer-v2/v3
    obligation (delta-spark's InvariantViolationException): a row
    violates unless the expression evaluates to TRUE — NULL is a
    violation too, matching delta-spark's CheckDeltaInvariant and the
    PROTOCOL.md requirement that the expression "evaluate to true",
    stricter than standard SQL CHECK. One extra pass over the batch, only
    on tables that declare obligations; delta-spark fuses the check
    into the write projection — same cost class, kept separate here
    for clarity. Raises naming the constraint and one violating row."""
    obligations = _write_obligations(snap)
    if not obligations:
        return
    flags = [
        F.expr(expr).cast("boolean").alias(f"__ob{i}")
        for i, (_lbl, expr) in enumerate(obligations)
    ]
    viol_any = None
    for i in range(len(obligations)):
        # NULL or FALSE both violate (must be TRUE per PROTOCOL.md)
        this = ~F.col(f"__ob{i}").eqNullSafe(F.lit(True))
        viol_any = this if viol_any is None else (viol_any | this)
    bad = (
        df.select(*df.columns, *flags).filter(viol_any).limit(1).collect()
    )
    if bad:
        row = bad[0]
        broken = [
            f"{lbl} ({expr!r})"
            for i, (lbl, expr) in enumerate(obligations)
            if row[f"__ob{i}"] is not True
        ]
        vals = {c: row[c] for c in df.columns}
        raise ValueError(
            f"write to {where} violates {'; '.join(broken)}: row {vals}"
        )


# -- column mapping (PROTOCOL.md "Column Mapping", name + id modes) ------
# With delta.columnMapping.mode = name, data files store columns under
# per-field PHYSICAL names carried in the schemaString's field metadata
# (delta.columnMapping.physicalName / .id); partition values and stats
# in the log are keyed by physical names, while metaData.partitionColumns
# keeps the logical names. Mode `id` (what Iceberg-converted / UniForm
# and some delta-rs writers produce) additionally requires resolving data
# columns by the PARQUET FIELD ID (delta.columnMapping.id ↔ the file's
# parquet field_id), NOT by name — the batch lanes do this natively via
# Spark's spark.sql.parquet.fieldId.read/write.enabled (the read schema's
# fields carry `parquet.field.id` metadata, so files whose column names
# differ entirely still resolve, at every struct nesting level); the
# arrow streaming lanes resolve top-level columns by the file schema's
# PARQUET:field_id metadata (nested struct fields rename positionally,
# as in name mode). partitionValues stay keyed by physicalName in BOTH
# modes per the protocol.

_CM_MODE = "delta.columnMapping.mode"
_CM_MAXID = "delta.columnMapping.maxColumnId"
_CM_PHYS = "delta.columnMapping.physicalName"
_CM_ID = "delta.columnMapping.id"

# Change Data Feed (PROTOCOL.md "Add CDC File"): table flag, the
# directory change files land in, and the change-type column they carry
_CDF_FLAG = "delta.enableChangeDataFeed"
_DV_FLAG = "delta.enableDeletionVectors"
_CDF_DIR = "_change_data"
_CHANGE_TYPE = T.StructField("_change_type", T.StringType(), False)


def _mapping_mode(config: dict | None, where: str = "table") -> str:
    mode = (config or {}).get(_CM_MODE) or "none"
    if mode not in ("none", "name", "id"):
        raise ValueError(
            f"unknown Delta column-mapping mode {mode!r} in {where}"
        )
    return mode


# metadata key Spark's parquet reader/writer use for field-id resolution
# (spark.sql.parquet.fieldId.read.enabled / .write.enabled)
_PARQUET_FID = "parquet.field.id"


def _field_id(field: T.StructField) -> int:
    fid = (field.metadata or {}).get(_CM_ID)
    if fid is None:
        raise ValueError(
            f"column-mapped table (id mode): field {field.name!r} lacks "
            f"{_CM_ID} metadata in its schemaString"
        )
    return int(fid)


def _schema_field_ids(fields) -> set[int]:
    """Every delta.columnMapping.id carried by ``fields`` — ALL nesting
    levels, since nested struct fields have ids of their own and must
    resolve by id exactly like top-level columns (array element / map
    key+value types are not StructFields and carry no ids)."""
    out: set[int] = set()

    def _walk(dt: T.DataType) -> None:
        if isinstance(dt, T.StructType):
            for f in dt.fields:
                out.add(_field_id(f))
                _walk(f.dataType)
        elif isinstance(dt, T.ArrayType):
            _walk(dt.elementType)
        elif isinstance(dt, T.MapType):
            _walk(dt.keyType)
            _walk(dt.valueType)

    for f in fields:
        out.add(_field_id(f))
        _walk(f.dataType)
    return out


def _arrow_field_ids(schema) -> set[int]:
    """Every PARQUET:field_id in an arrow/parquet footer schema, all
    nesting levels (struct children, list value fields, map key/item)."""
    import pyarrow as pa

    out: set[int] = set()

    def _walk(field) -> None:
        fid = (field.metadata or {}).get(b"PARQUET:field_id")
        if fid is not None:
            out.add(int(fid))
        t = field.type
        if pa.types.is_struct(t):
            for i in range(t.num_fields):
                _walk(t.field(i))
        elif pa.types.is_list(t) or pa.types.is_large_list(t):
            _walk(t.value_field)
        elif pa.types.is_map(t):
            _walk(t.key_field)
            _walk(t.item_field)

    for f in schema:
        _walk(f)
    return out


# id-mode file footers already verified to carry field ids, keyed by
# (path, size, mtime_ns) — delta data files are immutable once committed
# (new content ⇒ new path), the stat key catches in-place corruption too
_FID_VERIFIED: set[tuple] = set()


def _require_field_ids(table: str, rels, fields) -> None:
    """Preflight id-mode data files against the data columns' field-id
    requirements (``fields``: the non-partition StructFields, whose
    delta.columnMapping.ids at EVERY nesting level the read will ask
    for; extra non-table columns like the CDF stager's _change_type
    legitimately have none and resolve by name). Spark's field-id
    matcher errors on flat schemas but NULL-FILLS nested ones when a
    file lacks ids (observed on 4.x) — silently wrong rows, so we
    verify footers ourselves, nested fields included.

    Per-subtree, to admit the SCHEMA-EVOLUTION shape: ids are assigned
    monotonically and never reused, so a file may legitimately lack a
    column's ENTIRE subtree when the column's id exceeds every id the
    file carries (the file provably predates the column — null-fill by
    design). But a file CARRYING a column's top-level id must carry
    every nested id under it (the children were assigned in the same
    walk), and a top-level id at-or-below the file's own maximum must
    be present — anything else is a malformed file Spark would silently
    null-fill.

    Driver-side, one pyarrow footer read (~ms) per file, cached for the
    process lifetime; a real deployment would fold this into the
    stats/skipping footer pass."""
    import pyarrow.parquet as pq

    groups = [(_field_id(f), _schema_field_ids([f])) for f in fields]
    for rel in rels:
        full = os.path.join(table, rel)
        st = os.stat(full)
        key = (full, st.st_size, st.st_mtime_ns)
        if key in _FID_VERIFIED:
            continue
        present = _arrow_field_ids(pq.read_schema(full))
        fmax = max(present, default=-1)
        for top, sub in groups:
            if top in present:
                missing = sorted(sub - present)
            elif top <= fmax:
                missing = sorted(sub)
            else:
                continue  # the file provably predates this column
            if missing:
                raise ValueError(
                    f"id-mode table {table}: data file {rel} carries no "
                    f"parquet field ids for {missing} — cannot resolve "
                    f"columns by id (refusing to null-fill)"
                )
        _FID_VERIFIED.add(key)


def _physical_name(field: T.StructField) -> str:
    phys = (field.metadata or {}).get(_CM_PHYS)
    if not phys:
        raise ValueError(
            f"column-mapped table: field {field.name!r} lacks "
            f"{_CM_PHYS} metadata in its schemaString"
        )
    return phys


def _physical_datatype(dt: T.DataType, with_ids: bool = False) -> T.DataType:
    """The PHYSICAL shape of a logical type under column mapping: every
    struct field (any nesting level) renamed to its physicalName.
    ``with_ids`` (id mode) additionally carries each field's
    delta.columnMapping.id as ``parquet.field.id`` metadata, so Spark's
    parquet lanes resolve/write nested fields by id."""
    if isinstance(dt, T.StructType):
        return T.StructType(
            [
                T.StructField(
                    _physical_name(f),
                    _physical_datatype(f.dataType, with_ids),
                    f.nullable,
                    {_PARQUET_FID: _field_id(f)} if with_ids else None,
                )
                for f in dt.fields
            ]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(
            _physical_datatype(dt.elementType, with_ids), dt.containsNull
        )
    if isinstance(dt, T.MapType):
        return T.MapType(
            _physical_datatype(dt.keyType, with_ids),
            _physical_datatype(dt.valueType, with_ids),
            dt.valueContainsNull,
        )
    return dt


def _strip_field_metadata(dt: T.DataType) -> T.DataType:
    """The schema with ALL field metadata removed (recursively) — the
    logical shape a user-supplied DataFrame is compared against: a
    column-mapped table's schemaString carries per-field mapping
    metadata that StructType equality would otherwise see."""
    if isinstance(dt, T.StructType):
        return T.StructType(
            [
                T.StructField(
                    f.name, _strip_field_metadata(f.dataType), f.nullable
                )
                for f in dt.fields
            ]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(
            _strip_field_metadata(dt.elementType), dt.containsNull
        )
    if isinstance(dt, T.MapType):
        return T.MapType(
            _strip_field_metadata(dt.keyType),
            _strip_field_metadata(dt.valueType),
            dt.valueContainsNull,
        )
    return dt


def _contains_ntz(dt: T.DataType) -> bool:
    """True when the type tree contains TIMESTAMP_NTZ anywhere — the
    delta timestampNtz table feature applies (reader 3 / writer 7)."""
    if isinstance(dt, T.TimestampNTZType):
        return True
    if isinstance(dt, T.StructType):
        return any(_contains_ntz(f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return _contains_ntz(dt.elementType)
    if isinstance(dt, T.MapType):
        return _contains_ntz(dt.keyType) or _contains_ntz(dt.valueType)
    return False


def _contains_variant(dt: T.DataType) -> bool:
    """True when the type tree contains VARIANT anywhere — the delta
    variantType table feature applies (reader 3 / writer 7)."""
    if isinstance(dt, getattr(T, "VariantType", ())):
        return True
    if isinstance(dt, T.StructType):
        return any(_contains_variant(f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return _contains_variant(dt.elementType)
    if isinstance(dt, T.MapType):
        return _contains_variant(dt.keyType) or _contains_variant(
            dt.valueType
        )
    return False


def _merge_schemas(
    table_schema: T.StructType, df_schema: T.StructType
) -> T.StructType:
    """The mergeSchema union: table fields first (keeping their exact
    types and any metadata), then the batch's NEW fields in batch order,
    forced nullable (pre-evolution files have no values for them). A
    same-name type conflict raises — silent coercion loses data."""
    table_names = {f.name for f in table_schema.fields}
    by_name = {f.name: f for f in df_schema.fields}
    for f in table_schema.fields:
        g = by_name.get(f.name)
        if g is not None and _strip_field_metadata(
            g.dataType
        ) != _strip_field_metadata(f.dataType):
            raise ValueError(
                f"mergeSchema type conflict on column {f.name!r}: table "
                f"has {f.dataType.simpleString()}, batch has "
                f"{g.dataType.simpleString()}"
            )
    new_fields = [
        T.StructField(g.name, g.dataType, True)
        for g in df_schema.fields
        if g.name not in table_names
    ]
    return T.StructType(list(table_schema.fields) + new_fields)


def _assign_mapping(schema: T.StructType) -> tuple[T.StructType, int]:
    """Name-mode mapping assignment for a NEW table (what delta-spark's
    ALTER TABLE ... SET TBLPROPERTIES columnMapping.mode=name does at
    create): every struct field at every nesting level gets a fresh
    ``col-<uuid>`` physical name and a sequential id. Returns the
    metadata-carrying schema and the max assigned id."""
    import uuid as _uuid

    counter = 0

    def walk_dt(dt: T.DataType) -> T.DataType:
        if isinstance(dt, T.StructType):
            return T.StructType([walk_field(f) for f in dt.fields])
        if isinstance(dt, T.ArrayType):
            return T.ArrayType(walk_dt(dt.elementType), dt.containsNull)
        if isinstance(dt, T.MapType):
            return T.MapType(
                walk_dt(dt.keyType), walk_dt(dt.valueType), dt.valueContainsNull
            )
        return dt

    def walk_field(f: T.StructField) -> T.StructField:
        nonlocal counter
        counter += 1
        md = dict(f.metadata or {})
        md[_CM_ID] = counter
        md[_CM_PHYS] = f"col-{_uuid.uuid4()}"
        return T.StructField(f.name, walk_dt(f.dataType), f.nullable, md)

    return T.StructType([walk_field(f) for f in schema.fields]), counter


def _evolve_mapping(
    mapped: T.StructType, batch: T.StructType, start: int
) -> tuple[T.StructType, int]:
    """mergeSchema on a COLUMN-MAPPED table: the table's fields keep
    their physicalName/id verbatim (old files resolve unchanged), and
    the batch's NEW fields get fresh ``col-<uuid>`` physical names and
    sequential ids ABOVE ``start`` (the table's maxColumnId) at every
    nesting level — ids are never reused per the protocol, so foreign
    id-mode files written before a column was dropped can never collide
    with an evolved column. Returns (evolved schema, new max id)."""
    import uuid as _uuid

    counter = start

    def walk_dt(dt: T.DataType) -> T.DataType:
        if isinstance(dt, T.StructType):
            return T.StructType([walk_field(f) for f in dt.fields])
        if isinstance(dt, T.ArrayType):
            return T.ArrayType(walk_dt(dt.elementType), dt.containsNull)
        if isinstance(dt, T.MapType):
            return T.MapType(
                walk_dt(dt.keyType), walk_dt(dt.valueType),
                dt.valueContainsNull,
            )
        return dt

    def walk_field(f: T.StructField) -> T.StructField:
        nonlocal counter
        counter += 1
        md = dict(f.metadata or {})
        md[_CM_ID] = counter
        md[_CM_PHYS] = f"col-{_uuid.uuid4()}"
        return T.StructField(f.name, walk_dt(f.dataType), f.nullable, md)

    names = {f.name for f in mapped.fields}
    new_fields = [
        walk_field(T.StructField(g.name, g.dataType, True))
        for g in batch.fields
        if g.name not in names
    ]
    return T.StructType(list(mapped.fields) + new_fields), counter


_ROW_TRACKING_DOMAIN = "delta.rowTracking"
_RT_RID_KEY = "delta.rowTracking.materializedRowIdColumnName"
_RT_RCV_KEY = "delta.rowTracking.materializedRowCommitVersionColumnName"


def _materialized_rt_cols(snap: "_Snapshot") -> tuple[str, str] | None:
    """The table's materialized row-id / row-commit-version PHYSICAL
    column names (PROTOCOL.md "Row Tracking": on a
    delta.enableRowTracking=true table, a row's id is the materialized
    column value when non-null, else baseRowId + row position; its
    commit version likewise falls back to defaultRowCommitVersion).
    None when the table has never assigned them — the first
    id-preserving DML assigns fresh names and re-emits metaData, as
    delta-spark does lazily in the DML transaction."""
    cfg = snap.config or {}
    rid = cfg.get(_RT_RID_KEY)
    rcv = cfg.get(_RT_RCV_KEY)
    return (rid, rcv) if rid and rcv else None


def _row_tracking_state(snap: "_Snapshot") -> tuple[bool, bool, int]:
    """(supported, enabled, rowIdHighWaterMark) for the rowTracking
    table feature (PROTOCOL.md "Row Tracking"): supported = the writer
    feature is declared (every new add must carry fresh
    baseRowId/defaultRowCommitVersion and bump the high-water-mark
    domain); enabled = delta.enableRowTracking=true (row ids are
    STABLE — rewrites must preserve them, which this engine refuses
    rather than breaks). hwm is -1 when the domain has never been
    written (fresh ids then start at 0, per the protocol)."""
    supported = "rowTracking" in set(
        (snap.protocol or {}).get("writerFeatures") or ()
    )
    enabled = (
        str((snap.config or {}).get("delta.enableRowTracking", "")).lower()
        == "true"
    )
    hwm = -1
    dom = (getattr(snap, "domains", None) or {}).get(_ROW_TRACKING_DOMAIN)
    if dom and not dom.get("removed") and dom.get("configuration"):
        try:
            hwm = int(
                json.loads(dom["configuration"]).get(
                    "rowIdHighWaterMark", -1
                )
            )
        except (ValueError, TypeError, json.JSONDecodeError):
            raise ValueError(
                f"malformed {_ROW_TRACKING_DOMAIN} domain configuration "
                f"{dom['configuration']!r}"
            )
    return supported, enabled, hwm


def _row_tracking_actions(
    table: str, snap: "_Snapshot", staged_rels: list, version: int,
    data_removing: bool = False,
    rows_preserved: bool = False,
) -> tuple[dict, dict | None]:
    """Row-tracking obligations for a commit adding ``staged_rels`` at
    ``version``: returns (per-rel add extras {baseRowId,
    defaultRowCommitVersion}, the bumped delta.rowTracking
    domainMetadata action or None). Fresh base ids are allocated
    contiguously above the CURRENT high water mark (the caller
    recomputes per commit-race iteration, so concurrent writers never
    reuse ids — the loser replays with the winner's mark); per-file row
    counts come from one parquet-footer read each. Raises on
    data-removing ops when delta.enableRowTracking=true UNLESS the
    caller materialized the surviving rows' ids into the staged files
    (``rows_preserved`` — the DML path threads the table's materialized
    row-id/commit-version columns through the rewrite)."""
    supported, enabled, hwm = _row_tracking_state(snap)
    if not supported:
        return {}, None
    if enabled and data_removing and not rows_preserved:
        raise ValueError(
            f"{table} has delta.enableRowTracking=true: data-removing "
            f"operations must PRESERVE materialized row ids across the "
            f"rewrite, which this writer does not implement (appends "
            f"work; disable row tracking to rewrite)"
        )
    import pyarrow.parquet as pq

    extras: dict = {}
    next_id = hwm + 1
    for rel in sorted(staged_rels):
        n = pq.read_metadata(os.path.join(table, rel)).num_rows
        extras[rel] = {
            "baseRowId": next_id,
            "defaultRowCommitVersion": version,
        }
        next_id += n
    domain = {
        "domainMetadata": {
            "domain": _ROW_TRACKING_DOMAIN,
            "configuration": json.dumps(
                {"rowIdHighWaterMark": next_id - 1}
            ),
            "removed": False,
        }
    }
    return extras, domain


def _fresh_row_tracking(
    table: str, staged_rels: list, version: int
) -> tuple[dict, dict | None]:
    """Create-path rowTracking allocation: contiguous base ids from 0
    plus the initial high-water-mark domain (the latest>=0 path goes
    through _row_tracking_actions against the live snapshot)."""
    import pyarrow.parquet as pq

    extras: dict = {}
    next_id = 0
    for rel in sorted(staged_rels):
        n = pq.read_metadata(os.path.join(table, rel)).num_rows
        extras[rel] = {
            "baseRowId": next_id,
            "defaultRowCommitVersion": version,
        }
        next_id += n
    domain = {
        "domainMetadata": {
            "domain": _ROW_TRACKING_DOMAIN,
            "configuration": json.dumps(
                {"rowIdHighWaterMark": next_id - 1}
            ),
            "removed": False,
        }
    }
    return extras, domain


_IDENT_HWM = "delta.identity.highWaterMark"


def _identity_fields(schema: T.StructType) -> list[T.StructField]:
    """Top-level fields carrying ``delta.identity.*`` metadata (writer
    v6 / identityColumns: identity columns are top-level longs per the
    protocol)."""
    return [
        f
        for f in schema.fields
        if any(
            k.startswith("delta.identity.") for k in (f.metadata or {})
        )
    ]


def _identity_info(schema: T.StructType, df_cols: list[str]) -> list[dict]:
    """Per identity column: the bookkeeping needed to allocate/admit
    values — start, step, allowExplicitInsert, the recorded high water
    mark, and whether the batch supplies the column."""
    out = []
    for f in _identity_fields(schema):
        md = f.metadata or {}
        step = int(md.get("delta.identity.step", 1))
        if step == 0:
            raise ValueError(
                f"malformed identity column {f.name!r}: step is 0"
            )
        allow = md.get("delta.identity.allowExplicitInsert", False)
        hwm = md.get(_IDENT_HWM)
        out.append(
            {
                "name": f.name,
                "start": int(md.get("delta.identity.start", 1)),
                "step": step,
                "allow": str(allow).lower() == "true",
                "hwm": int(hwm) if hwm is not None else None,
                "supplied": f.name in df_cols,
                "nullable": f.nullable,
            }
        )
    return out


def _decode_path(raw: str) -> str:
    """add/remove paths are URL-encoded per the protocol (RFC 2396);
    decode before touching the filesystem. Absolute paths (shallow
    clones) are out of scope — error, never read outside the table."""
    from urllib.parse import unquote

    path = unquote(raw)
    if os.path.isabs(path) or "://" in path:
        raise ValueError(
            f"absolute add.path {raw!r} unsupported (shallow clones are "
            f"out of this reader's scope)"
        )
    return path


def _replay(table: str, version: int | None) -> _Snapshot:
    """Replay the log up to ``version`` (default: latest)."""
    entries = _log_entries(table)
    ckpt_map = _checkpoints(table)
    ckpts = sorted(ckpt_map)
    if not entries and not ckpts:
        raise ValueError(f"no Delta log at {table}/{_LOG}")
    latest = max(
        entries[-1][0] if entries else -1, ckpts[-1] if ckpts else -1
    )
    if version is None:
        version = latest
    elif version > latest:
        raise ValueError(
            f"version {version} not in {table} (latest is {latest})"
        )
    schema_json: str | None = None
    part_cols: list[str] = []
    live: dict[str, dict] = {}
    dvs: dict[str, dict] = {}
    domains: dict[str, dict] = {}
    row_meta: dict[str, dict] = {}
    config: dict = {}
    protocol: dict = {"minReaderVersion": 1, "minWriterVersion": 1}

    def _see_add(a: dict) -> None:
        path = _decode_path(a["path"])
        dv = a.get("deletionVector")
        if dv:
            # DVs (inline AND on-disk) decode at scan time
            # (sources/deltadv.py) — record the descriptor so the file
            # is never read as a full file
            dv = dict(dv) if isinstance(dv, list) else dv
            dvs[path] = dv
        else:
            dvs.pop(path, None)  # a plain re-add clears the file's DV
        pv = a.get("partitionValues") or {}
        # checkpoint schema stores partitionValues as map<string,string>;
        # pyarrow's to_pylist renders maps as (key, value) tuple lists
        live[path] = dict(pv) if isinstance(pv, list) else pv
        if a.get("baseRowId") is not None:
            row_meta[path] = {
                "baseRowId": int(a["baseRowId"]),
                "defaultRowCommitVersion": (
                    int(a["defaultRowCommitVersion"])
                    if a.get("defaultRowCommitVersion") is not None
                    else None
                ),
            }
        else:
            row_meta.pop(path, None)

    # Start from the newest checkpoint at-or-before `version`, if any —
    # a checkpoint-only table (JSON commits expired by log retention) is
    # valid: the checkpoint fully describes the snapshot.
    ckpt_version = max((v for v in ckpts if v <= version), default=-1)
    # reconstruction is complete iff a checkpoint anchors the replay OR
    # the JSON log still reaches back to version 0 — anything else is a
    # truncated history and must error, not return a partial file set
    if ckpt_version < 0 and (not entries or entries[0][0] != 0):
        raise ValueError(
            f"cannot reconstruct version {version} of {table}: no "
            f"checkpoint at-or-before it and the JSON log does not "
            f"start at 0 (log cleanup removed early commits)"
        )
    if ckpt_version >= 0:
        for row in _checkpoint_rows(table, ckpt_version, ckpt_map):
            add = row.get("add")
            if add and add.get("path"):
                _see_add(add)
            dom = row.get("domainMetadata")
            if dom and dom.get("domain"):
                domains[dom["domain"]] = dict(dom)
            meta = row.get("metaData")
            if meta and meta.get("schemaString"):
                schema_json = meta["schemaString"]
                part_cols = list(meta.get("partitionColumns") or [])
                c = meta.get("configuration")
                config = (dict(c) if isinstance(c, list) else c) or {}
            proto = row.get("protocol")
            if proto and proto.get("minReaderVersion") is not None:
                protocol = {k: v for k, v in proto.items() if v is not None}
                _check_reader_protocol(protocol, table)

    for v, path in entries:
        if v <= ckpt_version or v > version:
            continue
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "metaData" in action:
                    schema_json = action["metaData"]["schemaString"]
                    part_cols = list(
                        action["metaData"].get("partitionColumns") or []
                    )
                    config = action["metaData"].get("configuration") or {}
                elif "add" in action:
                    _see_add(action["add"])
                elif "remove" in action:
                    gone = _decode_path(action["remove"]["path"])
                    live.pop(gone, None)
                    dvs.pop(gone, None)
                    row_meta.pop(gone, None)
                elif "domainMetadata" in action:
                    dom = action["domainMetadata"]
                    if dom.get("domain"):
                        # latest action wins; removed=true stays as a
                        # tombstone until a checkpoint drops it
                        domains[dom["domain"]] = dict(dom)
                elif "protocol" in action:
                    protocol = {
                        k: v
                        for k, v in action["protocol"].items()
                        if v is not None
                    }
                    _check_reader_protocol(protocol, table)
    if schema_json is None:
        raise ValueError(f"no metaData action found in {table}/{_LOG}")
    return _Snapshot(
        schema_json, part_cols, live, config, protocol, dvs, domains,
        row_meta,
    )


def delta_live_files(table: str, version: int | None = None) -> list[str]:
    """Relative paths of the files LIVE at ``version`` (default latest) —
    the replayed add-minus-remove set. The observable OPTIMIZE contracts:
    same rows, fewer live files, old versions' sets untouched."""
    return sorted(_replay(table, version)[2])


def last_txn_version(table: str, app_id: str) -> int | None:
    """Highest ``txn`` (setTransaction) version committed for ``app_id``,
    or None if the application never committed. This is Delta's
    idempotent-writer primitive (PROTOCOL.md "Transaction Identifiers"):
    a streaming sink records (appId, batchId) with each commit and skips
    batches at-or-below the recorded version on replay. Reads the JSON
    commits plus any ``txn`` rows a checkpoint carries."""
    if not os.path.isdir(os.path.join(table, _LOG)):
        return None  # table doesn't exist yet: no app ever committed
    entries = _log_entries(table)
    ckpt_map = _checkpoints(table)
    ckpts = sorted(ckpt_map)
    if not entries and not ckpts:
        return None
    best: int | None = None

    def _see(txn: dict | None) -> None:
        nonlocal best
        if txn and txn.get("appId") == app_id and txn.get("version") is not None:
            v = int(txn["version"])
            best = v if best is None or v > best else best

    ckpt_version = ckpts[-1] if ckpts else -1
    if ckpt_version >= 0:
        for row in _checkpoint_rows(table, ckpt_version, ckpt_map):
            _see(row.get("txn"))
    for v, path in entries:
        if v <= ckpt_version:
            continue
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    _see(json.loads(line).get("txn"))
    return best


def delta_features(table: str) -> dict:
    """Introspect the table's protocol + table-feature surface WITHOUT
    the reader gates, so a user learns what this engine cannot consume
    BEFORE opening a batch read or a stream (the gates themselves raise
    at first scan/plan — correct, but late). Returns::

        {"protocol": {...last protocol action...},
         "configuration": {...last metaData configuration...},
         "unsupported": ["minReaderVersion=3", "readerFeature:...", ...],
         "streamable": bool}

    ``unsupported`` names every feature outside this reader's documented
    scope (module docstring): a minReaderVersion above 3, any declared
    readerFeature not in _SUPPORTED_READER_FEATURES,
    and unreadable
    checkpoint layouts. Deletion vectors are NOT listed: all three
    storage types decode, the streaming legs (snapshot AND tail) mask
    the deleted positions, and the write paths materialize-on-rewrite
    (sources/deltadv.py, DML/OPTIMIZE/checkpoint/vacuum) — this engine
    just never CREATES a DV. The one DV hole left is batch
    read_change_feed over a foreign DV-ADD commit without cdc files,
    which raises by name (a row-level change needs a DV diff). Column mapping (name AND id modes) and v2/UUID
    checkpoints are supported and not listed. Empty list ⇒ the batch
    reader and deltastream source can consume the table."""
    proto: dict = {"minReaderVersion": 1, "minWriterVersion": 1}
    conf: dict = {}
    unsupported: list[str] = []

    def _see_protocol(p: dict | None) -> None:
        nonlocal proto
        if p and p.get("minReaderVersion") is not None:
            proto = {k: v for k, v in p.items() if v is not None}

    def _see_meta(m: dict | None) -> None:
        nonlocal conf
        if m is not None and m.get("configuration") is not None:
            c = m["configuration"]
            # checkpoint map columns come back as (key, value) tuples
            conf = dict(c) if not isinstance(c, dict) else c

    try:
        ckpt_map = _checkpoints(table)
    except ValueError as exc:  # unknown layout: report, don't raise
        ckpt_map = {}
        unsupported.append(f"checkpointLayout:{exc}")
    ckpts = sorted(ckpt_map)
    anchor = -1
    if ckpts:
        try:
            for row in _checkpoint_rows(table, ckpts[-1], ckpt_map):
                _see_protocol(row.get("protocol"))
                _see_meta(row.get("metaData"))
            anchor = ckpts[-1]
        except Exception as exc:
            # a corrupt/unreadable checkpoint (empty v2 file, missing
            # sidecar) is a consumability blocker to REPORT here — the
            # readers raise, the introspector must not
            unsupported.append(f"checkpointLayout:{exc}")
    for v, path in _log_entries(table):
        if v <= anchor:
            continue
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                _see_protocol(action.get("protocol"))
                _see_meta(action.get("metaData"))

    v = int(proto.get("minReaderVersion") or 1)
    if v > 3:
        unsupported.append(f"minReaderVersion={v}")
    elif v == 3:
        for feat in (
            set(proto.get("readerFeatures") or []) - _SUPPORTED_READER_FEATURES
        ):
            unsupported.append(f"readerFeature:{feat}")
    cmode = conf.get(_CM_MODE, "none")
    if cmode not in (None, "", "none", "name", "id"):
        # name mode AND id mode are READ/WRITE supported (read_delta,
        # write_delta, deltastream — id resolves by parquet field id)
        unsupported.append(f"columnMapping:{cmode}")
    unsupported = sorted(set(unsupported))
    return {
        "protocol": proto,
        "configuration": conf,
        "unsupported": unsupported,
        "streamable": not unsupported,
    }


def delta_domain_metadata(table: str) -> dict:
    """The table's LIVE domain metadata (PROTOCOL.md "Domain Metadata"):
    {domain: configuration-string} for every domain whose latest action
    is not a removal. Foreign writers (clustering, row tracking, Sharing)
    park state here; replay tracks it and write_checkpoint preserves it
    across clean_log, so this surface is retention-safe."""
    return {
        name: dom.get("configuration")
        for name, dom in (getattr(_replay(table, None), "domains", None) or {}).items()
        if not dom.get("removed")
    }


def _info_ts(info: dict | None) -> int | None:
    """A commitInfo's authoritative timestamp: inCommitTimestamp when
    present (the in-commit-timestamps table feature — monotone by
    construction and immune to file-mtime drift), else the classic
    commitInfo.timestamp."""
    if not info:
        return None
    if info.get("inCommitTimestamp") is not None:
        return int(info["inCommitTimestamp"])
    if info.get("timestamp") is not None:
        return int(info["timestamp"])
    return None


def delta_version_at(table: str, timestamp_ms: int) -> int:
    """``timestampAsOf`` resolution (delta-spark semantics): the greatest
    RETAINED version whose commit timestamp is ≤ ``timestamp_ms``. A
    commit's timestamp is its commitInfo.timestamp when recorded (our
    writer and delta-spark both record one), else the commit file's
    mtime; a commit carrying ``inCommitTimestamp`` (the
    in-commit-timestamps feature) resolves by IT, never the mtime the
    feature exists to replace. A timestamp before the earliest retained
    commit raises —
    clean_log'd history cannot be time-traveled to, exactly as in
    delta-spark; a timestamp past the newest commit resolves to it.

    The WHOLE commit is scanned for commitInfo, not just the first line:
    commitInfo-first is only a convention, and a foreign writer that
    puts it elsewhere must resolve to the same per-version timestamp
    here as in delta_history and the streaming startingTimestamp path
    (which both scan all lines)."""
    stamps: list[tuple[int, int]] = []
    for v, path in _log_entries(table):
        ts = None
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                ts = _info_ts(json.loads(line).get("commitInfo"))
                if ts is not None:
                    break
        if ts is None:
            ts = int(os.path.getmtime(path) * 1000)
        stamps.append((v, ts))
    if not stamps:
        raise ValueError(f"no retained JSON commits in {table}/{_LOG}")
    # timestamps are made monotone the way delta-spark does (a later
    # commit with an earlier clock reading inherits its predecessor's)
    mono: list[tuple[int, int]] = []
    for v, ts in stamps:
        if mono and ts < mono[-1][1]:
            ts = mono[-1][1]
        mono.append((v, ts))
    eligible = [v for v, ts in mono if ts <= timestamp_ms]
    if not eligible:
        raise ValueError(
            f"timestamp {timestamp_ms} predates the earliest retained "
            f"commit of {table} (version {mono[0][0]} at {mono[0][1]})"
        )
    return eligible[-1]


def read_delta(
    spark: SparkSession,
    table: str,
    version: int | None = None,
    timestamp_ms: int | None = None,
) -> DataFrame:
    """Read a Delta table as of ``version`` (default: latest) — time
    travel included, no delta-spark jar. ``timestamp_ms`` is the
    ``timestampAsOf`` form (exclusive with ``version``): the snapshot at
    the greatest version committed at-or-before that wall-clock instant
    (delta_version_at). Partitioned tables get their
    partition columns re-attached from each add-action's
    partitionValues (authoritative per the protocol), cast to the
    table-schema type; file groups sharing partitionValues are read
    together so the plan stays one parquet scan per distinct partition
    tuple."""
    if timestamp_ms is not None:
        if version is not None:
            raise ValueError("pass version OR timestamp_ms, not both")
        version = delta_version_at(table, timestamp_ms)
    snap = _replay(table, version)
    return _scan_files(spark, table, snap, snap.live)


def _scan_files(
    spark: SparkSession,
    table: str,
    snap: _Snapshot,
    files: dict,
    extra_fields: list[T.StructField] | None = None,
    keep_positions: dict | None = None,
) -> DataFrame:
    """The scan kernel shared by read_delta and read_change_feed: a
    DataFrame over ``files`` ({rel_path: partitionValues}) in the
    table's LOGICAL schema, partition columns re-attached from the
    (physically-keyed, under column mapping) partitionValues, one
    parquet scan per distinct partition tuple. ``extra_fields`` are
    NON-TABLE columns stored verbatim in the files (the CDF reader's
    ``_change_type``) — appended to the read schema and the output,
    never name-mapped. ``keep_positions`` ({rel_path: sorted row
    indexes}) INVERTS the deletion-vector filter for the listed files:
    only the rows AT those parquet positions are returned — the CDF
    reader's DV-diff derivation (the delete rows of a DV-growing
    re-add are exactly the newly-vectored positions); it wins over a
    snapshot DV on the same file."""
    part_cols = snap.part_cols
    cmode = _mapping_mode(snap.config, table)
    mapped = cmode in ("name", "id")
    with_ids = cmode == "id"
    schema = T.StructType.fromJson(json.loads(snap.schema_json))
    extra_fields = list(extra_fields or [])
    logical = T.StructType(
        _t.cast(T.StructType, _strip_field_metadata(schema)).fields
        + extra_fields
    )
    if mapped:
        # a mapped table whose schemaString lacks the required per-field
        # metadata is malformed per the protocol — validate even when the
        # live set is empty, so the defect surfaces at first read
        for f in schema.fields:
            _physical_name(f)
            if with_ids:
                _field_id(f)
    if not files:
        return spark.createDataFrame([], logical)
    data_fields = [f for f in schema.fields if f.name not in part_cols]
    if with_ids:
        # id mode: data columns resolve by PARQUET FIELD ID, not name —
        # the read schema's fields carry parquet.field.id metadata and
        # Spark's field-id matcher does the rest (nested levels too);
        # physical names remain as the requested field names, a cosmetic
        # detail once ids match. Files lacking ids fail loudly via the
        # footer preflight (Spark's own matcher errors on flat schemas
        # but null-fills nested ones — wrong rows, so we don't rely on
        # it).
        spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
        _require_field_ids(
            table,
            files,
            [f for f in schema.fields if f.name not in part_cols],
        )
    if mapped:
        # name mode: data files store columns under the per-field
        # PHYSICAL names in the schemaString metadata — read with the
        # physical schema, then rename back to logical names (a
        # positional struct cast renames nested fields; flat fields are
        # a plain alias, so Catalyst sees no real cast)
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
    if extra_fields:
        data_schema = T.StructType(data_schema.fields + extra_fields)
        renames = renames + [F.col(f.name) for f in extra_fields]

    dvs = getattr(snap, "dvs", None) or {}
    keep_positions = keep_positions or {}

    def read_group(rels: list[str]) -> DataFrame:
        """One logical scan over a group of files, deletion vectors
        applied: files WITHOUT a DV read as one multi-path scan; each
        DV-carrying file reads with its per-file parquet row position
        (`_metadata.row_index`, delta-spark's own DV filter column) and
        anti-joins the decoded deleted positions — broadcast, built
        through Arrow (a DV is bounded by its file's row count, and the
        bitmap bytes are read once driver-side; a 1000-executor
        deployment would ship descriptors and decode executor-side,
        same plan shape). ``keep_positions`` files SEMI-join instead:
        only the listed positions survive."""
        import pandas as _pd

        from marketdb_spark.sources.deltadv import decode_dv

        plain = [
            os.path.join(table, r)
            for r in rels
            if r not in dvs and r not in keep_positions
        ]
        grp: list[DataFrame] = []
        if plain:
            grp.append(
                spark.read.schema(data_schema).parquet(*plain).select(renames)
            )
        for rel in rels:
            if rel in keep_positions:
                df = (
                    spark.read.schema(data_schema)
                    .parquet(os.path.join(table, rel))
                    .select(
                        *renames,
                        F.col("_metadata.row_index").alias("__dv_ri"),
                    )
                )
                pos_df = spark.createDataFrame(
                    _pd.DataFrame(
                        {
                            "__dv_ri": _pd.array(
                                keep_positions[rel], dtype="int64"
                            )
                        }
                    )
                )
                grp.append(
                    df.join(
                        F.broadcast(pos_df), "__dv_ri", "left_semi"
                    ).drop("__dv_ri")
                )
                continue
            if rel not in dvs:
                continue
            positions = decode_dv(dvs[rel], table, rel)
            if not positions:  # cardinality-0 DV: the file reads whole
                grp.append(
                    spark.read.schema(data_schema)
                    .parquet(os.path.join(table, rel))
                    .select(renames)
                )
                continue
            df = (
                spark.read.schema(data_schema)
                .parquet(os.path.join(table, rel))
                .select(
                    *renames,
                    F.col("_metadata.row_index").alias("__dv_ri"),
                )
            )
            pos_df = spark.createDataFrame(
                _pd.DataFrame({"__dv_ri": _pd.array(positions, dtype="int64")})
            )
            grp.append(
                df.join(F.broadcast(pos_df), "__dv_ri", "left_anti").drop(
                    "__dv_ri"
                )
            )
        out = grp[0]
        for g in grp[1:]:
            out = out.unionByName(g)
        return out

    if not part_cols:
        return read_group(list(files))
    # group files by partition tuple; union one literal-annotated read
    # per group (partition cardinality bounds the union width).
    # partitionValues are keyed by PHYSICAL names under column mapping
    # (the protocol's rule); tolerate logical-keyed values from sloppy
    # foreign writers rather than silently attaching nulls.
    by_part: dict[tuple, list[str]] = {}
    for path, pvals in files.items():
        key = tuple(pvals.get(pv_key[c], pvals.get(c)) for c in part_cols)
        by_part.setdefault(key, []).append(path)
    types = {f.name: f.dataType for f in logical.fields}
    parts = []
    # NULL partition values sort last (a plain tuple sort would raise
    # TypeError comparing None to str)
    for key, rels in sorted(
        by_part.items(),
        key=lambda kv: tuple((v is None, v or "") for v in kv[0]),
    ):
        df = read_group(rels)
        for c, raw in zip(part_cols, key):
            df = df.withColumn(
                c,
                (F.lit(None) if raw is None else F.lit(raw)).cast(types[c]),
            )
        parts.append(df.select([f.name for f in logical.fields]))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def read_change_feed(
    spark: SparkSession,
    table: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Change Data Feed reader (delta-spark's ``readChangeFeed`` /
    ``table_changes``): the row-level changes committed in versions
    ``[from_version, to_version]`` (inclusive; default: latest), as the
    table's LOGICAL columns plus ``_change_type``
    ('insert'/'delete'/'update_preimage'/'update_postimage'),
    ``_commit_version``, and ``_commit_timestamp``.

    Per the protocol (PROTOCOL.md "Add CDC File"): when a commit carries
    ``cdc`` actions, its changes are EXACTLY those ``_change_data``
    files (the add/remove actions are ignored for CDF); otherwise the
    changes derive from the actions — dataChange adds are inserts,
    dataChange removes are whole-file deletes whose rows are read from
    the removed file (still on disk unless vacuumed — a vacuumed change
    raises by name rather than under-reporting), and a DV-carrying
    re-add of a live file is a ROW-LEVEL delete of exactly
    positions(DV_new) − positions(DV_prev) (delta-spark's CDCReader
    derivation for foreign DV-based DELETEs; a SHRINKING vector —
    un-delete/RESTORE — raises by name). Compaction commits
    (dataChange: false) contribute nothing. The table must have
    ``delta.enableChangeDataFeed`` set; column-mapped tables work —
    change files speak physical names like any data file.

    Scale shape: one pruned parquet scan per commit per partition tuple,
    unioned — the log bounds the union width, no driver-side row
    handling."""
    snap = _replay(table, to_version)
    if str(snap.config.get(_CDF_FLAG, "")).lower() != "true":
        raise ValueError(
            f"change data was not recorded for {table}: "
            f"{_CDF_FLAG} is not set (enable_cdf at table create)"
        )
    entries = dict(_log_entries(table))
    if to_version is None:
        if not entries:
            raise ValueError(
                f"no retained JSON commits in {table}/{_LOG} to read "
                f"changes from"
            )
        to_version = max(entries)
    if from_version < 0 or from_version > to_version:
        raise ValueError(
            f"invalid change-feed range [{from_version}, {to_version}]"
        )
    missing = [
        v for v in range(from_version, to_version + 1) if v not in entries
    ]
    if missing:
        raise ValueError(
            f"cannot read changes for versions {missing} of {table}: "
            f"their JSON commits were removed by log retention"
        )
    stamps = {
        r["version"]: r["timestamp"] for r in delta_history(table)
    }
    # Historical commits must be read as they were THEN: the to_version
    # snapshot's deletion vectors never apply to earlier versions'
    # files, so the derivation scans below get a DV-stripped snapshot
    # (cdc files are standalone — DV descriptors never attach to them).
    snap_nodv = snap._replace(dvs={})
    out: DataFrame | None = None
    # Incremental prior-snapshot DV map for the DV-diff derivation
    # (ADVICE r13): {live path: DV descriptor or None}, initialized by
    # ONE _replay at the first DV-carrying commit (empty when that
    # commit is version 0 — nothing precedes it) and rolled forward by
    # each version's OWN actions (compactions included — dataChange:
    # false still moves files) instead of re-replaying the full log per
    # version: O(log) once, not O(range × log).
    prior: dict[str, dict | None] | None = None
    last_track: tuple[dict, list] | None = None
    for v in range(from_version, to_version + 1):
        cdcs: dict[str, dict] = {}
        adds: dict[str, dict] = {}
        removed: dict[str, dict] = {}
        add_dvs: dict[str, dict] = {}
        removed_dvs: dict[str, dict] = {}
        track_adds: dict[str, dict | None] = {}
        track_removes: list[str] = []
        if prior is not None and last_track is not None:
            ta, tr = last_track
            for p in tr:
                prior.pop(p, None)
            prior.update(ta)
        last_track = None
        with open(entries[v]) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "cdc" in action:
                    c = action["cdc"]
                    cdcs[_decode_path(c["path"])] = (
                        c.get("partitionValues") or {}
                    )
                elif "add" in action:
                    a = action["add"]
                    track_adds[_decode_path(a["path"])] = a.get(
                        "deletionVector"
                    )
                    if a.get("dataChange") is not False:
                        if a.get("deletionVector"):
                            add_dvs[_decode_path(a["path"])] = a[
                                "deletionVector"
                            ]
                        adds[_decode_path(a["path"])] = (
                            a.get("partitionValues") or {}
                        )
                elif "remove" in action:
                    r = action["remove"]
                    track_removes.append(_decode_path(r["path"]))
                    if r.get("dataChange") is not False:
                        if r.get("deletionVector"):
                            # the tombstone's descriptor IS the file's
                            # row set at removal time — derivable
                            removed_dvs[_decode_path(r["path"])] = r[
                                "deletionVector"
                            ]
                        removed[_decode_path(r["path"])] = (
                            r.get("partitionValues") or {}
                        )
        last_track = (track_adds, track_removes)
        if cdcs:
            # the commit's changes are exactly its change files, which
            # carry _change_type in-band
            part = _scan_files(
                spark, table, snap, cdcs, extra_fields=[_CHANGE_TYPE]
            )
        elif adds or removed:
            # a DV-carrying ADD is a ROW-LEVEL change: for a re-added
            # live file the delete rows are exactly
            # positions(DV_new) − positions(DV_prev) (delta-spark's
            # CDCReader derivation — the default DML shape on modern
            # DV tables is add(file, DV′) + remove(file, DV)); for a
            # file FIRST added with a DV the inserts are the file
            # minus its vector. A SHRINKING vector (un-delete, e.g.
            # RESTORE) is not derivable as row changes — raise by
            # name, mirroring delta-spark. A DV-carrying REMOVE
            # without a matching re-add (whole-file DELETE of a
            # soft-deleted file) stays derivable: the tombstone's
            # descriptor is applied below, so the delete rows are
            # exactly the rows live at removal time.
            keep_pos: dict[str, list[int]] = {}
            keep_pvals: dict[str, dict] = {}
            dv_ins: dict[str, dict] = {}
            if add_dvs:
                from marketdb_spark.sources.deltadv import decode_dv

                if prior is None:
                    if v == 0:
                        prior = {}  # nothing precedes version 0
                    else:
                        ps = _replay(table, v - 1)
                        ps_dvs = getattr(ps, "dvs", None) or {}
                        prior = {
                            p: ps_dvs.get(p) for p in ps.live
                        }
                for path, desc in sorted(add_dvs.items()):
                    try:
                        new_pos = set(decode_dv(desc, table, path))
                        old_pos = (
                            set(
                                decode_dv(prior[path], table, path)
                            )
                            if prior.get(path) is not None
                            else set()
                        )
                    except ValueError as e:
                        raise ValueError(
                            f"cannot derive changes for version {v} "
                            f"of {table}: {e}"
                        ) from None
                    if path not in prior:
                        # fresh file soft-carrying a DV: its live rows
                        # are the inserts (file minus vector)
                        dv_ins[path] = desc
                        continue
                    if old_pos - new_pos:
                        raise ValueError(
                            f"cannot derive changes for version {v} of "
                            f"{table}: {path}'s deletion vector SHRANK "
                            f"(rows un-deleted, e.g. RESTORE) — "
                            f"row-level un-deletes are not derivable "
                            f"and the commit recorded no cdc files"
                        )
                    diff = sorted(new_pos - old_pos)
                    # re-add of a live file: a row-level delete, never
                    # a whole-file insert — and its paired tombstone is
                    # not a whole-file delete
                    keep_pvals[path] = adds.pop(path)
                    removed.pop(path, None)
                    removed_dvs.pop(path, None)
                    if diff:
                        keep_pos[path] = diff
                    else:
                        keep_pvals.pop(path)
            # derivation reads the action files themselves — adds whose
            # files a LATER overwrite+vacuum reclaimed are just as gone
            # as vacuumed removes; raise by name, never under-report
            gone = [
                p
                for p in list(removed) + list(adds) + list(keep_pvals)
                if not os.path.exists(os.path.join(table, p))
            ]
            if gone:
                raise ValueError(
                    f"cannot derive changes for version {v} of {table}: "
                    f"files {gone} are no longer on disk (vacuumed) and "
                    f"the commit recorded no cdc files"
                )
            pieces = []
            if adds:
                snap_ins = (
                    snap._replace(dvs=dv_ins) if dv_ins else snap_nodv
                )
                pieces.append(
                    _scan_files(spark, table, snap_ins, adds).withColumn(
                        "_change_type", F.lit("insert")
                    )
                )
            if keep_pos:
                pieces.append(
                    _scan_files(
                        spark,
                        table,
                        snap_nodv,
                        keep_pvals,
                        keep_positions=keep_pos,
                    ).withColumn("_change_type", F.lit("delete"))
                )
            if removed:
                snap_rm = (
                    snap._replace(dvs=removed_dvs)
                    if removed_dvs
                    else snap_nodv
                )
                pieces.append(
                    _scan_files(
                        spark, table, snap_rm, removed
                    ).withColumn("_change_type", F.lit("delete"))
                )
            if not pieces:
                continue  # e.g. a re-add whose vector did not grow
            part = pieces[0]
            for p in pieces[1:]:
                part = part.unionByName(p)
        else:
            continue  # metadata-only or compaction commit: no changes
        ts = stamps.get(v)
        # long, matching the deltacdf streaming source and delta-spark
        part = part.withColumn(
            "_commit_version", F.lit(v).cast(T.LongType())
        ).withColumn(
            "_commit_timestamp",
            F.timestamp_millis(F.lit(int(ts))) if ts is not None else F.lit(None).cast("timestamp"),
        )
        out = part if out is None else out.unionByName(part)
    if out is None:
        schema = T.StructType(
            _t.cast(
                T.StructType, _strip_field_metadata(
                    T.StructType.fromJson(json.loads(snap.schema_json))
                )
            ).fields
            + [
                _CHANGE_TYPE,
                T.StructField("_commit_version", T.LongType(), False),
                T.StructField("_commit_timestamp", T.TimestampType(), True),
            ]
        )
        return spark.createDataFrame([], schema)
    return out


_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _table_partitioning(table: str) -> list[str] | None:
    """The table's partitionColumns, or None if the table doesn't exist
    yet (no commits and no checkpoints)."""
    if not os.path.isdir(os.path.join(table, _LOG)):
        return None
    if not _log_entries(table) and not _checkpoint_versions(table):
        return None
    return _replay(table, None).part_cols


def _stage_files(
    df: DataFrame, table: str, part_cols: list[str], prefix: str = ""
) -> list[tuple[str, dict]]:
    """Write df's data files into the table directory under fresh names
    (Hive-style ``col=value`` subdirs when partitioned) WITHOUT
    committing them — they become live only when an add action lands.
    Returns [(relative_path, partitionValues)] with partitionValues
    decoded from the staged directory layout (Spark percent-encodes
    special chars; ``__HIVE_DEFAULT_PARTITION__`` means null).
    ``prefix`` roots the staged files under a table subdirectory — the
    CDF writer stages change files under ``_change_data/``."""
    import shutil as _shutil
    import uuid as _uuid

    from urllib.parse import unquote

    tmp = os.path.join(table, f"_staging_{_uuid.uuid4().hex}")
    writer = df.write.mode("error")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(tmp)
    staged: list[tuple[str, dict]] = []
    try:
        for root, _dirs, files in sorted(os.walk(tmp)):
            rel_dir = os.path.relpath(root, tmp)
            pvals: dict[str, str | None] = {}
            if rel_dir != ".":
                for comp in rel_dir.split(os.sep):
                    col, sep, raw = comp.partition("=")
                    if not sep:
                        continue  # not a partition component
                    pvals[col] = None if raw == _HIVE_NULL else unquote(raw)
            for f in sorted(files):
                if not f.endswith(".parquet"):
                    continue
                if set(pvals) != set(part_cols):
                    raise ValueError(
                        f"staged layout {rel_dir!r} does not carry the "
                        f"partition columns {part_cols}"
                    )
                # size short-circuit (ADVICE r13): a 0-row parquet file
                # is schema-only — near-constant small size — so files
                # above the bound skip the driver-side footer parse
                # entirely (serialized I/O that grew with file count on
                # wide writes); only the rare small file pays it
                if os.path.getsize(os.path.join(root, f)) > 65536:
                    empty = False
                else:
                    import pyarrow.parquet as _pq

                    try:
                        empty = (
                            _pq.read_metadata(
                                os.path.join(root, f)
                            ).num_rows
                            == 0
                        )
                    except Exception:
                        # a footer this pyarrow can't parse (e.g. the
                        # VARIANT logical type) — keep the file; the
                        # skip is an optimization, never a gate
                        empty = False
                if empty:
                    # empty shuffle partition: committing an add for a
                    # 0-row file is pure log noise (and at scale,
                    # thousands of them per DML) — skip it
                    continue
                name = f"part-{_uuid.uuid4().hex}.parquet"
                rel = name if rel_dir == "." else os.path.join(rel_dir, name)
                if prefix:
                    rel = os.path.join(prefix, rel)
                dest = os.path.join(table, rel)
                os.makedirs(os.path.dirname(dest), exist_ok=True)
                os.replace(os.path.join(root, f), dest)
                staged.append((rel, {c: pvals[c] for c in part_cols}))
    except BaseException:
        _unstage(table, [r for r, _ in staged])
        raise
    finally:
        _shutil.rmtree(tmp, ignore_errors=True)
    return staged


def _remove_data_file(table: str, rel: str) -> bool:
    """Delete one data file and any partition dirs the delete emptied.
    Returns False when the file was already gone (best-effort paths)."""
    try:
        os.unlink(os.path.join(table, rel))
    except OSError:
        return False
    d = os.path.dirname(rel)
    while d:
        try:
            os.rmdir(os.path.join(table, d))
        except OSError:
            break
        d = os.path.dirname(d)
    return True


def _unstage(table: str, rels: list[str]) -> None:
    """Best-effort removal of staged-but-never-committed data files (and
    any partition dirs they emptied) — nothing references them, so
    leaving them behind only wastes space and confuses direct-parquet
    listings."""
    for rel in rels:
        _remove_data_file(table, rel)


def _commit_info(operation: str, params: dict | None = None) -> dict:
    """A ``commitInfo`` action (PROTOCOL.md: free-form provenance, first
    line of the commit by convention). Readers must ignore it — ours do —
    but it is what DESCRIBE HISTORY surfaces, so the writer records the
    operation name and its parameters the way delta-spark does.
    Parameters serialize with a ``default=str`` fallback: provenance
    recording must never reject a value (e.g. a datetime.date in a
    replace_where predicate) that the predicate matcher itself accepts
    via str()-canonicalization."""
    import time as _time

    return {
        "commitInfo": {
            "timestamp": int(_time.time() * 1000),
            "operation": operation,
            "operationParameters": {
                k: json.dumps(v, default=str) if not isinstance(v, str) else v
                for k, v in (params or {}).items()
            },
            "engineInfo": "marketdb-spark",
        }
    }


def delta_history(table: str) -> list[dict]:
    """DESCRIBE HISTORY analog: one row per RETAINED JSON commit, newest
    first — ``{"version", "timestamp", "operation",
    "operationParameters", "n_adds", "n_removes", "data_change"}``.
    Operation comes from the commit's ``commitInfo`` when present (our
    writer and delta-spark both record one); foreign commits without it
    report operation None with the action counts still filled. Commits
    expired by clean_log are gone here too — same retention caveat as
    delta-spark's own DESCRIBE HISTORY."""
    out: list[dict] = []
    for v, path in _log_entries(table):
        info: dict = {}
        n_adds = n_removes = 0
        data_change = False
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "commitInfo" in action:
                    info = action["commitInfo"]
                elif "add" in action:
                    n_adds += 1
                    data_change |= action["add"].get("dataChange") is not False
                elif "remove" in action:
                    n_removes += 1
                    data_change |= (
                        action["remove"].get("dataChange") is not False
                    )
        out.append(
            {
                "version": v,
                "timestamp": _info_ts(info),
                "operation": info.get("operation"),
                "operationParameters": info.get("operationParameters") or {},
                "n_adds": n_adds,
                "n_removes": n_removes,
                "data_change": data_change,
            }
        )
    return out[::-1]


def _ict_state(table: str, version: int) -> tuple[bool, int | None]:
    """Whether the in-commit-timestamp chain is ACTIVE for the commit
    about to be published at ``version``, plus the newest retained prior
    stamp (None when no prior stamp survives — the chain restarts from
    the wall clock, which delta tolerates after log retention).

    Gate order: the newest retained JSON commit's stamp decides on the
    cheap common path; when NO prior JSON commit is retained
    (write_checkpoint + clean_log removed them all), the CHECKPOINTED
    table state decides — ``delta.enableInCommitTimestamps`` or the
    ``inCommitTimestamp`` writer feature — so the feature's writer
    obligation ("every commit after enablement carries a stamp")
    survives log cleanup instead of silently lapsing."""
    prev = max(
        (v for v, _p in _log_entries(table) if v < version), default=None
    )
    if prev is not None:
        with open(os.path.join(table, _LOG, f"{prev:020d}.json")) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                info = json.loads(line).get("commitInfo")
                if info is not None:
                    ict = info.get("inCommitTimestamp")
                    if ict is not None:
                        return True, int(ict)
                    return False, None
        return False, None
    if version == 0:
        return False, None
    try:
        snap = _replay(table, version - 1)
    except ValueError:
        return False, None
    active = (
        snap.config.get("delta.enableInCommitTimestamps") == "true"
        or "inCommitTimestamp" in (snap.protocol.get("writerFeatures") or ())
    )
    return active, None


def _publish_commit(table: str, version: int, actions: list[dict]) -> bool:
    """Atomic commit publish shared by every Delta writer here: the full
    commit body goes to a temp name (fsynced), then ``os.link`` claims
    the version file — put-if-absent AND all-or-nothing, so a concurrent
    replayer can never observe a half-written commit (the version name
    only appears with complete content). Returns False when another
    writer already owns the version (lost the race — recompute and
    retry)."""
    import uuid as _uuid

    log_path = os.path.join(table, _LOG, f"{version:020d}.json")
    # in-commit timestamps (the inCommitTimestamp table feature): once
    # the chain is active — preceding retained commit carries one, or
    # the checkpointed table state declares the feature — every commit
    # we publish continues it monotonically: max(now, prev + 1), wall
    # clock alone when no prior stamp is retained. One small file read
    # at the single choke point every commit writer already goes
    # through (a log replay only on the rare all-JSON-cleaned path).
    ict_active, prev_ict = _ict_state(table, version)
    if ict_active:
        import time as _time

        stamp = int(_time.time() * 1000)
        if prev_ict is not None:
            stamp = max(stamp, prev_ict + 1)
        for a in actions:
            info = a.get("commitInfo")
            if info is not None:
                info["inCommitTimestamp"] = stamp
                break
    tmp_log = os.path.join(table, _LOG, f".tmp_{_uuid.uuid4().hex}.json")
    with open(tmp_log, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp_log, log_path)
    except FileExistsError:
        return False
    finally:
        os.unlink(tmp_log)
    return True


def write_delta(
    df: DataFrame,
    table: str,
    mode: str = "append",
    txn_app: str | None = None,
    txn_version: int | None = None,
    partition_by: list[str] | None = None,
    replace_where: dict[str, list] | None = None,
    column_mapping: str | None = None,
    enable_cdf: bool = False,
    merge_schema: bool = False,
    enable_dvs: bool = False,
    enable_row_tracking: bool = False,
) -> int | None:
    """Minimal protocol-correct Delta writer: data files land under the
    table under fresh names (Hive-style ``col=value`` dirs for
    partitioned tables, with add.partitionValues authoritative per the
    protocol), then one commit JSON (protocol + metaData on first commit
    or schema-changing overwrite, add/remove actions) claims the next
    version via an exclusive create — the same put-if-absent commit race
    as sources/snapshot.py (and Delta itself), with the same retry
    discipline: blind appends recompute and retry, and a final loss
    raises the shared CommitConflict. Guards, not assumptions: an append
    with a mismatched schema, or a ``partition_by`` that disagrees with
    the table's partitionColumns, raises instead of committing adds the
    existing metaData would misread (appends to an existing table ADOPT
    its partitioning when ``partition_by`` is omitted); every
    non-success exit unstages the data files it wrote, so guards and
    lost races never leave orphan parquet in the table. An overwrite
    with a new schema re-emits metaData so readers never force the old
    schema onto new files; overwrites cannot change the partitioning.

    ``txn_app`` + ``txn_version`` make the commit IDEMPOTENT per Delta's
    setTransaction protocol (PROTOCOL.md "Transaction Identifiers"): the
    commit carries a ``txn`` action, and a replayed write — same app at
    or below the recorded version, e.g. a Structured Streaming
    micro-batch redelivered after a restart — is skipped and returns
    None instead of double-committing. This is exactly how delta-spark's
    streaming sink achieves exactly-once on top of at-least-once
    micro-batch replay.

    ``replace_where`` (delta-spark's ``replaceWhere`` option, in its
    original partition-predicate form): with ``mode="overwrite"``, a
    ``{partition_col: [values...]}`` predicate scopes the overwrite to
    MATCHING PARTITIONS ONLY — the idempotent-backfill pattern (rewrite
    one day/market, leave the rest of a 100 TB table untouched). The
    removes are exactly the live files whose partitionValues match
    every predicate column, and delta's data constraint is enforced:
    a staged file whose partitionValues fall OUTSIDE the predicate
    raises (and unstages) instead of silently widening the overwrite.
    A replace_where overwrite can never change the schema.

    ``column_mapping="name"`` on table CREATE enables the protocol's
    column-mapping name mode (PROTOCOL.md "Column Mapping"): every field
    gets a ``col-<uuid>`` physical name + sequential id in the
    schemaString metadata, data files are staged under physical names,
    add.partitionValues are keyed by physical names (partitionColumns
    stay logical), and the protocol advances to reader 2 / writer 5 —
    the rename-without-rewrite foundation. Appends and overwrites to a
    mapped table ADOPT its mapping automatically (the argument may
    restate it, never change it); schema EVOLUTION on a mapped table is
    out of scope and raises rather than dropping the mapping metadata.
    The user-facing DataFrame always speaks LOGICAL names — physical
    names are a storage detail.

    ``enable_cdf=True`` on table CREATE enables the Change Data Feed
    (PROTOCOL.md "Add CDC File"; delta-spark's
    ``delta.enableChangeDataFeed``): every later commit that REMOVES
    data (overwrite / replaceWhere — delete+insert semantics) also
    stages ``_change_data/`` parquet files holding the commit's full
    row-level changes with a ``_change_type`` column
    ('delete'/'insert') and records them as ``cdc`` actions; CDF
    readers (read_change_feed) then consume exactly those files for the
    commit. Pure appends record no cdc files — the protocol lets
    readers derive their inserts from the add actions. Like
    column_mapping, the flag is create-time only (existing tables adopt
    their recorded configuration).

    ``merge_schema=True`` (delta-spark's ``mergeSchema`` option): a
    batch carrying NEW columns re-emits metaData with the UNION schema
    — existing fields keep their exact types (a same-name type conflict
    raises), new fields append as nullable, and rows from
    pre-evolution files (append) or the merged schema's old-only
    columns (overwrite) read back as NULLs (the parquet reader fills
    missing columns). Batches may also OMIT existing nullable columns.
    Works under column mapping in both modes (new fields get fresh
    physicalNames/ids above maxColumnId); meaningless with
    replace_where (which never changes the schema) and raises there."""
    import uuid as _uuid

    from urllib.parse import quote

    from marketdb_spark.sources.snapshot import CommitConflict

    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    if merge_schema and replace_where is not None:
        raise ValueError(
            "merge_schema cannot combine with replace_where (which "
            "never changes the schema)"
        )
    if (txn_app is None) != (txn_version is None):
        raise ValueError("txn_app and txn_version must be set together")
    if replace_where is not None and mode != "overwrite":
        raise ValueError("replace_where requires mode='overwrite'")
    # normalize predicate values to the protocol's CANONICAL partition-
    # value strings (None = a null partition value). Booleans encode as
    # 'true'/'false' — Spark's Hive-style staged layout writes them
    # lower-cased, so Python's str(True) = 'True' would never match and
    # every boolean-partition overwrite would die at the constraint
    # check. Dates/timestamps str() to their ISO forms, matching the
    # staged directory encoding.
    def _canon_pv(v) -> str | None:
        if v is None:
            return None
        if isinstance(v, bool):
            return str(v).lower()
        return str(v)

    rw = (
        {c: {_canon_pv(v) for v in vs} for c, vs in replace_where.items()}
        if replace_where is not None
        else None
    )
    if column_mapping not in (None, "none", "name", "id"):
        raise ValueError(
            f"column_mapping must be None|'none'|'name'|'id', got "
            f"{column_mapping!r}"
        )
    if txn_app is not None:
        seen = last_txn_version(table, txn_app)
        if seen is not None and seen >= txn_version:
            return None  # replayed batch: already committed
    existing: _Snapshot | None = None
    if os.path.isdir(os.path.join(table, _LOG)) and (
        _log_entries(table) or _checkpoint_versions(table)
    ):
        existing = _replay(table, None)
    existing_parts = existing.part_cols if existing is not None else None
    if existing_parts is not None and partition_by is not None:
        if list(partition_by) != existing_parts:
            raise ValueError(
                f"partition_by {list(partition_by)} disagrees with "
                f"{table}'s partitionColumns {existing_parts}"
            )
    part_cols = (
        existing_parts
        if existing_parts is not None
        else list(partition_by or [])
    )
    if rw is not None:
        bad = [c for c in rw if c not in part_cols]
        if bad:
            raise ValueError(
                f"replace_where columns {bad} are not partition columns "
                f"of {table} (partitioned by {part_cols})"
            )
    # column-mapping resolution: an existing table's mode is adopted (the
    # argument may restate it, never change it); a new table takes the
    # requested mode. Under name mode the staged files speak PHYSICAL
    # names while this API and the log's partitionColumns stay logical.
    max_id = 0
    mapped_evolved_from: str | None = None
    if existing is not None:
        cmode = _mapping_mode(existing.config, table)
        cdf_on = (
            str(existing.config.get(_CDF_FLAG, "")).lower() == "true"
        )
        if enable_cdf and not cdf_on:
            raise ValueError(
                f"{table} does not have Change Data Feed enabled; "
                f"enabling it on an existing table is unsupported "
                f"(create-time only)"
            )
        if enable_dvs and str(
            existing.config.get(_DV_FLAG, "")
        ).lower() != "true":
            raise ValueError(
                f"{table} does not have deletion vectors enabled; "
                f"enabling them on an existing table is unsupported "
                f"(create-time only)"
            )
        if enable_row_tracking and str(
            existing.config.get("delta.enableRowTracking", "")
        ).lower() != "true":
            raise ValueError(
                f"{table} does not have row tracking enabled; "
                f"enabling it on an existing table is unsupported "
                f"(create-time only)"
            )
        if column_mapping in ("name", "id") and cmode != column_mapping:
            raise ValueError(
                f"{table}'s column-mapping mode is {cmode!r}; enabling or "
                f"changing column mapping on an existing table is "
                f"unsupported (create-time only)"
            )
        if _contains_ntz(df.schema) and "timestampNtz" not in set(
            (existing.protocol or {}).get("readerFeatures") or []
        ):
            # appending/evolving a TIMESTAMP_NTZ column into a table
            # whose protocol never declared the feature would leave
            # feature-blind readers misinterpreting the column — the
            # upgrade belongs to table CREATE, not a side effect
            raise ValueError(
                f"{table}'s protocol does not declare timestampNtz; "
                f"writing TIMESTAMP_NTZ columns into an existing table "
                f"without the feature is unsupported (recreate the "
                f"table)"
            )
        if _contains_variant(df.schema) and not (
            {"variantType", "variantType-preview"}
            & set((existing.protocol or {}).get("readerFeatures") or [])
        ):
            # same rule for VARIANT columns (PROTOCOL.md "Variant Data
            # Type"): feature-blind readers would misread the binary
            raise ValueError(
                f"{table}'s protocol does not declare variantType; "
                f"writing VARIANT columns into an existing table "
                f"without the feature is unsupported (recreate the "
                f"table)"
            )
        mapped_schema = (
            T.StructType.fromJson(json.loads(existing.schema_json))
            if cmode in ("name", "id")
            else None
        )
        if mapped_schema is not None and _strip_field_metadata(
            mapped_schema
        ) != _strip_field_metadata(df.schema):
            if not merge_schema:
                raise ValueError(
                    f"schema mismatch on column-mapped table {table}: "
                    f"table has {existing.schema_json}, batch has "
                    f"{df.schema.json()} (pass merge_schema=True to "
                    f"evolve)"
                )
            # mergeSchema on a mapped table: validate the overlap (type
            # conflicts raise), then assign fresh physicalNames/ids to
            # the NEW columns above the table's maxColumnId — old files
            # resolve unchanged, metaData re-emits with the bumped id
            _merge_schemas(
                _t.cast(
                    T.StructType, _strip_field_metadata(mapped_schema)
                ),
                _t.cast(T.StructType, _strip_field_metadata(df.schema)),
            )
            try:  # belt and braces: a foreign maxColumnId may lag the
                # actually-assigned ids; never assign below either
                seen_max = max(_schema_field_ids(mapped_schema.fields))
            except ValueError:  # name-mode schemaString without ids
                seen_max = 0
            start = max(
                int(existing.config.get(_CM_MAXID) or 0), seen_max
            )
            mapped_schema, max_id = _evolve_mapping(
                mapped_schema, df.schema, start
            )
            mapped_evolved_from = existing.schema_json
    elif column_mapping in ("name", "id"):
        cmode = column_mapping
        cdf_on = bool(enable_cdf)
        mapped_schema, max_id = _assign_mapping(df.schema)
    else:
        cmode, mapped_schema = "none", None
        cdf_on = bool(enable_cdf)
    # identity columns (writer v6): the batch either SUPPLIES values
    # (allowed only with allowExplicitInsert) or OMITS the column and
    # gets values allocated above the recorded high water mark
    # (start/step sequence). The new high water mark is computed from
    # the STAGED files after staging and re-emitted in metaData inside
    # the commit loop — where a concurrent hwm bump is a CommitConflict
    # for generated values (they were minted off a stale mark).
    identity_info: list[dict] = []
    if existing is not None:
        identity_info = _identity_info(
            T.StructType.fromJson(json.loads(existing.schema_json)),
            df.columns,
        )
        if identity_info and cmode != "none":
            raise ValueError(
                f"{table}: identity columns on a column-mapped table "
                f"are out of this writer's scope"
            )
        if identity_info and merge_schema:
            raise ValueError(
                f"{table}: mergeSchema on an identity-column table is "
                f"out of this writer's scope"
            )
        for info in identity_info:
            if info["supplied"] and not info["allow"]:
                raise ValueError(
                    f"{table}: identity column {info['name']!r} is "
                    f"GENERATED ALWAYS (allowExplicitInsert is false) — "
                    f"explicit values are not allowed; omit the column "
                    f"to have values allocated"
                )
        to_gen = [i for i in identity_info if not i["supplied"]]
        if to_gen:
            # allocate hwm + step·rank. row_number over a constant
            # ordering is a single-partition window — delta-spark
            # allocates per-partition ranges instead; same values,
            # different physical plan, swap in at real scale
            from pyspark.sql import Window as _W

            rn = F.row_number().over(
                _W.orderBy(F.monotonically_increasing_id())
            )
            for info in to_gen:
                base = (
                    info["hwm"]
                    if info["hwm"] is not None
                    else info["start"] - info["step"]
                )
                if info["nullable"]:
                    # try_add is typed nullable, matching the table
                    # field's nullability for the structural schema
                    # compare below (when(lit(True), v) folds to
                    # non-nullable v at analysis on Spark 4)
                    val = F.try_add(
                        F.lit(base),
                        rn.cast("long") * F.lit(info["step"]),
                    ).cast("long")
                else:
                    val = (
                        F.lit(base)
                        + rn.cast("long") * F.lit(info["step"])
                    ).cast("long")
                df = df.withColumn(info["name"], val)
            df = df.select(
                *[
                    f.name
                    for f in T.StructType.fromJson(
                        json.loads(existing.schema_json)
                    ).fields
                ]
            )
    if existing is not None:
        # CHECK constraints / column invariants: enforced on the batch
        # BEFORE staging (fail fast, no orphan files); new tables have
        # no obligations (this writer offers no constraint DDL)
        _enforce_write_obligations(df, existing, table)
    if mapped_schema is not None:
        with_ids = cmode == "id"
        phys_of = {f.name: _physical_name(f) for f in mapped_schema.fields}

        def _stage_select(present: list[str]) -> list:
            """Logical→physical rename list over the mapped fields that
            exist in ``present`` (mergeSchema evolution: the batch may
            omit table columns — readers null-fill them for the staged
            files; cdc staging passes the union frame's columns)."""
            cols = []
            for f in mapped_schema.fields:
                if f.name not in present:
                    continue
                phys_dt = _physical_datatype(f.dataType, with_ids)
                col = F.col(f.name)
                if phys_dt != _strip_field_metadata(f.dataType):
                    col = col.cast(phys_dt)  # positional nested rename;
                    #                          under id mode the cast target
                    #                          carries nested parquet.field.id
                    #                          metadata
                cols.append(
                    col.alias(
                        phys_of[f.name],
                        metadata=(
                            {_PARQUET_FID: _field_id(f)} if with_ids else None
                        ),
                    )
                )
            return cols

        stage_renames = _stage_select(df.columns)
        stage_df = df.select(stage_renames)
        stage_cols = [phys_of[c] for c in part_cols]
    else:
        phys_of = {}
        stage_df, stage_cols = df, list(part_cols)
    clus_dom = (
        (getattr(existing, "domains", None) or {}).get("delta.clustering")
        if existing is not None
        else None
    )
    if clus_dom and not clus_dom.get("removed"):
        # PROTOCOL.md "Clustered Table": the spec only OBLIGES domain
        # preservation, but best-effort means actually clustering when
        # we can — route the batch through the Morton sort on the
        # domain's clustering columns before staging (one extra range
        # exchange; a clustered write pays that sort by definition).
        # Nested column paths and columns absent from the batch skip
        # the sort (still legal best-effort). Columns speak the staged
        # frame's names: physical under mapping, logical otherwise.
        try:
            paths = json.loads(
                clus_dom.get("configuration") or "{}"
            ).get("clusteringColumns") or []
        except (TypeError, ValueError):
            paths = []
        ccols = [
            phys_of.get(p[0], p[0])
            for p in paths
            if isinstance(p, list) and len(p) == 1
            and p[0] in df.columns and p[0] not in part_cols
        ]
        if ccols and len(ccols) == len(paths):
            from marketdb_spark.sources.zorder import cluster_frame

            stage_df = cluster_frame(stage_df, ccols)
    os.makedirs(os.path.join(table, _LOG), exist_ok=True)
    staged = _stage_files(stage_df, table, stage_cols)
    names = [rel for rel, _ in staged]
    spark_df = df.sparkSession
    # identity bookkeeping input: the extreme value actually STAGED
    # (max for ascending sequences, min for descending) — one footer
    # -stat-sized scan of the staged files, never a re-run of the
    # user's plan
    staged_ident_ext: dict[str, int] = {}
    if identity_info and staged:
        ext = (
            spark_df.read.parquet(
                *[os.path.join(table, rel) for rel, _ in staged]
            )
            .agg(
                *[
                    (
                        F.max(i["name"]) if i["step"] > 0
                        else F.min(i["name"])
                    ).alias(i["name"])
                    for i in identity_info
                ]
            )
            .first()
        )
        for i in identity_info:
            if ext[i["name"]] is not None:
                staged_ident_ext[i["name"]] = int(ext[i["name"]])
    all_cdc: list[str] = []  # every CDF file staged across retries

    try:
        if rw is not None:
            # delta's replaceWhere data constraint: every staged file
            # must fall INSIDE the predicate, or the "overwrite" would
            # silently touch partitions the caller did not scope (staged
            # partitionValues are keyed by physical names when mapped)
            for rel, pvals in staged:
                off = {
                    c: pvals.get(phys_of.get(c, c))
                    for c in rw
                    if pvals.get(phys_of.get(c, c)) not in rw[c]
                }
                if off:
                    raise ValueError(
                        f"replace_where violation: staged file carries "
                        f"partition values {off} outside the predicate "
                        f"{replace_where}"
                    )
        for _ in range(5):
            entries = _log_entries(table)
            # Checkpoints count as table state too: a checkpoint-only
            # table (JSON commits expired under log retention — a layout
            # read_delta explicitly supports) must commit ABOVE the
            # checkpoint version and still run the schema/partition
            # guards, else the new commit lands at-or-below the
            # checkpoint and replay silently skips it.
            ckpts = _checkpoint_versions(table)
            latest = max(
                entries[-1][0] if entries else -1, ckpts[-1] if ckpts else -1
            )
            removes: list[str] = []
            need_meta = latest < 0
            evolved_schema: T.StructType | None = None
            if latest >= 0:
                cur = _replay(table, None)
                _check_writer_protocol(
                    cur, table, data_removing=(mode != "append")
                )
                schema_json, table_parts, live = (
                    cur.schema_json, cur.part_cols, cur.live
                )
                if table_parts != part_cols:
                    # a concurrent writer created/changed the table with a
                    # different layout after we staged — the staged files
                    # would be misread, so refuse
                    raise ValueError(
                        f"{table} is partitioned by {table_parts}, staged "
                        f"files are laid out by {part_cols}"
                    )
                if _mapping_mode(cur.config, table) != cmode:
                    # concurrent create with a different mapping mode —
                    # the staged files carry the wrong column names
                    raise ValueError(
                        f"{table}'s column-mapping mode changed while "
                        f"staging; staged files speak the wrong names"
                    )
                # STRUCTURAL schema compare, not string equality:
                # pyspark's schema.json() sorts keys while external Delta
                # writers emit {"type":...,"fields":...} order — a raw
                # string compare would reject every schema-identical
                # append to a foreign table. Field METADATA is stripped
                # from the compare: a column-mapped table's schemaString
                # carries per-field mapping metadata the user's DataFrame
                # never has.
                table_schema = _strip_field_metadata(
                    T.StructType.fromJson(json.loads(schema_json))
                )
                df_schema = _strip_field_metadata(df.schema)
                if mode == "overwrite" and rw is not None:
                    if table_schema != df_schema:
                        raise ValueError(
                            f"replace_where overwrite cannot change the "
                            f"schema of {table}"
                        )
                    removes = sorted(
                        p
                        for p, pv in live.items()
                        if all(
                            pv.get(phys_of.get(c, c), pv.get(c)) in vals
                            for c, vals in rw.items()
                        )
                    )
                elif mode == "overwrite":
                    removes = sorted(live)
                    need_meta = table_schema != df_schema
                    if mapped_evolved_from is not None:
                        # schema-evolving overwrite on a mapped table:
                        # same staleness rule as the append branch —
                        # the evolved schema (fresh ids above
                        # maxColumnId) was computed against the
                        # pre-stage snapshot
                        if cur.schema_json != mapped_evolved_from:
                            raise CommitConflict(
                                f"mergeSchema on {table} is stale: a "
                                f"concurrent commit changed the mapped "
                                f"schema while this batch was staging"
                            )
                        evolved_schema = mapped_schema
                        need_meta = True
                    elif need_meta and cmode in ("name", "id"):
                        # stage-time schemas matched, commit-loop
                        # schemas differ: a concurrent schema change —
                        # the staged files speak stale physical names
                        raise CommitConflict(
                            f"overwrite of column-mapped {table} is "
                            f"stale: a concurrent commit changed the "
                            f"table schema while this batch was staging"
                        )
                    elif need_meta and merge_schema:
                        # overwrite + mergeSchema (delta-spark): the
                        # UNION schema — old-only columns survive in
                        # metaData and read back NULL for the new files
                        evolved_schema = _merge_schemas(
                            T.StructType.fromJson(json.loads(schema_json)),
                            df.schema,
                        )
                elif table_schema != df_schema:
                    if merge_schema and mapped_evolved_from is not None:
                        # the evolved mapped schema (fresh ids above
                        # maxColumnId) was computed against the
                        # pre-stage snapshot; a concurrent schema change
                        # would make the staged files' physical names /
                        # ids stale — loud conflict, never a guess
                        if cur.schema_json != mapped_evolved_from:
                            raise CommitConflict(
                                f"mergeSchema on {table} is stale: a "
                                f"concurrent commit changed the mapped "
                                f"schema while this batch was staging"
                            )
                        evolved_schema = mapped_schema
                        need_meta = True
                    elif merge_schema:
                        evolved_schema = _merge_schemas(
                            T.StructType.fromJson(json.loads(schema_json)),
                            df.schema,
                        )
                        need_meta = True
                    else:
                        raise ValueError(
                            f"append schema mismatch on {table}: table "
                            f"has {schema_json}, batch has "
                            f"{df.schema.json()} (pass merge_schema=True "
                            f"to evolve)"
                        )
            # identity bookkeeping (inside the loop: hwm races are real):
            # generated values were minted off the pre-stage high water
            # mark — a concurrent bump means duplicates, loud conflict;
            # supplied values just push the mark outward (never inward)
            ident_schema_override: str | None = None
            if identity_info and latest >= 0:
                cur_schema_i = T.StructType.fromJson(
                    json.loads(cur.schema_json)
                )
                changed = False
                patched = []
                for f in cur_schema_i.fields:
                    md = dict(f.metadata or {})
                    info = next(
                        (
                            i
                            for i in identity_info
                            if i["name"] == f.name
                        ),
                        None,
                    )
                    if info is not None:
                        cur_hwm = md.get(_IDENT_HWM)
                        cur_hwm = (
                            int(cur_hwm) if cur_hwm is not None else None
                        )
                        if not info["supplied"] and cur_hwm != info["hwm"]:
                            raise CommitConflict(
                                f"identity allocation on {table} is "
                                f"stale: a concurrent commit moved "
                                f"{f.name!r}'s high water mark"
                            )
                        ext = staged_ident_ext.get(f.name)
                        if ext is not None:
                            if cur_hwm is None:
                                newh = ext
                            elif info["step"] > 0:
                                newh = max(cur_hwm, ext)
                            else:
                                newh = min(cur_hwm, ext)
                            if newh != cur_hwm:
                                md[_IDENT_HWM] = newh
                                changed = True
                    patched.append(
                        T.StructField(f.name, f.dataType, f.nullable, md)
                    )
                if changed:
                    ident_schema_override = T.StructType(patched).json()
                    need_meta = True
            if txn_app is not None:
                # re-check inside the loop: a concurrent replay of the
                # SAME batch may have won an earlier race iteration
                seen = last_txn_version(table, txn_app)
                if seen is not None and seen >= txn_version:
                    _unstage(table, names)  # staged files are orphans now
                    _unstage(table, all_cdc)
                    return None
            # Change Data Feed: a data-removing commit (overwrite /
            # replaceWhere) stages its full row-level changes under
            # _change_data/ and records them as cdc actions — CDF readers
            # consume exactly these files for the commit. Built inside
            # the retry loop because the removes are a function of the
            # live set; a lost race unstages and rebuilds.
            cdc_staged: list[tuple[str, dict]] = []
            if cdf_on and removes:
                deletes_df = _scan_files(
                    spark_df, table, cur, {p: live[p] for p in removes}
                ).withColumn("_change_type", F.lit("delete"))
                # a schema-changing overwrite stages the NEW schema: the
                # insert postimages must be read with the batch schema —
                # under column mapping, with the EVOLVED mapped schema
                # (its physical names/ids are what the staged files
                # speak) — never the pre-overwrite snapshot's (which
                # would drop new columns and NULL-fill removed ones
                # into the feed)
                if need_meta and mapped_schema is not None:
                    ins_snap = cur._replace(
                        schema_json=mapped_schema.json()
                    )
                elif need_meta and evolved_schema is not None:
                    ins_snap = cur._replace(
                        schema_json=evolved_schema.json()
                    )
                elif need_meta:
                    ins_snap = cur._replace(schema_json=df.schema.json())
                else:
                    ins_snap = cur
                inserts_df = _scan_files(
                    spark_df, table, ins_snap, dict(staged)
                ).withColumn("_change_type", F.lit("insert"))
                cdc_df = deletes_df.unionByName(
                    inserts_df, allowMissingColumns=True
                )
                if mapped_schema is not None:
                    # rebuilt over the union frame's columns: an evolved
                    # overwrite's delete preimages carry old-only
                    # columns the batch rename list would drop
                    cdc_df = cdc_df.select(
                        _stage_select(cdc_df.columns)
                        + [F.col("_change_type")]
                    )
                cdc_staged = _stage_files(
                    cdc_df, table, stage_cols, prefix=_CDF_DIR
                )
                all_cdc.extend(rel for rel, _ in cdc_staged)
            version = latest + 1
            # rowTracking obligations (recomputed per race iteration:
            # fresh base ids above the CURRENT high water mark); a
            # CREATE with enable_row_tracking allocates from id 0
            if latest >= 0:
                rt_extras, rt_domain = _row_tracking_actions(
                    table,
                    cur,
                    [rel for rel, _ in staged],
                    version,
                    data_removing=bool(removes),
                )
            elif enable_row_tracking:
                rt_extras, rt_domain = _fresh_row_tracking(
                    table, [rel for rel, _ in staged], version
                )
            else:
                rt_extras, rt_domain = {}, None
            op = (
                "WRITE"
                if mode == "append"
                else ("REPLACE WHERE" if rw is not None else "OVERWRITE")
            )
            actions = [
                _commit_info(
                    op,
                    {"mode": mode, **({"predicate": replace_where} if rw is not None else {})},
                )
            ]
            if txn_app is not None:
                actions.append(
                    {"txn": {"appId": txn_app, "version": int(txn_version)}}
                )
            if latest < 0:
                # column mapping needs reader 2 / writer 5, CDF writer 4
                # (writer versions are cumulative per the protocol)
                if (
                    _contains_ntz(df.schema)
                    or _contains_variant(df.schema)
                    or enable_dvs
                    or enable_row_tracking
                ):
                    # timestampNtz / variantType / deletionVectors /
                    # rowTracking are FEATURE-form only: v7 listing
                    # every feature the table actually uses
                    # (rowTracking is writer-only — a reader needs
                    # nothing special, so an all-writer feature set
                    # keeps minReaderVersion at 1)
                    rf = []
                    if _contains_ntz(df.schema):
                        rf.append("timestampNtz")
                    if _contains_variant(df.schema):
                        rf.append("variantType")
                        try:
                            shred = (
                                str(
                                    df.sparkSession.conf.get(
                                        "spark.sql.variant."
                                        "writeShredding.enabled"
                                    )
                                ).lower()
                                == "true"
                            )
                        except Exception:
                            shred = False
                        if shred:
                            # the staged files will carry the spec's
                            # typed_value groups — declare the
                            # reader-writer feature so feature-blind
                            # readers refuse instead of misreading
                            rf.append("variantShredding-preview")
                    if enable_dvs:
                        rf.append("deletionVectors")
                    if cmode in ("name", "id"):
                        rf.append("columnMapping")
                    wf = list(rf) + (["changeDataFeed"] if cdf_on else [])
                    if enable_row_tracking:
                        wf += ["rowTracking", "domainMetadata"]
                    proto = {
                        "minReaderVersion": 3 if rf else 1,
                        "minWriterVersion": 7,
                        **({"readerFeatures": sorted(rf)} if rf else {}),
                        "writerFeatures": sorted(wf),
                    }
                elif cmode in ("name", "id"):
                    proto = {"minReaderVersion": 2, "minWriterVersion": 5}
                elif cdf_on:
                    proto = {"minReaderVersion": 1, "minWriterVersion": 4}
                else:
                    proto = {"minReaderVersion": 1, "minWriterVersion": 2}
                actions.append({"protocol": proto})
            if need_meta:
                # re-emits PRESERVE the table's existing configuration
                # (CDF flag, foreign keys) — a schema evolution or
                # overwrite must not strip table features
                configuration: dict = (
                    dict(cur.config) if latest >= 0 else {}
                )
                if cmode in ("name", "id"):
                    configuration.update(
                        {_CM_MODE: cmode, _CM_MAXID: str(max_id)}
                    )
                if cdf_on:
                    configuration[_CDF_FLAG] = "true"
                if enable_dvs:
                    configuration[_DV_FLAG] = "true"
                if enable_row_tracking and latest < 0:
                    # stable ids from birth: assign the materialized
                    # column names at create, as delta-spark's
                    # feature-enable does
                    configuration["delta.enableRowTracking"] = "true"
                    configuration[_RT_RID_KEY] = (
                        f"_row-id-col-{_uuid.uuid4()}"
                    )
                    configuration[_RT_RCV_KEY] = (
                        f"_row-commit-version-col-{_uuid.uuid4()}"
                    )
                actions.append(
                    {
                        "metaData": {
                            "id": _uuid.uuid4().hex,
                            "format": {"provider": "parquet", "options": {}},
                            "schemaString": (
                                ident_schema_override
                                if ident_schema_override is not None
                                else evolved_schema.json()
                                if evolved_schema is not None
                                else mapped_schema.json()
                                if mapped_schema is not None
                                else df.schema.json()
                            ),
                            "partitionColumns": part_cols,
                            "configuration": configuration,
                        }
                    }
                )
            if rt_domain is not None:
                actions.append(rt_domain)
            for p in removes:
                rm: dict = {"path": quote(p, safe="/="), "dataChange": True}
                cur_dvs = getattr(cur, "dvs", None) or {}
                if p in cur_dvs:  # the descriptor rides the tombstone
                    rm["deletionVector"] = cur_dvs[p]
                rm.update(
                    (getattr(cur, "row_meta", None) or {}).get(p) or {}
                )
                actions.append({"remove": rm})
            for rel, pvals in staged:
                full = os.path.join(table, rel)
                actions.append(
                    {
                        "add": {
                            # URL-encode per the protocol; keep the
                            # Hive-style / and = readable as delta-spark
                            # does
                            "path": quote(rel, safe="/="),
                            "partitionValues": pvals,
                            "size": os.path.getsize(full),
                            "modificationTime": int(
                                os.path.getmtime(full) * 1000
                            ),
                            "dataChange": True,
                            **(rt_extras.get(rel) or {}),
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
            if not _publish_commit(table, version, actions):
                # lost the race — the change files were derived from a
                # stale live set; drop them and rebuild next iteration
                _unstage(table, [rel for rel, _ in cdc_staged])
                continue
            return version
        raise CommitConflict(f"lost the commit race 5 times on {table}")
    except BaseException:
        # guards, CommitConflict, or anything else before a successful
        # commit: the staged files were never referenced — remove them
        _unstage(table, names)
        _unstage(table, all_cdc)
        raise


def convert_to_delta(
    spark: SparkSession,
    table: str,
    partition_by: list[str] | None = None,
) -> int:
    """CONVERT TO DELTA (delta-spark's ``CONVERT TO DELTA parquet.`...```):
    build a transaction log over an EXISTING plain-parquet directory IN
    PLACE — no data movement, commit 0 simply claims every parquet file
    already there as an ``add``. This is the migration path a real user
    takes to put a multi-TB historical store under transactional
    management without rewriting it: after conversion the directory
    reads via read_delta (time travel from v0 on), appends via
    write_delta, streams via deltastream, checkpoints and vacuums like
    any other table.

    ``partition_by`` names the Hive-style layout columns
    (``col=value`` directories); partitionValues are decoded from the
    directory components per file (percent-decoding,
    ``__HIVE_DEFAULT_PARTITION__`` → null) and become authoritative per
    the protocol. The schema is Spark's own inference over the
    directory (partition-column types included). Converting a directory
    that is already a Delta table raises; a layout that does not carry
    the declared partition columns raises before any commit."""
    from urllib.parse import quote, unquote

    import uuid as _uuid

    from marketdb_spark.sources.snapshot import CommitConflict

    if os.path.isdir(os.path.join(table, _LOG)) and (
        _log_entries(table) or _checkpoint_versions(table)
    ):
        raise ValueError(f"{table} is already a Delta table")
    part_cols = list(partition_by or [])
    df = spark.read.parquet(table)
    missing = [c for c in part_cols if c not in df.columns]
    if missing:
        raise ValueError(
            f"partition columns {missing} not present in the inferred "
            f"schema of {table} ({df.columns})"
        )
    adds: list[tuple[str, dict]] = []
    for root, dirs, files in sorted(os.walk(table)):
        dirs[:] = sorted(
            d for d in dirs if d != _LOG and not d.startswith("_staging_")
        )
        rel_dir = os.path.relpath(root, table)
        pvals: dict[str, str | None] = {}
        if rel_dir != ".":
            for comp in rel_dir.split(os.sep):
                col, sep, raw = comp.partition("=")
                if not sep:
                    continue
                pvals[col] = None if raw == _HIVE_NULL else unquote(raw)
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            if set(pvals) != set(part_cols):
                raise ValueError(
                    f"layout {rel_dir!r} does not carry the partition "
                    f"columns {part_cols} — pass the directory's actual "
                    f"partitioning"
                )
            rel = f if rel_dir == "." else os.path.join(rel_dir, f)
            adds.append((rel, {c: pvals[c] for c in part_cols}))
    if not adds:
        raise ValueError(f"no parquet files under {table} to convert")
    os.makedirs(os.path.join(table, _LOG), exist_ok=True)
    actions: list[dict] = [
        _commit_info("CONVERT", {"partitionBy": part_cols}),
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": _uuid.uuid4().hex,
                "format": {"provider": "parquet", "options": {}},
                "schemaString": df.schema.json(),
                "partitionColumns": part_cols,
                "configuration": {},
            }
        },
    ]
    for rel, pvals in adds:
        full = os.path.join(table, rel)
        actions.append(
            {
                "add": {
                    "path": quote(rel, safe="/="),
                    "partitionValues": pvals,
                    "size": os.path.getsize(full),
                    "modificationTime": int(os.path.getmtime(full) * 1000),
                    "dataChange": True,
                }
            }
        )
    if not _publish_commit(table, 0, actions):
        raise CommitConflict(
            f"another writer created {table}'s version 0 during conversion"
        )
    return 0


def write_checkpoint(
    table: str,
    version: int | None = None,
    *,
    part_size: int | None = DEFAULT_CHECKPOINT_PART_SIZE,
    sidecar_size: int | None = None,
) -> int:
    """Write a classic parquet checkpoint at ``version`` (default:
    latest) plus the ``_last_checkpoint`` pointer — the log compaction
    step that makes log retention safe: after this, JSON commits
    at-or-before the checkpoint are redundant (clean_log removes them)
    and a reader replays checkpoint + newer commits only. One row per
    action: protocol, metaData, one ``add`` per live file
    (partitionValues as map<string,string>, per the protocol), one
    ``txn`` per application high-water mark — so idempotent-writer state
    survives log cleanup. At 100 TB the checkpoint is KBs-to-MBs of
    metadata written driver-side.

    Above ``part_size`` actions the writer emits a MULTI-PART classic
    set (``n.checkpoint.o.p.parquet``, part o of p — what stock
    delta-spark writes past spark.databricks.delta.checkpoint.partSize),
    matching what the reader already replays; the pointer then carries
    the protocol's ``parts`` field. Crash-safe by construction: parts
    land before the pointer moves, and an incomplete set (writer died
    mid-way) is ignored by readers per the protocol while the previous
    checkpoint + JSON log still cover the range. ``part_size=None``
    forces single-part.

    Tables declaring the ``v2Checkpoint`` table feature get the V2
    layout instead — a UUID-named JSON checkpoint whose first action is
    the required ``checkpointMetadata`` marker — the writer obligation
    that makes such tables WRITABLE here, not just readable (the file
    round-trips through _v2_checkpoint_rows and the foreign-layout
    tests). With ``sidecar_size`` set and more file actions than it,
    the adds split into parquet SIDECAR files of at most that many rows
    under ``_delta_log/_sidecars/`` (written BEFORE the checkpoint file
    per the protocol's visibility rule) and the checkpoint carries
    ``sidecar`` references instead — the layout that keeps any single
    checkpoint file bounded on very large tables; ``None`` stays
    sidecar-less (every action inline)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    entries = _log_entries(table)
    ckpt_map = _checkpoints(table)
    ckpts = sorted(ckpt_map)
    latest = max(
        entries[-1][0] if entries else -1, ckpts[-1] if ckpts else -1
    )
    if latest < 0:
        raise ValueError(f"no Delta log at {table}/{_LOG}")
    if version is None:
        version = latest
    snap = _replay(table, version)
    schema_json, part_cols, live = snap.schema_json, snap.part_cols, snap.live
    dvs = getattr(snap, "dvs", None) or {}
    row_meta = getattr(snap, "row_meta", None) or {}

    # per-app txn high-water marks visible at `version`
    txns: dict[str, int] = {}
    ckpt_anchor = max((v for v in ckpts if v <= version), default=-1)
    if ckpt_anchor >= 0:
        for row in _checkpoint_rows(table, ckpt_anchor, ckpt_map):
            txn = row.get("txn")
            if txn and txn.get("appId") is not None:
                txns[txn["appId"]] = int(txn["version"])
    for v, path in entries:
        if v <= ckpt_anchor or v > version:
            continue
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    txn = json.loads(line).get("txn")
                    if txn and txn.get("appId") is not None:
                        txns[txn["appId"]] = max(
                            int(txn["version"]),
                            txns.get(txn["appId"], -1),
                        )

    if "v2Checkpoint" in (
        set(snap.protocol.get("readerFeatures") or ())
        | set(snap.protocol.get("writerFeatures") or ())
    ):
        # the v2 writer obligation: UUID-named, checkpointMetadata
        # marker first; file actions inline (sidecar-less) or split
        # into bounded parquet sidecars when sidecar_size says so
        import uuid as _uuid

        from urllib.parse import quote

        acts: list[dict] = [{"checkpointMetadata": {"version": version}}]
        acts.append(
            {
                "protocol": {
                    k: v for k, v in snap.protocol.items() if v is not None
                }
            }
        )
        acts.append(
            {
                "metaData": {
                    "id": "marketdb-spark",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema_json,
                    "partitionColumns": part_cols,
                    "configuration": dict(snap.config or {}),
                }
            }
        )
        adds_v2: list[dict] = []
        for path, pvals in sorted(live.items()):
            full = os.path.join(table, path)
            add: dict = {
                "path": quote(path, safe="/="),
                "partitionValues": dict(pvals or {}),
                "size": os.path.getsize(full),
                "modificationTime": int(os.path.getmtime(full) * 1000),
                # checkpoint adds restate state, they don't change it —
                # dataChange false so change-only consumers (foreign
                # CDF/streaming readers) ignore them per the protocol
                "dataChange": False,
                **(row_meta.get(path) or {}),
            }
            if path in dvs:
                add["deletionVector"] = dvs[path]
            adds_v2.append(add)
        if sidecar_size is not None and len(adds_v2) > sidecar_size:
            # sidecar layout: bounded parquet files of add rows under
            # _delta_log/_sidecars/, written BEFORE the checkpoint file
            # so a visible checkpoint never references a missing
            # sidecar (crash mid-write leaves orphan sidecars, which
            # readers never open)
            side_dir = os.path.join(table, _LOG, "_sidecars")
            os.makedirs(side_dir, exist_ok=True)
            side_schema = pa.schema(
                [
                    (
                        "add",
                        pa.struct(
                            [
                                ("path", pa.string()),
                                (
                                    "partitionValues",
                                    pa.map_(pa.string(), pa.string()),
                                ),
                                ("size", pa.int64()),
                                ("modificationTime", pa.int64()),
                                ("dataChange", pa.bool_()),
                                ("baseRowId", pa.int64()),
                                ("defaultRowCommitVersion", pa.int64()),
                                (
                                    "deletionVector",
                                    pa.struct(
                                        [
                                            ("storageType", pa.string()),
                                            (
                                                "pathOrInlineDv",
                                                pa.string(),
                                            ),
                                            ("offset", pa.int32()),
                                            ("sizeInBytes", pa.int32()),
                                            ("cardinality", pa.int64()),
                                        ]
                                    ),
                                ),
                            ]
                        ),
                    )
                ]
            )
            for i in range(0, len(adds_v2), sidecar_size):
                chunk = adds_v2[i : i + sidecar_size]
                rows = [
                    {
                        "add": {
                            **a,
                            "partitionValues": list(
                                a["partitionValues"].items()
                            ),
                            "deletionVector": (
                                {
                                    k: a["deletionVector"].get(k)
                                    for k in (
                                        "storageType",
                                        "pathOrInlineDv",
                                        "offset",
                                        "sizeInBytes",
                                        "cardinality",
                                    )
                                }
                                if a.get("deletionVector")
                                else None
                            ),
                        }
                    }
                    for a in chunk
                ]
                side_name = f"{_uuid.uuid4()}.parquet"
                side_path = os.path.join(side_dir, side_name)
                pq.write_table(
                    pa.Table.from_pylist(rows, schema=side_schema),
                    side_path,
                )
                acts.append(
                    {
                        "sidecar": {
                            "path": side_name,
                            "sizeInBytes": os.path.getsize(side_path),
                            "modificationTime": int(
                                os.path.getmtime(side_path) * 1000
                            ),
                        }
                    }
                )
        else:
            acts.extend({"add": a} for a in adds_v2)
        for app, v in sorted(txns.items()):
            acts.append({"txn": {"appId": app, "version": v}})
        for name in sorted(getattr(snap, "domains", None) or {}):
            dom = snap.domains[name]
            if dom.get("removed"):
                continue
            acts.append(
                {
                    "domainMetadata": {
                        "domain": dom["domain"],
                        "configuration": dom.get("configuration"),
                        "removed": False,
                    }
                }
            )
        ck_name = f"{version:020d}.checkpoint.{_uuid.uuid4()}.json"
        with open(os.path.join(table, _LOG, ck_name), "w") as f:
            for a in acts:
                f.write(json.dumps(a) + "\n")
        _advance_checkpoint_pointer(
            table, version, {"version": version, "size": len(acts)}
        )
        return version

    ck_schema = pa.schema(
        [
            (
                "protocol",
                pa.struct(
                    [
                        ("minReaderVersion", pa.int32()),
                        ("minWriterVersion", pa.int32()),
                        # table-features form (protocol v3+) — null for
                        # legacy protocols, preserved verbatim otherwise
                        ("readerFeatures", pa.list_(pa.string())),
                        ("writerFeatures", pa.list_(pa.string())),
                    ]
                ),
            ),
            (
                "metaData",
                pa.struct(
                    [
                        ("id", pa.string()),
                        (
                            "format",
                            pa.struct(
                                [
                                    ("provider", pa.string()),
                                    (
                                        "options",
                                        pa.map_(pa.string(), pa.string()),
                                    ),
                                ]
                            ),
                        ),
                        ("schemaString", pa.string()),
                        ("partitionColumns", pa.list_(pa.string())),
                        ("configuration", pa.map_(pa.string(), pa.string())),
                    ]
                ),
            ),
            (
                "add",
                pa.struct(
                    [
                        ("path", pa.string()),
                        ("partitionValues", pa.map_(pa.string(), pa.string())),
                        ("size", pa.int64()),
                        ("modificationTime", pa.int64()),
                        ("dataChange", pa.bool_()),
                        # row-tracking fields survive the checkpoint
                        # (PROTOCOL.md "Row Tracking")
                        ("baseRowId", pa.int64()),
                        ("defaultRowCommitVersion", pa.int64()),
                        # PROTOCOL.md checkpoint schema: a live file's
                        # deletion-vector descriptor MUST survive the
                        # checkpoint, or every post-clean_log reader
                        # resurrects the deleted rows
                        (
                            "deletionVector",
                            pa.struct(
                                [
                                    ("storageType", pa.string()),
                                    ("pathOrInlineDv", pa.string()),
                                    ("offset", pa.int32()),
                                    ("sizeInBytes", pa.int32()),
                                    ("cardinality", pa.int64()),
                                ]
                            ),
                        ),
                    ]
                ),
            ),
            (
                "txn",
                pa.struct([("appId", pa.string()), ("version", pa.int64())]),
            ),
            (
                "domainMetadata",
                pa.struct(
                    [
                        ("domain", pa.string()),
                        ("configuration", pa.string()),
                        ("removed", pa.bool_()),
                    ]
                ),
            ),
        ]
    )
    from urllib.parse import quote

    # the table's ACTUAL protocol and configuration ride into the
    # checkpoint — a checkpoint that hardcoded {1,2}/{} would strip
    # column mapping (or any table feature) the moment clean_log
    # removed the JSON commit that declared it
    rows: list[dict] = [
        {
            "protocol": {
                "minReaderVersion": int(
                    snap.protocol.get("minReaderVersion") or 1
                ),
                "minWriterVersion": int(
                    snap.protocol.get("minWriterVersion") or 2
                ),
                "readerFeatures": snap.protocol.get("readerFeatures"),
                "writerFeatures": snap.protocol.get("writerFeatures"),
            },
            "metaData": None,
            "add": None,
            "txn": None,
        },
        {
            "protocol": None,
            "metaData": {
                "id": "marketdb-spark",
                "format": {"provider": "parquet", "options": []},
                "schemaString": schema_json,
                "partitionColumns": part_cols,
                "configuration": list((snap.config or {}).items()),
            },
            "add": None,
            "txn": None,
        },
    ]
    for path, pvals in sorted(live.items()):
        # size/modificationTime are required checkpoint fields
        # (PROTOCOL.md "Checkpoint Schema") external readers parse;
        # stat the live file (it must exist — it's in the live set)
        full = os.path.join(table, path)
        rows.append(
            {
                "protocol": None,
                "metaData": None,
                # re-encode per the protocol (reader percent-decodes)
                "add": {
                    "path": quote(path, safe="/="),
                    "partitionValues": list((pvals or {}).items()),
                    "size": os.path.getsize(full),
                    "modificationTime": int(os.path.getmtime(full) * 1000),
                    # restated state, not a change (see the v2 writer)
                    "dataChange": False,
                    "baseRowId": (row_meta.get(path) or {}).get(
                        "baseRowId"
                    ),
                    "defaultRowCommitVersion": (
                        row_meta.get(path) or {}
                    ).get("defaultRowCommitVersion"),
                    "deletionVector": (
                        {
                            "storageType": dvs[path].get("storageType"),
                            "pathOrInlineDv": dvs[path].get(
                                "pathOrInlineDv"
                            ),
                            "offset": dvs[path].get("offset"),
                            "sizeInBytes": dvs[path].get("sizeInBytes"),
                            "cardinality": dvs[path].get("cardinality"),
                        }
                        if path in dvs
                        else None
                    ),
                },
                "txn": None,
            }
        )
    for app, v in sorted(txns.items()):
        rows.append(
            {
                "protocol": None,
                "metaData": None,
                "add": None,
                "txn": {"appId": app, "version": v},
            }
        )
    # the latest domainMetadata per domain rides into the checkpoint
    # (PROTOCOL.md "Domain Metadata": checkpoints must carry live
    # domains; removed=true tombstones MAY be dropped — we drop them)
    for name in sorted(getattr(snap, "domains", None) or {}):
        dom = snap.domains[name]
        if dom.get("removed"):
            continue
        rows.append(
            {
                "domainMetadata": {
                    "domain": dom["domain"],
                    "configuration": dom.get("configuration"),
                    "removed": False,
                }
            }
        )
    n_parts = (
        1
        if part_size is None or len(rows) <= part_size
        else -(-len(rows) // part_size)
    )
    if n_parts == 1:
        ck_path = os.path.join(
            table, _LOG, f"{version:020d}.checkpoint.parquet"
        )
        pq.write_table(pa.Table.from_pylist(rows, schema=ck_schema), ck_path)
    else:
        # a checkpoint is an unordered action SET, so any row partition
        # is a valid part split; parts land before the pointer moves, so
        # a crash mid-set leaves an incomplete set readers skip
        for p in range(n_parts):
            chunk = rows[p * part_size : (p + 1) * part_size]
            name = (
                f"{version:020d}.checkpoint."
                f"{p + 1:010d}.{n_parts:010d}.parquet"
            )
            pq.write_table(
                pa.Table.from_pylist(chunk, schema=ck_schema),
                os.path.join(table, _LOG, name),
            )
    record = {"version": version, "size": len(rows)}
    if n_parts > 1:
        record["parts"] = n_parts  # protocol's multi-part marker
    _advance_checkpoint_pointer(table, version, record)
    return version


def _advance_checkpoint_pointer(
    table: str, version: int, record: dict
) -> None:
    """Move ``_last_checkpoint`` — MONOTONE only: an explicit older
    ``version`` (re-materializing a historical checkpoint) must not
    move the pointer backwards — after clean_log anchors retention to
    the NEWEST checkpoint and deletes intervening JSON commits, a
    reader following a rewound pointer could no longer replay to
    head."""
    pointer = os.path.join(table, _LOG, "_last_checkpoint")
    recorded = -1
    if os.path.exists(pointer):
        try:
            with open(pointer) as f:
                recorded = int(json.load(f).get("version", -1))
        except (ValueError, json.JSONDecodeError):
            recorded = -1  # unreadable pointer: rewrite it
    newest_ckpt = max(_checkpoint_versions(table), default=-1)
    if version >= max(recorded, newest_ckpt):
        with open(pointer, "w") as f:
            json.dump(record, f)


def clean_log(table: str) -> list[str]:
    """Delete JSON commits at-or-before the latest checkpoint — Delta's
    log-retention cleanup, safe ONLY because the checkpoint fully
    describes that prefix (write_checkpoint first). Time travel to
    versions below the checkpoint is gone after this, exactly as with
    snapshot.vacuum's log checkpointing. Returns deleted paths.

    Honors ``checkpointProtection`` (PROTOCOL.md "Checkpoint
    Protection"): on tables declaring the feature, history before
    ``delta.requireCheckpointProtectionBeforeVersion`` may only vanish
    in one truncation that reaches the protected boundary — a cleanup
    whose checkpoint anchor stops INSIDE the protected range would
    strip commits another writer's recovery depends on, so it raises
    by name (write a checkpoint at or past the boundary first)."""
    ckpts = _checkpoint_versions(table)
    if not ckpts:
        raise ValueError(
            f"{table} has no checkpoint; write_checkpoint before clean_log"
        )
    anchor = ckpts[-1]
    snap = _replay(table, None)
    if "checkpointProtection" in set(
        (snap.protocol or {}).get("writerFeatures") or ()
    ):
        protect = int(
            (snap.config or {}).get(
                "delta.requireCheckpointProtectionBeforeVersion", 0
            )
        )
        if anchor + 1 < protect:
            raise ValueError(
                f"cannot clean_log {table}: checkpointProtection "
                f"requires history before version {protect} to be "
                f"truncated in one step, but the latest checkpoint is "
                f"at {anchor} — write_checkpoint at version "
                f">= {protect - 1} first"
            )
    deleted = []
    for v, path in _log_entries(table):
        if v <= anchor:
            os.remove(path)
            deleted.append(path)
    return deleted


def optimize_delta(
    spark: SparkSession,
    table: str,
    min_files: int = 2,
    zorder_by: list[str] | None = None,
) -> int | None:
    """OPTIMIZE (small-file compaction): rewrite every partition whose
    live set holds ≥ ``min_files`` files into ONE file, committed as a
    single log entry of ``remove`` + ``add`` actions with
    ``dataChange: false`` — the protocol's marker that the commit
    rearranges bytes without changing table contents, so a streaming
    reader of the table skips it instead of re-emitting rows
    (PROTOCOL.md Add/Remove "dataChange"). Returns the committed
    version, or None when every partition is already compact.

    ``zorder_by`` (delta-spark's ``OPTIMIZE ... ZORDER BY (cols)``):
    every partition rewrites REGARDLESS of file count (re-clustering
    changes layout even for one file), rows sorted by the Morton
    interleave of the named data columns (sources/zorder.py — one
    min/max pass per partition for the bucket ranges, then a sort;
    the same cost class as any clustered write). Data-skipping readers
    then prune on the tight per-file ranges of every z-ordered column
    at once. Recorded in commitInfo as ``zOrderBy``, still
    ``dataChange: false``.

    This completes the table lifecycle next to write_checkpoint/
    clean_log the way HBase region compaction completes the reference's
    store (MarketDB.scala's put path + region maintenance; the plain
    parquet store mirrors it in sources/store.py:96): streaming ingest
    creates one file per micro-batch per partition, and scan cost
    grows with file count, not data size, until compaction folds them.
    Time travel to pre-optimize versions keeps working — old files are
    removed from the LIVE SET, not deleted from disk.

    Concurrency: the commit uses the same put-if-absent version claim
    as write_delta. A lost race recomputes the live set and retries
    ONLY if every file this compaction rewrote is still live (a
    concurrent append is fine — its new files simply stay); if a
    concurrent overwrite/optimize removed any of them, the compaction
    is stale — its staged files are unstaged and CommitConflict raised
    (delta-spark resolves the same way: OPTIMIZE loses to conflicting
    transactions and reruns)."""
    import uuid as _uuid

    from urllib.parse import quote

    from marketdb_spark.sources.snapshot import CommitConflict

    snap = _replay(table, None)
    # writer gate: unknown writer features must refuse before anything
    # is touched. Deletion vectors are granted: the rewrite below reads
    # DV-carrying files through the position-mask scan and MATERIALIZES
    # the deletes — the compacted file drops the descriptor (delta's
    # REORG/PURGE semantics), never resurrects rows.
    _check_writer_protocol(snap, table)
    dvs = getattr(snap, "dvs", None) or {}
    part_cols, live = snap.part_cols, snap.live
    schema = T.StructType.fromJson(json.loads(snap.schema_json))
    if zorder_by is None:
        # clustered tables (PROTOCOL.md "Clustered Table"): a bare
        # OPTIMIZE re-clusters on the delta.clustering domain's
        # columns, matching delta-spark's behavior on clustered tables
        # — callers can still pass zorder_by explicitly to override
        clus = (getattr(snap, "domains", None) or {}).get(
            "delta.clustering"
        )
        if clus and not clus.get("removed"):
            try:
                paths = json.loads(
                    clus.get("configuration") or "{}"
                ).get("clusteringColumns") or []
            except (TypeError, ValueError):
                paths = []
            bucketable = {
                f.name
                for f in schema.fields
                if isinstance(
                    f.dataType,
                    (T.NumericType, T.TimestampType, T.BooleanType),
                )
            }
            cand = [
                p[0]
                for p in paths
                if isinstance(p, list) and len(p) == 1
                and p[0] in bucketable and p[0] not in part_cols
            ]
            if cand and len(cand) == len(paths):
                zorder_by = cand
    if zorder_by:
        bad = [
            c for c in zorder_by
            if c in part_cols
            or c not in {f.name for f in schema.fields}
        ]
        if bad:
            raise ValueError(
                f"zorder_by columns {bad} must be non-partition data "
                f"columns of {table}"
            )
    # compaction never renames: under column mapping the files are read
    # AND rewritten with their physical column names — add.partitionValues
    # and the Hive-style dirs stay keyed by physical names per the
    # protocol, and the logical surface is untouched. Under id mode the
    # read resolves by parquet field id and the schema's parquet.field.id
    # metadata rides through the read into the rewritten files, so
    # compacted files keep their ids.
    cmode = _mapping_mode(snap.config, table)
    mapped = cmode in ("name", "id")
    with_ids = cmode == "id"
    if with_ids:
        spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    stage_key = {
        f.name: (_physical_name(f) if mapped else f.name)
        for f in schema.fields
        if f.name in part_cols
    }
    data_schema = T.StructType(
        [
            T.StructField(
                _physical_name(f) if mapped else f.name,
                _physical_datatype(f.dataType, with_ids)
                if mapped
                else f.dataType,
                f.nullable,
                {_PARQUET_FID: _field_id(f)} if with_ids else None,
            )
            for f in schema.fields
            if f.name not in part_cols
        ]
    )
    # delta.enableRowTracking=true (STABLE ids): compaction moves rows
    # between files, so the surviving ids MATERIALIZE through the
    # rewrite exactly like DML (PROTOCOL.md "Row Tracking") — without
    # this, an enabled table could never compact, and on DV tables
    # OPTIMIZE is the purge path. Mapped + enabled stays refused (via
    # the _row_tracking_actions gate below).
    rt_cols: tuple[str, str] | None = None
    rt_meta_update: dict | None = None
    _, rt_enabled, _ = _row_tracking_state(snap)
    if rt_enabled and not mapped:
        rt_cols = _materialized_rt_cols(snap)
        if rt_cols is None:
            rt_cols = (
                f"_row-id-col-{_uuid.uuid4()}",
                f"_row-commit-version-col-{_uuid.uuid4()}",
            )
            rt_meta_update = {
                _RT_RID_KEY: rt_cols[0],
                _RT_RCV_KEY: rt_cols[1],
            }
        data_schema = T.StructType(
            data_schema.fields
            + [
                T.StructField(rt_cols[0], T.LongType(), True),
                T.StructField(rt_cols[1], T.LongType(), True),
            ]
        )
    by_part: dict[tuple, list[str]] = {}
    for path, pvals in live.items():
        pv = pvals or {}
        key = tuple(pv.get(stage_key[c], pv.get(c)) for c in part_cols)
        by_part.setdefault(key, []).append(path)
    threshold = 1 if zorder_by else max(int(min_files), 2)
    todo = {
        key: sorted(paths)
        for key, paths in by_part.items()
        # a DV-carrying file is ALWAYS rewrite-eligible regardless of
        # the loose-file threshold: compacting it materializes the
        # soft-deleted rows away (delta's REORG ... APPLY (PURGE))
        if len(paths) >= threshold or any(p in dvs for p in paths)
    }
    if not todo:
        return None
    if with_ids:
        _require_field_ids(
            table,
            [p for paths in todo.values() for p in paths],
            [f for f in schema.fields if f.name not in part_cols],
        )

    # rewrite each loose partition into one file; the read-coalesce is
    # per-partition-tuple, so the rewrites are independent
    # single-partition jobs — submitted from a small driver thread pool
    # (spark_optimization_guide §2.6: serial submission makes per-job
    # scheduler latency, not data, the cost floor when many small
    # partitions are loose; Spark schedules concurrent jobs fine, same
    # device as sources/store.compact_store). Results are re-assembled
    # in the deterministic sorted-partition order below so the staged
    # add order — and with it row-id baseRowId assignment — is
    # identical to the serial loop's.
    import shutil as _shutil

    staged: list[tuple[str, dict]] = []
    removes: list[str] = []
    tmp = os.path.join(table, f"_staging_{_uuid.uuid4().hex}")
    ordered = sorted(
        todo.items(),
        key=lambda kv: tuple((v is None, v or "") for v in kv[0]),
    )

    def _rewrite_one(key, paths):
            # the staged add's partitionValues (and the cosmetic dirs)
            # are keyed the way the table keys them: physical under
            # column mapping, logical otherwise
            pvals = dict(zip((stage_key[c] for c in part_cols), key))
            pieces: list[DataFrame] = []
            plain = (
                []
                if rt_cols is not None
                else [
                    os.path.join(table, p) for p in paths if p not in dvs
                ]
            )
            if plain:
                pieces.append(
                    spark.read.schema(data_schema).parquet(*plain)
                )
            for p in paths:
                # per-file reads for DV-carrying files (read minus the
                # deleted positions — same `_metadata.row_index`
                # anti-join as _scan_files, so the compacted file
                # materializes the deletes) and, under enabled row
                # tracking, for EVERY file (each needs its own
                # baseRowId literal to materialize ids)
                if p not in dvs and rt_cols is None:
                    continue
                import pandas as _pd

                from marketdb_spark.sources.deltadv import decode_dv

                base = spark.read.schema(data_schema).parquet(
                    os.path.join(table, p)
                ).select(
                    "*", F.col("_metadata.row_index").alias("__dv_ri")
                )
                if rt_cols is not None:
                    meta = (getattr(snap, "row_meta", None) or {}).get(
                        p
                    ) or {}
                    rid = F.col(rt_cols[0])
                    if meta.get("baseRowId") is not None:
                        rid = F.coalesce(
                            rid,
                            (
                                F.lit(int(meta["baseRowId"]))
                                + F.col("__dv_ri")
                            ).cast("long"),
                        )
                    rcv = F.col(rt_cols[1])
                    if meta.get("defaultRowCommitVersion") is not None:
                        rcv = F.coalesce(
                            rcv,
                            F.lit(
                                int(meta["defaultRowCommitVersion"])
                            ).cast("long"),
                        )
                    base = base.withColumn(rt_cols[0], rid).withColumn(
                        rt_cols[1], rcv
                    )
                if p in dvs:
                    positions = decode_dv(dvs[p], table, p)
                    if positions:
                        pos_df = spark.createDataFrame(
                            _pd.DataFrame(
                                {
                                    "__dv_ri": _pd.array(
                                        positions, dtype="int64"
                                    )
                                }
                            )
                        )
                        base = base.join(
                            F.broadcast(pos_df), "__dv_ri", "left_anti"
                        )
                pieces.append(base.drop("__dv_ri"))
            df = pieces[0]
            for extra in pieces[1:]:
                df = df.unionByName(extra)
            if zorder_by:
                # z-cluster within the partition: bucket ranges from one
                # min/max pass, Morton interleave, one sorted file. The
                # read speaks PHYSICAL names under column mapping — map
                # the logical zorder names through.
                from marketdb_spark.sources.zorder import (
                    bucketize,
                    interleave_bits,
                )

                phys_by_logical = {
                    f.name: (_physical_name(f) if mapped else f.name)
                    for f in schema.fields
                }
                zphys = [phys_by_logical[c] for c in zorder_by]
                ranges = df.agg(
                    *[F.min(c).cast("double").alias(f"lo_{i}")
                      for i, c in enumerate(zphys)],
                    *[F.max(c).cast("double").alias(f"hi_{i}")
                      for i, c in enumerate(zphys)],
                ).first()

                def _rng(i):
                    lo, hi = ranges[f"lo_{i}"], ranges[f"hi_{i}"]
                    return (0.0, 0.0) if lo is None or hi is None else (lo, hi)

                z = interleave_bits(
                    [
                        bucketize(F.col(c), *_rng(i))
                        for i, c in enumerate(zphys)
                    ]
                )
                df = (
                    df.withColumn("__z", z)
                    .coalesce(1)
                    .sortWithinPartitions("__z")
                    .drop("__z")
                )
            out_dir = os.path.join(tmp, _uuid.uuid4().hex)
            df.coalesce(1).write.parquet(out_dir)
            [one] = [
                f for f in os.listdir(out_dir) if f.endswith(".parquet")
            ]
            part_dir = "/".join(
                f"{c}={_HIVE_NULL if pvals[c] is None else quote(pvals[c], safe='')}"
                for c in pvals
            )
            name = f"part-{_uuid.uuid4().hex}.parquet"
            rel = os.path.join(part_dir, name) if part_dir else name
            dest = os.path.join(table, rel)
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            os.replace(os.path.join(out_dir, one), dest)
            return rel, pvals

    try:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(
            max_workers=max(1, min(8, len(ordered)))
        ) as pool:
            futs = [pool.submit(_rewrite_one, k, p) for k, p in ordered]
            results: list[tuple[str, dict] | None] = []
            first_err: BaseException | None = None
            for f in futs:
                try:
                    results.append(f.result())
                except BaseException as e:  # noqa: BLE001 — re-raised
                    results.append(None)
                    if first_err is None:
                        first_err = e
        if first_err is not None:
            # unstage every rewrite that DID land before failing the op
            _unstage(table, [r for r, _ in filter(None, results)])
            raise first_err
        for (key, paths), (rel, pvals) in zip(ordered, results):
            staged.append((rel, pvals))
            removes.extend(paths)
    except BaseException:
        _unstage(table, [r for r, _ in staged])
        _shutil.rmtree(tmp, ignore_errors=True)
        raise
    finally:
        _shutil.rmtree(tmp, ignore_errors=True)

    try:
        for _ in range(5):
            entries = _log_entries(table)
            ckpts = _checkpoint_versions(table)
            latest = max(
                entries[-1][0] if entries else -1, ckpts[-1] if ckpts else -1
            )
            cur = _replay(table, None)
            parts2, live2 = cur.part_cols, cur.live
            dvs2 = getattr(cur, "dvs", None) or {}
            if parts2 != part_cols or any(p not in live2 for p in removes):
                raise CommitConflict(
                    f"optimize of {table} is stale: a concurrent commit "
                    f"removed rewritten files or changed the partitioning"
                )
            from marketdb_spark.sources.deltadv import dv_descriptor_key

            if any(
                dv_descriptor_key(dvs2.get(p)) != dv_descriptor_key(dvs.get(p))
                for p in removes
            ):
                # a concurrent DV commit soft-deleted more rows from a
                # file this compaction already materialized — committing
                # would resurrect them (compared on the 5-field protocol
                # projection: a checkpoint between read and commit strips
                # writer extras like uniqueId)
                raise CommitConflict(
                    f"optimize of {table} is stale: a concurrent commit "
                    f"changed a rewritten file's deletion vector"
                )
            version = latest + 1
            rt_extras, rt_domain = _row_tracking_actions(
                table,
                cur,
                [rel for rel, _ in staged],
                version,
                # compaction moves rows between files; with rt_cols the
                # surviving ids are MATERIALIZED into the compacted
                # files above, so stable ids hold — only mapped +
                # enabled (rt_cols None) still refuses
                data_removing=True,
                rows_preserved=rt_cols is not None,
            )
            op_params: dict = {"auto": False}
            if zorder_by:
                op_params["zOrderBy"] = list(zorder_by)
            actions = [_commit_info("OPTIMIZE", op_params)]
            if rt_meta_update:
                # lazy materialized-column-name assignment: re-emit
                # metaData in this same commit; a concurrent writer
                # having assigned DIFFERENT names makes the staged
                # files speak the wrong columns — loud conflict
                stale_keys = {
                    k: v
                    for k, v in rt_meta_update.items()
                    if (cur.config or {}).get(k) not in (None, v)
                }
                if stale_keys:
                    raise CommitConflict(
                        f"optimize of {table} is stale: a concurrent "
                        f"commit assigned different values for "
                        f"{sorted(stale_keys)}"
                    )
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
                                **rt_meta_update,
                            },
                        }
                    }
                )
            if rt_domain is not None:
                actions.append(rt_domain)
            for p in removes:
                rm = {"path": quote(p, safe="/="), "dataChange": False}
                if p in dvs:  # the descriptor rides the tombstone
                    rm["deletionVector"] = dvs[p]
                rm.update(
                    (getattr(cur, "row_meta", None) or {}).get(p) or {}
                )
                actions.append({"remove": rm})
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
                            "dataChange": False,
                            **(rt_extras.get(rel) or {}),
                        }
                    }
                )
            if not _publish_commit(table, version, actions):
                continue  # lost the race — revalidate the live set, retry
            return version
        raise CommitConflict(f"lost the commit race 5 times on {table}")
    except BaseException:
        _unstage(table, [r for r, _ in staged])
        raise


def vacuum_delta(
    table: str,
    min_file_age_seconds: float = 3600.0,
    dry_run: bool = False,
) -> list[str]:
    """VACUUM: physically delete data files no longer in the CURRENT
    snapshot's live set — the irreversible step that reclaims the bytes
    OPTIMIZE and overwrites left behind (delta-spark's VACUUM, and the
    Delta analog of sources/snapshot.vacuum). Returns the deleted
    relative paths (or would-delete, with ``dry_run``).

    Time travel to any version that referenced a vacuumed file is GONE
    (its replay still resolves, but the scan fails at read time —
    exactly delta-spark's behavior). The log itself is untouched:
    retention of log entries is clean_log's job, bytes are vacuum's.

    Unreferenced files YOUNGER than ``min_file_age_seconds`` are kept —
    the same retention guard as snapshot.vacuum and Delta's
    ``delta.deletedFileRetentionDuration``: write_delta/optimize_delta
    move staged files into the table BEFORE their commit lands, so
    without the age gate a concurrent vacuum could delete files whose
    commit then succeeds (a committed version pointing at vanished
    data). Pass 0 only when writers are quiesced."""
    import time as _time

    snap = _replay(table, None)
    # vacuumProtocolCheck's whole point: VACUUM must run the writer
    # gate before deleting bytes (an unknown writer feature could imply
    # files referenced outside add actions)
    _check_writer_protocol(snap, table)
    live_set = set(snap.live)
    cutoff = _time.time() - min_file_age_seconds
    deleted: list[str] = []
    for root, _dirs, files in os.walk(table):
        rel_root = os.path.relpath(root, table)
        # _change_data is never in the live set but IS referenced by cdc
        # actions — vacuuming it would break read_change_feed over
        # retained history, so it is skipped entirely (conservative;
        # delta-spark ages CDF files out with the same retention clock)
        if rel_root.split(os.sep)[0].startswith(
            ("_delta_log", "_staging_", _CDF_DIR)
        ):
            continue
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            rel = f if rel_root == "." else os.path.join(rel_root, f)
            full = os.path.join(table, rel)
            if rel in live_set or os.path.getmtime(full) > cutoff:
                continue
            deleted.append(rel)
            if not dry_run:
                _remove_data_file(table, rel)
    return deleted


def delta_sink(table: str, app_id: str):
    """foreachBatch callable: ``stream.writeStream.foreachBatch(
    delta_sink(path, "my-query-id"))`` — exactly-once streaming ingest
    into the Delta table. Structured Streaming replays micro-batches
    at-least-once after a restart; the ``txn`` action dedups them by
    (app_id, batch_id), upgrading the sink to exactly-once — the same
    contract sources/snapshot.snapshot_sink provides for the snapshot
    table, here expressed in Delta's own protocol so ANY Delta reader
    sees exactly-once results."""

    def _sink(batch: DataFrame, batch_id: int) -> None:
        write_delta(batch, table, txn_app=app_id, txn_version=batch_id)

    return _sink
