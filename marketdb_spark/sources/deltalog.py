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

Scope (documented, not hidden): JSON commits + the ``_last_checkpoint``
parquet checkpoint are replayed; deletion vectors, column mapping, and
v2 checkpoints (reader version > 1 features) raise instead of returning
wrong rows. Partition values ride back in as literal columns per add —
the directory layout is NOT trusted (the protocol says partitionValues
is authoritative).

At 100 TB the replay cost is the log size (KBs per commit, one
checkpoint parquet), not the data; the returned DataFrame scans exactly
the live files, so partition pruning and pushdown behave as for any
parquet read.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_LOG = "_delta_log"


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


def _replay(table: str, version: int | None):
    """Replay the log up to ``version`` (default: latest). Returns
    (schema_json, partition_cols, {path: partitionValues})."""
    entries = _log_entries(table)
    if not entries:
        raise ValueError(f"no Delta log at {table}/{_LOG}")
    if version is None:
        version = entries[-1][0]
    schema_json: str | None = None
    part_cols: list[str] = []
    live: dict[str, dict] = {}

    # Start from the newest checkpoint at-or-before `version`, if any —
    # the protocol's _last_checkpoint points at the latest one; older
    # ones remain addressable by filename.
    ckpt_version = -1
    log_dir = os.path.join(table, _LOG)
    for name in sorted(os.listdir(log_dir)):
        if name.endswith(".checkpoint.parquet"):
            v = int(name.split(".")[0])
            if v <= version:
                ckpt_version = max(ckpt_version, v)
    if ckpt_version >= 0:
        import pyarrow.parquet as pq

        ck = pq.read_table(
            os.path.join(
                log_dir, f"{ckpt_version:020d}.checkpoint.parquet"
            )
        ).to_pylist()
        for row in ck:
            add = row.get("add")
            if add and add.get("path"):
                pv = add.get("partitionValues") or {}
                # checkpoint schema stores partitionValues as
                # map<string,string>; pyarrow's to_pylist renders maps
                # as (key, value) tuple lists
                live[add["path"]] = dict(pv) if isinstance(pv, list) else pv
            meta = row.get("metaData")
            if meta and meta.get("schemaString"):
                schema_json = meta["schemaString"]
                part_cols = list(meta.get("partitionColumns") or [])
            proto = row.get("protocol")
            if proto and (proto.get("minReaderVersion") or 1) > 1:
                raise ValueError(
                    f"unsupported Delta minReaderVersion "
                    f"{proto['minReaderVersion']} (deletion vectors / "
                    f"column mapping need a feature-aware reader)"
                )

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
                elif "add" in action:
                    a = action["add"]
                    live[a["path"]] = a.get("partitionValues") or {}
                elif "remove" in action:
                    live.pop(action["remove"]["path"], None)
                elif "protocol" in action:
                    if (action["protocol"].get("minReaderVersion") or 1) > 1:
                        raise ValueError(
                            f"unsupported Delta minReaderVersion "
                            f"{action['protocol']['minReaderVersion']}"
                        )
    if schema_json is None:
        raise ValueError(f"no metaData action found in {table}/{_LOG}")
    return schema_json, part_cols, live


def read_delta(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame:
    """Read a Delta table as of ``version`` (default: latest) — time
    travel included, no delta-spark jar. Partitioned tables get their
    partition columns re-attached from each add-action's
    partitionValues (authoritative per the protocol), cast to the
    table-schema type; file groups sharing partitionValues are read
    together so the plan stays one parquet scan per distinct partition
    tuple."""
    schema_json, part_cols, live = _replay(table, version)
    schema = T.StructType.fromJson(json.loads(schema_json))
    if not live:
        return spark.createDataFrame([], schema)
    data_schema = T.StructType(
        [f for f in schema.fields if f.name not in part_cols]
    )
    if not part_cols:
        paths = [os.path.join(table, p) for p in live]
        return spark.read.schema(data_schema).parquet(*paths)
    # group files by partition tuple; union one literal-annotated read
    # per group (partition cardinality bounds the union width)
    by_part: dict[tuple, list[str]] = {}
    for path, pvals in live.items():
        key = tuple(pvals.get(c) for c in part_cols)
        by_part.setdefault(key, []).append(os.path.join(table, path))
    types = {f.name: f.dataType for f in schema.fields}
    parts = []
    # NULL partition values sort last (a plain tuple sort would raise
    # TypeError comparing None to str)
    for key, paths in sorted(
        by_part.items(),
        key=lambda kv: tuple((v is None, v or "") for v in kv[0]),
    ):
        df = spark.read.schema(data_schema).parquet(*paths)
        for c, raw in zip(part_cols, key):
            df = df.withColumn(
                c,
                (F.lit(None) if raw is None else F.lit(raw)).cast(types[c]),
            )
        parts.append(df.select([f.name for f in schema.fields]))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def write_delta(
    df: DataFrame, table: str, mode: str = "append"
) -> int:
    """Minimal protocol-correct Delta writer (unpartitioned tables):
    data files land at the table root under fresh names, then one
    commit JSON (protocol + metaData on first commit, add/remove
    actions after) claims the next version via an exclusive create —
    the same put-if-absent commit race as sources/snapshot.py, which is
    also how Delta itself commits. Exists so round-trips and interop
    tests don't need delta jars; partitioned WRITES are out of scope
    (the reader handles partitioned tables written by real writers)."""
    import uuid as _uuid

    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    os.makedirs(os.path.join(table, _LOG), exist_ok=True)
    tmp = os.path.join(table, f"_staging_{_uuid.uuid4().hex}")
    df.write.mode("error").parquet(tmp)
    names = []
    for f in sorted(os.listdir(tmp)):
        if f.endswith(".parquet"):
            name = f"part-{_uuid.uuid4().hex}.parquet"
            os.replace(os.path.join(tmp, f), os.path.join(table, name))
            names.append(name)
    import shutil as _shutil

    _shutil.rmtree(tmp, ignore_errors=True)

    entries = _log_entries(table)
    removes: list[str] = []
    if mode == "overwrite" and entries:
        _, _, live = _replay(table, None)
        removes = sorted(live)
    version = entries[-1][0] + 1 if entries else 0
    actions = []
    if version == 0:
        actions.append(
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
        )
        actions.append(
            {
                "metaData": {
                    "id": _uuid.uuid4().hex,
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": df.schema.json(),
                    "partitionColumns": [],
                    "configuration": {},
                }
            }
        )
    for p in removes:
        actions.append(
            {"remove": {"path": p, "dataChange": True}}
        )
    for n in names:
        actions.append(
            {
                "add": {
                    "path": n,
                    "partitionValues": {},
                    "size": os.path.getsize(os.path.join(table, n)),
                    "modificationTime": 0,
                    "dataChange": True,
                }
            }
        )
    log_path = os.path.join(table, _LOG, f"{version:020d}.json")
    fd = os.open(log_path, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
    with os.fdopen(fd, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    return version
