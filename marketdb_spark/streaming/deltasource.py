"""Delta table as a STREAMING SOURCE — incremental, exactly-once
consumption of the table `sources/deltalog.delta_sink` writes, with no
delta jars: ``spark.readStream.format("deltastream").load(table)``.

This is the read side of the Delta lifecycle loop (delta-spark's own
streaming source, re-expressed over the public protocol): a fresh query
first emits the table's CURRENT SNAPSHOT (the live file set at the
latest version — checkpoint-anchored replay, so log retention is fine),
then tails the transaction log version by version, emitting each new
commit's ``add`` actions. Offsets are ``{"v": N}`` = "all commits ≤ N
consumed" (with ``{"v": -1, "snap": N}`` marking the pending initial
snapshot), so Spark's checkpoint gives bit-identical replay of any
committed range.

``dataChange`` is honored the way the protocol intends: a commit whose
adds all carry ``dataChange: false`` (OPTIMIZE/compaction — our
optimize_delta, or delta-spark's OPTIMIZE) rearranges bytes without
changing contents, so the tail SKIPS it instead of re-emitting rewritten
rows — exactly-once survives compaction. A ``remove`` with
``dataChange: true`` (overwrite/delete) after the stream started is NOT
an append and RAISES (delta-spark's source does the same without
ignoreChanges); appends and compactions are the supported lifecycle.

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

from marketdb_spark.sources.deltalog import _LOG, _decode_path, _replay

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


def _tail_adds(table: str, version: int) -> list[tuple[str, dict]]:
    """The (path, partitionValues) adds of ONE tail commit, honoring
    dataChange: a pure-compaction commit returns [] (skip), a
    dataChange:true remove raises (not an append-only change)."""
    path = _commit_path(table, version)
    if not os.path.exists(path):
        raise ValueError(
            f"deltastream cannot replay version {version} of {table}: "
            f"its JSON commit was removed by log retention while the "
            f"stream was tailing (clean_log the prefix below the "
            f"stream's start only)"
        )
    adds: list[tuple[str, dict]] = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            action = json.loads(line)
            if "add" in action:
                a = action["add"]
                if a.get("dataChange") is not False:
                    adds.append(
                        (_decode_path(a["path"]), a.get("partitionValues") or {})
                    )
            elif "remove" in action:
                if action["remove"].get("dataChange") is not False:
                    raise ValueError(
                        f"deltastream: version {version} of {table} "
                        f"removes data (overwrite/delete) — not an "
                        f"append-only change; restart the stream from a "
                        f"fresh checkpoint to re-snapshot"
                    )
    return adds


class DeltaStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, schema: T.StructType):
        self.table = options["path"]
        self.schema = schema
        self.part_cols = list(
            json.loads(options.get("partcols") or "[]")
        )

    def initialOffset(self) -> dict:
        # snapshot boundary pinned at stream start: everything live at
        # `snap` arrives as batch 0, the tail starts above it
        return {"v": -1, "snap": _latest_version(self.table)}

    def latestOffset(self) -> dict:
        return {"v": _latest_version(self.table)}

    def partitions(self, start: dict, end: dict):
        sv, ev = int(start["v"]), int(end["v"])
        files: list[tuple[str, dict]] = []
        if sv < 0:
            # initial snapshot: the live set at the pinned version —
            # checkpoint-anchored replay, so log retention below it is
            # fine and a restarted batch-0 replays bit-identically
            snap = int(start.get("snap", ev))
            _schema, _parts, live = _replay(self.table, snap)
            files.extend(sorted(live.items()))
            sv = snap
        for v in range(sv + 1, ev + 1):
            files.extend(_tail_adds(self.table, v))
        return [
            DeltaFilePartition(self.table, rel, pvals)
            for rel, pvals in files
        ] or [DeltaFilePartition(self.table, "", {})]

    def read(self, partition: DeltaFilePartition):
        if not partition.rel:
            return iter(())
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_type

        tbl = pq.read_table(os.path.join(partition.table, partition.rel))
        n = tbl.num_rows
        cols, names = [], []
        for f in self.schema.fields:
            if f.name in partition.pvals or f.name in self.part_cols:
                raw = partition.pvals.get(f.name)
                at = to_arrow_type(f.dataType)
                # partitionValues are strings per the protocol; cast to
                # the table-schema type through arrow
                const = pa.array([raw] * n, pa.string()).cast(at)
                cols.append(const)
            else:
                cols.append(tbl.column(f.name).combine_chunks())
            names.append(f.name)
        yield from pa.table(dict(zip(names, cols))).to_batches()

    def commit(self, end: dict) -> None:
        pass  # log retention belongs to the table owner


class DeltaStreamDataSource(DataSource):
    """``spark.readStream.format("deltastream").load(table)`` — snapshot
    + append tail of a Delta table, compaction-aware, no jars."""

    @classmethod
    def name(cls) -> str:
        return "deltastream"

    def schema(self) -> T.StructType:
        # a StructType (not DDL text — toDDL needs a SparkContext, and
        # this runs inside the sessionless planner worker)
        schema_json, _parts, _live = _replay(self.options["path"], None)
        return T.StructType.fromJson(json.loads(schema_json))

    def streamReader(self, schema) -> DeltaStreamReader:
        opts = dict(self.options)
        _schema_json, parts, _live = _replay(self.options["path"], None)
        opts["partcols"] = json.dumps(parts)
        return DeltaStreamReader(opts, schema)


def register_delta_stream_source(spark: SparkSession) -> None:
    """Idempotent format registration."""
    spark.dataSource.register(DeltaStreamDataSource)


def read_delta_stream(spark: SparkSession, table: str):
    """Convenience: register + open the stream on ``table``."""
    register_delta_stream_source(spark)
    return spark.readStream.format("deltastream").load(table)
