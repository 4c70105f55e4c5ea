"""Distributed CSV-in-ZIP reading via a Spark 4 Python DataSource —
`spark.read.format("rtszip")` scans archive members in EXECUTORS.

The driver-side `extract_rts_zip` utility (rts_csv.py) unzips one day's
archive before scanning; fine for one archive, wrong for a backlog of
thousands (the extraction step is a serial, disk-doubling pass). This
source removes it: the driver lists each archive's central directory
(cheap metadata — no entry bytes are read), emits ONE InputPartITION PER
ZIP MEMBER, and each Spark task streams its member's lines directly out
of the archive. Scale shape: parallelism = number of members across all
archives; a day's archive is single-digit MB so a member is a healthy
task size; nothing is ever extracted to disk.

Mirrors the reference's archive iteration (marketdb-loader/
.../TradeData.scala:33-48: open ZIP, iterate `*ft.csv` entries, read
lines) with Spark owning the distribution.

Wire-up: ``spark.dataSource.register(ZipLinesDataSource)`` once per
session, then ``read_rts_zip_distributed`` parses the raw lines into the
same RTS_RAW_SCHEMA columns the CSV reader produces, so `parse_trades`
(the V1 validate/quarantine split) runs unchanged downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marketdb_spark.sources.rts_csv import RTS_RAW_SCHEMA

try:  # pyspark >= 4.0
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    HAS_PYTHON_DATASOURCE = True
except ImportError:  # pragma: no cover - older pyspark
    HAS_PYTHON_DATASOURCE = False

    class DataSource:  # type: ignore[no-redef]
        pass

    class DataSourceReader:  # type: ignore[no-redef]
        pass

    class InputPartition:  # type: ignore[no-redef]
        pass


class ZipMemberPartition(InputPartition):
    """One task = one archive member (the natural unit: members are
    independently compressed, so tasks never contend on a stream)."""

    def __init__(self, archive: str, entry: str):
        self.archive = archive
        self.entry = entry


class ZipLinesReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.suffix = options.get("suffix", "ft.csv").lower()

    def partitions(self):  # driver: central-directory listing only
        import glob
        import zipfile

        archives = sorted(glob.glob(self.path))
        parts = []
        for ar in archives:
            with zipfile.ZipFile(ar) as zf:
                for name in zf.namelist():
                    if name.lower().endswith(self.suffix):
                        parts.append(ZipMemberPartition(ar, name))
        if not parts:
            raise FileNotFoundError(
                f"no *{self.suffix} entries under {self.path}"
            )
        return parts

    def read(self, partition: ZipMemberPartition):  # executor: stream lines
        import io
        import zipfile

        with zipfile.ZipFile(partition.archive) as zf:
            with zf.open(partition.entry) as member:
                text = io.TextIOWrapper(member, "utf-8", errors="replace")
                for line in text:
                    yield (partition.archive, partition.entry, line.rstrip("\r\n"))


class ZipLinesDataSource(DataSource):
    """`spark.read.format("rtszip").option("suffix", "ft.csv").load(glob)`
    → (archive, entry, line) rows, one partition per ZIP member."""

    @classmethod
    def name(cls) -> str:
        return "rtszip"

    def schema(self) -> str:
        return "archive string, entry string, line string"

    def reader(self, schema) -> ZipLinesReader:
        return ZipLinesReader(self.options)


def register_zip_source(spark: SparkSession) -> None:
    """Idempotent format registration (re-register is a cheap overwrite)."""
    spark.dataSource.register(ZipLinesDataSource)


def read_rts_zip_distributed(
    spark: SparkSession, zip_glob: str, entry_suffix: str = "ft.csv"
) -> DataFrame:
    """Distributed equivalent of read_rts_zip: archives scanned in
    executors, lines split into the RTS_RAW_SCHEMA columns (short lines
    surface through the `_corrupt` column exactly as the PERMISSIVE csv
    reader would), ready for `parse_trades`. Blank lines are DROPPED —
    Spark's csv reader skips empty lines entirely rather than producing
    a row, and the two paths must agree on downstream quarantine counts
    (an all-NULL row with NULL _corrupt would be neither valid nor
    quarantined)."""
    register_zip_source(spark)
    lines = (
        # explicit schema: skips the engine's per-load schema-resolution
        # worker spawn on the Python DataSource lane
        spark.read.format("rtszip")
        .schema("archive string, entry string, line string")
        .option("suffix", entry_suffix)
        .load(zip_glob)
        .filter(F.length("line") > 0)
    )
    n_cols = len(RTS_RAW_SCHEMA.fields) - 1  # minus _corrupt
    fields = F.split(F.col("line"), ";")
    cols = [
        # nullif(…, ''): the csv reader maps empty unquoted fields to NULL;
        # the validator's missing-field checks depend on that convention
        F.nullif(
            F.when(F.size(fields) == n_cols, fields.getItem(i)), F.lit("")
        ).alias(RTS_RAW_SCHEMA.fields[i].name)
        for i in range(n_cols)
    ]
    corrupt = (
        F.when(F.size(fields) != n_cols, F.col("line"))
        .alias("_corrupt")
    )
    return lines.select(*cols, corrupt)
