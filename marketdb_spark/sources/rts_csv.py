"""RTS exchange CSV batch source — the reference's archive loader
(marketdb-loader/.../TradeData.scala:30-101: `;`-separated lines
`code;contract;price;amount;time;trade_id;nosystem`, header lines starting
"code;", blank lines, market constantly 'RTS' — TradeData.scala:30).

Spark-first: one `spark.read.csv` with an explicit schema (no inference
pass over 100 TB), malformed rows preserved via a corrupt-record column,
then a declarative valid/quarantine split — the reference's
Rejected(msg) path (Trade.scala:52-54, MarketDB.scala:157-159) as a
DataFrame predicate instead of an event-sourced monad.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

RTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("code", T.StringType(), True),
        T.StructField("contract", T.StringType(), True),
        T.StructField("price", T.StringType(), True),
        T.StructField("amount", T.StringType(), True),
        T.StructField("time", T.StringType(), True),
        T.StructField("trade_id", T.StringType(), True),
        T.StructField("nosystem", T.StringType(), True),
        T.StructField("_corrupt", T.StringType(), True),
    ]
)

RTS_TIME_FMT = "yyyy-MM-dd HH:mm:ss.SSS"
RTS_MARKET = "RTS"  # constant in the reference feed (TradeData.scala:30)

# Width caps from the reference's dictionary id-space
# (marketdb-core/.../core/MarketDB.scala:23-24, guards Trade.scala:52-54).
MARKET_ID_MAX = (1 << 8) - 1
SECURITY_ID_MAX = (1 << 24) - 1


def extract_rts_zip(
    zip_path: str, work_dir: str, entry_suffix: str = "ft.csv"
) -> list[str]:
    """Extract the trade CSV entries from an RTS archive into ``work_dir``
    and return their paths. `*ft.csv` = futures trades, `*ot.csv` = options
    trades (TradeData.scala:33-34) — same line format, so either suffix
    feeds the same parser. Driver-side utility: one archive is one trading day
    (~single-digit MB); the extracted CSVs are then scanned by Spark in
    parallel. For 100 TB of archives, run this fan-out per-day first (it is
    embarrassingly parallel) and point read_rts_csv at the whole directory."""
    import zipfile
    from pathlib import Path

    out_dir = Path(work_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    out: list[str] = []
    with zipfile.ZipFile(zip_path) as zf:
        for info in zf.infolist():
            if info.filename.lower().endswith(entry_suffix):
                target = out_dir / Path(info.filename).name
                with zf.open(info) as src, open(target, "wb") as dst:
                    dst.write(src.read())
                out.append(str(target))
    return out


def read_rts_zip(
    spark: SparkSession, zip_path: str, work_dir: str, entry_suffix: str = "ft.csv"
) -> DataFrame:
    """CSV-in-ZIP batch source (SURVEY §2A S3): unzip the day's trade
    entries (futures by default; pass entry_suffix='ot.csv' for options),
    then scan them with the schema'd CSV reader."""
    files = extract_rts_zip(zip_path, work_dir, entry_suffix)
    if not files:
        raise FileNotFoundError(f"no *ft.csv entries in {zip_path}")
    return read_rts_csv(spark, files)


def read_rts_csv(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """Read raw RTS lines. All columns land as strings; parsing/validation
    happens in `parse_trades` so bad values quarantine instead of nulling
    silently (PERMISSIVE mode keeps the raw line in `_corrupt`)."""
    return (
        spark.read.option("sep", ";")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .schema(RTS_RAW_SCHEMA)
        .csv(path)
    )


def parse_trades(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split raw RTS rows into (valid typed trades, quarantine).

    Skips header lines (`code` == 'code') and blank lines
    (TradeData.scala:61-86); everything else must parse completely or it
    goes to quarantine with a reason — the V1 validate-enrich pipeline
    (Trade.scala:11-73) as declarative column logic.

    Quarantine rows share the engine-wide record shape
    (reject_reason, source, payload-json) so every ingest path can append
    to one quarantine store without schema conflicts."""
    skip = (F.col("code") == "code") | (
        F.col("code").isNull()
        & F.col("contract").isNull()
        & F.col("_corrupt").isNull()
    )
    candidate = raw.filter(~skip)

    # try_cast (not cast): under ANSI SQL semantics a malformed value must
    # quarantine with a reason, not abort the job.
    typed = candidate.select(
        F.lit(RTS_MARKET).alias("market"),
        F.col("contract").alias("security"),
        F.col("trade_id").try_cast("bigint").alias("trade_id"),
        F.col("price").try_cast("decimal(18,8)").alias("price"),
        F.col("amount").try_cast("int").alias("amount"),
        F.try_to_timestamp("time", F.lit(RTS_TIME_FMT)).alias("time"),
        (F.col("nosystem").try_cast("int") == 1).alias("nosystem"),
        F.col("_corrupt"),
        *[F.col(c).alias(f"_raw_{c}") for c in ("price", "amount", "time", "trade_id", "nosystem")],
    )

    reason = (
        F.when(F.col("_corrupt").isNotNull(), "malformed line")
        .when(F.col("security").isNull(), "missing contract")
        .when(F.col("trade_id").isNull(), "bad trade_id")
        .when(F.col("price").isNull(), "bad price")
        .when(F.col("price") <= 0, "non-positive price")
        .when(F.col("amount").isNull(), "bad amount")
        .when(F.col("amount") <= 0, "non-positive amount")
        .when(F.col("time").isNull(), "bad time")
        .when(F.col("nosystem").isNull(), "bad nosystem flag")
    )
    flagged = typed.withColumn("reject_reason", reason)

    trade_cols = ["market", "security", "trade_id", "price", "amount", "time", "nosystem"]
    valid = flagged.filter(F.col("reject_reason").isNull()).select(*trade_cols)
    quarantine = flagged.filter(F.col("reject_reason").isNotNull()).select(
        "reject_reason",
        F.lit("rts_csv").alias("source"),
        F.to_json(
            F.struct(
                F.col("security").alias("contract"),
                *[
                    F.col(f"_raw_{c}").alias(c)
                    for c in ("price", "amount", "time", "trade_id", "nosystem")
                ],
                F.col("_corrupt").alias("corrupt_line"),
            )
        ).alias("payload"),
    )
    return valid, quarantine
