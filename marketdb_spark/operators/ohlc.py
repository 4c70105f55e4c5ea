"""OHLC bar aggregation — the minute-bucket rollup implied by the
reference's row-key clock (year, dayOfYear, minuteOfDay)
(marketdb-core/.../model/Trade.scala:24-27): all events of one instrument
in one minute share a row, which is exactly a bar grouping.

Implemented as a plain groupBy over a truncated timestamp with
min_by/max_by for open/close — single shuffle, fully codegen'd, no UDF.
Deterministic tie-break on (time, id) mirrors the reference's stable merge
(TimeSeriesEnumerator.scala:86-93).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from marketdb_spark.functions.exact import dsum


def ohlc_bars(
    df: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    value_col: str,
    id_col: str,
    bar: str = "hour",
    volume_col: str | None = None,
) -> DataFrame:
    """Per (keys, bar) compute open/high/low/close/volume/n_events.

    ``bar`` is a date_trunc unit ('minute', 'hour', 'day', ...). ``id_col``
    breaks ties between events with equal timestamps deterministically.
    ``volume_col``: when given (e.g. a trade's integer ``amount``), volume
    is its plain sum; otherwise volume is the decimal-exact sum of
    ``value_col`` (the events-table convention).
    """
    tie = F.struct(F.col(time_col), F.col(id_col))
    vol = (
        F.sum(volume_col).alias("volume")
        if volume_col is not None
        else dsum(F.col(value_col), scale=6).alias("volume")
    )
    return (
        df.withColumn("bar_start", F.date_trunc(bar, F.col(time_col)))
        .groupBy(*key_cols, "bar_start")
        .agg(
            F.min_by(value_col, tie).alias("open"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.max_by(value_col, tie).alias("close"),
            vol,
            F.count("*").alias("n_events"),
        )
    )


def rollup_bars(
    bars: DataFrame,
    key_cols: Sequence[str],
    bar: str = "day",
) -> DataFrame:
    """Re-aggregate finer OHLC bars into coarser ones WITHOUT touching raw
    events — the continuous-aggregate / hypertable-rollup pattern: at 100 TB
    the daily job reads 24 hourly rows per key instead of re-scanning the
    raw table (OHLC components compose: open = open of earliest sub-bar,
    high = max, low = min, close = close of latest sub-bar, volume/count =
    sums). bar_start is unique per (key, sub-bar), so min_by/max_by over it
    are deterministic — no raw-level tie-break needed here; the sub-bar agg
    already resolved ties on (time, id)."""
    out = (
        bars.withColumn("coarse_start", F.date_trunc(bar, F.col("bar_start")))
        .groupBy(*key_cols, "coarse_start")
        .agg(
            F.min_by("open", F.col("bar_start")).alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", F.col("bar_start")).alias("close"),
            # hourly volume is an exact ≤6-dp decimal rendered as double —
            # the re-cast is an identity, keeping the re-sum order-free
            dsum(F.col("volume"), scale=6).alias("volume"),
            F.sum("n_events").alias("n_events"),
        )
    )
    return out.withColumnRenamed("coarse_start", "bar_start")
