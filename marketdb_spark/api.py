"""The marketdb query façade: `(series keys, time interval) -> ordered
DataFrame` scans plus k-way merge — the reference's entire server-side
query surface (marketdb-core/.../core/MarketDB.scala:66-106) and client
merge (marketdb-iteratee/.../TimeSeriesEnumerator.scala:48-99), re-expressed
as lazy DataFrames.

Semantics preserved (SURVEY §3.2):
  * interval inclusive at BOTH ends (`time >= start AND time <= end`;
    the reference appends 0x00 to the stop key, MarketDB.scala:80 — we
    refine its minute-granularity over-approximation to exact time).
  * global ordering by event time across merged series, deterministic
    tie-break (time, kind, id) instead of the reference's input-order
    tie-break which is nondeterministic under parallelism.
  * the fold surface (count/collect/limit — MarketIteratees.scala:7-55)
    is native Spark: .count(), .collect(), .limit().
"""

from __future__ import annotations

from collections.abc import Sequence
from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scan_series(
    df: DataFrame,
    time_col: str,
    start: datetime | str | None = None,
    end: datetime | str | None = None,
    order: bool = True,
    tie_cols: Sequence[str] = (),
    **key_equals,
) -> DataFrame:
    """`scan_trades(market, security, interval)` generalized: equality on
    series keys + inclusive time range, ordered by event time.

    Both predicates are expressed declaratively so Catalyst pushes them to
    the parquet scan (partition pruning on key columns if the dataset is
    partitioned by them; min/max row-group skipping on the time column —
    the Spark analog of the reference's HBase start/stop key range,
    MarketDB.scala:79-81)."""
    for col, val in key_equals.items():
        df = df.filter(F.col(col) == val)
    if start is not None:
        df = df.filter(F.col(time_col) >= F.lit(start).cast("timestamp"))
    if end is not None:
        df = df.filter(F.col(time_col) <= F.lit(end).cast("timestamp"))
    if order:
        df = df.orderBy(time_col, *tie_cols)
    return df


def merge_series(
    series: Sequence[DataFrame],
    time_col: str,
    tie_cols: Sequence[str] = (),
    kind_col: str | None = None,
    kinds: Sequence[str] | None = None,
) -> DataFrame:
    """K-way merge of N series into one globally time-ordered stream —
    the reference's min-head merge loop (TimeSeriesEnumerator.scala:86-93)
    expressed as unionByName + orderBy (Spark's sort machinery does the
    k-way merge with spill; heterogeneous schemas union to the common
    superschema with nulls, the reference's MarketPayload upcast).

    If ``kind_col`` is given, each input is tagged with its name from
    ``kinds`` — the deterministic replacement for the reference's
    input-order tie-break."""
    if kind_col is not None:
        kinds = kinds or [f"s{i}" for i in range(len(series))]
        series = [
            df.withColumn(kind_col, F.lit(k)) for df, k in zip(series, kinds)
        ]
    out = series[0]
    for df in series[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    order_cols = [time_col, *([kind_col] if kind_col else []), *tie_cols]
    return out.orderBy(*order_cols)


def explode_days(df: DataFrame, start_col: str, end_col: str) -> DataFrame:
    """Column form of Interval.toDays: one output row per (input row, day)."""
    return df.withColumn(
        "day",
        F.explode(
            F.sequence(
                F.col(start_col).cast("date"),
                F.col(end_col).cast("date"),
                F.expr("interval 1 day"),
            )
        ),
    )
