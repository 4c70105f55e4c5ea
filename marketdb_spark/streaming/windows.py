"""Streaming windowed aggregation + arbitrary stateful folds — the
unbounded-input analog of the reference's iteratee folds
(marketdb-iteratee/.../MarketIteratees.scala:6-55) with the late-data
policy the reference lacks (it trusts queue order — SURVEY §2B).

All helpers take/return streaming DataFrames and work identically on
batch frames (Spark's unified semantics), which is how the tests pin
their behavior.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from marketdb_spark.functions.exact import dsum


def tumbling_counts(
    df: DataFrame,
    time_col: str,
    key_cols: Sequence[str],
    width: str = "1 minute",
    value_col: str | None = None,
) -> DataFrame:
    """Tumbling event-time window counts (+ exact value sum) per key —
    the minute-bucket rollup (V2 row-key clock, Trade.scala:24-27)."""
    aggs = [F.count("*").alias("n_events")]
    if value_col:
        aggs.append(dsum(F.col(value_col), scale=6).alias("sum_value"))
    return (
        df.groupBy(F.window(time_col, width).alias("win"), *key_cols)
        .agg(*aggs)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *key_cols,
            "n_events",
            *(["sum_value"] if value_col else []),
        )
    )


def sliding_counts(
    df: DataFrame,
    time_col: str,
    key_cols: Sequence[str],
    width: str = "10 minutes",
    slide: str = "5 minutes",
) -> DataFrame:
    """Sliding event-time windows (each event lands in width/slide buckets)."""
    return (
        df.groupBy(F.window(time_col, width, slide).alias("win"), *key_cols)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *key_cols,
            "n_events",
        )
    )


def session_counts(
    df: DataFrame, time_col: str, key_cols: Sequence[str], gap: str = "5 minutes"
) -> DataFrame:
    """Session windows: a session closes after `gap` of key silence."""
    return (
        df.groupBy(F.session_window(time_col, gap).alias("win"), *key_cols)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            *key_cols,
            "n_events",
        )
    )


def running_fold(
    df: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    value_col: str,
) -> DataFrame:
    """The reference's counter/sequencer iteratee as a grouped stateful
    fold: per key, emit (n_seen, last_value, total) after consuming the
    group's time-ordered stream. Batch form uses applyInPandas; the
    streaming form is applyInPandasWithState with the same per-group body
    (marketdb_spark.streaming docstring).

    This is the deliberate Pandas-UDF slow path: only for folds the
    built-in aggregate/window surface can't express."""
    key_cols = list(key_cols)
    schema = ", ".join(
        f"{c} {t}" for c, t in df.select(*key_cols).dtypes
    ) + ", n_seen bigint, last_value double, total double"

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col)
        keys = {c: [pdf[c].iloc[0]] for c in key_cols}
        return pd.DataFrame(
            {
                **keys,
                "n_seen": [len(pdf)],
                "last_value": [float(pdf[value_col].iloc[-1])],
                "total": [float(pdf[value_col].sum())],
            }
        )

    return df.groupBy(*key_cols).applyInPandas(fold, schema=schema)
