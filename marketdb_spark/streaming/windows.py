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
from marketdb_spark.sources.store import store_exists


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


# --- continuous OHLC aggregate (incremental view maintenance) --------------

def partial_bars(
    df: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    value_col: str,
    id_col: str,
    bar: str = "hour",
) -> DataFrame:
    """Combinable per-batch OHLC partials: besides the bar values, each
    partial carries its open/close (time, id) keys so partials from
    different micro-batches can be merged exactly (the same trick partial
    aggregation uses JVM-side; min/max over the key struct is the
    deterministic tie-break of operators.ohlc)."""
    tie = F.struct(F.col(time_col), F.col(id_col))
    return (
        df.withColumn("bar_start", F.date_trunc(bar, F.col(time_col)))
        .groupBy(*key_cols, "bar_start")
        .agg(
            F.min(tie).alias("open_key"),
            F.max(tie).alias("close_key"),
            F.min_by(value_col, tie).alias("open"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.max_by(value_col, tie).alias("close"),
            dsum(F.col(value_col), scale=6).alias("volume"),
            F.count("*").alias("n_events"),
        )
    )


def combine_bars(bars: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Merge partial bars (same schema in and out — a semigroup):
    open/close follow their carried keys, high/low/volume/count combine
    directly. volume is an exact ≤6-dp decimal rendered as double, so the
    re-sum is order-independent."""
    return bars.groupBy(*key_cols, "bar_start").agg(
        F.min("open_key").alias("open_key"),
        F.max("close_key").alias("close_key"),
        F.min_by("open", "open_key").alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max_by("close", "close_key").alias("close"),
        dsum(F.col("volume"), scale=6).alias("volume"),
        F.sum("n_events").alias("n_events"),
    )


def merge_bars_batch(
    spark,
    batch: DataFrame,
    batch_id: int,
    store_path: str,
    key_cols: Sequence[str],
    time_col: str,
    value_col: str,
    id_col: str,
    bar: str = "hour",
) -> bool:
    """Merge one micro-batch's partial bars into the stored bar table.
    Returns False if the batch was already applied (replay skipped).

    Exactly-once under foreachBatch's at-least-once replay: the id of the
    last applied batch is stamped on every stored row (`_applied_batch_id`
    column), so it commits atomically WITH the data in the same parquet
    write — a replayed batch (crash after commit, before checkpoint) sees
    its own id already in the store and skips, instead of double-counting
    volume/n_events. This is the standard idempotent-foreachBatch pattern;
    a side-car marker file would not be atomic with the overwrite.
    """
    key_cols = list(key_cols)
    partial = partial_bars(batch, key_cols, time_col, value_col, id_col, bar)
    if store_exists(spark, store_path):  # real read errors propagate —
        existing = spark.read.parquet(store_path)  # never truncate the store
        if "_applied_batch_id" in existing.columns:
            last = existing.agg(F.max("_applied_batch_id")).first()[0]
            if last is not None and batch_id <= last:
                return False  # replayed batch — already merged
            existing = existing.drop("_applied_batch_id")
        merged = combine_bars(partial.unionByName(existing), key_cols)
    else:  # first batch — store doesn't exist yet
        merged = combine_bars(partial, key_cols)
    merged = merged.withColumn("_applied_batch_id", F.lit(int(batch_id)))
    # materialize before overwriting the store we just read
    merged = merged.localCheckpoint()
    merged.write.mode("overwrite").parquet(store_path)
    try:
        merged._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass
    return True


def start_ohlc_stream(
    spark,
    stream: DataFrame,
    store_path: str,
    checkpoint_path: str,
    key_cols: Sequence[str],
    time_col: str,
    value_col: str,
    id_col: str,
    bar: str = "hour",
):
    """Continuously-maintained OHLC bar table (the hypertable
    continuous-aggregate pattern): each micro-batch computes its partial
    bars and merges them into the stored table — raw events are read once,
    ever. Restart-safe: the checkpoint replays unacknowledged batches and
    merge_bars_batch skips any batch id already stamped into the store.

    Local-mode note: the merge rewrites the whole (small) bar table; at
    scale you would partition the store by bar date and overwrite only the
    partitions the batch touched (dynamic partition overwrite) — bars are
    ~6 orders of magnitude smaller than events, so either way the merge
    cost is negligible next to the scan.
    """
    key_cols = list(key_cols)

    def _sink(batch: DataFrame, batch_id: int) -> None:
        merge_bars_batch(
            spark, batch, batch_id, store_path, key_cols,
            time_col, value_col, id_col, bar,
        )

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
