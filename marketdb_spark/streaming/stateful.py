"""Arbitrary stateful streaming folds via applyInPandasWithState — the
true unbounded-input analog of the reference's iteratee operators
(marketdb-iteratee/.../MarketIteratees.scala:6-55: counter, sequencer,
printer are incremental folds fed one time-ordered element at a time).

A GroupState per key holds the fold accumulator across micro-batches;
the watermark bounds state lifetime (GroupStateTimeout.EventTimeTimeout)
— the state-growth answer the reference never needed because its folds
ran over bounded scans (SURVEY §7 risk register).

Scale notes: state is partitioned by group key across executors (HDFS/
RocksDB-backed state store on a real cluster); each micro-batch shuffles
only new rows to their key's partition. Keys are (market, security)-like
— bounded cardinality, uniform.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Output: one row per (key, micro-batch) with the running fold values —
# the streaming counter (n_seen) + last/total folds in one pass.
def _out_schema(key_fields: Sequence[StructField]) -> StructType:
    return StructType(
        list(key_fields)
        + [
            StructField("n_seen", LongType()),
            StructField("last_value", DoubleType()),
            StructField("total", DoubleType()),
        ]
    )


_STATE_SCHEMA = StructType(
    [
        StructField("n_seen", LongType()),
        StructField("last_value", DoubleType()),
        StructField("total", DoubleType()),
        StructField("last_time", StringType()),
    ]
)


def running_fold_stream(
    df: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    value_col: str,
    state_timeout: bool = True,
) -> DataFrame:
    """Per-key incremental fold over an unbounded stream: emits the updated
    (n_seen, last_value, total) after every micro-batch touching the key.

    Within a batch, rows are folded in ``time_col`` order; `last_value`
    tracks the max-time row seen so far (the reference's per-series streams
    arrive time-ordered from the scanner merge; across micro-batches the
    watermark bounds disorder). Same fold body as the batch
    marketdb_spark.streaming.windows.running_fold — batch/stream parity is
    pinned by tests/test_streaming.py.
    """
    key_cols = list(key_cols)
    key_fields = [
        StructField(name, dtype)
        for name, dtype in zip(
            key_cols, [df.schema[c].dataType for c in key_cols]
        )
    ]
    out_schema = _out_schema(key_fields)

    def fold(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            n_seen, last_value, total, last_time = state.get
        else:
            n_seen, last_value, total, last_time = 0, float("nan"), 0.0, ""
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(time_col)
            n_seen += len(pdf)
            total += float(pdf[value_col].sum())
            t_max = str(pdf[time_col].iloc[-1])
            if t_max >= last_time:
                last_value = float(pdf[value_col].iloc[-1])
                last_time = t_max
        state.update((n_seen, last_value, total, last_time))
        if state_timeout:
            # expire a key's state one watermark past its last activity
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 60_000)
        yield pd.DataFrame(
            {
                **{c: [k] for c, k in zip(key_cols, key)},
                "n_seen": [n_seen],
                "last_value": [last_value],
                "total": [total],
            }
        )

    return df.groupBy(*key_cols).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if state_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )
