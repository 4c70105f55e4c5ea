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
        ev_max_ms = 0
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(time_col)
            n_seen += len(pdf)
            total += float(pdf[value_col].sum())
            ev_max_ms = max(ev_max_ms, pdf[time_col].iloc[-1].value // 1_000_000)
            t_max = str(pdf[time_col].iloc[-1])
            if t_max >= last_time:
                last_value = float(pdf[value_col].iloc[-1])
                last_time = t_max
        state.update((n_seen, last_value, total, last_time))
        if state_timeout:
            # Expire a key one minute past its last activity IN EVENT TIME.
            # The anchor must be max(watermark, this batch's own max event
            # time): in the first batches the watermark is still 0 (it lags
            # one batch), and anchoring there would set an epoch-1970
            # timeout that instantly expires the state as soon as the
            # watermark advances — including across a checkpoint restart.
            anchor = max(state.getCurrentWatermarkMs(), ev_max_ms)
            state.setTimeoutTimestamp(anchor + 60_000)
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


# --- transformWithStateInPandas (Spark 4 stateful API) ---------------------
# Same running-fold semantics as running_fold_stream, on the newer
# StatefulProcessor interface: typed named state slots (ValueState) instead
# of one opaque state tuple, explicit timers, and TTL support — the closest
# Spark analog yet of the reference's resumable iteratee objects
# (marketdb-iteratee/.../MarketIteratees.scala:6-55, whose Cont/Done states
# are exactly a value-state + emission protocol).

from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)

_TWS_STATE_DDL = "n_seen BIGINT, last_value DOUBLE, total DOUBLE, last_time STRING"


class _RunningFoldProcessor(StatefulProcessor):
    """Per-key (n_seen, last_value, total) fold; one output row per
    (key, micro-batch). Keys are hash-partitioned across the cluster's
    state store; each batch shuffles only its new rows."""

    def __init__(self, key_cols: Sequence[str], time_col: str, value_col: str):
        self._key_cols = list(key_cols)
        self._time_col = time_col
        self._value_col = value_col

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("fold", _TWS_STATE_DDL)

    def handleInputRows(self, key, rows, timerValues):
        if self._state.exists():
            n_seen, last_value, total, last_time = self._state.get()
        else:
            n_seen, last_value, total, last_time = 0, float("nan"), 0.0, ""
        for pdf in rows:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(self._time_col)
            n_seen += len(pdf)
            total += float(pdf[self._value_col].sum())
            t_max = str(pdf[self._time_col].iloc[-1])
            if t_max >= last_time:
                last_value = float(pdf[self._value_col].iloc[-1])
                last_time = t_max
        self._state.update((n_seen, last_value, total, last_time))
        yield pd.DataFrame(
            {
                **{c: [k] for c, k in zip(self._key_cols, key)},
                "n_seen": [n_seen],
                "last_value": [last_value],
                "total": [total],
            }
        )

    def close(self) -> None:
        pass


def running_fold_tws(
    df: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    value_col: str,
) -> DataFrame:
    """running_fold_stream on the Spark 4 transformWithStateInPandas API.

    Emits in Update mode (one refreshed row per key per batch). Batch/stream
    parity with the applyInPandasWithState fold is pinned by
    tests/test_streaming.py.

    Runtime requirements: the RocksDB state store provider
    (spark.sql.streaming.stateStore.providerClass) and the protobuf package
    (the state protocol between the Python worker and the JVM state server
    is protobuf-framed) — the test gates on both.
    """
    key_fields = [
        StructField(name, df.schema[name].dataType) for name in key_cols
    ]
    return df.groupBy(*key_cols).transformWithStateInPandas(
        statefulProcessor=_RunningFoldProcessor(key_cols, time_col, value_col),
        outputStructType=_out_schema(key_fields),
        outputMode="Update",
        timeMode="None",
    )
