"""Watermark-safe streaming as-of join (SURVEY §7 risk register).

The batch as-of (operators/asof.py) rides a union + last-value window,
which Structured Streaming cannot execute incrementally. This is the
streaming form: tag quote and trade streams, union them, group by the
series key, and run an applyInPandasWithState fold that

- buffers BOTH sides per key,
- holds each trade until the event-time watermark passes its timestamp
  (by then every quote at-or-before it has arrived — the same guarantee
  the reference gets from its time-ordered scanner merge,
  marketdb-iteratee/.../TimeSeriesEnumerator.scala:36-46, but under
  out-of-order delivery),
- emits the trade matched to the latest quote with q_ts <= t_ts
  (optionally within a tolerance), left-join semantics: no quote → nulls,
- then evicts every quote no longer reachable by any future trade: state
  per key is O(late window), NOT O(stream length).

Scale notes: one shuffle on the series key into the state store; state is
per-key and watermark-bounded; each micro-batch moves only its new rows.
The no-data micro-batch Spark runs after a watermark advance fires the
event-time timeout, which flushes trades that became ready without new
input — this is what makes a bounded (availableNow) run emit its tail.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_STATE_SCHEMA = StructType(
    [
        StructField("q_ts", ArrayType(LongType())),   # µs, sorted ascending
        StructField("q_px", ArrayType(DoubleType())),
        StructField("t_ts", ArrayType(LongType())),   # µs, unordered buffer
        StructField("t_id", ArrayType(LongType())),
        StructField("t_px", ArrayType(DoubleType())),
    ]
)


def asof_join_stream(
    trades: DataFrame,
    quotes: DataFrame,
    key_col: str,
    time_col: str,
    id_col: str,
    trade_value_col: str,
    quote_value_col: str,
    watermark: str = "10 minutes",
    tolerance_us: int | None = None,
    quote_ttl_ms: int = 3_600_000,
) -> DataFrame:
    """Join a trade stream to the most recent quote per key, streaming.

    Pass the inputs UN-watermarked: the single watermark is applied here,
    after the union, so one watermark node governs both sides. (Separate
    per-input watermarks fall under Spark's multiple-watermark MIN policy
    — a quiet or exhausted side then pins the global watermark and the
    other side's trades are never released.) Returns long-µs timestamps
    (t_ts_us, q_ts_us) — callers convert with ``F.timestamp_micros`` so
    no precision is lost in flight.

    Quote ties on (key, ts) resolve to the max value on both this and the
    oracle side. ``quote_ttl_ms`` bounds how long a quote-only key keeps
    state after its last activity."""
    tagged_trades = trades.select(
        F.col(key_col).alias("k"),
        F.col(time_col).alias("ts"),
        F.lit("t").alias("kind"),
        F.col(id_col).cast("long").alias("ev_id"),
        F.col(trade_value_col).cast("double").alias("px"),
    )
    tagged_quotes = quotes.select(
        F.col(key_col).alias("k"),
        F.col(time_col).alias("ts"),
        F.lit("q").alias("kind"),
        F.lit(None).cast("long").alias("ev_id"),
        F.col(quote_value_col).cast("double").alias("px"),
    )
    unioned = tagged_trades.unionByName(tagged_quotes).withWatermark(
        "ts", watermark
    )

    out_schema = StructType(
        [
            StructField("k", trades.schema[key_col].dataType),
            StructField("trade_id", LongType()),
            StructField("t_ts_us", LongType()),
            StructField("trade_px", DoubleType()),
            StructField("q_ts_us", LongType()),
            StructField("quote_px", DoubleType()),
        ]
    )

    def fold(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            q_ts, q_px, t_ts, t_id, t_px = (list(x) for x in state.get)
        else:
            q_ts, q_px, t_ts, t_id, t_px = [], [], [], [], []

        for pdf in pdfs:
            if pdf.empty:
                continue
            ts_us = pdf["ts"].astype("int64") // 1000  # ns → µs
            is_q = (pdf["kind"] == "q").to_numpy()
            for t, k_, i, p in zip(
                ts_us, is_q, pdf["ev_id"].to_numpy(), pdf["px"].to_numpy()
            ):
                if k_:
                    q_ts.append(int(t)), q_px.append(float(p))
                else:
                    t_ts.append(int(t))
                    t_id.append(int(i))
                    t_px.append(float(p))

        # quotes sorted by (ts, px): ties on ts resolve to max px (the
        # rightmost hit), matching the oracle's MAX(value) per (key, ts)
        order = sorted(range(len(q_ts)), key=lambda i: (q_ts[i], q_px[i]))
        q_ts = [q_ts[i] for i in order]
        q_px = [q_px[i] for i in order]

        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000
        ready = sorted(
            (i for i in range(len(t_ts)) if t_ts[i] <= wm_us),
            key=lambda i: t_ts[i],
        )
        held = [i for i in range(len(t_ts)) if t_ts[i] > wm_us]

        import bisect

        rows = []
        for i in ready:
            j = bisect.bisect_right(q_ts, t_ts[i]) - 1
            if j >= 0 and (
                tolerance_us is None or q_ts[j] >= t_ts[i] - tolerance_us
            ):
                rows.append((t_id[i], t_ts[i], t_px[i], q_ts[j], q_px[j]))
            else:
                rows.append((t_id[i], t_ts[i], t_px[i], None, None))

        t_ts, t_id, t_px = (
            [t_ts[i] for i in held],
            [t_id[i] for i in held],
            [t_px[i] for i in held],
        )

        # evict quotes unreachable from any future trade: future trades
        # have ts > horizon, so keep quotes in (horizon - tolerance, ∞)
        # plus the single latest quote at-or-before that bound
        horizon = min([wm_us] + t_ts) if t_ts else wm_us
        bound = horizon - tolerance_us if tolerance_us is not None else horizon
        cut = bisect.bisect_right(q_ts, bound) - 1
        if cut > 0:
            keep_from = cut if tolerance_us is None else bisect.bisect_left(q_ts, bound)
            if tolerance_us is not None and keep_from > 0:
                keep_from -= 1  # retain one quote at/below the bound
            q_ts, q_px = q_ts[keep_from:], q_px[keep_from:]

        if not t_ts and (state.hasTimedOut or not q_ts):
            if state.exists:
                state.remove()
        else:
            state.update((q_ts, q_px, t_ts, t_id, t_px))
            # held trades: wake on the very next watermark advance;
            # quote-only state: expire after the TTL
            state.setTimeoutTimestamp(wm_ms + (1 if t_ts else quote_ttl_ms))

        if rows:
            tid, tts, tpx, qts, qpx = zip(*rows)
            yield pd.DataFrame(
                {
                    "k": [key[0]] * len(rows),
                    "trade_id": tid,
                    "t_ts_us": tts,
                    "trade_px": tpx,
                    "q_ts_us": pd.array(qts, dtype="Int64"),
                    "quote_px": qpx,
                }
            )

    return (
        unioned.groupBy("k")
        .applyInPandasWithState(
            fold,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
        .withColumnRenamed("k", key_col)
    )
