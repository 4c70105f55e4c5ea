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
        # watermark (ms) at the last call that saw input rows or held/
        # flushed trades for this key — the quote TTL clock. Lets a timeout
        # invocation tell the trade-flush wake (wm+1) apart from genuine
        # quote expiry: only the latter may drop surviving quotes.
        StructField("last_active_wm", LongType()),
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
    return asof_join_stream_tagged(
        tagged_trades.unionByName(tagged_quotes),
        watermark=watermark,
        tolerance_us=tolerance_us,
        quote_ttl_ms=quote_ttl_ms,
        key_out=key_col,
    )


def asof_join_stream_tagged(
    tagged: DataFrame,
    watermark: str = "10 minutes",
    tolerance_us: int | None = None,
    quote_ttl_ms: int = 3_600_000,
    key_out: str = "k",
) -> DataFrame:
    """As-of join over a PRE-TAGGED stream with columns
    (k, ts, kind∈{'t','q'}, ev_id, px). When both sides derive from one
    source (e.g. an event-type split of the same table), tagging with a
    CASE expression and calling this directly halves the source scans —
    asof_join_stream would plan the file scan once per side per
    micro-batch."""
    unioned = tagged.withWatermark("ts", watermark)

    out_schema = StructType(
        [
            StructField("k", tagged.schema["k"].dataType),
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
        # everything below is numpy-vectorized: the fold touches each
        # micro-batch row a constant number of times in C, never in a
        # Python-level per-row loop (100k-row batches cost ~ms, not sec)
        import numpy as np

        if state.exists:
            g = state.get
            sq_ts = np.asarray(g[0], dtype="int64")
            sq_px = np.asarray(g[1], dtype="float64")
            st_ts = np.asarray(g[2], dtype="int64")
            st_id = np.asarray(g[3], dtype="int64")
            st_px = np.asarray(g[4], dtype="float64")
            prev_active_ms = int(g[5]) if g[5] is not None else 0
        else:
            sq_ts = st_ts = st_id = np.empty(0, dtype="int64")
            sq_px = st_px = np.empty(0, dtype="float64")
            prev_active_ms = 0

        had_input = False
        new_q, new_t = [], []
        for pdf in pdfs:
            if pdf.empty:
                continue
            had_input = True
            ts_us = (pdf["ts"].astype("int64") // 1000).to_numpy()  # ns → µs
            is_q = pdf["kind"].eq("q").to_numpy()
            px = pdf["px"].to_numpy(dtype="float64")
            new_q.append((ts_us[is_q], px[is_q]))
            is_t = ~is_q
            # ev_id is null on the quote side, so the column may arrive as
            # float64; trades always carry a real id
            ids_t = pdf["ev_id"].fillna(-1).astype("int64").to_numpy()[is_t]
            new_t.append((ts_us[is_t], ids_t, px[is_t]))

        q_ts = np.concatenate([sq_ts] + [q[0] for q in new_q])
        q_px = np.concatenate([sq_px] + [q[1] for q in new_q])
        t_ts = np.concatenate([st_ts] + [t[0] for t in new_t])
        t_id = np.concatenate([st_id] + [t[1] for t in new_t])
        t_px = np.concatenate([st_px] + [t[2] for t in new_t])

        # quotes sorted by (ts, px): ties on ts resolve to max px (the
        # rightmost searchsorted hit), matching the oracle's MAX(value)
        # per (key, ts)
        order = np.lexsort((q_px, q_ts))
        q_ts, q_px = q_ts[order], q_px[order]

        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000
        ready = t_ts <= wm_us
        r_ts, r_id, r_px = t_ts[ready], t_id[ready], t_px[ready]
        t_ts, t_id, t_px = t_ts[~ready], t_id[~ready], t_px[~ready]

        if len(q_ts):
            j = np.searchsorted(q_ts, r_ts, side="right") - 1
            jm = np.clip(j, 0, None)
            matched = j >= 0
            if tolerance_us is not None:
                matched &= q_ts[jm] >= r_ts - tolerance_us
            out_q_ts, out_q_px = q_ts[jm], q_px[jm]
        else:
            matched = np.zeros(len(r_ts), dtype=bool)
            out_q_ts = np.zeros(len(r_ts), dtype="int64")
            out_q_px = np.zeros(len(r_ts), dtype="float64")

        # evict quotes unreachable from any future trade: future trades
        # have ts > horizon, so keep quotes in (horizon - tolerance, ∞)
        # plus the single latest quote at-or-before that bound
        horizon = int(min([wm_us] + t_ts.tolist())) if len(t_ts) else wm_us
        bound = horizon - tolerance_us if tolerance_us is not None else horizon
        cut = int(np.searchsorted(q_ts, bound, side="right")) - 1
        if cut > 0:
            keep_from = (
                cut
                if tolerance_us is None
                else max(int(np.searchsorted(q_ts, bound, side="left")) - 1, 0)
            )
            q_ts, q_px = q_ts[keep_from:], q_px[keep_from:]

        # the TTL clock restarts whenever the key sees input or holds/
        # flushes a trade; a bare timeout wake leaves it running
        active = had_input or len(r_ts) or len(t_ts)
        last_active_ms = wm_ms if active else prev_active_ms
        # a timeout only evicts quote-only state when it was genuinely the
        # quote TTL that fired — NOT the wm+1 trade-flush wake (which also
        # lands here once all held trades drain; dropping the quotes there
        # would NULL-join a later trade, breaking ASOF LEFT semantics)
        ttl_expired = (
            state.hasTimedOut
            and not active
            and wm_ms >= prev_active_ms + quote_ttl_ms
        )
        if not len(t_ts) and (ttl_expired or not len(q_ts)):
            if state.exists:
                state.remove()
        else:
            state.update(
                (
                    q_ts.tolist(), q_px.tolist(), t_ts.tolist(),
                    t_id.tolist(), t_px.tolist(), last_active_ms,
                )
            )
            # held trades: wake on the very next watermark advance;
            # quote-only state: expire TTL after the last activity
            state.setTimeoutTimestamp(
                wm_ms + 1 if len(t_ts) else last_active_ms + quote_ttl_ms
            )

        if len(r_ts):
            # nullable arrays carry the unmatched rows as true NULLs (a
            # float NaN would stay NaN through Arrow, not become NULL)
            yield pd.DataFrame(
                {
                    "k": np.repeat(key[0], len(r_ts)),
                    "trade_id": r_id,
                    "t_ts_us": r_ts,
                    "trade_px": r_px,
                    "q_ts_us": pd.arrays.IntegerArray(
                        out_q_ts.astype("int64"), mask=~matched
                    ),
                    "quote_px": pd.arrays.FloatingArray(
                        out_q_px.astype("float64"), mask=~matched
                    ),
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
        .withColumnRenamed("k", key_out)
    )
