"""As-of join — the backtesting staple the reference expresses by merging
trade and order series into one time-ordered stream and folding over it
(marketdb-iteratee/.../TimeSeriesEnumerator.scala:48-99; heterogeneous merge
test MultipleTimeSeriesEnumeratorTest.scala:137-186).

Spark has no built-in as-of join. This implementation is the *union trick*:
tag both sides, union on a common schema, and take ``last(right, ignorenulls)``
over a window ordered by (time, side) — i.e. exactly the reference's k-way
merge followed by a stateful "remember the latest right row" fold.

Scale properties: ONE shuffle (on the join key), no UDF, no broadcast of
either side, and skew behaves like any window over the key. This beats the
`merge_asof`-in-`applyInPandas` alternative (which materializes each key
group in pandas) whenever groups are large; at 100 TB the window form
streams through each key partition sorted, spilling via the sort machinery.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _orderable(dt: T.DataType) -> bool:
    """Spark can ORDER BY any type except MapType (at any nesting depth)."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    return True


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    right_cols: Sequence[str] | None = None,
    suffix: str = "_right",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row with equal join keys:
    ``direction='backward'`` (default) matches the most recent right row at
    or before left.time — inclusive, matching the reference's end-inclusive
    interval semantics (MarketDB.scala:80); ``direction='forward'`` matches
    the earliest right row at or after left.time.

    right_cols: columns of ``right`` to carry (default: all non-key,
    non-time). They appear suffixed on the output, plus
    ``{right_time}{suffix}`` for the matched timestamp.

    tolerance_seconds: bounded staleness (pandas merge_asof semantics): the
    nearest match is kept only if |left.time - right.time| ≤ tolerance —
    otherwise the left row gets NULLs. There is no fall-forward to older
    rows; a quote staler than the tolerance means "no quote". Applied as a
    post-predicate on the matched payload, so the plan shape (one shuffle,
    window scan) is unchanged.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*on, right_time)]
    payload = F.struct(
        F.col(right_time).alias("__t"), *[F.col(c) for c in right_cols]
    )

    left_tagged = left.withColumn("__is_left", F.lit(1)).withColumn(
        "__payload", F.lit(None).cast(right.select(payload).schema[0].dataType)
    ).withColumn("__time", F.col(left_time))
    right_tagged = (
        right.select(*on, payload.alias("__payload"), F.col(right_time).alias("__time"))
        .withColumn("__is_left", F.lit(0))
    )

    unioned = left_tagged.unionByName(right_tagged, allowMissingColumns=True)
    # Deterministic tie-break among right rows sharing (key, time): order by
    # the full payload struct — the generalization of the reference's stable
    # (time, id) ordering (TimeSeriesEnumerator.scala:56-58). backward/last
    # then always matches the MAX payload of the tied set, forward/first the
    # MIN. Skipped only if the payload contains a MapType (not orderable);
    # left rows (null payload) are unaffected — __is_left already places them.
    payload_type = right.select(payload).schema[0].dataType
    tie = [F.col("__payload")] if _orderable(payload_type) else []
    if direction == "backward":
        # Right rows sort before left rows at equal time → a right row at
        # exactly left.time is visible to it (inclusive bound).
        w = (
            W.partitionBy(*on)
            .orderBy(F.col("__time"), F.col("__is_left"), *tie)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        match = F.last("__payload", ignorenulls=True).over(w)
    else:
        # Forward: left rows sort before right rows at equal time, and we
        # take the first right payload at-or-after the current row.
        w = (
            W.partitionBy(*on)
            .orderBy(F.col("__time"), F.desc("__is_left"), *tie)
            .rowsBetween(W.currentRow, W.unboundedFollowing)
        )
        match = F.first("__payload", ignorenulls=True).over(w)
    matched = unioned.withColumn("__match", match).filter(F.col("__is_left") == 1)
    if tolerance_seconds is not None:
        # epoch-seconds delta as double: sub-second precision preserved
        delta = F.abs(
            F.col("__time").cast("double") - F.col("__match.__t").cast("double")
        )
        matched = matched.withColumn(
            "__match", F.when(delta <= F.lit(float(tolerance_seconds)), F.col("__match"))
        )

    out_cols: list[Column] = [F.col(c) for c in left.columns]
    out_cols.append(F.col("__match.__t").alias(f"{right_time}{suffix}"))
    out_cols.extend(F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in right_cols)
    return matched.select(*out_cols)
