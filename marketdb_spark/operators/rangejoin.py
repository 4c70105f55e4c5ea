"""Cell-bucketed range join: interval ⋈ point with NO shared equi key.

A pure range predicate (`point BETWEEN start AND end`) gives Catalyst no
equi key, so the naive plan is BroadcastNestedLoopJoin / CartesianProduct
— O(|intervals|·|points|), the join that cannot ship at 100 TB. The
scalable form MANUFACTURES an equi key: explode each interval into the
coarse time cells it spans, key each point by its own cell, hash-join on
the cell, then apply the exact range predicate. Work becomes
O(|points| + Σ interval_cells + |candidate pairs|); the cell width dials
selectivity (one cell ≈ interval width keeps the explode factor ~2).

Each point lives in EXACTLY ONE cell, so a qualifying (interval, point)
pair meets in exactly one cell — no post-join dedup is needed (contrast
band-join formulations that must dedup across overlapping bands).

This is the generalization of the reference's day-expanded scans
(interval → per-day key ranges, MarketDB.scala:66-78 + the Joda interval
split): the reference expands the QUERY interval into day keys; here the
DATA intervals expand so two unkeyed sets can meet on a hash join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_UNIT_SECONDS = {
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 604800,
}


def _parse_cell_width_us(cell: str, who: str) -> int:
    """Parse '<n> <unit>' into an exact microsecond width. One parser for
    every operator in this module — the two join shapes MUST agree on the
    grid, so the spec grammar lives in one place. Rejects variable-width
    units (month/year), non-integer multiples, and non-positive widths
    (width 0 would make pmod NULL/raise and silently empty the join)."""
    n_str, _, unit_str = cell.strip().partition(" ")
    unit = unit_str.strip().rstrip("s")
    if unit not in _UNIT_SECONDS:
        raise ValueError(
            f"{who} cell unit must be fixed-width "
            f"{sorted(_UNIT_SECONDS)}, got {cell!r}"
        )
    try:
        n = int(n_str)
    except ValueError:
        raise ValueError(
            f"{who} cell multiple must be a positive integer, got {cell!r}"
        ) from None
    if n <= 0:
        raise ValueError(
            f"{who} cell multiple must be a positive integer, got {cell!r}"
        )
    return n * _UNIT_SECONDS[unit] * 1_000_000


def _cell_of(col: Column, width_us: int) -> Column:
    """Epoch-anchored cell id: epoch_micros − epoch_micros mod width.
    Exact int64 arithmetic — no double division whose rounding could flip
    a boundary bucket. The timestamp cast: unix_micros rejects
    TIMESTAMP_NTZ/DATE; the session-tz shift this applies to NTZ values
    is identical on both sides of any join, so grid alignment (the thing
    that matters) is unaffected."""
    us = F.unix_micros(col.cast("timestamp"))
    return us - F.pmod(us, F.lit(width_us))


def cell_range_join(
    intervals: DataFrame,
    points: DataFrame,
    start_col: str,
    end_col: str,
    point_col: str,
    cell: str = "1 day",
    end_inclusive: bool = False,
) -> DataFrame:
    """Join every interval row to every point row with
    start <= point < end (or <= end when ``end_inclusive``), via
    cell-bucketed hash join — no cartesian/BNLJ anywhere in the plan.

    ``cell`` is ``"<n> <unit>"`` with a FIXED-WIDTH unit
    (second/minute/hour/day/week — month/year vary in length and are
    rejected). Both sides bucket onto the same epoch-anchored grid
    (cell id = epoch_micros − epoch_micros mod width), so multi-unit
    cells like '2 days' or '6 hours' share one phase: an interval's
    exploded cells and a point's single cell can never sit on offset
    grids. All arithmetic is exact int64 (unix_micros + pmod) — no
    double division whose rounding could flip a boundary bucket.
    Columns from both inputs are carried through; callers
    project/aggregate after."""
    width_us = _parse_cell_width_us(cell, "cell_range_join")

    def cell_of(col: str) -> Column:
        return _cell_of(F.col(col), width_us)

    cells = F.sequence(
        cell_of(start_col), cell_of(end_col), F.lit(width_us)
    )
    iv = intervals.withColumn("__cell", F.explode(cells))
    pt = points.withColumn("__cell", cell_of(point_col))
    upper = (
        F.col(point_col) <= F.col(end_col)
        if end_inclusive
        else F.col(point_col) < F.col(end_col)
    )
    return (
        iv.join(pt, "__cell")
        .filter((F.col(point_col) >= F.col(start_col)) & upper)
        .drop("__cell")
    )


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    cell: str = "1 day",
) -> DataFrame:
    """Interval ⋈ interval OVERLAP join (a.start < b.end AND
    b.start < a.end, half-open intervals) with no shared equi key, via
    the same manufactured-cell-key device as cell_range_join: BOTH sides
    explode onto one epoch-anchored grid and hash-join on the cell.

    An overlapping pair shares every cell in [cell(max(starts)),
    cell(min(ends))] — joining on cells alone would duplicate it. Instead
    of a post-join dedup shuffle, each pair is counted EXACTLY ONCE at
    its anchor cell — cell(greatest(a.start, b.start)) — which both
    exploded sequences provably contain (greatest(starts) lies inside
    both intervals): a filter, not a distinct.

    Column names must be disjoint between a and b (alias before calling).
    PRECONDITION (both operators in this module): start <= end on every
    row — F.sequence raises on a negative span, surfacing malformed
    intervals instead of silently dropping them. Work is
    O(Σ cells_a + Σ cells_b + |cell-collision candidates|); cell width ≈
    typical interval width keeps the explode factor ~2 and the candidate
    set near the true result size."""
    width_us = _parse_cell_width_us(cell, "interval_overlap_join")

    def cell_of(col: Column) -> Column:
        return _cell_of(col, width_us)

    def explode_cells(df: DataFrame, start: str, end: str) -> DataFrame:
        return df.withColumn(
            "__cell",
            F.explode(
                F.sequence(
                    cell_of(F.col(start)), cell_of(F.col(end)), F.lit(width_us)
                )
            ),
        )

    overlap = (F.col(a_start) < F.col(b_end)) & (
        F.col(b_start) < F.col(a_end)
    )
    anchor = cell_of(F.greatest(F.col(a_start), F.col(b_start)))
    return (
        explode_cells(a, a_start, a_end)
        .join(explode_cells(b, b_start, b_end), "__cell")
        .filter(overlap & (F.col("__cell") == anchor))
        .drop("__cell")
    )
