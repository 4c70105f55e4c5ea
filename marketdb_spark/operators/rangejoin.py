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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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

    ``cell`` must be a day-multiple or sub-day interval understood by
    date_trunc/sequence ('1 day', '1 hour', ...). Columns from both
    inputs are carried through; callers project/aggregate after."""
    unit = cell.split()[-1].rstrip("s")  # '1 day' -> 'day' for date_trunc
    step = F.expr(f"interval {cell}")
    cells = F.sequence(
        F.date_trunc(unit, F.col(start_col)),
        F.date_trunc(unit, F.col(end_col)),
        step,
    )
    iv = intervals.withColumn("__cell", F.explode(cells))
    pt = points.withColumn("__cell", F.date_trunc(unit, F.col(point_col)))
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
