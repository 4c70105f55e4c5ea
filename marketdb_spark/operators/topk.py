"""Distributed top-k per group (SURVEY §2B "Sort / limit / top-k")."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column | str],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """row_number-and-filter top-k: one shuffle on the group key; AQE
    handles group-key skew. order_cols must include a unique tie-break for
    deterministic results."""
    w = W.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )
