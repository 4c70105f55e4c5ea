"""Physical-plan inspection helpers — the engine's "did Catalyst do what
we designed for" surface. Used by tests to pin the scale-critical plan
properties (SURVEY §4): predicate pushdown to parquet, partition pruning,
column pruning, broadcast of dimension tables, shuffle counts.

These checks are the Spark analog of the reference's storage-access
guarantees: the HBase scan key range (MarketDB.scala:79-82) must become
`PushedFilters` on the parquet scan, or a 100 TB query reads 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """explain('formatted') as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter predicates that reached the parquet reader."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out.extend(p.strip() for p in m.group(1).split(",") if p.strip())
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (column pruning check)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols.extend(
            c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()
        )
    return cols


def count_broadcast_joins(df: DataFrame) -> int:
    return physical_plan(df).count("BroadcastHashJoin")


def count_shuffles(df: DataFrame) -> int:
    """Exchange operators in the plan (AQE may later coalesce/elide some)."""
    plan = physical_plan(df)
    return len(re.findall(r"Exchange (hashpartitioning|rangepartitioning|SinglePartition)", plan))


def uses_take_ordered(df: DataFrame) -> bool:
    """Global ORDER BY + LIMIT should plan TakeOrderedAndProject, never a
    full sort."""
    return "TakeOrderedAndProject" in physical_plan(df)
