"""Table catalog over the driver-generated parquet test data.

``load(spark, sf_dir, name)`` is the single scan entry point — every query
goes through it so partition pruning / filter pushdown behavior is uniform
(this is the Spark analog of the reference's HBase range-scan source,
marketdb-iteratee/.../TimeSeriesEnumerator.scala:36-46).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Column pruning + predicate pushdown are applied by
    Catalyst on top of this — callers just select/filter declaratively.

    `events.ts` is physically TIMESTAMP(NANOS); Spark reads it as a long
    (spark.sql.legacy.parquet.nanosAsLong) and we truncate to µs — the same
    floor semantics as DuckDB's TIMESTAMP_NS→TIMESTAMP cast, so oracles
    compare equal. (Sub-µs precision is below the reference's data model,
    which is epoch-millis — marketdb-api/.../model/Market.scala:29-35.)"""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the spark.sql path."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
