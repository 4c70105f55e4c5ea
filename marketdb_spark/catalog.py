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

    `events.ts` is physically a naive parquet timestamp (generations have
    shipped both TIMESTAMP(NANOS) and TIMESTAMP(MICROS, isAdjustedToUTC=
    false)); normalize every variant to session-TZ TIMESTAMP so event-time
    ops (withWatermark, window) work and oracles (DuckDB's naive
    TIMESTAMP) compare equal. Sub-µs precision is below the reference's
    data model, which is epoch-millis — marketdb-api/.../model/
    Market.scala:29-35."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # nanos-generation data needs this to read at all (as a long); a no-op
    # for the micros generation.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":  # TIMESTAMP(NANOS) read as long: ns → µs
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # naive µs: reinterpret wall-clock in the session TZ. toPandas
            # round-trips through the same TZ, so oracle values are
            # TZ-invariant; the tuned session pins UTC anyway.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the spark.sql path."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
