"""Storage-layout queries: the write paths driven through the oracle gate.

The store operators (sources/store.py, sources/zorder.py) are exercised by
round-trip queries — write the clustered layout to a temp location, read
it back, and aggregate — so the driver's hash gate proves the layout
transformations are LOSSLESS, while the layout's pruning properties are
pinned by tests/test_scale.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marketdb_spark.catalog import load
from marketdb_spark.functions.exact import dsum
from marketdb_spark.queries.registry import query


@query(
    "store_zorder_scan",
    oracle="""
    SELECT l_partkey,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
    FROM lineitem
    WHERE l_partkey <= 200 AND l_orderkey <= 30000
    GROUP BY l_partkey
    """,
)
def store_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through the z-order clustered store (sources/zorder.py):
    lineitem is written clustered on the Morton interleave of
    (l_orderkey, l_partkey), read back, filtered on BOTH clustered
    dimensions, and aggregated — hash-equal to the same computation on
    the raw table, proving the multi-dimensional clustering is a pure
    layout change (the N-dim generalization of the reference's composite
    row key, Trade.scala:22-30). The filter on each z-ordered column
    prunes row groups via the min/max stats the clustering concentrates;
    coverage evidence in tests/test_scale.py::TestZOrder."""
    import shutil
    import tempfile

    from marketdb_spark.sources.zorder import zorder_write

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    work = tempfile.mkdtemp(prefix="zorder_store_")
    try:
        zorder_write(li, f"{work}/li", ["l_orderkey", "l_partkey"], n_files=16)
        out = (
            spark.read.parquet(f"{work}/li")
            .filter((F.col("l_partkey") <= 200) & (F.col("l_orderkey") <= 30000))
            .groupBy("l_partkey")
            .agg(
                F.count("*").alias("n_lines"),
                dsum("l_quantity", scale=6).alias("sum_qty"),
                dsum("l_extendedprice", scale=6).alias("sum_price"),
            )
        )
        # detach from the temp files so the caller can evaluate lazily
        return out.localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)
