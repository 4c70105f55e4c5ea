"""Bucketed fact tables — the 100 TB answer to the fact⋈fact shuffle.

`orders ⋈ lineitem ON orderkey` shuffles both sides on every query; at
100 TB that shuffle IS the bottleneck (SURVEY §2B scale notes). Writing
both facts bucketed by the join key co-locates matching rows at write
time, so Catalyst plans a SortMergeJoin with ZERO Exchange on either side
— pinned by tests/test_sources.py::TestBucketed.

This is the Spark analog of the reference's key-prefix co-location: all
events of one instrument share an HBase region (row key prefix,
Trade.scala:22-30); here all rows of one order share a bucket file pair.

Bucketing requires the session catalog (`saveAsTable` — plain
`.parquet(path)` cannot record bucket metadata). Sort within buckets by
the join key so the SMJ's sort is also free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed catalog table (overwrites).

    The input is hash-repartitioned by the bucket column into exactly
    ``n_buckets`` partitions first: repartition and the bucket spec use
    the same HashPartitioning (murmur3 pmod n), so write partition i
    holds exactly bucket i — each task sorts and writes ONE bucket file
    in parallel instead of one task emitting all buckets, and the table
    lands as exactly n_buckets files rather than (input tasks × buckets)
    small files (guide §6: without the cluster-before-write every scan
    task opens a writer per bucket it sees)."""
    writer = (
        df.repartition(n_buckets, bucket_col)
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(sort_col or bucket_col)
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str] | str,
    force_smj: bool = False,
) -> DataFrame:
    """Join two same-bucketed tables — no Exchange when bucket specs match
    and spark.sql.sources.bucketing.enabled (default true).

    force_smj adds a merge hint: at test scale one side fits the broadcast
    threshold and Catalyst would (correctly) broadcast instead, hiding the
    bucketing path this function exists for; at fact×fact scale the hint is
    unnecessary."""
    left = spark.table(left_table)
    if force_smj:
        left = left.hint("merge")
    return left.join(spark.table(right_table), on=on)
