"""Set-operator surface (SURVEY §2B "Set operators"): union (the k-way
merge precursor, reference TimeSeriesEnumerator.scala:48-99), intersect,
except, and exact dedup via dropDuplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marketdb_spark.catalog import load
from marketdb_spark.queries.registry import query


@query(
    "set_union_all_parties",
    oracle="""
    SELECT party_key, party_kind, COUNT(*) AS n
    FROM (
      SELECT c_custkey AS party_key, 'customer' AS party_kind FROM customer
      UNION ALL
      SELECT s_suppkey AS party_key, 'supplier' AS party_kind FROM supplier
    )
    GROUP BY party_key, party_kind
    """,
)
def set_union_all_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL by name over heterogeneous inputs projected to a common
    superschema — the reference's heterogeneous trades+orders merge
    (MultipleTimeSeriesEnumeratorTest.scala:137-186) in relational form."""
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("party_key"), F.lit("customer").alias("party_kind")
    )
    supp = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("party_key"), F.lit("supplier").alias("party_kind")
    )
    return cust.unionByName(supp).groupBy("party_key", "party_kind").agg(
        F.count("*").alias("n")
    )


@query(
    "set_intersect_keys",
    oracle="""
    SELECT custkey FROM (
      SELECT c_custkey AS custkey FROM customer
      INTERSECT
      SELECT o_custkey AS custkey FROM orders
    )
    """,
)
def set_intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) of customer keys that appear in orders."""
    cust = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    ords = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return cust.intersect(ords)


@query(
    "set_except_keys",
    oracle="""
    SELECT custkey FROM (
      SELECT c_custkey AS custkey FROM customer
      EXCEPT
      SELECT o_custkey AS custkey FROM orders
    )
    """,
)
def set_except_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customers that never ordered."""
    cust = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    ords = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return cust.subtract(ords)  # EXCEPT DISTINCT


@query(
    "set_intersect_all_keys",
    oracle="""
    SELECT custkey FROM (
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT ALL
      SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000
    )
    """,
)
def set_intersect_all_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiplicity-preserving)."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.filter(F.col("o_totalprice") > 100000).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersectAll(b)


@query(
    "set_except_all_keys",
    oracle="""
    SELECT custkey FROM (
      SELECT o_custkey AS custkey FROM orders
      EXCEPT ALL
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    )
    """,
)
def set_except_all_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference)."""
    o = load(spark, sf_dir, "orders")
    a = o.select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.exceptAll(b)


@query(
    "set_dropdup_events",
    oracle="""
    SELECT user_id, event_type, COUNT(*) AS n_distinct_days
    FROM (
      SELECT DISTINCT user_id, event_type, CAST(ts AS DATE) AS day
      FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events) events
    )
    GROUP BY user_id, event_type
    """,
)
def set_dropdup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a key subset (dropDuplicates) then count — the
    idempotent-by-key re-ingest semantic (reference: deterministic
    row+qualifier, Trade.scala:56-57; SURVEY §3.3)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.select("user_id", "event_type", F.col("ts").cast("date").alias("day"))
        .dropDuplicates(["user_id", "event_type", "day"])
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n_distinct_days"))
    )
