"""Window-function surface (SURVEY §2B "Window functions"): ranking,
analytic lag/lead, running frames, top-k per group.

These generalize the reference's ordered-stream folds — an iteratee holding
incremental state over a time-ordered scan (marketdb-iteratee/
.../MarketIteratees.scala:6-55) is exactly a window frame over
``partitionBy(series).orderBy(time)``.

Determinism contract: every ORDER BY inside a window carries a unique
tie-break key, mirroring the reference's stable-merge tie-break
(TimeSeriesEnumerator.scala:86-93 / SURVEY §3.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from marketdb_spark.catalog import load
from marketdb_spark.queries.registry import query


@query(
    "win_topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders
    )
    WHERE rn <= 3
    """,
)
def win_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: row_number + filter — the distributed
    top-k-per-group idiom (no global sort; one shuffle on the group key)."""
    orders = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "win_rank_dense_ntile",
    oracle="""
    SELECT c_custkey,
           c_mktsegment,
           CAST(RANK()       OVER w AS INT) AS rnk,
           CAST(DENSE_RANK() OVER w AS INT) AS drnk,
           CAST(NTILE(4)     OVER w AS INT) AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def win_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile over one window definition."""
    cust = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "win_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def win_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum per customer — decimal-exact so any engine agrees on
    every prefix (see marketdb_spark.functions.exact)."""
    orders = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


@query(
    "win_lag_lead_price",
    oracle="""
    SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber, l_extendedprice,
           LAG(l_extendedprice)  OVER w AS prev_price,
           LEAD(l_extendedprice) OVER w AS next_price
    FROM lineitem
    WHERE l_partkey % 50 = 0
    WINDOW w AS (
      PARTITION BY l_partkey ORDER BY l_shipdate, l_orderkey, l_linenumber
    )
    """,
)
def win_lag_lead_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over the ship-date sequence of each part."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_partkey") % 50 == 0)
    w = W.partitionBy("l_partkey").orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    return li.select(
        "l_partkey",
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        F.lag("l_extendedprice").over(w).alias("prev_price"),
        F.lead("l_extendedprice").over(w).alias("next_price"),
    )


@query(
    "win_cume_percent",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume,
           CAST(NTILE(10) OVER w AS INT) AS decile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def win_cume_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist: ratios of small integers → exact doubles
    on any engine (single division of identical ints)."""
    cust = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(10).over(w).alias("decile"),
    )


@query(
    "win_moving_avg",
    oracle="""
    SELECT event_id, user_id, ts,
           (CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
              / COUNT(value) OVER w) AS moving_avg_value
    FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events) events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
    )
    """,
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-row moving average per user over event time — the rolling-VWAP
    shape from the reference's iteratee incremental state (SURVEY §2B)."""
    ev = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        (
            F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double")
            / F.count("value").over(w)
        ).alias("moving_avg_value"),
    )


@query(
    "win_first_last_range",
    oracle="""
    SELECT user_id, event_id, ts, value,
           FIRST_VALUE(value) OVER w AS first_in_window,
           LAST_VALUE(value)  OVER w AS last_in_window
    FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events) events
    WHERE user_id % 10 = 0
    WINDOW w AS (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    )
    """,
)
def win_first_last_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value with an explicit frame (deterministic order)."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 0)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.first("value").over(w).alias("first_in_window"),
        F.last("value").over(w).alias("last_in_window"),
    )


@query(
    "win_gaps_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
      FROM events
    ),
    numbered AS (
      SELECT user_id, day,
             day - CAST(ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY day) AS INTEGER) AS grp
      FROM days
    )
    SELECT user_id,
           CAST(MIN(day) AS TIMESTAMP) AS island_start,
           CAST(MAX(day) AS TIMESTAMP) AS island_end,
           CAST(COUNT(*) AS BIGINT) AS n_days
    FROM numbered GROUP BY user_id, grp
    """,
)
def win_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands segmentation: per user, maximal runs of
    CONSECUTIVE active days (an island breaks at the first day with no
    events) — the classic sessionization-at-day-granularity shape
    (retention streaks, continuous-coverage audits). The day-minus-
    row_number device turns each island into a constant group key, so
    the whole thing is one window + one aggregation over the DISTINCT
    (user, day) frame — which is |users|×|days| rows regardless of event
    volume: the window never sees the raw fact table. Dates are cast to
    timestamp on output (cross-engine date stringification differs)."""
    days = (
        load(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
    )
    rn = F.row_number().over(
        W.partitionBy("user_id").orderBy("day")
    )
    numbered = days.withColumn("grp", F.date_sub(F.col("day"), rn))
    return (
        numbered.groupBy("user_id", "grp")
        .agg(
            F.min("day").cast("timestamp").alias("island_start"),
            F.max("day").cast("timestamp").alias("island_end"),
            F.count("*").alias("n_days"),
        )
        .drop("grp")
    )


@query(
    "win_rolling_median",
    oracle="""
    WITH d AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(value) AS value
      FROM events GROUP BY user_id, CAST(ts AS TIMESTAMP)
    ),
    u AS (
      SELECT user_id, ts,
             CAST(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)
                  AS DOUBLE) AS vu
      FROM d
    )
    SELECT user_id, ts,
           quantile_cont(vu, 0.5) OVER (
             PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS med_micro,
           CAST(COUNT(*) OVER (
             PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_frame
    FROM u
    """,
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING MEDIAN over a 7-row frame per user — the robust-statistics
    window (outlier-resistant smoothing) the moving AVERAGE family can't
    express: an order statistic, not a running sum, so the engine
    re-ranks the frame per row. Exactness device: values are pre-scaled
    to integer micro-units (as doubles < 2^53), so both engines'
    linear-interpolation formulas — Spark's a + (b−a)·frac and DuckDB's
    quantile_cont — are EXACT integer-or-half arithmetic and agree
    bit-for-bit on even-sized head frames; (user, ts) is pre-deduped
    with MAX so the frame contents are a deterministic set. Scale: one
    exchange on user_id; the 7-row frame is O(1) state per row —
    unlike a growing frame, this never buffers a partition."""
    ev = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
        .select(
            "user_id",
            "ts",
            (F.col("value").cast("decimal(18,6)") * 1000000)
            .cast("bigint")
            .cast("double")
            .alias("vu"),
        )
    )
    w = W.partitionBy("user_id").orderBy("ts").rowsBetween(-6, 0)
    return ev.select(
        "user_id",
        "ts",
        F.expr("percentile(vu, 0.5)").over(w).alias("med_micro"),
        F.count("*").over(w).alias("n_frame"),
    )
