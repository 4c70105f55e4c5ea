"""Scalar-function library coverage, JSON access, pivot, subqueries,
global top-k, statistical moments (SURVEY §2B "Scalar function library" +
remaining [S] surface).

Moments (stddev/var/corr) are computed from decimal-exact sums via the
textbook formulas rather than the engines' native accumulators — the
native implementations are order-dependent and would never hash-match.
Scales chosen so every scaled sum stays under 2^53 (exact.py contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from marketdb_spark.catalog import load
from marketdb_spark.functions.exact import dsum, oracle_dsum
from marketdb_spark.queries.registry import query


@query(
    "q04_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS → left-semi join + aggregate."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    semi = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@query(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand) AS brand_upper,
           LOWER(p_type) AS type_lower,
           TRIM(CONCAT(p_brand, ' / ', p_type)) AS brand_type,
           SUBSTRING(p_name, 1, 8) AS name_prefix,
           CAST(LENGTH(p_name) AS INT) AS name_len,
           regexp_extract(p_type, '([A-Z]+)', 1) AS first_word,
           CAST(LEN(string_split(p_name, ' ')) AS INT) AS n_name_words,
           REPLACE(p_brand, '#', '-') AS brand_dashed,
           CAST(levenshtein(p_brand, 'Brand-00') AS INT) AS lev_to_base
    FROM part
    WHERE p_partkey % 7 = 0
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery: case, trim/concat, substring, regexp
    extraction, split, replace, edit distance."""
    part = load(spark, sf_dir, "part").filter(F.col("p_partkey") % 7 == 0)
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.trim(F.concat(F.col("p_brand"), F.lit(" / "), F.col("p_type"))).alias(
            "brand_type"
        ),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("int").alias("name_len"),
        F.regexp_extract("p_type", r"([A-Z]+)", 1).alias("first_word"),
        F.size(F.split("p_name", " ")).cast("int").alias("n_name_words"),
        F.regexp_replace("p_brand", "#", "-").alias("brand_dashed"),
        F.levenshtein("p_brand", F.lit("Brand-00")).cast("int").alias("lev_to_base"),
    )


@query(
    "scalar_datetime_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT) AS yr,
           CAST(MONTH(o_orderdate) AS INT) AS mo,
           CAST(DAYOFYEAR(o_orderdate) AS INT) AS doy,
           CAST(EXTRACT(MINUTE FROM o_orderdate) AS INT) AS minute_of_hour,
           CAST(epoch(o_orderdate) AS BIGINT) AS unix_sec,
           date_trunc('month', o_orderdate) AS month_start,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
                AS INT) AS days_since_epoch_start
    FROM orders
    WHERE o_orderkey % 11 = 0
    """,
)
def scalar_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time battery: parts (the reference's row-key clock fields —
    year/dayOfYear/minuteOfDay, Trade.scala:24-27), truncation, arithmetic,
    epoch conversion."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 11 == 0)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.dayofyear("o_orderdate").cast("int").alias("doy"),
        F.minute("o_orderdate").cast("int").alias("minute_of_hour"),
        F.unix_timestamp("o_orderdate").alias("unix_sec"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        (F.col("o_orderdate") + F.expr("interval 30 days")).alias("due_date"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("date")
        ).cast("int").alias("days_since_epoch_start"),
    )


@query(
    "scalar_math_conditional",
    oracle="""
    SELECT c_custkey,
           ROUND(ABS(c_acctbal), 1) AS abs_bal,
           CASE WHEN c_acctbal > 0 THEN SQRT(c_acctbal) END AS sqrt_bal,
           POW(CAST(c_nationkey AS DOUBLE), 2.0) AS nation_sq,
           CASE WHEN c_acctbal < 0 THEN 'overdrawn'
                WHEN c_acctbal < 1000 THEN 'low' ELSE 'high' END AS bal_band,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_masked,
           CAST(GREATEST(c_acctbal, 0.0) AS DOUBLE) AS bal_floor0,
           CAST(c_custkey % 97 AS BIGINT) AS custkey_mod
    FROM customer
    """,
)
def scalar_math_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math + conditional battery: abs/round/sqrt/pow, CASE,
    coalesce/nullif, greatest, modulo. All deterministic double ops: sqrt
    and pow(x,2) are IEEE correctly-rounded, so both engines agree bit-for-
    bit. (ln/exp/trig are deliberately absent from oracle-checked outputs —
    they're libm-dependent and differ in the last ulp across engines.)"""
    cust = load(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.round(F.abs("c_acctbal"), 1).alias("abs_bal"),
        F.when(F.col("c_acctbal") > 0, F.sqrt(F.col("c_acctbal"))).alias("sqrt_bal"),
        F.pow(F.col("c_nationkey").cast("double"), 2.0).alias("nation_sq"),
        F.when(F.col("c_acctbal") < 0, "overdrawn")
        .when(F.col("c_acctbal") < 1000, "low")
        .otherwise("high")
        .alias("bal_band"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
            "segment_masked"
        ),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor0"),
        (F.col("c_custkey") % 97).alias("custkey_mod"),
    )


@query(
    "scalar_hash_funcs",
    oracle="""
    SELECT doc_id,
           md5(text) AS h_md5,
           sha256(text) AS h_sha256
    FROM documents
    WHERE doc_id % 5 = 0
    """,
)
def scalar_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable hash functions (the correctness harness's own primitives)."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return docs.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2("text", 256).alias("h_sha256"),
    )


@query(
    "json_props_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
             AS sum_k,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column access: get_json_object + typed aggregation over the
    extracted field (integer sums — exact on any engine)."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).cast("int").alias("min_k"),
        F.max(k).cast("int").alias("max_k"),
    )


@query(
    "pivot_status_by_flag",
    oracle=f"""
    SELECT l_returnflag,
           {oracle_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS O,
           {oracle_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def pivot_status_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one column per l_linestatus value, exact quantity sums."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum("l_quantity"))
    )


@query(
    "stats_moments",
    oracle=f"""
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             {oracle_dsum('l_quantity')} AS s1,
             {oracle_dsum('l_quantity * l_quantity', 4)} AS s2,
             {oracle_dsum('l_discount', 4)} AS d1,
             {oracle_dsum('l_quantity * l_discount', 4)} AS qd
      FROM lineitem
      GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (s1 / n) AS mean_qty,
           ((s2 - s1 * s1 / n) / (n - 1)) AS var_qty,
           sqrt((s2 - s1 * s1 / n) / (n - 1)) AS stddev_qty,
           ((qd - s1 * d1 / n) / (n - 1)) AS cov_qty_disc
    FROM s
    """,
)
def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance / stddev / covariance from decimal-exact sums —
    order-independent, unlike the engines' native accumulators, so the
    comparison is bit-exact."""
    li = load(spark, sf_dir, "lineitem")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        dsum("l_quantity").alias("s1"),
        dsum(F.col("l_quantity") * F.col("l_quantity"), scale=4).alias("s2"),
        dsum("l_discount", scale=4).alias("d1"),
        dsum(F.col("l_quantity") * F.col("l_discount"), scale=4).alias("qd"),
    )
    n, s1, s2, d1, qd = (F.col(c) for c in ("n", "s1", "s2", "d1", "qd"))
    return s.select(
        "l_returnflag",
        "n",
        (s1 / n).alias("mean_qty"),
        ((s2 - s1 * s1 / n) / (n - 1)).alias("var_qty"),
        F.sqrt((s2 - s1 * s1 / n) / (n - 1)).alias("stddev_qty"),
        ((qd - s1 * d1 / n) / (n - 1)).alias("cov_qty_disc"),
    )


@query(
    "sort_global_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 25
    """,
)
def sort_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY + LIMIT → Spark plans TakeOrderedAndProject (per-
    partition top-k + merge on the driver; no full sort, no full shuffle)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(25)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


@query(
    "win_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey
             ORDER BY epoch(o_orderdate)
             RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS spend_90d
    FROM orders
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event-time: trailing-90-day spend per customer
    (time-valued rangeBetween via epoch seconds; decimal-exact sum)."""
    orders = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-90 * 86400, W.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("spend_90d"),
    )


@query(
    "scalar_bitwise_funcs",
    oracle="""
    SELECT event_id,
           event_id & 255 AS masked,
           event_id << 3 AS shifted_l,
           event_id >> 2 AS shifted_r,
           xor(event_id, user_id) AS xored,
           (event_id >> 2) | (user_id & 7) AS mixed,
           CAST(bit_count(event_id) AS BIGINT) AS n_bits
    FROM events
    WHERE event_id < 500
    """,
)
def scalar_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar coverage (the primitives under simhash/bitmap/bucket
    ops): and/or/xor, shifts, popcount — all JVM-side, map-only."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    eid, uid = F.col("event_id"), F.col("user_id")
    return ev.select(
        "event_id",
        eid.bitwiseAND(F.lit(255)).alias("masked"),
        F.shiftleft(eid, 3).alias("shifted_l"),
        F.shiftright(eid, 2).alias("shifted_r"),
        eid.bitwiseXOR(uid).alias("xored"),
        F.shiftright(eid, 2).bitwiseOR(uid.bitwiseAND(F.lit(7))).alias("mixed"),
        F.bit_count(eid).cast("long").alias("n_bits"),
    )
