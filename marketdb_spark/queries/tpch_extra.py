"""Remaining TPC-H query shapes (q02, q07-q09, q11-q17, q19-q22), adapted to
the driver's simplified star schema (no partsupp table, no
commitdate/receiptdate/shipmode columns — the lineitem distinct
(partkey, suppkey) pair set serves as the partsupp surrogate, and
returnflag/orderpriority stand in for the missing date/mode predicates).

These exist to exercise the full analytic operator surface of SURVEY §2B:
correlated scalar subqueries, scalar subqueries against a CTE, EXISTS /
NOT EXISTS with correlated conditions, NOT IN anti joins, two-level
aggregation, disjunctive pushable predicates, self-joins on the nation dim,
and conditional aggregation. The reference has none of this server-side —
its analytic surface is client-side iteratee folds (README.md:103-109) —
so all of 2B's [S] rows land here.

Scale notes: every dim join broadcasts; the only shuffles are on fact keys
(l_orderkey / l_partkey / l_suppkey), all uniform at TPC-H ratios. Double
sums go through exact decimal casts (marketdb_spark.functions.exact) so the
DuckDB oracle hash-matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from marketdb_spark.catalog import load
from marketdb_spark.functions.exact import dsum, oracle_davg, oracle_dsum
from marketdb_spark.queries.registry import query


@query(
    "q02_best_supplier",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    ranked AS (
      SELECT p_partkey, p_brand, s_name, s_acctbal, n_name,
             ROW_NUMBER() OVER (PARTITION BY p_partkey
               ORDER BY s_acctbal DESC, l_suppkey) AS rn
      FROM part
      JOIN ps ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE p_size = 15 AND r_name = 'EUROPE'
    )
    SELECT p_partkey, p_brand, s_name, s_acctbal, n_name
    FROM ranked WHERE rn = 1
    """,
)
def q02_best_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: partsupp := distinct lineitem pairs, best
    supplier := max s_acctbal instead of min ps_supplycost): snowflake join
    + correlated "argmax per part" via window top-1. All dims broadcast.

    Join ORDER is the lever: the selective dims (p_size, EUROPE) are
    broadcast-joined onto the raw (partkey, suppkey) stream BEFORE the
    dropDuplicates, so the only shuffle (the distinct) moves the ~1/50 ×
    ~1/5 filtered pair set instead of every lineitem pair — equivalent
    because the pair filter depends only on the dedup keys, and the
    dims are 1:1 per key so the carried columns are constant within a
    dedup group. Catalyst cannot reorder this itself (no CBO stats, and
    a distinct is a barrier it won't push joins through); at 100 TB the
    difference is shuffling TBs vs GBs."""
    part = load(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    euro_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .join(F.broadcast(euro_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .dropDuplicates(["l_partkey", "l_suppkey"])
    )
    w = Window.partitionBy("p_partkey").orderBy(
        F.desc("s_acctbal"), F.col("l_suppkey")
    )
    return (
        ps.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_partkey", "p_brand", "s_name", "s_acctbal", "n_name")
    )


@query(
    "q07_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {oracle_dsum('volume', 4)} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(YEAR(l_shipdate) AS INT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                           AND TIMESTAMP '1997-12-31 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: nation dim joined TWICE under different roles
    (supplier side / customer side) with a symmetric pair predicate.

    The disjunctive pair predicate IMPLIES supp_nation ∈ {3,7} AND
    cust_nation ∈ {3,7} — decomposed per-side filters Catalyst cannot
    derive from the OR. Applying them via broadcast joins BEFORE the
    fact-fact shuffle cuts both shuffle inputs to the two nations'
    share (~2/N each side) while the residual pair filter still runs
    after the join; at 100 TB that is the difference between shuffling
    the whole shipping window and shuffling only the two trade lanes."""
    both = ("NATION_3", "NATION_7")
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp"),
            F.lit("1997-12-31 00:00:00").cast("timestamp"),
        )
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin(*both))
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin(*both))
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    li2 = li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey).join(
        F.broadcast(n1), supp.s_nationkey == F.col("n1_key")
    )
    orders2 = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
    return (
        li2.join(orders2, li2.l_orderkey == orders2.o_orderkey)
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4).alias(
                "revenue"
            )
        )
    )


@query(
    "q08_market_share",
    oracle=f"""
    SELECT o_year,
           CAST({oracle_dsum('nation_volume', 4)} / {oracle_dsum('volume', 4)}
                AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             CASE WHEN n2.n_name = 'NATION_3'
                  THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS nation_volume
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                            AND TIMESTAMP '1997-12-31 00:00:00'
    ) all_nations
    GROUP BY o_year
    """,
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: 8-way snowflake with the nation dim in two roles and
    a conditional-aggregate ratio (market share). Both sums are exact
    decimals, so the one double division is deterministic across engines."""
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp"),
            F.lit("1997-12-31 00:00:00").cast("timestamp"),
        )
    )
    cust = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # broadcast the selective part dim (and the supplier role) onto
    # lineitem, and the customer→EUROPE chain onto orders, BEFORE the
    # fact-fact shuffle: both shuffle inputs shrink by their dims'
    # selectivity (Catalyst keeps the written order without CBO stats)
    li2 = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    orders2 = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == region.r_regionkey)
    )
    return (
        li2.join(orders2, li2.l_orderkey == orders2.o_orderkey)
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
        .withColumn("volume", volume)
        .withColumn(
            "nation_volume",
            F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
                F.lit(0.0)
            ),
        )
        .groupBy("o_year")
        .agg(
            (dsum("nation_volume", scale=4) / dsum("volume", scale=4)).alias(
                "mkt_share"
            )
        )
    )


@query(
    "q09_product_profit",
    oracle=f"""
    SELECT n_name AS nation, o_year, {oracle_dsum('amount', 4)} AS sum_profit
    FROM (
      SELECT n_name, CAST(YEAR(o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount)
               - p_retailprice * l_quantity * 0.1 AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY n_name, o_year
    """,
)
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: supply cost := 10% of retail price — there
    is no partsupp.ps_supplycost in this schema): LIKE-filtered part dim,
    profit expression across part/lineitem/orders, grouped by supplier
    nation and order year."""
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * F.lit(0.1)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy(F.col("n_name").alias("nation"), F.col("o_year"))
        .agg(dsum(amount, scale=4).alias("sum_profit"))
    )


@query(
    "q11_important_stock",
    oracle=f"""
    WITH value_by_part AS (
      SELECT l_partkey, {oracle_dsum('l_extendedprice * (1 - l_discount)', 4)} AS value
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_5'
      GROUP BY l_partkey
    )
    SELECT l_partkey, value
    FROM value_by_part
    WHERE value > (SELECT {oracle_dsum('value', 4)} * 0.001 FROM value_by_part)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted: stock value := shipped revenue per part —
    no partsupp): grouped aggregate filtered against a scalar subquery over
    the SAME aggregate (fraction-of-total). The scalar side is a 1-row
    broadcast cross join; the per-part values are exact decimals so the
    re-sum for the threshold is order-independent too."""
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    value_by_part = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("l_partkey")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4).alias(
                "value"
            )
        )
    )
    total = value_by_part.agg(
        (dsum("value", scale=4) * F.lit(0.001)).alias("threshold")
    )
    return (
        value_by_part.join(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select("l_partkey", "value")
    )


@query(
    "q12_priority_lines",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: groups by returnflag — no shipmode
    column): fact-fact join + conditional counting aggregation."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join with an extra join-condition filter
    (not a WHERE — zero-order customers must survive), then a two-level
    aggregate (orders per customer → customers per order-count)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT CAST(100.0 * {oracle_dsum(
        "CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END",
        4)} / {oracle_dsum('l_extendedprice * (1 - l_discount)', 4)}
      AS DOUBLE) AS promo_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: global conditional-aggregate ratio over a month of
    lineitem joined to the broadcast part dim."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (F.lit(100.0) * dsum(promo_rev, scale=4) / dsum(rev, scale=4)).alias(
                "promo_revenue"
            )
        )
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {oracle_dsum('l_extendedprice * (1 - l_discount)', 4)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: view-style CTE reused twice — once as the join fact,
    once inside a scalar MAX subquery (broadcast 1-row cross join). MAX of
    exact-decimal doubles is deterministic, so the equality is safe."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4).alias(
            "total_revenue"
        )
    )
    best = revenue.agg(F.max("total_revenue").alias("best_revenue"))
    supp = load(spark, sf_dir, "supplier")
    return (
        supp.join(revenue, supp.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("best_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q16_supplier_count",
    oracle="""
    SELECT p_brand, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    """,
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted: the NOT IN exclusion list is
    negative-balance suppliers — no s_comment column): NOT IN → left anti
    join (keys are non-null, so anti join ≡ NOT IN), IN-list predicate,
    count(distinct) per group."""
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    )
    li = load(spark, sf_dir, "lineitem")
    excluded = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    return (
        li.join(F.broadcast(excluded), li.l_suppkey == excluded.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle=f"""
    SELECT CAST({oracle_dsum('l_extendedprice')} / 7.0 AS DOUBLE) AS avg_yearly,
           COUNT(*) AS n_rows
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#5' AND p_type = 'MEDIUM'
      AND l_quantity < (
        SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey
      )
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar-aggregate subquery (per-part mean
    quantity), decorrelated to aggregate + join — the same plan Catalyst
    derives for the subquery form. AVG(l_quantity) is an integer sum /
    count in double: exact on both engines, so the 0.2× threshold compares
    identically."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#5") & (F.col("p_type") == "MEDIUM")
    )
    per_part = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == per_part.avg_partkey)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"),
            F.count("*").alias("n_rows"),
        )
    )


@query(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT {oracle_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 40
           AND l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive band predicates spanning
    both join sides — Catalyst extracts the common l_partkey equi-key for
    the hash join and evaluates the OR as a post-join filter."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(5, 20)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(10, 40)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4).alias(
                "revenue"
            ),
            F.count("*").alias("n_rows"),
        )
    )


@query(
    "q20_promo_suppliers",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE p_type = 'PROMO'
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING SUM(l_quantity) > 100
    )
    AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
    """,
)
def q20_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: excess-stock test := shipped more than 100
    units of PROMO parts in 1997): IN-subquery chain → two left-semi joins,
    one against a grouped HAVING aggregate. SUM(l_quantity) is an integral
    double — exact, so the HAVING threshold is engine-stable."""
    supp = load(spark, sf_dir, "supplier")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    heavy = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
    )
    asia_nations = load(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 2)
    return (
        supp.join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(
            F.broadcast(asia_nations),
            supp.s_nationkey == asia_nations.n_nationkey,
            "left_semi",
        )
        .select("s_suppkey", "s_name")
    )


@query(
    "q21_sole_supplier_waits",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_sole_supplier_waits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: "kept waiting" := sole supplier with a
    returned line on a multi-supplier finalized order — no
    receiptdate/commitdate): correlated EXISTS → conditional left-semi
    join, correlated NOT EXISTS → conditional left-anti join, both against
    self-joined lineitem on the order key."""
    supp = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select(
            F.col("l_orderkey").alias("l3_orderkey"),
            F.col("l_suppkey").alias("l3_suppkey"),
        )
    )
    return (
        l1.join(
            l2,
            (l1.l_orderkey == l2.l2_orderkey) & (l1.l_suppkey != l2.l2_suppkey),
            "left_semi",
        )
        .join(
            l3,
            (l1.l_orderkey == F.col("l3_orderkey"))
            & (l1.l_suppkey != F.col("l3_suppkey")),
            "left_anti",
        )
        .join(orders, l1.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), l1.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@query(
    "q22_global_sales_opportunity",
    oracle=f"""
    WITH avg_bal AS (
      SELECT {oracle_davg('c_acctbal', 6)} AS ab
      FROM customer WHERE c_acctbal > 0.0 AND c_nationkey < 10
    )
    SELECT c_nationkey AS cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           {oracle_dsum('c_acctbal', 6)} AS totacctbal
    FROM customer, avg_bal
    WHERE c_nationkey < 10 AND c_acctbal > ab
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY c_nationkey
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted: country code := c_nationkey — no phone
    column; dormancy := no orders since 2000 — every customer has at least
    one order in this dataset): scalar-average subquery threshold +
    NOT EXISTS anti join + grouped aggregate. Balances carry >2 decimals,
    so the exact-decimal avg and sum use scale 6 (identity cast ⇒ both
    engines round identically)."""
    cust = load(spark, sf_dir, "customer").filter(F.col("c_nationkey") < 10)
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (dsum("c_acctbal", scale=6) / F.count("c_acctbal")).alias("ab")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal", scale=6).alias("totacctbal"),
        )
    )
