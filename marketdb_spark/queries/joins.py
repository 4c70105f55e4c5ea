"""Join surface (SURVEY §2B "Joins"): broadcast dim enrichment (the uid
pattern, reference marketdb-core/.../uid/UIDProvider.scala:30-48), multi-way
shuffle joins, semi/anti, outer, and non-equi range joins.

Scale notes: dimension tables (region/nation/supplier/part at TPC-H ratios)
are broadcast — no shuffle of the fact side. Fact-fact joins
(lineitem ⋈ orders) shuffle on the join key; AQE picks skew-join splits at
runtime. At 100 TB the win is bucketing both facts on orderkey — the write
path in marketdb_spark.sources supports that layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marketdb_spark.catalog import load
from marketdb_spark.functions.exact import dsum, oracle_dsum
from marketdb_spark.queries.registry import query


@query(
    "q03_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {oracle_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, aggregate, deterministic top-10.

    customer is small relative to the facts → broadcast; orders⋈lineitem is
    the one real shuffle, on l_orderkey."""
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


@query(
    "q05_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           {oracle_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way snowflake join. region/nation/supplier/customer
    all broadcast; only orders⋈lineitem shuffles."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4).alias("revenue")
        )
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {oracle_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: join + aggregate + deterministic top-20."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "n_name")
    )


@query(
    "join_dim_enrich",
    oracle="""
    SELECT r_name, n_name, COUNT(*) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def join_dim_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dictionary-style enrichment — the Spark form of the
    reference's uid encode/decode (UIDProvider.scala:141-174): replace the
    distributed get-or-create counter with a broadcast dim join."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count("*").alias("n_customers"))
    )


@query(
    "join_semi_active_customers",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey
        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    )
    """,
)
def join_semi_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_anti_inactive_customers",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "join_outer_nation_customers",
    oracle="""
    SELECT n_name,
           CAST(COUNT(c_custkey) AS BIGINT) AS n_customers,
           COALESCE(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 0.0)
             AS total_balance
    FROM nation
    LEFT JOIN customer ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def join_outer_nation_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join keeping empty nations, with COALESCE on the agg."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        nation.join(cust, cust.c_nationkey == nation.n_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.coalesce(dsum("c_acctbal"), F.lit(0.0)).alias("total_balance"),
        )
    )


@query(
    "join_correlated_avg",
    oracle=f"""
    WITH order_avg AS (
      SELECT l_orderkey AS avg_key,
             {oracle_dsum('l_extendedprice')} / COUNT(*) AS avg_price
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey, l_linenumber, l_extendedprice, avg_price
    FROM lineitem JOIN order_avg ON l_orderkey = avg_key
    WHERE l_extendedprice > 1.5 * avg_price
    """,
)
def join_correlated_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar-aggregate subquery (lineitems priced >1.5× their
    order's mean). Catalyst decorrelates the subquery form to aggregate +
    self-join — two scans and two shuffles of the fact. Expressed as an
    unbounded window over l_orderkey instead: ONE scan, ONE shuffle, and
    the per-group mean is computed where the rows already are. Same
    decimal-exact arithmetic as dsum, so the oracle still matches
    bit-for-bit."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey")
    avg_price = (
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).over(w).cast("double")
        / F.count("*").over(w)
    )
    return (
        li.withColumn("avg_price", avg_price)
        .filter(F.col("l_extendedprice") > 1.5 * F.col("avg_price"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "avg_price")
    )


@query(
    "q18_large_orders",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey,
             {oracle_dsum('l_quantity')} AS total_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING {oracle_dsum('l_quantity')} > 150
    )
    SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
    FROM big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING on a grouped fact, then join back to
    orders/customer. The aggregate runs first so the join input is tiny."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    )


@query(
    "join_point_in_interval",
    oracle="""
    WITH periods AS (
      SELECT CAST(y AS INT) AS year_key,
             CAST(CAST(y AS VARCHAR) || '-01-01' AS TIMESTAMP) AS p_start,
             CAST(CAST(y AS VARCHAR) || '-07-01' AS TIMESTAMP) AS p_end,
             'H1-' || CAST(y AS VARCHAR) AS period_name
      FROM (SELECT UNNEST(range(1995, 2002)) AS y)
    )
    SELECT period_name, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    JOIN periods
      ON CAST(YEAR(o_orderdate) AS INT) = year_key
     AND o_orderdate >= p_start AND o_orderdate < p_end
    GROUP BY period_name
    """,
)
def join_point_in_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join with a bucketing key (the Q1 key-range scan
    generalized to arbitrary intervals): the derived year bucket turns a
    range-only join (BNLJ, quadratic) into an equi hash join + residual
    range filter. At 100 TB: intervals spanning buckets are exploded to
    one row per bucket first; the fact side never replicates."""
    orders = load(spark, sf_dir, "orders")
    periods = spark.range(1995, 2002).select(
        F.col("id").cast("int").alias("year_key"),
        F.to_timestamp(F.concat(F.col("id"), F.lit("-01-01"))).alias("p_start"),
        F.to_timestamp(F.concat(F.col("id"), F.lit("-07-01"))).alias("p_end"),
        F.concat(F.lit("H1-"), F.col("id")).alias("period_name"),
    )
    return (
        orders.join(
            F.broadcast(periods),
            (F.year("o_orderdate").cast("int") == F.col("year_key"))
            & (F.col("o_orderdate") >= F.col("p_start"))
            & (F.col("o_orderdate") < F.col("p_end")),
        )
        .groupBy("period_name")
        .agg(F.count("*").alias("n_orders"))
    )


@query(
    "join_full_outer_nation_profile",
    oracle="""
    WITH c AS (
      SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_cust
      FROM customer GROUP BY c_nationkey
    ),
    s AS (
      SELECT s_nationkey AS nk2, CAST(COUNT(*) AS BIGINT) AS n_supp
      FROM supplier WHERE s_acctbal > 3000 GROUP BY s_nationkey
    )
    SELECT COALESCE(nk, nk2) AS nationkey, n_cust, n_supp
    FROM c FULL OUTER JOIN s ON nk = nk2
    """,
)
def join_full_outer_nation_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregates with disjoint key coverage (the
    supplier filter guarantees nations on one side only → null rows on
    both sides survive)."""
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 3000)
    c = cust.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count("*").alias("n_cust")
    )
    s = supp.groupBy(F.col("s_nationkey").alias("nk2")).agg(
        F.count("*").alias("n_supp")
    )
    return c.join(s, c.nk == s.nk2, "full_outer").select(
        F.coalesce("nk", "nk2").alias("nationkey"), "n_cust", "n_supp"
    )


@query(
    "join_nonequi_balance_pairs",
    oracle="""
    SELECT a.s_suppkey AS a_key, b.s_suppkey AS b_key,
           a.s_acctbal AS a_bal, b.s_acctbal AS b_bal
    FROM supplier a
    JOIN supplier b
      ON a.s_suppkey < b.s_suppkey
     AND abs(a.s_acctbal - b.s_acctbal) < 10.0
    """,
)
def join_nonequi_balance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure non-equi self-join — supplier pairs with near-identical
    balances — band-bucketed into a HASH join (the same manufactured-
    equi-key device as operators/rangejoin.py, on a value grid instead
    of a time grid): each row keys by an exact integer balance band
    (cents div 2000 — a 20-unit band, twice the 10-unit predicate radius,
    so float rounding at the band edge can never split a qualifying
    pair further than ADJACENT bands), one side explodes to its
    {band-1, band, band+1} candidates, the join runs on band equality
    and the EXACT |Δ|<10 + key-order predicate filters the candidates.
    Each pair meets exactly once (a's own band is a single value), so no
    post-join dedup. Work is O(rows + candidate pairs) instead of the
    old BroadcastNestedLoopJoin's O(rows²) — the shape that ships at
    100 TB, where the all-pairs loop cannot (band cardinality scales
    with the value range, so the hash spreads; a hot band is AQE
    skew-join territory, not a different algorithm)."""
    supp = load(spark, sf_dir, "supplier")
    # exact integer band: round(bal*100) is the unique cent count for
    # 2-decimal money (and for arbitrary doubles is within 1 cent), so
    # |a_bal - b_bal| < 10 bounds the cent distance by 1001 < 2000 —
    # adjacent-band containment holds with a full band of margin
    # floor(cents / 2000): exact — a cent count divisible by 2000 divides
    # exactly in IEEE double (both operands and the integer quotient are
    # representable), and any other quotient sits ≥ 1/2000 from an
    # integer, far beyond double rounding error, so floor never flips
    band = F.floor(F.round(F.col("s_acctbal") * 100) / 2000)
    a = supp.select(
        F.col("s_suppkey").alias("a_key"),
        F.col("s_acctbal").alias("a_bal"),
        band.alias("__band"),
    )
    b = supp.select(
        F.col("s_suppkey").alias("b_key"),
        F.col("s_acctbal").alias("b_bal"),
        F.explode(
            F.array(band - 1, band, band + 1)
        ).alias("__band"),
    )
    return (
        a.join(b, "__band")
        .filter(
            (F.col("a_key") < F.col("b_key"))
            & (F.abs(F.col("a_bal") - F.col("b_bal")) < 10.0)
        )
        .select("a_key", "b_key", "a_bal", "b_bal")
    )


@query(
    "join_range_price_band",
    oracle="""
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM part
    JOIN lineitem
      ON l_partkey = p_partkey
     AND l_extendedprice BETWEEN p_retailprice * 0.9 AND p_retailprice * 1.1
    GROUP BY p_brand
    """,
)
def join_range_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range hybrid join: equi key drives the hash join, the band
    predicate is applied as a post-join filter (no cartesian blow-up)."""
    part = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(
            F.broadcast(part),
            (li.l_partkey == part.p_partkey)
            & (li.l_extendedprice >= part.p_retailprice * 0.9)
            & (li.l_extendedprice <= part.p_retailprice * 1.1),
        )
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_pairs"))
    )


@query(
    "join_salted_hotkey",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, s.s_name, l.l_quantity
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE l.l_quantity >= 45
    """,
)
def join_salted_hotkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic skew-mitigation join through the oracle gate: the
    fact side is salted (operators.skew.salted_join), the dim side
    replicated across every salt, and the join runs on (key, salt) — the
    hot key's rows spread over n_salts reducers instead of one. The salt
    routes rows but never changes the RESULT, so the oracle is the plain
    join: hash-equality proves salting is semantically free. Covers the
    case AQE's skew split can't fix deterministically ahead of time
    (known hot instrument against a huge dim — the reference's
    front-month-future skew, MarketDB.scala:24)."""
    from marketdb_spark.operators.skew import salted_join

    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    sup = load(spark, sf_dir, "supplier")
    joined = salted_join(li, sup.withColumnRenamed("s_suppkey", "l_suppkey"),
                         on="l_suppkey", n_salts=8)
    return joined.select("l_orderkey", "l_linenumber", "s_name", "l_quantity")


@query(
    "join_range_cells",
    oracle="""
    SELECT o.o_orderkey,
           CAST(COUNT(*) AS BIGINT) AS n_shipped
    FROM orders o JOIN lineitem l
      ON l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
    WHERE o.o_totalprice > 400000
    GROUP BY o.o_orderkey
    """,
)
def join_range_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join with NO equi key — per big order, count ALL
    lineitems (any order) shipped in the 7 days from its order date.
    Catalyst's native plan for an unkeyed range predicate is a nested
    loop; operators.rangejoin.cell_range_join manufactures a day-cell
    equi key instead (intervals explode into the cells they span, points
    key by their own cell), so the plan is a hash join on cells + exact
    range filter — NO CartesianProduct / BroadcastNestedLoopJoin (gated
    in tests/test_plans.py). Contrast join_nonequi_balance_pairs, which
    keeps the BNLJ fallback as the documented small-side-only shape.

    Because COUNT decomposes, the point side is PRE-AGGREGATED to cell
    granularity before the join (daily ship counts; the timestamps are
    midnight-aligned so a day-cell is entirely in or out of every
    interval): the join touches |days| rows instead of |lineitems|,
    collapsing ~50M true interval-point matches at sf0.1 to ~240k
    interval-day pairs — the pattern that makes unkeyed range
    AGGREGATION shippable at 100 TB. For non-decomposable payloads the
    same cell_range_join runs against the raw points."""
    from marketdb_spark.operators.rangejoin import cell_range_join

    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(
            "o_orderkey",
            "o_orderdate",
            (F.col("o_orderdate") + F.expr("interval 7 days")).alias("o_end"),
        )
    )
    daily = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.date_trunc("day", "l_shipdate").alias("ship_day"))
        .agg(F.count("*").alias("n_day"))
    )
    joined = cell_range_join(
        orders, daily, "o_orderdate", "o_end", "ship_day", cell="1 day"
    )
    return joined.groupBy("o_orderkey").agg(
        F.sum("n_day").cast("long").alias("n_shipped")
    )


@query(
    "join_interval_overlap",
    oracle="""
    SELECT a.o_orderkey AS audit_key,
           CAST(COUNT(*) AS BIGINT) AS n_overlaps,
           CAST(MIN(b.o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(b.o_orderkey) AS BIGINT) AS max_key
    FROM orders a JOIN orders b
      ON a.o_orderdate < b.o_orderdate + INTERVAL 30 DAY
     AND b.o_orderdate < a.o_orderdate + INTERVAL 30 DAY
     AND a.o_orderkey <> b.o_orderkey
    WHERE a.o_orderkey % 1000 = 0
    GROUP BY a.o_orderkey
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval ⋈ interval overlap join with NO shared equi key — for
    each "audit window" (every 1000th order's 30-day fulfillment
    window), count ALL orders whose own 30-day window overlaps it,
    across the whole table. The naive plan is a cartesian on a pure
    range predicate; operators/rangejoin.interval_overlap_join
    manufactures a cell equi-key (both sides explode onto one
    epoch-anchored 30-day grid) and counts each pair exactly once at
    cell(greatest(starts)) — a filter, not a dedup shuffle. This is the
    two-sided generalization of join_range_cells (interval ⋈ point),
    completing the range-join family; the registry-wide plan gate proves
    no BNLJ/cartesian appears."""
    from marketdb_spark.operators.rangejoin import interval_overlap_join

    orders = load(spark, sf_dir, "orders")
    win = F.expr("INTERVAL 30 DAYS")
    audit = orders.filter(F.col("o_orderkey") % 1000 == 0).select(
        F.col("o_orderkey").alias("a_key"),
        F.col("o_orderdate").alias("a_start"),
        (F.col("o_orderdate") + win).alias("a_end"),
    )
    allw = orders.select(
        F.col("o_orderkey").alias("b_key"),
        F.col("o_orderdate").alias("b_start"),
        (F.col("o_orderdate") + win).alias("b_end"),
    )
    pairs = interval_overlap_join(
        audit, allw, "a_start", "a_end", "b_start", "b_end", cell="30 days"
    ).filter(F.col("a_key") != F.col("b_key"))
    return pairs.groupBy(F.col("a_key").alias("audit_key")).agg(
        F.count("*").alias("n_overlaps"),
        F.min("b_key").alias("min_key"),
        F.max("b_key").alias("max_key"),
    )


@query(
    "join_runtime_filter",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           {oracle_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def join_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join (Catalyst's InjectRuntimeFilter): the
    selective predicate on orders is turned into a bloom filter that
    prunes lineitem rows BEFORE the join shuffle — at 100 TB this is the
    difference between shuffling the whole fact table and shuffling only
    the ~2% of lines whose orderkey can match. Spark only injects the
    filter on the shuffle-join path (a broadcast join prunes during the
    probe already), so the query pins the non-broadcast plan the big-data
    case would take: at real scale the filtered orders side exceeds the
    broadcast threshold naturally and these session confs are the
    defaults. tests/test_plans.py gates that bloom_filter_might_contain
    is actually present in the optimized plan — the conf combination is
    asserted, not assumed."""
    prev = {k: spark.conf.get(k, None) for k in RUNTIME_FILTER_CONFS}
    for k, v in RUNTIME_FILTER_CONFS.items():
        spark.conf.set(k, v)
    try:
        # evaluate INSIDE the pinned-conf window (the frame is lazy; the
        # caller would otherwise run it under restored session confs)
        return _runtime_filter_frame(spark, sf_dir).localCheckpoint()
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# The conf pin for join_runtime_filter (and its plan gate): bloom filters
# only inject on the shuffle-join path, and the application-side size gate
# defaults to 10GB — both are no-ops at real scale and pinned for the
# tiny local test files.
RUNTIME_FILTER_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter."
    "applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def _runtime_filter_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lazy join/agg under join_runtime_filter — split out so
    tests/test_plans.py can gate the UN-executed plan for
    bloom_filter_might_contain under the same conf pin."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderstatus") == "F")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                scale=4,
            ).alias("revenue"),
        )
    )
