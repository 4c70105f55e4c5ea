"""Grouped / rollup / cube / distinct aggregation queries (SURVEY §2B
"Aggregation"). Generalizes the reference's counter fold
(marketdb-iteratee/.../MarketIteratees.scala:7-21) to the full Spark SQL
aggregation surface. All double sums go through exact decimal casts
(see marketdb_spark.functions.exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marketdb_spark.catalog import load
from marketdb_spark.functions.exact import davg, dsum, oracle_davg, oracle_dsum
from marketdb_spark.queries.registry import query

_Q1_CUTOFF = "1998-09-02 00:00:00"


@query(
    "q01_pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {oracle_dsum('l_quantity')} AS sum_qty,
      {oracle_dsum('l_extendedprice')} AS sum_base_price,
      {oracle_dsum('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
      {oracle_dsum('(l_extendedprice * (1 - l_discount)) * (1 + l_tax)', 6)} AS sum_charge,
      {oracle_davg('l_quantity')} AS avg_qty,
      {oracle_davg('l_extendedprice')} AS avg_price,
      {oracle_davg('l_discount')} AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate with map-side partial aggs."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price, scale=4).alias("sum_disc_price"),
            dsum(charge, scale=6).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q06_forecast_revenue",
    oracle=f"""
    SELECT {oracle_dsum('l_extendedprice * l_discount', 4)} AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: highly selective scan → global aggregate. All four
    predicates are pushable to the parquet reader (min/max stats)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), scale=4).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


@query(
    "agg_distinct_counts",
    oracle="""
    SELECT
      l_returnflag,
      CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
      CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_part,
      CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_order
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(distinct) — Spark expands to two-phase aggregate automatically."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.countDistinct("l_orderkey").alias("n_order"),
    )


@query(
    "agg_rollup_priority",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {oracle_dsum('o_totalprice')} AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (status → priority → grand total)."""
    orders = load(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
    )


@query(
    "agg_cube_flags",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows,
           {oracle_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two low-cardinality dimensions."""
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"),
        dsum("l_quantity").alias("sum_qty"),
    )


@query(
    "agg_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {oracle_dsum('o_totalprice')} AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL surface."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               {oracle_dsum('o_totalprice')} AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "agg_collect_ordered",
    oracle="""
    SELECT l_orderkey,
           ARRAY_TO_STRING(LIST(l_linenumber ORDER BY l_linenumber), ',')
             AS line_numbers,
           CAST(LEN(LIST(l_linenumber)) AS INT) AS n_lines
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    GROUP BY l_orderkey
    """,
)
def agg_collect_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered materialization of a group into an array — the Spark analog
    of the reference's `sequencer` fold (MarketIteratees.scala:23-37).
    (Serialized to a string: array-typed outputs stringify differently
    across engines/pandas, which would break the value-hash compare.)"""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") % 100 == 0)
        .groupBy("l_orderkey")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("l_linenumber"))).alias(
                "line_numbers"
            ),
            F.count("l_linenumber").cast("int").alias("n_lines"),
        )
    )


@query(
    "agg_quantiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_quantity, 0.9) AS p90_qty,
           quantile_cont(l_quantity, 0.99) AS p99_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated quantiles over an integer-valued measure (interpolation
    on integers is exact in double, so both engines agree; continuous
    measures would differ in the last ulp across interpolation formulas)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("median_qty"),
        F.percentile("l_quantity", F.lit(0.9)).alias("p90_qty"),
        F.percentile("l_quantity", F.lit(0.99)).alias("p99_qty"),
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS exact_supps,
           TRUE AS parts_within_bound,
           TRUE AS supps_within_bound
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) with an oracle-checkable
    contract: the raw HLL estimate is algorithm-specific (no SQL engine
    reproduces it bit-for-bit), so the query emits the exact distinct
    counts plus a boolean asserting the sketch landed within 3·rsd of
    exact — the accuracy HLL++ guarantees at ~3 standard errors. The
    oracle computes the exact counts and asserts the bound holds (TRUE),
    so a broken sketch (or a regressed rsd) fails the hash compare.
    Shape: both the HLL sketch and the exact distinct run as two-phase
    partial aggregates; HLL state is O(2^p) per group regardless of
    corpus size — the 100 TB path drops the exact column and keeps only
    the sketch."""
    rsd = 0.05
    li = load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd).alias("approx_parts"),
        F.approx_count_distinct("l_suppkey", rsd).alias("approx_supps"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_suppkey").alias("exact_supps"),
    )
    bound = F.lit(3 * rsd)

    def within(approx: str, exact: str):
        return (
            F.abs(F.col(approx) - F.col(exact))
            <= bound * F.col(exact)
        )

    return agg.select(
        "l_returnflag",
        "exact_parts",
        "exact_supps",
        within("approx_parts", "exact_parts").alias("parts_within_bound"),
        within("approx_supps", "exact_supps").alias("supps_within_bound"),
    )


@query(
    "agg_minmax_by",
    oracle="""
    WITH ranked AS (
      SELECT l_returnflag, l_extendedprice, l_orderkey,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
               ORDER BY l_extendedprice, l_orderkey) AS rn_min,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
               ORDER BY l_extendedprice DESC, l_orderkey DESC) AS rn_max
      FROM lineitem
    )
    SELECT l_returnflag,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           MAX(CASE WHEN rn_min = 1 THEN l_orderkey END) AS cheapest_order,
           MAX(CASE WHEN rn_max = 1 THEN l_orderkey END) AS dearest_order
    FROM ranked
    GROUP BY l_returnflag
    """,
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max and argmin/argmax with a deterministic (value, key) tie-break."""
    li = load(spark, sf_dir, "lineitem")
    pair = F.struct(F.col("l_extendedprice"), F.col("l_orderkey"))
    return li.groupBy("l_returnflag").agg(
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.min_by("l_orderkey", pair).alias("cheapest_order"),
        F.max_by("l_orderkey", pair).alias("dearest_order"),
    )


@query(
    "sample_stratified_det",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_sampled,
           {oracle_dsum('o_totalprice')} AS sum_price,
           {oracle_davg('o_totalprice')} AS avg_price
    FROM orders
    WHERE (o_orderkey * 2654435761) % 4294967296 < 429496729
    GROUP BY o_orderpriority
    """,
)
def sample_stratified_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample via a multiplicative hash on the key
    (Knuth LCG, pure BIGINT arithmetic → engine-exact and reproducible
    across runs/engines, unlike rand()-based sampleBy). The predicate is a
    scan-side filter — at 100 TB the sample never leaves the map stage, and
    per-stratum statistics aggregate the sampled ~10% only."""
    orders = load(spark, sf_dir, "orders")
    keep = (F.col("o_orderkey") * F.lit(2654435761)) % F.lit(4294967296) < 429496729
    return (
        orders.filter(keep)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_sampled"),
            dsum("o_totalprice").alias("sum_price"),
            davg("o_totalprice").alias("avg_price"),
        )
    )


@query(
    "unpivot_lineitem_metrics",
    oracle=f"""
    SELECT l_returnflag, metric,
           {oracle_dsum('val')} AS total,
           COUNT(*) AS n
    FROM (
      SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS val FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
    )
    GROUP BY l_returnflag, metric
    """,
)
def unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (unpivot/melt, the inverse of pivot_status_by_flag)
    + per-metric totals. Spark's unpivot is a zero-shuffle Expand node — each
    input row fans out to one row per metric map-side; the only shuffle is
    the final small-key aggregation."""
    li = load(spark, sf_dir, "lineitem")
    long = li.select(
        "l_returnflag", "l_quantity", "l_extendedprice", "l_discount"
    ).unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "metric",
        "val",
    )
    return long.groupBy("l_returnflag", "metric").agg(
        dsum("val").alias("total"), F.count("*").alias("n")
    )


@query(
    "agg_salted_two_phase",
    oracle="""
    SELECT event_type,
           CAST(COUNT(value) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY event_type
    """,
)
def agg_salted_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe aggregation via operators.skew.salted_agg: groupBy(key,
    salt) partial → groupBy(key) final. events has 5 hot event_type keys —
    the shape where one reducer would own 20% of a 100 TB table; salting
    spreads each hot key over 16 reducers and the final phase combines 16
    tiny rows per key. The result is identical to a plain GROUP BY (the
    oracle), because count/sum/min/max are salt-decomposable (decimal sum
    → order-independent)."""
    from marketdb_spark.operators.skew import salted_agg

    ev = load(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        ["event_type"],
        {
            "n_events": ("count", F.col("value")),
            "total_value": ("sum", F.col("value").cast("decimal(18,6)")),
            "min_value": ("min", F.col("value")),
            "max_value": ("max", F.col("value")),
        },
    )
    return out.withColumn("total_value", F.col("total_value").cast("double"))


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT
             CAST(('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
                  AS BIGINT) % 1024) AS BIGINT) AS buckets_set,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-counting distinct sketch with a DETERMINISTIC, oracle-
    checkable core: hash every key into one of 1024 bitmap buckets
    (md5-derived, bit-identical on both engines) and count the buckets
    hit — the integer the linear-counting estimator
    n̂ = -m·ln(empty/m) is computed from. The exact distinct count rides
    along to expose the sketch's accuracy. This is the verifiable sibling
    of agg_approx_distinct (HLL, rows-only by necessity): the sketch
    state itself is checked exactly, the estimate formula is left to the
    caller. Shape: map-side bucket hash; the groupBy's distinct runs as
    a two-phase partial aggregate — sketch memory is O(m) per group at
    any corpus size."""
    from marketdb_spark.functions.text import token_hash64

    orders = load(spark, sf_dir, "orders")
    bucket = token_hash64(F.col("o_custkey").cast("string")) % 1024
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct(bucket).alias("buckets_set"),
        F.countDistinct("o_custkey").alias("exact_distinct"),
    )


@query(
    "agg_approx_quantiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS exact_median,
           TRUE AS approx_within_bound
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (Greenwald-Khanna sketch) under the same
    oracle-checkable contract as agg_approx_distinct: the sketch value is
    algorithm-specific, so the query emits the exact median plus a boolean
    asserting the approximation landed inside the exact [p45, p55] value
    band — far looser than GK's guaranteed 1/accuracy = 1% rank error, so
    only a broken sketch can flip it. Quantities are integers, so the
    exact interpolated quantiles are bit-identical across engines. Sketch
    state is O(accuracy·log n) per group — the only quantile shape that
    ships at 100 TB (exact quantiles need a full sort per group)."""
    li = load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", 0.5, 100).alias("approx_median"),
        F.percentile("l_quantity", F.lit(0.5)).alias("exact_median"),
        F.percentile("l_quantity", F.lit(0.45)).alias("lo"),
        F.percentile("l_quantity", F.lit(0.55)).alias("hi"),
    )
    return agg.select(
        "l_returnflag",
        "exact_median",
        (
            (F.col("approx_median") >= F.col("lo"))
            & (F.col("approx_median") <= F.col("hi"))
        ).alias("approx_within_bound"),
    )


@query(
    "agg_mode_deterministic",
    oracle="""
    SELECT l_returnflag, mode_qty, mode_count FROM (
      SELECT l_returnflag,
             CAST(l_quantity AS BIGINT) AS mode_qty,
             CAST(COUNT(*) AS BIGINT) AS mode_count,
             ROW_NUMBER() OVER (
               PARTITION BY l_returnflag
               ORDER BY COUNT(*) DESC, CAST(l_quantity AS BIGINT)
             ) AS rn
      FROM lineitem
      GROUP BY l_returnflag, CAST(l_quantity AS BIGINT)
    ) WHERE rn = 1
    """,
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC mode (most frequent value; ties → smallest value).
    Spark's built-in F.mode is explicitly non-deterministic under ties,
    which makes it unverifiable — this form pins the tie-break with
    max_by over struct(count, -value), so both engines agree bit-for-bit.
    Shape: two-phase count aggregation on (group, value), then a k-keyed
    argmax — no window over the fact table, no sort."""
    li = load(spark, sf_dir, "lineitem")
    counts = (
        li.select("l_returnflag", F.col("l_quantity").cast("bigint").alias("q"))
        .groupBy("l_returnflag", "q")
        .agg(F.count("*").alias("c"))
    )
    best = F.max(F.struct(F.col("c"), (-F.col("q")).alias("nq"), F.col("q")))
    return counts.groupBy("l_returnflag").agg(
        best.getField("q").alias("mode_qty"),
        best.getField("c").alias("mode_count"),
    )


@query(
    "agg_heavy_hitters",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1, 2
    ),
    t AS (
      SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS total
      FROM lineitem GROUP BY 1
    )
    SELECT c.l_returnflag, c.qty, c.cnt, t.total
    FROM c JOIN t USING (l_returnflag)
    WHERE c.cnt * 64 >= t.total
    """,
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact frequent-items (heavy hitters) with relative support
    phi = 1/64: per group, emit every value whose frequency is >= phi of
    the group's row count. Generalizes the reference's counter fold
    (marketdb-iteratee/.../MarketIteratees.scala:7-21) to the standard
    streaming-analytics heavy-hitter contract, computed exactly.
    Shape: one two-phase count on (group, value) + a broadcast join of
    the per-group totals (|groups| rows) — no window over the fact
    table, no second fact scan, and the support test is pure integer
    arithmetic (cnt*64 >= total), so there is no float threshold to
    diverge cross-engine. At 100 TB both aggregations are map-side
    partial; the totals side is KBs regardless of corpus size."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("bigint").alias("qty")
    )
    counts = li.groupBy("l_returnflag", "qty").agg(F.count("*").alias("cnt"))
    totals = li.groupBy("l_returnflag").agg(F.count("*").alias("total"))
    return counts.join(F.broadcast(totals), "l_returnflag").filter(
        F.col("cnt") * 64 >= F.col("total")
    )


_CM_D = 4  # sketch depth (independent hash rows)
_CM_W = 256  # sketch width (buckets per row)


@query(
    "agg_countmin_freq",
    oracle="""
    WITH ds AS (SELECT UNNEST([0, 1, 2, 3]) AS d),
    h AS (SELECT o_custkey, md5(CAST(o_custkey AS VARCHAR)) AS hx
          FROM orders),
    cells AS (
      SELECT ds.d,
             CAST(('0x' || substring(h.hx, ds.d * 8 + 1, 8)) AS BIGINT)
               % 256 AS b,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM h CROSS JOIN ds GROUP BY 1, 2
    ),
    probes AS (
      SELECT o_custkey, md5(CAST(o_custkey AS VARCHAR)) AS hx,
             CAST(COUNT(*) AS BIGINT) AS exact_cnt
      FROM orders WHERE o_custkey <= 20 GROUP BY 1, 2
    ),
    pc AS (
      SELECT p.o_custkey, p.exact_cnt, ds.d,
             CAST(('0x' || substring(p.hx, ds.d * 8 + 1, 8)) AS BIGINT)
               % 256 AS b
      FROM probes p CROSS JOIN ds
    )
    SELECT pc.o_custkey AS custkey,
           CAST(MIN(cells.c) AS BIGINT) AS cm_estimate,
           CAST(MAX(pc.exact_cnt) AS BIGINT) AS exact_cnt
    FROM pc JOIN cells ON cells.d = pc.d AND cells.b = pc.b
    GROUP BY 1
    """,
)
def agg_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch point-frequency estimation with a FULLY EXACT
    oracle: unlike HLL (whose state is engine-internal), a CM sketch is
    plain SQL — d=4 hash rows of w=256 counters, estimate = min over
    rows of the probed bucket's count. Both engines compute the
    identical sketch bit-for-bit, so the estimate itself (not just an
    error band) is hash-gated; the exact count rides along to expose the
    overestimate. The d rows' hashes are the four 8-hex-char FIELDS of
    ONE md5 per key (the standard split-one-hash construction) — r8
    replaced the original per-row md5(d:key), which paid 4 hashes + a
    string concat per input row for identical sketch quality (1.6s →
    0.95s at sf0.1). Shape: one md5 per row, then a map-side explode of
    the 4 precomputed (d, bucket) structs + two-phase count into
    d*w=1024 cells — O(1) state per any corpus size; probes join the
    broadcast cell table. This is the frequency-sketch sibling of
    agg_bitmap_distinct (distinct-count sketch)."""
    orders = load(spark, sf_dir, "orders").select("o_custkey")

    def rows4(col_h):
        # the 4 (d, bucket) pairs from one md5: bucket_d = hex field d
        return F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("d"),
                        (
                            F.conv(F.substring(col_h, 1 + 8 * i, 8), 16, 10)
                            .cast("bigint")
                            % _CM_W
                        ).alias("b"),
                    )
                    for i in range(_CM_D)
                ]
            )
        )

    h = orders.withColumn("hx", F.md5(F.col("o_custkey").cast("string")))
    cells = (
        h.select(rows4(F.col("hx")).alias("db"))
        .groupBy(F.col("db.d").alias("d"), F.col("db.b").alias("b"))
        .agg(F.count("*").alias("c"))
    )
    probes = (
        orders.filter(F.col("o_custkey") <= 20)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("exact_cnt"))
        .withColumn("hx", F.md5(F.col("o_custkey").cast("string")))
        .select("o_custkey", "exact_cnt", rows4(F.col("hx")).alias("db"))
        .select(
            "o_custkey",
            "exact_cnt",
            F.col("db.d").alias("d"),
            F.col("db.b").alias("b"),
        )
    )
    return (
        probes.join(F.broadcast(cells), ["d", "b"])
        .groupBy("o_custkey")
        .agg(
            F.min("c").alias("cm_estimate"),
            F.max("exact_cnt").alias("exact_cnt"),
        )
        .withColumnRenamed("o_custkey", "custkey")
    )


@query(
    "sample_reservoir_det",
    oracle="""
    SELECT event_type, event_id, rk FROM (
      SELECT event_type, event_id,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
             ) AS INT) AS rk
      FROM events
    ) WHERE rk <= 10
    """,
)
def sample_reservoir_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-SIZE per-stratum sampling (the reservoir contract: exactly
    k rows per group, unlike the fixed-RATE Bernoulli sample of
    sample_stratified_det): keep each event_type's 10 rows with the
    smallest md5(event_id). Hash-ordering is the deterministic,
    engine-portable replacement for random reservoir fill — same
    marginal distribution (md5 is uniform on the key), reproducible
    across runs and engines, and mergeable: the k smallest hashes of a
    union are computable from each part's k smallest, which is why
    bottom-k-by-hash is the standard distributed reservoir. At 100 TB
    the window's per-group top-k is pushed map-side by Spark's
    WindowGroupLimit, so each task forwards at most k rows per group to
    the single exchange."""
    ev = load(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    h = F.md5(F.col("event_id").cast("string"))
    rk = F.row_number().over(
        W.partitionBy("event_type").orderBy(h, "event_id")
    )
    return (
        ev.select("event_type", "event_id", rk.alias("rk"))
        .filter(F.col("rk") <= 10)
    )


@query(
    "agg_sketch_merge",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT
             CAST(('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
                  AS BIGINT) % 1024) AS BIGINT) AS buckets_set,
           CAST(COUNT(DISTINCT date_trunc('month', o_orderdate)) AS BIGINT)
             AS n_partials
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch MERGEABILITY — the property that makes approximate
    distinct-counting distributable: a linear-counting bitmap is built
    independently per (priority, MONTH) slice (the shape a partitioned
    ingest naturally produces: one partial sketch per arriving
    partition), then the per-month cell sets are UNION-merged per
    priority — and the hash gate proves merged(partials) ==
    direct(whole period), the defining sketch identity. The Spark side
    really materializes the partial sketches (collect_set of occupied
    cells per slice, then flatten+distinct across slices); the oracle
    computes the direct whole-period sketch. At 100 TB this is how
    distinct-over-a-year runs: per-partition sketches merge in O(cells)
    per group instead of re-shuffling raw keys."""
    orders = load(spark, sf_dir, "orders")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 15),
            16,
            10,
        ).cast("bigint")
        % 1024
    )
    partials = (
        orders.select(
            "o_orderpriority",
            F.date_trunc("month", "o_orderdate").alias("mon"),
            bucket.alias("cell"),
        )
        .groupBy("o_orderpriority", "mon")
        .agg(F.collect_set("cell").alias("cells"))
    )
    return partials.groupBy("o_orderpriority").agg(
        F.size(
            F.array_distinct(F.flatten(F.collect_list("cells")))
        ).cast("bigint").alias("buckets_set"),
        F.count("*").alias("n_partials"),
    )


@query(
    "agg_funnel_conversion",
    oracle="""
    WITH m AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END)
               AS first_view,
             MIN(CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END)
               AS first_click,
             MIN(CASE WHEN event_type = 'purchase'
                      THEN CAST(ts AS TIMESTAMP) END) AS first_purchase
      FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_viewed,
           CAST(SUM(CASE WHEN first_view IS NOT NULL
                          AND first_click > first_view THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clicked_after_view,
           CAST(SUM(CASE WHEN first_view IS NOT NULL
                          AND first_click > first_view
                          AND first_purchase > first_click
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
    FROM m
    """,
)
def agg_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDERED FUNNEL conversion (the product-analytics staple): users
    counted into view → click-after-view → purchase-after-click stages
    by comparing each stage's FIRST event time — min-reduction per
    (user, stage), then one global rollup. Strictly-ordered semantics
    (each stage must start after the previous stage's first touch).
    Pure conditional-min aggregation: one shuffle on user_id with full
    map-side partial aggregation, then a scalar rollup — at 100 TB the
    exchange carries one row per user, and the stage comparison is free.
    The cogrouped-pandas sibling (udf_cogrouped_funnel) covers the
    arbitrary-logic form; this row pins the pure-SQL shape."""
    ev = load(spark, sf_dir, "events")
    first = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))
    m = ev.groupBy("user_id").agg(
        first("view").alias("first_view"),
        first("click").alias("first_click"),
        first("purchase").alias("first_purchase"),
    )
    viewed = F.col("first_view").isNotNull()
    clicked = viewed & (F.col("first_click") > F.col("first_view"))
    full = clicked & (F.col("first_purchase") > F.col("first_click"))
    one = lambda c: F.sum(F.when(c, 1).otherwise(0))
    return m.agg(
        F.count("*").alias("n_users"),
        one(viewed).alias("n_viewed"),
        one(clicked).alias("n_clicked_after_view"),
        one(full).alias("n_full_funnel"),
    )
