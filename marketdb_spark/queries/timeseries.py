"""Time-series queries on the `events` table — the marketdb domain surface
(scan, k-way merge, as-of join, OHLC bars, interval expansion) exercised on
driver data so each has a DuckDB oracle.

The reference computes `(market, security, interval) -> ordered stream`
(MarketDB.scala:66-106) and client-side merge/folds
(TimeSeriesEnumerator.scala:48-99). `events(user_id, ts, event_type, value)`
plays the role of the (market, security) keyed stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marketdb_spark.api import merge_series, scan_series
from marketdb_spark.catalog import load
from marketdb_spark.functions.exact import dsum, oracle_dsum
from marketdb_spark.operators.asof import asof_join
from marketdb_spark.operators.ohlc import ohlc_bars
from marketdb_spark.queries.registry import query

_START = "2024-01-10 00:00:00"
_END = "2024-01-20 23:59:59"


@query(
    "ts_scan_series",
    oracle=f"""
    SELECT event_id, ts, user_id, event_type, value
    FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events) events
    WHERE user_id = 7
      AND ts >= TIMESTAMP '{_START}'
      AND ts <= TIMESTAMP '{_END}'
    """,
)
def ts_scan_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's one true query: key-equality + inclusive time range,
    ordered by time (MarketDB.scala:79-81; inclusive-end per SURVEY §3.2).
    Predicates push down to the parquet scan."""
    ev = load(spark, sf_dir, "events")
    return scan_series(
        ev, "ts", _START, _END, tie_cols=["event_id"], user_id=7
    ).select("event_id", "ts", "user_id", "event_type", "value")


@query(
    "ts_merge_series",
    oracle=f"""
    SELECT kind, event_id, ts, user_id, value
    FROM (
      SELECT 'clicks' AS kind, event_id, ts, user_id, value
      FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events) events WHERE event_type = 'click' AND user_id <= 20
      UNION ALL
      SELECT 'purchases' AS kind, event_id, ts, user_id, value
      FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events) events WHERE event_type = 'purchase' AND user_id <= 20
    )
    """,
)
def ts_merge_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-way heterogeneous merge into one globally time-ordered stream with
    deterministic (time, kind, id) tie-break — the reference's min-head
    merge (TimeSeriesEnumerator.scala:86-93) as unionByName + orderBy."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") <= 20)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", "value"
    )
    return merge_series(
        [clicks, purchases],
        time_col="ts",
        tie_cols=["event_id"],
        kind_col="kind",
        kinds=["clicks", "purchases"],
    ).select("kind", "event_id", "ts", "user_id", "value")


@query(
    "ts_asof_join",
    oracle="""
    SELECT a.event_id, a.user_id, a.ts, a.value,
           b.ts AS ts_right, b.value AS value_right
    FROM (SELECT * FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events) events WHERE event_type = 'click') a
    ASOF LEFT JOIN (SELECT * FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events) events WHERE event_type = 'purchase') b
      ON a.user_id = b.user_id AND a.ts >= b.ts
    """,
)
def ts_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each click gets the latest purchase at-or-before
    it for the same user — the backtesting staple (SURVEY §2B), one shuffle,
    no UDF (see marketdb_spark.operators.asof)."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    return asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_time="ts",
        right_time="ts",
        right_cols=["value"],
    )


@query(
    "ts_asof_forward",
    oracle="""
    SELECT a.event_id, a.user_id, a.ts,
           b.ts AS ts_right, b.value AS value_right
    FROM (SELECT * FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events) events WHERE event_type = 'signup') a
    ASOF LEFT JOIN (SELECT * FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events) events WHERE event_type = 'purchase') b
      ON a.user_id = b.user_id AND a.ts <= b.ts
    """,
)
def ts_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each signup gets the user's FIRST purchase at or
    after it (time-to-conversion analysis shape)."""
    ev = load(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    return asof_join(
        signups,
        purchases,
        on=["user_id"],
        left_time="ts",
        right_time="ts",
        right_cols=["value"],
        direction="forward",
    )


@query(
    "ts_ohlc_hourly",
    oracle="""
    WITH ranked AS (
      SELECT user_id, date_trunc('hour', ts) AS bar_start, ts, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
               ORDER BY ts, event_id) AS rn_open,
             ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
               ORDER BY ts DESC, event_id DESC) AS rn_close
      FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events) events
    )
    SELECT user_id, bar_start,
           MAX(CASE WHEN rn_open  = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_close = 1 THEN value END) AS close,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS volume,
           COUNT(*) AS n_events
    FROM ranked
    GROUP BY user_id, bar_start
    """,
)
def ts_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per user — the reference's minute-bucket row-key
    rollup (Trade.scala:24-27) generalized (see marketdb_spark.operators.ohlc)."""
    ev = load(spark, sf_dir, "events")
    return ohlc_bars(
        ev,
        key_cols=["user_id"],
        time_col="ts",
        value_col="value",
        id_col="event_id",
        bar="hour",
    )


@query(
    "ts_interval_days",
    oracle="""
    SELECT user_id,
           CAST(CAST(UNNEST(generate_series(
             CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE), INTERVAL 1 DAY
           )) AS DATE) AS TIMESTAMP) AS day
    FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events) events
    WHERE user_id <= 5
    GROUP BY user_id
    """,
)
def ts_interval_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval→days expansion (the loader's per-day loop,
    marketdb-loader/.../util/Implicits.scala:12-26): sequence + explode."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") <= 5)
    spans = ev.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("first_day"),
        F.max("ts").cast("date").alias("last_day"),
    )
    # day emitted as TIMESTAMP, not DATE: date-typed outputs stringify
    # differently across engines/pandas and would break the hash compare.
    return spans.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("first_day"), F.col("last_day"), F.expr("interval 1 day")
            )
        ).alias("day_date"),
    ).select("user_id", F.col("day_date").cast("timestamp").alias("day"))


@query(
    "ts_session_gaps",
    oracle="""
    SELECT user_id, event_id, ts,
           CAST(CASE WHEN prev_ts IS NULL
                     OR epoch_us(ts) - epoch_us(prev_ts) > 3600000000
                THEN 1 ELSE 0 END AS INT) AS is_session_start
    FROM (
      SELECT user_id, event_id, ts,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events) events
      WHERE user_id <= 10
    )
    """,
)
def ts_session_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization primitive: mark rows starting a new session after a
    >1h gap (batch analog of streaming session windows, SURVEY §2B)."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events").filter(F.col("user_id") <= 10)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(prev)
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(prev.isNull() | (gap_us > 3_600_000_000), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_session_start"),
    )


@query(
    "ts_tumbling_window",
    oracle="""
    SELECT time_bucket(INTERVAL 15 MINUTE, CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY window_start, event_type
    """,
)
def ts_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time buckets via F.window (the minute-bucket row-key
    clock of the reference, Trade.scala:24-27, generalized). 15-minute
    grids are epoch-aligned in Spark and 2000-01-01-aligned in DuckDB's
    time_bucket — both origins sit on a 15-minute boundary, so the bucket
    edges coincide and the oracle matches exactly."""
    from marketdb_spark.functions.exact import dsum

    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "15 minutes").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            dsum("value", scale=6).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "ts_ohlc_daily_rollup",
    oracle="""
    WITH ranked AS (
      SELECT user_id, date_trunc('day', ts) AS bar_start, ts, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('day', ts)
               ORDER BY ts, event_id) AS rn_open,
             ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('day', ts)
               ORDER BY ts DESC, event_id DESC) AS rn_close
      FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value FROM events) events
    )
    SELECT user_id, bar_start,
           MAX(CASE WHEN rn_open  = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_close = 1 THEN value END) AS close,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS volume,
           COUNT(*) AS n_events
    FROM ranked
    GROUP BY user_id, bar_start
    """,
)
def ts_ohlc_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC computed by re-aggregating HOURLY bars (operators.ohlc.
    rollup_bars) — the continuous-aggregate pattern. The oracle computes
    daily bars directly from raw events: the hash match proves the rollup
    composition is exactly equivalent, which is what licenses the cheap
    cascade (raw → hourly → daily → …) at scale."""
    ev = load(spark, sf_dir, "events")
    hourly = ohlc_bars(
        ev,
        key_cols=["user_id"],
        time_col="ts",
        value_col="value",
        id_col="event_id",
        bar="hour",
    )
    from marketdb_spark.operators.ohlc import rollup_bars

    return rollup_bars(hourly, key_cols=["user_id"], bar="day")


@query(
    "ts_asof_tolerance",
    oracle="""
    WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
                       event_type, value FROM events),
    j AS (
      SELECT a.event_id, a.user_id, a.ts, a.value,
             b.ts AS m_ts, b.value AS m_value
      FROM (SELECT * FROM ev WHERE event_type = 'click') a
      ASOF LEFT JOIN (SELECT * FROM ev WHERE event_type = 'purchase') b
        ON a.user_id = b.user_id AND a.ts >= b.ts
    )
    SELECT event_id, user_id, ts, value,
           CASE WHEN epoch(ts) - epoch(m_ts) <= 172800.0 THEN m_ts END
             AS ts_right,
           CASE WHEN epoch(ts) - epoch(m_ts) <= 172800.0 THEN m_value END
             AS value_right
    FROM j
    """,
)
def ts_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-staleness as-of join (merge_asof tolerance semantics): each
    click gets the latest same-user purchase at-or-before it ONLY if that
    purchase is ≤ 2 days old — a quote staler than the tolerance is no
    quote, not a fall-back to an even older one. Same one-shuffle window
    plan as ts_asof_join; the tolerance is a post-predicate."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    return asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_time="ts",
        right_time="ts",
        right_cols=["value"],
        tolerance_seconds=2 * 86400,
    )


@query(
    "ts_similarity_paa",
    oracle="""
    WITH seq AS (
      SELECT user_id, list(value ORDER BY ts, event_id) AS vals,
             COUNT(*) AS n
      FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value
            FROM events) events
      GROUP BY user_id HAVING COUNT(*) >= 8
    ),
    paa AS (
      SELECT user_id,
             list_transform(range(0, 8), j ->
               list_reduce(vals[CAST(floor(j * n / 8) AS BIGINT) + 1
                                : CAST(floor((j + 1) * n / 8) AS BIGINT)],
                           (a, b) -> a + b)
               / (floor((j + 1) * n / 8) - floor(j * n / 8))) AS sketch
      FROM seq
    )
    SELECT a.user_id,
           list_reduce(list_transform(range(0, 8), j ->
             (a.sketch[j + 1] - q.sketch[j + 1])
             * (a.sketch[j + 1] - q.sketch[j + 1])), (x, y) -> x + y) AS dist
    FROM paa a, paa q
    WHERE q.user_id = 0 AND a.user_id <> 0
    """,
)
def ts_similarity_paa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search via PAA sketches (piecewise aggregate
    approximation — the dimensionality reduction distributed TS-similarity
    systems use, cf. the EDBT'19 streaming-similarity and REPOSE
    trajectory-search line of work): each user's event-value sequence
    (ordered by ts, tie-break event_id) is reduced to 8 segment means
    map-side, then every user's sketch is compared to user 0's by squared
    Euclidean distance.

    Scale shape: the sketch is computed in ONE groupBy (collect_list +
    array folds — per-key data never leaves its partition after the
    shuffle), and the comparison joins 8-double sketches, not raw series:
    at 100 TB you broadcast the query sketch against billions of
    fixed-width rows. All folds are sequential over identically-ordered
    lists on both engines → bit-exact (zip_with/aggregate ↔ list_reduce).
    """
    ev = load(spark, sf_dir, "events")
    seq = (
        ev.groupBy("user_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "value"))
            ).alias("sv")
        )
        .filter(F.size("sv") >= 8)
        .select(
            "user_id",
            F.transform("sv", lambda s: s["value"]).alias("vals"),
            F.size("sv").alias("n"),
        )
    )

    def seg_mean(j):
        lo = F.floor(j * F.col("n") / 8)
        hi = F.floor((j + 1) * F.col("n") / 8)
        sl = F.slice("vals", (lo + 1).cast("int"), (hi - lo).cast("int"))
        return (
            F.aggregate(sl, F.lit(0.0), lambda a, x: a + x) / (hi - lo)
        )

    paa = seq.select(
        "user_id", F.array(*[seg_mean(F.lit(j)) for j in range(8)]).alias("sketch")
    )
    qsk = paa.filter(F.col("user_id") == 0).select(
        F.col("sketch").alias("qsketch")
    )
    dist = F.aggregate(
        F.zip_with("sketch", "qsketch", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return (
        paa.filter(F.col("user_id") != 0)
        .crossJoin(F.broadcast(qsk))
        .select("user_id", dist.alias("dist"))
    )


@query(
    "ts_resample_ffill",
    oracle="""
    WITH ev AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(value) AS value
      FROM events GROUP BY user_id, CAST(ts AS TIMESTAMP)
    ),
    spans AS (
      SELECT user_id, date_trunc('hour', MIN(ts)) AS mn, MAX(ts) AS mx
      FROM ev GROUP BY user_id
    ),
    grid AS (
      SELECT user_id,
             UNNEST(generate_series(mn, mx, INTERVAL 1 HOUR)) AS grid_ts
      FROM spans
    )
    SELECT g.user_id, g.grid_ts, e.ts AS src_ts, e.value
    FROM grid g ASOF JOIN ev e
      ON g.user_id = e.user_id AND e.ts <= g.grid_ts
    """,
)
def ts_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-grid resampling with forward fill — the gap-fill every
    market time-series consumer needs (sample the last-known value on an
    hourly grid per key). Per key: hourly grid spanning [trunc(min ts),
    max ts], then the backward as-of join (operators/asof.py) attaches
    the latest observation at-or-before each grid point; grid points
    before the first observation drop (inner as-of on both engines).
    Events sharing a timestamp are pre-reduced to MAX(value) — the same
    deterministic-tie convention as stream_asof_enrich — so the as-of
    match is unambiguous on any engine. Shape: the grid explode is
    map-side from per-key span aggregates; the as-of join is the
    operator's single union+window shuffle on user_id."""
    ev = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    spans = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("mn"),
        F.max("ts").alias("mx"),
    )
    grid = spans.select(
        "user_id",
        F.explode(F.sequence("mn", "mx", F.expr("interval 1 hour"))).alias(
            "grid_ts"
        ),
    )
    out = asof_join(
        grid, ev, on=["user_id"], left_time="grid_ts", right_time="ts",
        right_cols=["value"],
    )
    return out.filter(F.col("ts_right").isNotNull()).select(
        "user_id",
        "grid_ts",
        F.col("ts_right").alias("src_ts"),
        F.col("value_right").alias("value"),
    )


@query(
    "ts_ewma",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           list_reduce(list(CAST(value AS DOUBLE) ORDER BY ts, event_id),
                       (acc, v) -> acc * 0.75 + v * 0.25) AS ewma
    FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value
          FROM events) e
    GROUP BY user_id
    """,
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per key (alpha = 0.25, an
    exact binary fraction): the classic order-dependent recurrence
    ewma_i = 0.75*ewma_{i-1} + 0.25*v_i, evaluated as a deterministic
    left-to-right fold over the (ts, event_id)-ordered series so DuckDB's
    list_reduce replays the identical IEEE operations — an engine-exact
    result for an operator that naive floating aggregation cannot
    hash-check. Head element is the fold's seed on both engines.

    Shape: one groupBy(key) shuffle; the per-key series is collected to
    an array (bounded by events-per-key — fine for per-instrument daily
    series; at unbounded history you window the fold with a segmented
    scan or keep it as streaming state, streaming/stateful.py)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", F.col("value").cast("double").alias("v")
    )
    grouped = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sort_array(F.collect_list(F.struct("ts", "event_id", "v"))).alias(
            "series"
        ),
    )
    vals = F.transform("series", lambda s: s.getField("v"))
    ewma = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, v: acc * F.lit(0.75) + v * F.lit(0.25),
    )
    return grouped.select("user_id", "n_events", ewma.alias("ewma"))


@query(
    "ts_zscore_outliers",
    oracle=f"""
    WITH s AS (
      SELECT user_id, COUNT(*) AS n,
             {oracle_dsum('value')} AS s1,
             {oracle_dsum('value * value', 4)} AS s2
      FROM events GROUP BY user_id
    ),
    st AS (
      SELECT user_id, n,
             (s1 / n) AS mean_v,
             ((s2 - s1 * s1 / n) / (n - 1)) AS var_v
      FROM s WHERE n >= 2
    )
    SELECT e.user_id, e.event_id, CAST(e.ts AS TIMESTAMP) AS ts, e.value,
           (e.value - st.mean_v) / sqrt(st.var_v) AS zscore
    FROM events e JOIN st ON e.user_id = st.user_id
    WHERE st.var_v > 0
      AND abs((e.value - st.mean_v) / sqrt(st.var_v)) > 2.5
    """,
)
def ts_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key anomaly detection: flag events whose value deviates more
    than 2.5 sample standard deviations from the key's mean. Moments come
    from decimal-exact sums (the stats_moments convention — order-
    independent, so both engines derive bit-identical mean/variance
    doubles); the z-score itself is a fixed chain of IEEE ops (sub, div,
    correctly-rounded sqrt), hence engine-exact. var_v > 0 guards the
    constant-series cancellation case before any sqrt. Shape: one
    groupBy(key) for moments (map-side partial sums), stats broadcast
    back — the detection pass itself is map-only over the events scan."""
    ev = load(spark, sf_dir, "events")
    s = ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        dsum("value").alias("s1"),
        dsum(F.col("value") * F.col("value"), scale=4).alias("s2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    st = s.filter(n >= 2).select(
        "user_id",
        "n",
        (s1 / n).alias("mean_v"),
        ((s2 - s1 * s1 / n) / (n - 1)).alias("var_v"),
    )
    z = (F.col("value") - F.col("mean_v")) / F.sqrt(F.col("var_v"))
    return (
        ev.join(F.broadcast(st), "user_id")
        .filter((F.col("var_v") > 0) & (F.abs(z) > 2.5))
        .select("user_id", "event_id", "ts", "value", z.alias("zscore"))
    )


@query(
    "ts_autocorr_lag1",
    oracle=f"""
    WITH g AS (
      SELECT user_id, COUNT(*) AS n,
             {oracle_dsum('value')} AS s1,
             list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vals
      FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value
            FROM events) e
      GROUP BY user_id
    ),
    m AS (SELECT user_id, n, vals, (s1 / n) AS mean_v FROM g WHERE n >= 2),
    t AS (
      SELECT user_id, n,
             list_reduce(list_transform(range(1, len(vals)),
               i -> (vals[i] - mean_v) * (vals[i + 1] - mean_v)),
               (acc, x) -> acc + x) AS num,
             list_reduce(list_transform(vals,
               v -> (v - mean_v) * (v - mean_v)),
               (acc, x) -> acc + x) AS den
      FROM m
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_events, (num / den) AS autocorr1
    FROM t WHERE den > 0
    """,
)
def ts_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation per key — the mean-reversion/momentum
    diagnostic: sum of centered consecutive-pair products over the
    centered sum of squares, both evaluated as deterministic left-to-right
    folds over the (ts, event_id)-ordered series (the ts_ewma discipline),
    with the mean from a decimal-exact sum — so every double on both
    engines is identical and the ratio hash-checks bit-for-bit. den > 0
    guards constant series. Same shape/scale notes as ts_ewma: one
    groupBy(key), per-key series arrays."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", F.col("value").cast("double").alias("v")
    )
    g = ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        dsum("v").alias("s1"),
        F.sort_array(F.collect_list(F.struct("ts", "event_id", "v"))).alias(
            "series"
        ),
    )
    g = g.filter(F.col("n") >= 2)
    vals = F.transform("series", lambda s: s.getField("v"))
    mean_v = F.col("s1") / F.col("n")
    head = F.slice(vals, 1, F.size(vals) - 1)
    tail = F.slice(vals, 2, F.size(vals) - 1)
    num = F.aggregate(
        F.zip_with(head, tail, lambda a, b: (a - mean_v) * (b - mean_v)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    den = F.aggregate(
        F.transform(vals, lambda v: (v - mean_v) * (v - mean_v)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        g.select(
            "user_id",
            F.col("n").alias("n_events"),
            num.alias("num"),
            den.alias("den"),
        )
        .filter(F.col("den") > 0)
        .select("user_id", "n_events", (F.col("num") / F.col("den")).alias("autocorr1"))
    )


@query(
    "ts_vwap_hourly",
    oracle="""
    SELECT event_type,
           date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bar_start,
           CASE WHEN SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) <> 0
                THEN CAST(SUM(CAST(value * CAST(json_extract_string(props, '$.k')
                                           AS BIGINT) AS DECIMAL(18,6)))
                     AS DOUBLE)
                  / CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                         AS DOUBLE)
           END AS vwap,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS volume,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY event_type, bar_start
    """,
)
def ts_vwap_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted average price per (series, hourly bar) — the
    backtesting staple next to OHLC (the reference's per-minute buckets,
    Trade.scala:24-27, weighted by size). value = price, the JSON props
    field k = volume. Engine-exact: each price·volume product is one
    double multiply (identical bits both engines) truncated to
    decimal(18,6) before the SUM (order-independent exact adds), volume
    sums are integer-exact, and the final vwap is a single double
    division (NULL for zero-volume bars — ANSI-safe on both engines).
    Plan: one scan, map-side partial aggregation, one shuffle on
    (type, hour)."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    wsum = F.sum((F.col("value") * k).cast("decimal(18,6)")).cast("double")
    vol = F.sum(k)
    return ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bar_start")
    ).agg(
        F.when(vol != 0, wsum / vol.cast("double")).alias("vwap"),
        vol.cast("bigint").alias("volume"),
        F.count("*").alias("n_events"),
    )


def _bracket_obs(rows):
    """Attach backward/forward observation brackets (t1, v1, t2, v2) to
    every row of a union frame with columns (user_id, ts, value, is_obs):
    t1/v1 = the latest observation at-or-before the row's ts, t2/v2 = the
    earliest at-or-after (both INCLUSIVE). The kernel of ts_asof_nearest.
    Requires at most ONE observation row per (user_id, ts) — the caller
    dedups its obs side first.

    Brackets are carried as (ts, value) STRUCTS from one observation row
    — bracketing ts and value with separate last(ignorenulls) calls
    would desynchronize them when a matched observation's value is NULL
    (ignorenulls skips past it to an OLDER observation's value while the
    timestamp stays put).

    Plan shape: BOTH frames are running (unboundedPreceding→currentRow)
    frames — Spark's UnboundedPrecedingWindowFunctionFrame updates its
    aggregate incrementally, O(rows) per partition. The forward bracket
    comes from the same running frame over the REVERSED order (ts desc):
    "last observation at-or-before current, walking from the partition
    end" IS "first observation at-or-after current" in ascending time.
    The r13 form computed it over the ascending order with a
    (currentRow→unboundedFollowing) frame instead — Spark's
    UnboundedFollowingWindowFunctionFrame re-evaluates the aggregate
    over the whole remaining frame FOR EVERY ROW, O(rows²) per user
    partition: invisible at sf0.1 (~10²-10³ rows/user) and fatal at
    100 TB (10⁶ events/user → 10¹² frame evaluations). The price of the
    fix is a second sortWithinPartitions of the union (no new
    Exchange); the plan gate pins Sort→Window→Sort→Window on one
    exchange. Tie order makes both frames inclusive directly: obs
    sorts BEFORE the query row at equal ts under both orders
    (is_obs desc), so the old forward-hit backfill is gone."""
    from pyspark.sql import Window as W

    obs = F.when(
        F.col("is_obs") == 1,
        F.struct(F.col("ts").alias("t"), F.col("value").alias("v")),
    )
    w_back = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_obs").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_fwd = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("is_obs").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        rows.withColumn("__b", F.last(obs, ignorenulls=True).over(w_back))
        .withColumn("__f", F.last(obs, ignorenulls=True).over(w_fwd))
        .withColumn("t1", F.col("__b.t"))
        .withColumn("v1", F.col("__b.v"))
        .withColumn("t2", F.col("__f.t"))
        .withColumn("v2", F.col("__f.v"))
        .drop("__b", "__f")
    )


@query(
    "ts_resample_interp",
    oracle="""
    WITH ev AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(value) AS value
      FROM events GROUP BY user_id, CAST(ts AS TIMESTAMP)
    ),
    spans AS (
      SELECT user_id, date_trunc('hour', MIN(ts)) AS mn, MAX(ts) AS mx
      FROM ev GROUP BY user_id
    ),
    grid AS (
      SELECT user_id,
             UNNEST(generate_series(mn, mx, INTERVAL 1 HOUR)) AS grid_ts
      FROM spans
    ),
    prev AS (
      SELECT g.user_id, g.grid_ts, e.ts AS t1, e.value AS v1
      FROM grid g ASOF JOIN ev e
        ON g.user_id = e.user_id AND e.ts <= g.grid_ts
    ),
    nxt AS (
      SELECT g.user_id, g.grid_ts, e.ts AS t2, e.value AS v2
      FROM grid g ASOF JOIN ev e
        ON g.user_id = e.user_id AND g.grid_ts <= e.ts
    ),
    j AS (
      SELECT p.user_id, p.grid_ts, p.t1, p.v1, n.t2, n.v2,
             CAST(epoch_us(n.t2) // 1000000 - epoch_us(p.t1) // 1000000
                  AS BIGINT) AS den,
             CAST(epoch_us(n.t2) // 1000000
                  - epoch_us(p.grid_ts) // 1000000 AS BIGINT) AS w1,
             CAST(epoch_us(p.grid_ts) // 1000000
                  - epoch_us(p.t1) // 1000000 AS BIGINT) AS w2,
             CAST(CAST(p.v1 AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v1u,
             CAST(CAST(n.v2 AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v2u
      FROM prev p JOIN nxt n USING (user_id, grid_ts)
    )
    SELECT user_id, grid_ts, t1 AS prev_ts, t2 AS next_ts,
           CASE WHEN den = 0 THEN v1u ELSE v1u * w1 + v2u * w2 END
             AS interp_num,
           CASE WHEN den = 0 THEN CAST(1 AS BIGINT) ELSE den END
             AS interp_den
    FROM j
    """,
)
def ts_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-grid resampling with LINEAR INTERPOLATION — the other half
    of the gap-fill pair (ts_resample_ffill is the step-function half):
    per key, sample an hourly grid and attach value = v1 + (v2-v1) *
    (g-t1)/(t2-t1) between the bracketing observations. The interpolated
    value is emitted as an EXACT RATIONAL — interp_num/interp_den with
    micro-scaled integer values and second-resolution weights — because a
    float division is the one step two engines may round differently;
    every emitted column is integer/timestamp, so the hash gate checks
    the interpolation itself, not a rounding convention. Grid points
    coinciding with an observation get (v1u, 1). Shape: SINGLE PASS over
    the observations only — dedup to (user_id, ts, value), lead() to the
    next observation, then each CONSECUTIVE OBSERVATION PAIR emits
    exactly the hour-aligned grid points it brackets
    (t_i ≤ g < t_{i+1}, plus g = t_n for the aligned last observation).
    Equivalent to the r13 union+double-window form — the grid is the
    hour-aligned points of [min(ts), max(ts)] per user (the leading
    floor-hour points of the oracle's generate_series drop for lack of
    a backward bracket), and the pair holding g IS its bracket — but:
    ONE scan + ONE exchange instead of two (the span/grid branch
    re-scanned events because SQL plans have no subtree reuse), the
    sort/window carry only the ~N obs rows instead of N+grid rows, the
    bracket is an O(1) lead() (OffsetWindowFunctionFrame) instead of a
    (currentRow→unboundedFollowing) frame that Spark re-evaluates per
    row — O(rows²) per user partition, ~0.9 G frame evaluations at
    sf0.1, growing quadratically with per-user density — and grid rows
    are born with their brackets attached AFTER the window instead of
    being sorted through it. The leading repartition(user_id) still
    makes the dedup and the window ride one exchange (subset rule).
    Points before the first observation have no backward bracket and
    drop (inner semantics), mirroring ffill."""
    from pyspark.sql import Window as W

    par = spark.sparkContext.defaultParallelism
    ev = (
        load(spark, sf_dir, "events")
        .repartition(par, "user_id")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    w = W.partitionBy("user_id").orderBy("ts")
    hour = F.expr("interval 1 hour")
    pairs = ev.select(
        "user_id",
        "ts",
        "value",
        F.lead("ts").over(w).alias("nts"),
        F.lead("value").over(w).alias("nval"),
    )
    # hour-aligned grid points g with ts <= g < nts (the last obs of a
    # user, nts NULL, contributes only g == ts when hour-aligned):
    # start = ceil_hour(ts), stop = largest aligned point STRICTLY
    # before nts; an empty [start, stop] yields no rows (explode of
    # the empty array), never a reversed sequence() error.
    trunc_ts = F.date_trunc("hour", F.col("ts"))
    start = F.when(trunc_ts == F.col("ts"), F.col("ts")).otherwise(
        trunc_ts + hour
    )
    trunc_nxt = F.date_trunc("hour", F.col("nts"))
    stop = F.when(
        F.col("nts").isNull(), trunc_ts
    ).otherwise(
        F.when(trunc_nxt == F.col("nts"), trunc_nxt - hour).otherwise(
            trunc_nxt
        )
    )
    grid = F.when(
        start <= stop, F.sequence(start, stop, hour)
    ).otherwise(F.array().cast("array<timestamp>"))
    bracketed = (
        pairs.select(
            "user_id", "ts", "value", "nts", "nval",
            F.explode(grid).alias("grid_ts"),
        )
        .withColumn("t1", F.col("ts"))
        .withColumn("v1", F.col("value"))
        .withColumn(
            "t2",
            F.when(F.col("grid_ts") == F.col("ts"), F.col("ts")).otherwise(
                F.col("nts")
            ),
        )
        .withColumn(
            "v2",
            F.when(F.col("grid_ts") == F.col("ts"), F.col("value")).otherwise(
                F.col("nval")
            ),
        )
    )

    def secs(c):  # epoch seconds: integer div, never a float round-trip
        return F.expr(f"unix_micros({c}) div 1000000")

    def micros_scaled(c):  # exact micro-scaled integer value
        return (F.col(c).cast("decimal(18,6)") * 1000000).cast("bigint")

    j = (
        bracketed.withColumn("den", secs("t2") - secs("t1"))
        .withColumn("w1", secs("t2") - secs("grid_ts"))
        .withColumn("w2", secs("grid_ts") - secs("t1"))
        .withColumn("v1u", micros_scaled("v1"))
        .withColumn("v2u", micros_scaled("v2"))
    )
    return j.select(
        "user_id",
        "grid_ts",
        F.col("t1").alias("prev_ts"),
        F.col("t2").alias("next_ts"),
        F.when(F.col("den") == 0, F.col("v1u"))
        .otherwise(F.col("v1u") * F.col("w1") + F.col("v2u") * F.col("w2"))
        .alias("interp_num"),
        F.when(F.col("den") == 0, F.lit(1).cast("bigint"))
        .otherwise(F.col("den"))
        .alias("interp_den"),
    )


@query(
    "ts_asof_nearest",
    oracle="""
    WITH trades AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'purchase'
    ),
    quotes AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(value) AS value
      FROM events WHERE event_type = 'view'
      GROUP BY user_id, CAST(ts AS TIMESTAMP)
    ),
    back AS (
      SELECT t.event_id, t.user_id, t.ts, q.ts AS t1, q.value AS v1
      FROM trades t ASOF LEFT JOIN quotes q
        ON t.user_id = q.user_id AND q.ts <= t.ts
    ),
    fwd AS (
      SELECT t.event_id, q.ts AS t2, q.value AS v2
      FROM trades t ASOF LEFT JOIN quotes q
        ON t.user_id = q.user_id AND t.ts <= q.ts
    )
    SELECT b.event_id, b.user_id, b.ts,
           CASE WHEN b.t1 IS NULL THEN f.t2
                WHEN f.t2 IS NULL THEN b.t1
                WHEN epoch_us(b.ts) - epoch_us(b.t1)
                     <= epoch_us(f.t2) - epoch_us(b.ts) THEN b.t1
                ELSE f.t2 END AS quote_ts,
           CASE WHEN b.t1 IS NULL THEN f.v2
                WHEN f.t2 IS NULL THEN b.v1
                WHEN epoch_us(b.ts) - epoch_us(b.t1)
                     <= epoch_us(f.t2) - epoch_us(b.ts) THEN b.v1
                ELSE f.v2 END AS quote_px
    FROM back b JOIN fwd f USING (event_id)
    WHERE b.t1 IS NOT NULL OR f.t2 IS NOT NULL
    """,
)
def ts_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, direction = NEAREST (pandas merge_asof's third mode,
    completing backward/forward): each purchase matches the view with
    the smallest |Δt| per user; ties (equidistant brackets) prefer the
    EARLIER view — a pinned convention, since 'nearest' alone is
    ambiguous at equal distance. Same one-pass shape as
    ts_resample_interp: union both event roles, bracket each purchase
    with the inclusive backward/forward frames over ONE user_id
    exchange and ONE shared sort (_bracket_obs), then
    pick the closer bracket with exact integer microsecond distances —
    never a float subtraction. Purchases with no view at all drop
    (inner); one-sided purchases take their only bracket."""
    ev = load(spark, sf_dir, "events")
    trades = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts",
        F.lit(None).cast("double").alias("value"),
        F.lit(0).alias("is_obs"),
    )
    quotes = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
        .select(
            F.lit(None).cast("long").alias("event_id"),
            "user_id", "ts", "value",
            F.lit(1).alias("is_obs"),
        )
    )
    rows = trades.unionByName(quotes)
    b = _bracket_obs(rows).filter(
        (F.col("is_obs") == 0)
        & (F.col("t1").isNotNull() | F.col("t2").isNotNull())
    )
    d_back = F.unix_micros("ts") - F.unix_micros("t1")
    d_fwd = F.unix_micros("t2") - F.unix_micros("ts")
    take_back = F.col("t2").isNull() | (
        F.col("t1").isNotNull() & (d_back <= d_fwd)
    )
    return b.select(
        "event_id",
        "user_id",
        "ts",
        F.when(take_back, F.col("t1")).otherwise(F.col("t2")).alias("quote_ts"),
        F.when(take_back, F.col("v1")).otherwise(F.col("v2")).alias("quote_px"),
    )


_EPOCH_2024 = 1704067200  # 2024-01-01 UTC, shrinks x so x² sums stay exact


@query(
    "ts_linreg_trend",
    oracle=f"""
    WITH p AS (
      SELECT user_id,
             CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 1000000
                  - {_EPOCH_2024} AS HUGEINT) AS x,
             CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS HUGEINT) AS yu
      FROM events
    ),
    a AS (
      SELECT user_id, CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(x) AS sx, SUM(yu) AS sy,
             SUM(x * yu) AS sxy, SUM(x * x) AS sxx
      FROM p GROUP BY user_id
    )
    SELECT user_id,
           CAST(n AS BIGINT) AS n_obs,
           CAST(n * sxy - sx * sy AS DOUBLE) AS slope_num,
           CAST(n * sxx - sx * sx AS DOUBLE) AS slope_den,
           CASE WHEN n * sxx - sx * sx != 0
                THEN CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE)
           END AS slope_micro_per_sec
    FROM a
    """,
)
def ts_linreg_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series LINEAR TREND (ordinary least squares slope of value
    over time) — the drift estimator behind momentum/decay analytics —
    with the moment sums computed EXACTLY: x = epoch seconds rebased to
    2024-01-01 (slope is shift-invariant; rebasing keeps x² sums within
    exact integer range), y = micro-scaled integer value, and Sx, Sy,
    Sxy, Sxx accumulated as decimal(38,0) on Spark / HUGEINT in DuckDB —
    order-independent, unlike the streaming covar/var built-ins whose
    float accumulation both engines order differently. The closed-form
    slope = (n·Sxy − Sx·Sy) / (n·Sxx − Sx²) then converts the exact
    integers to doubles (correctly rounded identically on both engines)
    for one final division of identical operands. Degenerate series
    (all observations at one timestamp) yield NULL. Shape: one
    two-phase aggregation — five map-side integer sums per key."""
    ev = load(spark, sf_dir, "events")
    p = ev.select(
        "user_id",
        (
            F.expr("unix_micros(ts) div 1000000") - F.lit(_EPOCH_2024)
        ).cast("decimal(20,0)").alias("x"),
        (F.col("value").cast("decimal(18,6)") * 1000000)
        .cast("decimal(20,0)")
        .alias("yu"),
    )
    a = p.groupBy("user_id").agg(
        F.count("*").cast("decimal(20,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("yu").alias("sy"),
        F.sum(F.col("x") * F.col("yu")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return a.select(
        "user_id",
        F.col("n").cast("bigint").alias("n_obs"),
        num.cast("double").alias("slope_num"),
        den.cast("double").alias("slope_den"),
        F.when(den != 0, num.cast("double") / den.cast("double")).alias(
            "slope_micro_per_sec"
        ),
    )


@query(
    "ts_corr_series",
    oracle="""
    WITH v AS (
      SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
             CAST(COUNT(*) AS HUGEINT) AS x
      FROM events WHERE event_type = 'view'
      GROUP BY 1, 2
    ),
    p AS (
      SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * 1000000
                           AS HUGEINT)) AS HUGEINT) AS y
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1, 2
    ),
    j AS (SELECT v.user_id, v.x, p.y FROM v JOIN p USING (user_id, h)),
    a AS (
      SELECT user_id, CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM j GROUP BY user_id
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_hours,
           CASE WHEN (n * sxx - sx * sx) != 0 AND (n * syy - sy * sy) != 0
                THEN CAST(n * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                            * CAST(n * syy - sy * sy AS DOUBLE))
           END AS corr_view_purchase
    FROM a
    """,
)
def ts_corr_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-SERIES Pearson correlation, engine-exact: per user, the
    correlation between hourly view activity (count) and hourly purchase
    volume (exact micro-scaled sum) over the hours where both exist.
    Spark's corr()/covar_samp() accumulate floats in partition order, so
    two engines (or two runs) can disagree in the last bits — here every
    moment sum (Sx, Sy, Sxy, Sxx, Syy) is an exact integer
    (decimal(38,0) / HUGEINT), and the one float sequence — int→double
    conversion, multiply, sqrt, divide — has identical operands on both
    engines, so IEEE rounding is identical too. Degenerate series
    (constant x or y) yield NULL. Shape: two grouped counts, an
    equi-join on (user, hour), one moment aggregation — all two-phase,
    no window."""
    ev = load(spark, sf_dir, "events")
    h = F.date_trunc("hour", F.col("ts")).alias("h")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", h)
        .agg(F.count("*").cast("decimal(20,0)").alias("x"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", h)
        .agg(
            F.sum(
                (F.col("value").cast("decimal(18,6)") * 1000000).cast(
                    "decimal(20,0)"
                )
            ).alias("y")
        )
    )
    j = v.join(p, ["user_id", "h"]).select("user_id", "x", "y")
    a = j.groupBy("user_id").agg(
        F.count("*").cast("decimal(20,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return a.select(
        "user_id",
        F.col("n").cast("bigint").alias("n_hours"),
        F.when(
            (dx != 0) & (dy != 0),
            num.cast("double")
            / F.sqrt(dx.cast("double") * dy.cast("double")),
        ).alias("corr_view_purchase"),
    )


@query(
    "ts_mad_outliers",
    oracle="""
    WITH d AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(value) AS value
      FROM events GROUP BY user_id, CAST(ts AS TIMESTAMP)
    ),
    u AS (
      SELECT user_id, ts,
             CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS vu
      FROM d
    ),
    f AS (
      SELECT user_id, ts, vu,
             list(vu) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN 8 PRECEDING AND CURRENT ROW
             ) AS frame
      FROM u
    ),
    m AS (
      SELECT user_id, ts, vu, frame,
             list_sort(frame)[(len(frame) + 1) // 2] AS med
      FROM f
    )
    SELECT user_id, ts, vu AS value_micro,
           med AS med_micro,
           list_sort(list_transform(frame, x -> abs(x - med)))
             [(len(frame) + 1) // 2] AS mad_micro,
           (abs(vu - med) > 5 * list_sort(
               list_transform(frame, x -> abs(x - med))
             )[(len(frame) + 1) // 2]) AS is_outlier
    FROM m
    """,
)
def ts_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection per series: a point is an outlier when
    its distance from the rolling MEDIAN exceeds 5× the rolling MAD
    (median absolute deviation) over the trailing 9-row frame — the
    median/MAD pair is the robust alternative to ts_zscore_outliers'
    mean/stddev, immune to the outliers it is hunting. Implementation
    device: the frame is materialized as an ARRAY (collect_list window
    over integer micro-units), so median and MAD are lower-median
    element_at(sorted, (n+1) div 2) picks — pure integer arithmetic,
    bit-equal across engines, no interpolation convention to diverge.
    Scale: one exchange on user_id; the 9-element frame array is O(1)
    per row (bounded frame, never a partition buffer)."""
    from pyspark.sql import Window as W

    ev = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
        .select(
            "user_id",
            "ts",
            (F.col("value").cast("decimal(18,6)") * 1000000)
            .cast("bigint")
            .alias("vu"),
        )
    )
    w = W.partitionBy("user_id").orderBy("ts").rowsBetween(-8, 0)
    f = ev.select(
        "user_id", "ts", "vu", F.collect_list("vu").over(w).alias("frame")
    )
    lower_med = lambda arr: F.element_at(
        F.array_sort(arr), ((F.size(arr) + 1) / 2).cast("int")
    )
    m = f.select(
        "user_id", "ts", "vu", "frame", lower_med(F.col("frame")).alias("med")
    )
    dev = F.transform("frame", lambda x: F.abs(x - F.col("med")))
    mad = lower_med(dev)
    return m.select(
        "user_id",
        "ts",
        F.col("vu").alias("value_micro"),
        F.col("med").alias("med_micro"),
        mad.alias("mad_micro"),
        (F.abs(F.col("vu") - F.col("med")) > 5 * mad).alias("is_outlier"),
    )


@query(
    "ts_changepoint_cusum",
    oracle="""
    WITH d AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(value) AS value
      FROM events GROUP BY user_id, CAST(ts AS TIMESTAMP)
    ),
    u AS (
      SELECT user_id, ts,
             CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS vu
      FROM d
    ),
    dev AS (
      SELECT user_id, ts,
             CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) * vu
               - CAST(SUM(vu) OVER (PARTITION BY user_id) AS BIGINT) AS dv
      FROM u
    ),
    pre AS (
      SELECT user_id, ts,
             CAST(SUM(dv) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS p
      FROM dev
    ),
    stat AS (
      SELECT user_id,
             p - LEAST(CAST(0 AS BIGINT), CAST(MIN(p) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS BIGINT)) AS s
      FROM pre
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_obs,
           GREATEST(CAST(0 AS BIGINT), MAX(s)) AS cusum_max
    FROM stat GROUP BY user_id
    """,
)
def ts_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGEPOINT detection per series (one-sided CUSUM): the running
    statistic s_i = max(0, s_{i-1} + d_i) over mean-centered deviations
    spikes when the series' level shifts upward — the classic sequential
    test. Computed via the Kadane identity (max CUSUM == max-subarray
    sum of deviations == max_j [prefix_j - min(0, min_{i<j} prefix_i)]),
    which turns the order-dependent recurrence into three WINDOW passes
    sharing ONE user_id exchange — no per-series array collection, no
    engine-specific fold semantics (DuckDB v1.0's list_reduce evaluates
    dependent struct fields against a mutating accumulator — measured,
    avoided). Deviations are scaled by n (d_i = n*x_i - sum x) so the
    whole computation is exact BIGINT arithmetic. Scale: windows over
    user partitions, state O(1) per row; NULL window heads handled by
    least(0, NULL) -> 0, identical in both engines (probed)."""
    ev = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
        .select(
            "user_id",
            "ts",
            (F.col("value").cast("decimal(18,6)") * 1000000)
            .cast("bigint")
            .alias("vu"),
        )
    )
    from pyspark.sql import Window as W

    wall = W.partitionBy("user_id")
    wcum = wall.orderBy("ts").rowsBetween(W.unboundedPreceding, W.currentRow)
    wprev = wall.orderBy("ts").rowsBetween(W.unboundedPreceding, -1)
    dev = ev.select(
        "user_id",
        "ts",
        (
            F.count("*").over(wall) * F.col("vu")
            - F.sum("vu").over(wall)
        ).alias("dv"),
    )
    pre = dev.select(
        "user_id", "ts", F.sum("dv").over(wcum).alias("p")
    )
    stat = pre.select(
        "user_id",
        (
            F.col("p")
            - F.least(F.lit(0).cast("long"), F.min("p").over(wprev))
        ).alias("s"),
    )
    return stat.groupBy("user_id").agg(
        F.count("*").alias("n_obs"),
        F.greatest(F.lit(0).cast("long"), F.max("s")).alias("cusum_max"),
    )
