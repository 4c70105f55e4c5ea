"""marketdb-domain semantics on the trades/orders fixtures — mirrors the
reference's enumerator test suite (SURVEY §5 / FIXTURES.md §7):
inclusive interval bounds, global merge ordering with deterministic
tie-break, heterogeneous merge, fold surface."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from marketdb_spark.api import explode_days, merge_series, scan_series
from tests.conftest import BASE


def test_scan_inclusive_bounds(trades_df):
    """A scan for [t0, t5] includes rows at exactly t5 and excludes t5+1s
    — the exact-time refinement of the reference's end-inclusive minute
    scan (MarketDB.scala:80, SURVEY §3.2)."""
    start, end = BASE, BASE + dt.timedelta(minutes=5)
    got = scan_series(
        trades_df, "time", start, end, security="RTS-3.13", market="RTS"
    ).collect()
    times = [r.time for r in got]
    assert max(times) == end  # end instant included
    assert BASE + dt.timedelta(minutes=4, seconds=59) in times  # sub-minute row
    assert BASE + dt.timedelta(minutes=5, seconds=1) not in times  # past end


def test_scan_is_ordered(trades_df):
    got = scan_series(trades_df, "time", security="RTS-3.14").collect()
    times = [r.time for r in got]
    assert times == sorted(times)
    assert len(got) == 10


def test_merge_global_order_and_tiebreak(trades_df):
    """Two series with identical timestamps: merged stream is globally
    time-ordered and ties resolve by the declared (time, kind) order —
    the deterministic replacement for the reference's input-order
    tie-break (TimeSeriesEnumerator.scala:86-93)."""
    a = trades_df.filter(F.col("security") == "RTS-3.13").filter(
        F.col("trade_id") < 5000
    )
    b = trades_df.filter(F.col("security") == "RTS-3.14")
    merged = merge_series(
        [a, b], "time", tie_cols=["trade_id"], kind_col="kind", kinds=["s13", "s14"]
    ).collect()
    assert len(merged) == 20
    keys = [(r.time, r.kind, r.trade_id) for r in merged]
    assert keys == sorted(keys)
    # ties alternate deterministically: s13 before s14 at every shared minute
    for i in range(0, 20, 2):
        assert merged[i].kind == "s13" and merged[i + 1].kind == "s14"


def test_heterogeneous_merge_alternates(trades_df, orders_df):
    """Trades + orders (+500 ms offsets) merge into one stream that
    strictly alternates — the reference's heterogeneous-merge test
    (MultipleTimeSeriesEnumeratorTest.scala:137-186)."""
    t = trades_df.filter(
        (F.col("security") == "RTS-3.13") & (F.col("trade_id") < 5000)
    ).select("market", "security", "time", F.col("trade_id").alias("event_id"))
    o = orders_df.select(
        "market", "security", "time", F.col("order_id").alias("event_id")
    )
    merged = merge_series(
        [t, o], "time", tie_cols=["event_id"], kind_col="kind", kinds=["trade", "order"]
    ).collect()
    kinds = [r.kind for r in merged]
    assert kinds == ["trade", "order"] * 10


def test_folds(trades_df):
    """count / collect / limit — the reference's iteratee folds
    (MarketIteratees.scala:7-55, early stop TimeSeriesEnumerator.scala:82)."""
    s = scan_series(trades_df, "time", security="RTS-3.13", market="RTS")
    assert s.count() == 12
    assert len(s.limit(3).collect()) == 3
    seq = s.collect()
    assert [r.time for r in seq] == sorted(r.time for r in seq)


def test_explode_days(spark):
    df = spark.createDataFrame(
        [(dt.date(2012, 2, 1), dt.date(2012, 2, 4))], "a date, b date"
    )
    days = [r.day for r in explode_days(df, "a", "b").collect()]
    assert days == [dt.date(2012, 2, 1 + i) for i in range(4)]


def test_sql_surface_over_registered_views(spark):
    """The SQL-string interface: catalog.register_views + spark.sql must
    produce exactly what the DataFrame combinators produce (same Catalyst
    plans underneath — this pins the façade SURVEY §7 stage 3 promises)."""
    from marketdb_spark.catalog import register_views
    from marketdb_spark.queries import REGISTRY
    from tests.conftest import SF_SMALL

    register_views(spark, SF_SMALL)
    sql_rows = sorted(
        map(
            tuple,
            spark.sql(
                """
                SELECT l_orderkey,
                       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
                       o_orderdate
                FROM customer JOIN orders ON c_custkey = o_custkey
                JOIN lineitem ON l_orderkey = o_orderkey
                WHERE c_mktsegment = 'BUILDING'
                  AND o_orderdate < TIMESTAMP '1998-03-15'
                  AND l_shipdate > TIMESTAMP '1995-03-15'
                GROUP BY l_orderkey, o_orderdate
                ORDER BY revenue DESC, o_orderdate, l_orderkey
                LIMIT 10
                """
            ).collect(),
        )
    )
    df_rows = sorted(
        map(tuple, REGISTRY["q03_shipping_priority"].fn(spark, SF_SMALL).collect())
    )
    assert sql_rows == df_rows
