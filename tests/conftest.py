"""Shared pytest fixtures: one SparkSession per test session, plus the
marketdb-domain fixture frames from FIXTURES.md (trades/orders with ties,
duplicates, and interval-straddling rows — mirroring the reference's test
corpus, e.g. SingleTimeSeriesEnumeratorTest.scala:74-75)."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import types as T

from marketdb_spark.session import get_session

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    s = get_session(app_name="marketdb_spark_tests", shuffle_partitions=8)
    yield s


TRADES_SCHEMA = T.StructType(
    [
        T.StructField("market", T.StringType(), False),
        T.StructField("security", T.StringType(), False),
        T.StructField("trade_id", T.LongType(), False),
        T.StructField("price", T.DecimalType(18, 8), False),
        T.StructField("amount", T.IntegerType(), False),
        T.StructField("time", T.TimestampType(), False),
        T.StructField("nosystem", T.BooleanType(), False),
    ]
)

ORDERS_SCHEMA = T.StructType(
    [
        T.StructField("market", T.StringType(), False),
        T.StructField("security", T.StringType(), False),
        T.StructField("order_id", T.LongType(), False),
        T.StructField("time", T.TimestampType(), False),
        T.StructField("status", T.IntegerType(), False),
        T.StructField("action", T.ShortType(), False),
        T.StructField("dir", T.ShortType(), False),
        T.StructField("price", T.DecimalType(18, 8), False),
        T.StructField("amount", T.IntegerType(), False),
        T.StructField("amount_rest", T.IntegerType(), False),
        T.StructField(
            "deal",
            T.StructType(
                [
                    T.StructField("id", T.LongType(), True),
                    T.StructField("price", T.DecimalType(18, 8), True),
                ]
            ),
            True,
        ),
    ]
)

BASE = dt.datetime(2013, 2, 1, 10, 0, 0)


def _t(minutes: float) -> dt.datetime:
    return BASE + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="session")
def trades_df(spark):
    """Two series (RTS-3.13, RTS-3.14) × 10 rows, one minute apart, with a
    cross-series timestamp tie at every row — the reference's multi-series
    merge fixture (MultipleTimeSeriesEnumeratorTest.scala:55)."""
    rows = []
    for s, sec in enumerate(["RTS-3.13", "RTS-3.14"]):
        for i in range(10):
            rows.append(
                ("RTS", sec, s * 1000 + i, Decimal("152070.5") + i, 1 + i, _t(i), False)
            )
    # sub-minute offsets straddling an interval end minute (SURVEY §3.2)
    rows.append(("RTS", "RTS-3.13", 5000, Decimal("152075"), 2, _t(4) + dt.timedelta(seconds=59), False))
    rows.append(("RTS", "RTS-3.13", 5001, Decimal("152076"), 2, _t(5) + dt.timedelta(seconds=1), False))
    return spark.createDataFrame(rows, TRADES_SCHEMA)


@pytest.fixture(scope="session")
def orders_df(spark):
    """Orders offset +500ms from trades so a merged stream alternates
    strictly (MultipleTimeSeriesEnumeratorTest.scala:104,146); ~50% NULL
    deal (OrderProtocolSpec.scala:14-15)."""
    rows = []
    for i in range(10):
        deal = (100 + i, Decimal("152070.5")) if i % 2 == 0 else None
        rows.append(
            (
                "RTS",
                "RTS-3.13",
                2000 + i,
                _t(i) + dt.timedelta(milliseconds=500),
                1,
                1,
                1 if i % 2 == 0 else -1,
                Decimal("152070.5"),
                10,
                5,
                deal,
            )
        )
    return spark.createDataFrame(rows, ORDERS_SCHEMA)
