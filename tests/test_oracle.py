"""The local correctness gate: every registered query must match its
DuckDB oracle bit-exact at sf0.001 (the driver runs the same comparison at
sf0.01 — see marketdb_spark/oracle.py)."""

from __future__ import annotations

import pytest

from marketdb_spark.oracle import compare, duckdb_connection
from marketdb_spark.queries import REGISTRY
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_SMALL)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, con, name):
    spec = REGISTRY[name]
    if spec.oracle is None:
        df = spec.fn(spark, SF_SMALL)
        assert df.count() >= 0  # rows-only check, mirrors the driver
        return
    result = compare(name, spec.fn(spark, SF_SMALL), spec.oracle, con)
    assert result.ok, str(result)


# Queries that legitimately have no SQL oracle (sketches etc.) — keep this
# list tiny and justified in each query's docstring. Empty since round 5:
# agg_approx_distinct now checks its HLL sketch against an exact-count +
# error-bound oracle.
ROWS_ONLY_OK: set[str] = set()


def test_registry_complete():
    """Every query is callable; rows-only fallbacks are explicit."""
    assert len(REGISTRY) >= 40
    missing = {n for n, s in REGISTRY.items() if s.oracle is None}
    assert missing <= ROWS_ONLY_OK, f"queries without oracle: {missing - ROWS_ONLY_OK}"


def test_entry_contract(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    assert df.count() > 0
    assert set(mod.oracle_sql()) <= set(mod.queries())
