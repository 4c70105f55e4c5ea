"""Oracle-checked query registry.

Every operator in SURVEY.md §2B is exercised by at least one named query.
A query is a pair: a PySpark implementation ``(spark, sf_dir) -> DataFrame``
and (where SQL-expressible) an equivalent DuckDB oracle SQL string. The
driver — and ``tests/test_oracle.py`` locally — runs both and compares
row count, schema, and an order-insensitive value hash.

Importing this package populates ``REGISTRY``.
"""

from marketdb_spark.queries.registry import REGISTRY, QuerySpec, query

# Import for side effects: each module registers its queries.
from marketdb_spark.queries import core_agg  # noqa: E402,F401
from marketdb_spark.queries import joins  # noqa: E402,F401
from marketdb_spark.queries import tpch_extra  # noqa: E402,F401
from marketdb_spark.queries import windows  # noqa: E402,F401
from marketdb_spark.queries import setops  # noqa: E402,F401
from marketdb_spark.queries import scalar  # noqa: E402,F401
from marketdb_spark.queries import udf_surface  # noqa: E402,F401
from marketdb_spark.queries import timeseries  # noqa: E402,F401
from marketdb_spark.queries import llm_text  # noqa: E402,F401
from marketdb_spark.queries import llm_dedup  # noqa: E402,F401
from marketdb_spark.queries import llm_similarity  # noqa: E402,F401
from marketdb_spark.queries import llm_multimodal  # noqa: E402,F401
from marketdb_spark.queries import streaming_live  # noqa: E402,F401
from marketdb_spark.queries import storage  # noqa: E402,F401
from marketdb_spark.queries import corpus_ops  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "query"]
