"""UDF/UDTF surface + array/map scalar-function coverage (SURVEY §2B
"UDF / UDAF / UDTF surface" and the array/map rows of the scalar library).

The reference's extension model is "the user supplies the fold"
(README.md:103-109,135-155 — client-side iteratees); Spark's equivalents
are, in preference order: built-in functions (JVM, codegen) → Arrow-batched
pandas_udf → grouped applyInPandas / mapInPandas (operators.multimodal,
streaming.stateful) → Python UDTF for one-to-many row generators. Each gets
an oracle-checked query here so the slow paths are correctness-pinned too.

Scale notes: pandas_udf transfers Arrow record batches (no per-row pickle);
the LCG below is integer-exact in int64, so the oracle hash-matches. The
UDTF runs one Python process per task with batched rows — fine for
row-generators; never put it in a tight per-row scalar path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from marketdb_spark.catalog import load
from marketdb_spark.queries.registry import query

# LCG constants (glibc): value fits int64 for any orderkey in the data
# (max_key * 1103515245 << 2^63), so pandas int64 arithmetic is exact.
_LCG_A, _LCG_C, _LCG_M = 1103515245, 12345, 1 << 31


def _make_lcg_hash():
    """Built lazily: pandas_udf parses its DDL return type against an
    active SparkContext, so module import must stay session-free."""

    @pandas_udf("bigint")
    def _lcg_hash(keys: pd.Series) -> pd.Series:
        """Vectorized deterministic hash — the Arrow-batched scalar shape."""
        return (keys * _LCG_A + _LCG_C) % _LCG_M

    return _lcg_hash


@query(
    "udf_pandas_lcg_buckets",
    oracle=f"""
    SELECT CAST(((l_orderkey * {_LCG_A} + {_LCG_C}) % {_LCG_M}) % 16 AS BIGINT)
             AS bucket,
           COUNT(*) AS n_rows,
           CAST(MIN((l_orderkey * {_LCG_A} + {_LCG_C}) % {_LCG_M}) AS BIGINT)
             AS min_hash
    FROM lineitem
    GROUP BY bucket
    """,
)
def udf_pandas_lcg_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf (Arrow path) feeding a JVM-side aggregation —
    integer-exact, so the oracle pins the Arrow transfer bit-for-bit."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select(_make_lcg_hash()(F.col("l_orderkey")).alias("h"))
        .groupBy((F.col("h") % 16).alias("bucket"))
        .agg(F.count("*").alias("n_rows"), F.min("h").alias("min_hash"))
    )


class _SplitParts:
    """One-to-many row generator: '.'-separated parts of a text, trimmed,
    empties skipped, original position kept. Decorated with @udtf lazily
    (same session-free-import constraint as the pandas_udf above)."""

    def eval(self, text: str):  # noqa: D102 — contract documented above
        if text is None:
            return
        for i, p in enumerate(text.split(".")):
            p = p.strip()
            if p:
                yield i, p


@query(
    "udtf_text_parts",
    oracle="""
    SELECT doc_id, i - 1 AS part_idx, trim(parts[i]) AS part
    FROM (
      SELECT doc_id, string_split(text, '.') AS parts
      FROM documents WHERE doc_id < 50
    ), LATERAL (SELECT UNNEST(range(1, len(parts) + 1)) AS i) t
    WHERE trim(parts[i]) <> ''
    """,
)
def udtf_text_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF in a LATERAL join — the Spark ≥3.4 table-function shape
    of the reference's "user-supplied stream transformer"."""
    spark.udtf.register(
        "split_parts", udtf(_SplitParts, returnType="part_idx int, part string")
    )
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT doc_id, s.part_idx, s.part
        FROM documents, LATERAL split_parts(text) s
        WHERE doc_id < 50
        """
    )


def _make_wavg_udaf():
    """Grouped-aggregate pandas UDF (the UDAF shape): exact weighted mean
    via python Decimal so the result is engine-portable (a float64 sum
    would differ from DuckDB's fold order in the last bits)."""
    from decimal import Decimal

    @pandas_udf("double")
    def _wavg(price: pd.Series, qty: pd.Series) -> float:
        num = Decimal(0)
        den = 0
        for p, q in zip(price, qty):
            num += Decimal(str(p)) * int(q)
            den += int(q)
        # float(num) and float(den) are exact (scaled sums < 2^53), so the
        # single double division reproduces DuckDB's
        # CAST(dec AS DOUBLE)/CAST(big AS DOUBLE) bit-for-bit
        return float(num) / float(den) if den else None

    return _wavg


@query(
    "udaf_weighted_avg_price",
    oracle="""
    SELECT l_returnflag,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * CAST(l_quantity AS BIGINT)) AS DOUBLE)
                / CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS DOUBLE)
             AS wavg_price
    FROM lineitem
    WHERE l_orderkey < 3000
    GROUP BY l_returnflag
    """,
)
def udaf_weighted_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas_udf GROUPED_AGG — a user-defined aggregate running per group
    over Arrow batches (the iteratee-as-aggregation shape). Decimal-exact
    numerator/denominator, one final double division, so the DuckDB oracle
    hash-matches. Bounded to a key slice: the UDAF is the deliberate slow
    path (quantified by bench.py), not the recommended form — dsum covers
    the built-in route."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 3000)
    wavg = _make_wavg_udaf()
    return li.groupBy("l_returnflag").agg(
        wavg(F.col("l_extendedprice"), F.col("l_quantity")).alias("wavg_price")
    )


@query(
    "scalar_array_map_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(list_reduce(list_transform(range(1, l_linenumber + 1),
                                           x -> x * x),
                            (a, b) -> a + b) AS BIGINT) AS sum_sq,
           CAST(len(list_filter(range(1, l_linenumber + 1),
                                x -> x % 2 = 0)) AS BIGINT) AS n_even,
           CAST(list_reduce(list_transform(
                  list_zip(range(1, l_linenumber + 1),
                           list_reverse(range(1, l_linenumber + 1))),
                  s -> s[1] * s[2]), (a, b) -> a + b) AS BIGINT) AS dot_rev,
           map(['qty', 'line'],
               [l_quantity, CAST(l_linenumber AS DOUBLE)])['qty'][1] AS qty_val,
           CAST(cardinality(map(['qty', 'line'],
               [l_quantity, CAST(l_linenumber AS DOUBLE)])) AS INT) AS m_size
    FROM lineitem
    WHERE l_orderkey < 500
    """,
)
def scalar_array_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions (transform/filter/aggregate/zip_with/
    reverse/sequence) and map functions (map_from_arrays/element_at/size) —
    all JVM built-ins inside whole-stage codegen."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    arr = F.sequence(F.lit(1).cast("long"), F.col("l_linenumber").cast("long"))
    sum_sq = F.aggregate(
        F.transform(arr, lambda x: x * x),
        F.lit(0).cast("long"),
        lambda a, b: a + b,
    )
    n_even = F.size(F.filter(arr, lambda x: x % 2 == 0)).cast("long")
    dot_rev = F.aggregate(
        F.zip_with(arr, F.reverse(arr), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda a, b: a + b,
    )
    m = F.map_from_arrays(
        F.array(F.lit("qty"), F.lit("line")),
        F.array(F.col("l_quantity"), F.col("l_linenumber").cast("double")),
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        sum_sq.alias("sum_sq"),
        n_even.alias("n_even"),
        dot_rev.alias("dot_rev"),
        F.element_at(m, "qty").alias("qty_val"),
        F.size(m).alias("m_size"),
    )
