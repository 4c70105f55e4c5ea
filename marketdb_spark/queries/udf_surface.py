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


@query(
    "udf_grouped_minmax_scale",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN mx > mn
                THEN (q - mn) * 1000000 // (mx - mn)
                ELSE 0 END AS scaled
    FROM (
      SELECT l_orderkey, l_linenumber,
             CAST(l_quantity AS BIGINT) AS q,
             MIN(CAST(l_quantity AS BIGINT))
               OVER (PARTITION BY l_orderkey) AS mn,
             MAX(CAST(l_quantity AS BIGINT))
               OVER (PARTITION BY l_orderkey) AS mx
      FROM lineitem
      WHERE l_orderkey % 50 = 0
    )
    """,
)
def udf_grouped_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas — the batch form of the reference's
    'user supplies the fold' extension model (README.md:103-109): per
    ORDER min-max scaling of quantities computed inside an Arrow-batched
    pandas function. Integer-exact ((q-min)·10^6 floor-div (max-min) in
    int64), so the oracle (a window-function replay) hash-matches
    bit-for-bit. Scale notes, both directions: giant groups OOM the
    per-group pandas frame (per-key windows cover that JVM-side, see
    win_* queries), while MILLIONS of tiny groups pay a ~0.3 ms/group
    Python constant (measured: 150k orders = 45 s at sf0.1 — the
    registered query subsets the orders via a scan-pushed predicate to
    pin the correctness path without benching the anti-shape). Use
    grouped-map pandas only when the per-group logic genuinely needs
    imperative Python on moderate group counts; everything expressible
    as a window/agg belongs JVM-side."""
    import pandas as _pd

    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .filter(F.col("l_orderkey") % 50 == 0)
    )

    def scale(pdf: _pd.DataFrame) -> _pd.DataFrame:
        q = pdf["l_quantity"].astype("int64")
        mn, mx = q.min(), q.max()
        scaled = (
            (q - mn) * 1_000_000 // (mx - mn)
            if mx > mn
            else _pd.Series(0, index=q.index, dtype="int64")
        )
        return _pd.DataFrame(
            {
                "l_orderkey": pdf["l_orderkey"],
                "l_linenumber": pdf["l_linenumber"],
                "scaled": scaled,
            }
        )

    # explicit repartition on the group key: AQE's size-based partition
    # coalescing sees a few MB and would fuse the whole Python stage into
    # ONE task (measured 8s single-threaded vs <1s spread) — byte counts
    # are blind to per-group Python cost, so Python-heavy stages pin
    # their own parallelism; the groupBy reuses this hash distribution
    # (no second exchange).
    par = spark.sparkContext.defaultParallelism
    return (
        li.repartition(par, "l_orderkey")
        .groupBy("l_orderkey")
        .applyInPandas(
            scale, schema="l_orderkey long, l_linenumber int, scaled long"
        )
    )


@query(
    "udf_cogrouped_funnel",
    oracle="""
    WITH p AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
      WHERE event_type = 'purchase'
    ),
    v AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
      WHERE event_type = 'view'
    ),
    firstp AS (SELECT user_id, MIN(ts) AS first_purchase FROM p GROUP BY user_id),
    users AS (
      SELECT user_id FROM p UNION SELECT user_id FROM v
    )
    SELECT u.user_id,
           CAST(COALESCE((SELECT COUNT(*) FROM p WHERE p.user_id = u.user_id), 0)
                AS BIGINT) AS n_purchases,
           CAST(COALESCE((SELECT COUNT(*) FROM v WHERE v.user_id = u.user_id), 0)
                AS BIGINT) AS n_views,
           CAST(COALESCE((SELECT COUNT(*) FROM v
                          WHERE v.user_id = u.user_id
                            AND (fp.first_purchase IS NULL
                                 OR v.ts < fp.first_purchase)), 0)
                AS BIGINT) AS views_before_first_purchase
    FROM users u LEFT JOIN firstp fp ON fp.user_id = u.user_id
    """,
)
def udf_cogrouped_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas — two event streams cogrouped per user and
    folded together in one Arrow-batched pandas function (the conversion
    funnel: views before the first purchase). Pure integer logic on
    microsecond timestamps, so the oracle replay hash-matches exactly.
    This is the pandas shape for per-key MERGE logic two JVM-side windows
    can't express in one pass; group = one user's events (bounded), and
    parallelism is pinned explicitly — AQE's size-based coalescing is
    blind to per-group Python cost (see udf_grouped_minmax_scale).

    SCALE NOTE: this query exists to pin the cogrouped-applyInPandas
    SURFACE; the production shape for the same funnel is
    `agg_funnel_conversion` (queries/core_agg.py) — one JVM-side
    conditional aggregation over a single scan, no Python boundary, no
    per-user pandas frames. At 100 TB run that one; reach for cogroup
    only when the per-key merge logic genuinely needs imperative code."""
    import pandas as _pd

    from marketdb_spark.catalog import load as _load

    # the two sides are built from INDEPENDENT scans with distinct value
    # column names: a self-cogroup whose sides share attribute ids (one
    # .load() reused twice) hit a column-pruning bug where some partitions
    # delivered the right-side frames with only the key column (observed
    # at sf0.1; sf0.01 happened to plan differently)
    par = spark.sparkContext.defaultParallelism
    purchases = (
        _load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("p_ts"))
        .repartition(par, "user_id")
    )
    views = (
        _load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .select("user_id", F.col("ts").alias("v_ts"))
        .repartition(par, "user_id")
    )

    def funnel(key, pdf_p: _pd.DataFrame, pdf_v: _pd.DataFrame) -> _pd.DataFrame:
        p_ts = pdf_p["p_ts"].astype("int64")
        v_ts = pdf_v["v_ts"].astype("int64")
        if len(p_ts):
            before = int((v_ts < p_ts.min()).sum())
        else:
            before = len(v_ts)
        return _pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_purchases": [len(p_ts)],
                "n_views": [len(v_ts)],
                "views_before_first_purchase": [before],
            }
        )

    return (
        purchases.groupBy("user_id")
        .cogroup(views.groupBy("user_id"))
        .applyInPandas(
            funnel,
            schema=(
                "user_id long, n_purchases long, n_views long, "
                "views_before_first_purchase long"
            ),
        )
    )
