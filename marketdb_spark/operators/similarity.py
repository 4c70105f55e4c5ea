"""Embedding similarity search (SURVEY §2B [N]).

Brute-force cosine top-k is the exactness baseline: broadcast the (small)
query set against the full corpus — one pass over the corpus, no shuffle of
the corpus side, then a per-query top-k window. At 100 TB the corpus side
stays partitioned; only the query side moves.

The scale path is LSH bucketing (random-hyperplane signs → candidate
buckets → brute-force within bucket), same shape as minhash_lsh_pairs.

All arithmetic is a sequential left-to-right double fold (`F.aggregate`)
so the DuckDB oracle (list_reduce) reproduces results bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _fold_sum(arr: Column) -> Column:
    """Sequential double sum of an array — deterministic order."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    return _fold_sum(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    )


def norm(a: Column) -> Column:
    return F.sqrt(_fold_sum(F.transform(a, lambda x: x.cast("double") * x.cast("double"))))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k nearest corpus vectors per query vector by cosine.

    Output: (query_id, neighbor_id, cosine_sim, rank). Self-matches are
    excluded. Queries are broadcast; ranking ties break on neighbor id."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine_sim", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine_sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", F.col("rank").cast("int").alias("rank"))
    )
