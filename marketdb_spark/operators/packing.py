"""Sequence packing for training-data pipelines: concatenate documents in
a deterministic order and split the token stream into fixed-length chunks
(the GPT/Gopher pre-training layout). The core primitive is a global
prefix sum — the canonical "looks trivial, breaks at scale" operation:
``Window.orderBy(...)`` with no partition key funnels the whole dataset
through ONE task. This module implements the two-phase distributed form:

  1. range-repartition by the order key (so partition i holds smaller keys
     than partition i+1), per-partition exclusive running sums;
  2. aggregate one total per partition (a handful of rows), turn those
     into per-partition base offsets with a driver-scale window, broadcast
     them back, and add.

Wall-clock is two narrow passes over the data plus an O(#partitions)
side-table — no single-task stage, no data-size window state. The same
shape computes any distributed scan (running totals, global row numbers).

Reference analog: none — the reference's loader packs trade batches by
COUNT (BatchSettings(500), marketdb-loader/.../util/Iteratees.scala:41-88);
packing by cumulative token budget generalizes it ([N] mandate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exclusive_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str | Column,
    out_col: str = "offset",
) -> DataFrame:
    """Add ``out_col`` = sum of ``value_col`` over all rows with a strictly
    smaller ``order_col`` (exclusive prefix sum, long-typed). ``order_col``
    must be unique — ties across a range-partition boundary would make the
    result order-dependent.
    """
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    n_part = df.sparkSession.sparkContext.defaultParallelism
    part = df.repartitionByRange(n_part, F.col(order_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    # pass 1: exclusive running sum within each range partition
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    part = part.withColumn(
        "__local", F.coalesce(F.sum(value.cast("long")).over(w_local), F.lit(0))
    )
    # pass 2: per-partition totals → cumulative base offsets. This window
    # IS single-task, but over #partitions rows, not the dataset.
    totals = part.groupBy("__pid").agg(F.sum(value.cast("long")).alias("__tot"))
    w_base = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    bases = totals.select(
        "__pid", F.coalesce(F.sum("__tot").over(w_base), F.lit(0)).alias("__base")
    )
    return (
        part.join(F.broadcast(bases), "__pid")
        .withColumn(out_col, (F.col("__base") + F.col("__local")).cast("long"))
        .drop("__pid", "__local", "__base")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    ntok_col: str | Column,
    seq_len: int,
) -> DataFrame:
    """Assign each document its chunk span in the concatenate-then-split
    training layout: documents are laid out in ``id_col`` order; the token
    stream is cut every ``seq_len`` tokens. Returns (id, n_tokens, offset,
    start_chunk, end_chunk, n_chunks); a document spanning a cut belongs
    to every chunk it overlaps; empty documents span zero chunks."""
    ntok = F.col(ntok_col) if isinstance(ntok_col, str) else ntok_col
    packed = exclusive_prefix_sum(
        df.select(F.col(id_col), ntok.cast("long").alias("n_tokens")),
        id_col,
        "n_tokens",
    )
    start = (F.col("offset") / seq_len).cast("long")
    end = ((F.col("offset") + F.col("n_tokens") - 1) / seq_len).cast("long")
    return packed.select(
        F.col(id_col),
        "n_tokens",
        "offset",
        start.alias("start_chunk"),
        F.when(F.col("n_tokens") > 0, end).otherwise(start).alias("end_chunk"),
        F.when(F.col("n_tokens") > 0, end - start + 1)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_chunks"),
    )
