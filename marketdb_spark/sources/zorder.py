"""Z-order (Morton-curve) clustering for multi-dimensional scan pruning.

The reference's composite HBase row key (marketId ++ securityId ++ time,
Trade.scala:22-30) clusters the store along ONE dimension chain: a scan
keyed by the prefix is cheap, a scan keyed by a later component reads
everything. Z-ordering generalizes that to N dimensions: interleaving the
bits of rank-bucketized key columns produces a single sort key whose
ordering keeps rows close in EVERY dimension — each of k output files
covers ~k^(-1/n) of each column's value range, so parquet min/max
row-group stats prune selective filters on ANY z-ordered column, not just
the sort prefix. This is the write-time clustering a 100 TB store uses
when queries filter on several independent keys (security AND time AND
venue) and no single sort order serves them all.

Everything here is a map-side expression plus one range repartition:
  * per-column min/max: one aggregate pass (at scale: maintained table
    statistics make this free);
  * bucketize: width_bucket into 2^bits cells — a scan-side expression;
  * interleave: fixed bits*n shift/or terms, whole-stage-codegen'd;
  * layout: repartitionByRange on the z-value (range exchange with
    sampled bounds) + sortWithinPartitions — exactly the shuffle a plain
    global sort would do.

Evidence gates live in tests/test_scale.py::TestZOrder: per-file range
coverage of the secondary dimension shrinks by ~sqrt(n_files) vs a
linear sort, verified from the real parquet footers via pyarrow.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(cols: Sequence[Column], bits: int = 12) -> Column:
    """Morton interleave: bit i of column j lands at position i*n + j of
    the z-value. Inputs must already be integers in [0, 2^bits); the
    result fits a positive BIGINT for bits * n <= 62."""
    n = len(cols)
    if bits * n > 62:
        raise ValueError(f"bits*n = {bits * n} overflows a positive BIGINT")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * n + j)
    return z


def bucketize(col: Column | str, lo: float, hi: float, bits: int = 12) -> Column:
    """Map a numeric column into [0, 2^bits) cells by value range
    (width_bucket is 1-indexed and gives hi the overflow bucket — clamp
    both back). Rank-perfect bucketing would use quantile boundaries; the
    value-linear form is stat-free beyond min/max and is what table
    statistics give you at scale."""
    c = F.col(col) if isinstance(col, str) else col
    cells = 1 << bits
    if hi <= lo:  # constant column: one cell
        return F.lit(0).cast("long")
    b = F.width_bucket(c.cast("double"), F.lit(float(lo)), F.lit(float(hi)), F.lit(cells)) - 1
    return F.least(F.greatest(b, F.lit(0)), F.lit(cells - 1)).cast("long")


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 12,
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on the z-order of ``cols``.

    One min/max aggregate pass (driver-side scalars only), then a single
    range exchange on the z-value — the same cost as sorting the data
    once, which any clustered write pays."""
    ranges = df.agg(
        *[F.min(c).cast("double").alias(f"lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"hi_{c}") for c in cols],
    ).first()

    def _range(c: str) -> tuple[float, float]:
        # empty input / all-NULL cluster column → min/max are None;
        # (0.0, 0.0) takes bucketize's constant-column single-cell path
        # instead of raising TypeError on a None comparison
        lo, hi = ranges[f"lo_{c}"], ranges[f"hi_{c}"]
        return (0.0, 0.0) if lo is None or hi is None else (lo, hi)

    z = interleave_bits(
        [bucketize(c, *_range(c), bits) for c in cols], bits
    )
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def cluster_frame(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 12,
    n_files: int | None = None,
) -> DataFrame:
    """Reorganize a DataFrame by the z-order of ``cols`` WITHOUT
    writing it — the write-path clustering kernel (PROTOCOL.md
    "Clustered Table" best-effort): one min/max aggregate over the
    batch, then a single range exchange + in-partition sort on the
    Morton value (one column: a plain range sort — the interleave of
    one column IS its bucketized order, so skip the bucketing loss).
    ``n_files`` defaults to the batch's current partition count, so a
    clustered append stages the same number of files it would have
    unclustered. Used by deltalog.write_delta on tables carrying a
    ``delta.clustering`` domain, turning legal-but-unclustered appends
    into actually-clustered ones; per-file min/max tightening is
    pinned by tests/test_sources.py::TestClusteredTable."""
    from pyspark.sql import types as T

    if n_files is None:
        n_files = max(1, df.rdd.getNumPartitions())
    if len(cols) == 1:
        return df.repartitionByRange(
            n_files, cols[0]
        ).sortWithinPartitions(cols[0])
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    if not all(
        isinstance(
            dtypes.get(c),
            (T.NumericType, T.TimestampType, T.BooleanType),
        )
        for c in cols
    ):
        # a column with no double cast (string, binary, date): Morton
        # bucketing has no meaningful cell for it — fall back to a
        # lexicographic multi-column range cluster, which still
        # tightens the leading columns' per-file ranges
        return df.repartitionByRange(
            n_files, *cols
        ).sortWithinPartitions(*cols)
    ranges = df.agg(
        *[F.min(c).cast("double").alias(f"lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"hi_{c}") for c in cols],
    ).first()

    def _range(c: str) -> tuple[float, float]:
        lo, hi = ranges[f"lo_{c}"], ranges[f"hi_{c}"]
        return (0.0, 0.0) if lo is None or hi is None else (lo, hi)

    z = interleave_bits(
        [bucketize(c, *_range(c), bits) for c in cols], bits
    )
    return (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
