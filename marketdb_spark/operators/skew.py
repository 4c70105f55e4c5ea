"""Skew-mitigation operators: salted aggregation and salted broadcast-side
replication join.

AQE's skew-join split (spark.sql.adaptive.skewJoin, on in our session)
handles sort-merge skew at runtime; these explicit forms cover what AQE
cannot: (a) a single hot key inside a hash AGGREGATE (AQE never splits an
aggregation key), and (b) deliberate salting when the skew is known ahead
of time and the job must be deterministic about it.

The reference never shuffles (single-client merge), but its data model has
exactly this skew: one hot instrument (e.g. the front-month future) can
carry most of a day's trades against a 3-byte id space of ~16.7M
securities (MarketDB.scala:24).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# combinable aggregate kinds: (partial expression, re-combine function)
_KINDS = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),  # counts re-SUM across salts
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    aggs: dict[str, tuple[str, Column | str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation with a random salt on the hot key:
    groupBy(key, salt) partial → groupBy(key) final.

    ``aggs`` maps output name -> (kind, column) with kind in
    sum|count|min|max — the decomposable aggregates (avg = sum/count at
    the call site). Phase 1 spreads a hot key over n_salts reducers;
    phase 2 combines n_salts tiny rows per key. For uniform keys this adds
    one extra (cheap) shuffle — use only where skew is real.
    """
    key_cols = list(key_cols)
    salted = df.withColumn("_salt", (F.rand(seed=7) * n_salts).cast("int"))
    partial = salted.groupBy(*key_cols, "_salt").agg(
        *[
            _KINDS[kind][0](col).alias(f"_p_{name}")
            for name, (kind, col) in aggs.items()
        ]
    )
    finals = [
        _KINDS[kind][1](F.col(f"_p_{name}")).alias(name)
        for name, (kind, _) in aggs.items()
    ]
    return partial.groupBy(*key_cols).agg(*finals)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skewed fact ⋈ small-ish dim WITHOUT broadcast (dim too big to
    broadcast, fact key skewed): salt the fact side randomly, replicate
    every dim row across all n_salts salt values (explode), join on
    (key, salt). The hot key's rows land on n_salts reducers instead of
    one; dim grows n_salts× — bounded, unlike the hot reducer.

    Only ``inner`` and ``left`` are supported: the dim side is replicated
    n_salts×, so right/full outer would emit each unmatched dim row once
    per salt, and semi/anti test against the replicated set — both wrong.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' (dim side is "
            f"replicated {n_salts}x — outer/semi/anti would duplicate or "
            f"mistest unmatched dim rows), got {how!r}"
        )
    salted_fact = fact.withColumn(
        "_salt", (F.rand(seed=7) * n_salts).cast("int")
    )
    replicated = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_fact.join(replicated, on=[on, "_salt"], how=how)
    return out.drop("_salt")
