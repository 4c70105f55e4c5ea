"""Deterministic uid dictionary — replaces the reference's distributed
get-or-create counter (marketdb-core/.../uid/UIDProvider.scala:30-48,
267-324: HBase MaxIdRow + row locks + retries + STM cache) with a batch
dense_rank over distinct names. No distributed mutable state, no races;
re-running on the same names yields the same ids (UIDProviderTest's
race/conflict cases become structurally impossible).

Width caps from MarketDB.scala:23-24 are enforced as a validation output
instead of write-time guards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

KIND_WIDTHS = {"Market": 1, "Security": 3}  # bytes (MarketDB.scala:23-24)


def build_uid(df: DataFrame, columns: dict[str, str]) -> DataFrame:
    """columns maps kind -> source column, e.g. {'Market': 'market',
    'Security': 'security'}. Returns (kind, name, id) with id dense,
    1-based per kind, ordered by name (deterministic)."""
    parts = [
        df.select(F.lit(kind).alias("kind"), F.col(col).alias("name")).distinct()
        for kind, col in columns.items()
    ]
    names = parts[0]
    for p in parts[1:]:
        names = names.unionByName(p)
    w = W.partitionBy("kind").orderBy("name")
    return names.withColumn("id", F.dense_rank().over(w).cast("bigint"))


def update_uid(existing: DataFrame, df: DataFrame, columns: dict[str, str]) -> DataFrame:
    """Get-or-create over an EXISTING dictionary: names already present
    keep their ids untouched (the reference's hard invariant — ids are
    forever, UIDProvider's reverse-before-forward write ordering and
    conflict-validating cache exist to protect it, UIDProvider.scala:
    267-324, 350-402); genuinely new names get fresh ids starting past the
    current per-kind maximum, assigned by the same deterministic
    name-ordered rank. Re-running with the same input is a no-op.

    This is the incremental analog of build_uid: an append-only batch job
    instead of a row-locked distributed counter — the only coordination is
    one small aggregate over the (tiny, broadcastable) dictionary."""
    fresh_names = build_uid(df, columns).drop("id")
    new_names = fresh_names.join(
        existing.select("kind", "name"), on=["kind", "name"], how="left_anti"
    )
    base = existing.groupBy("kind").agg(F.max("id").alias("max_id"))
    w = W.partitionBy("kind").orderBy("name")
    assigned = (
        new_names.withColumn("rank", F.dense_rank().over(w).cast("bigint"))
        .join(F.broadcast(base), on="kind", how="left")
        .select(
            "kind",
            "name",
            (F.coalesce(F.col("max_id"), F.lit(0)) + F.col("rank")).alias("id"),
        )
    )
    return existing.unionByName(assigned)


def validate_uid(uid: DataFrame) -> DataFrame:
    """Rows violating the id-space caps (id >= 2^(8*width)) — the
    reference throws on overflow (UIDProvider.scala:256-265); we surface
    violations as a frame the caller can assert empty."""
    cap = F.when(
        F.col("kind") == "Market", F.lit((1 << (8 * KIND_WIDTHS["Market"])) - 1)
    ).otherwise(F.lit((1 << (8 * KIND_WIDTHS["Security"])) - 1))
    return uid.filter(F.col("id") > cap)


def encode(df: DataFrame, uid: DataFrame, kind: str, col: str, id_col: str) -> DataFrame:
    """Dictionary-encode a name column via broadcast join (UIDProvider's
    provideId, UIDProvider.scala:141-174 — cache lookup ≙ broadcast)."""
    dim = uid.filter(F.col("kind") == kind).select(
        F.col("name").alias(col), F.col("id").alias(id_col)
    )
    return df.join(F.broadcast(dim), on=col, how="left")


def decode(df: DataFrame, uid: DataFrame, kind: str, id_col: str, name_col: str) -> DataFrame:
    """Reverse lookup (UIDProvider.getName, UIDProvider.scala:79-109)."""
    dim = uid.filter(F.col("kind") == kind).select(
        F.col("id").alias(id_col), F.col("name").alias(name_col)
    )
    return df.join(F.broadcast(dim), on=id_col, how="left")
