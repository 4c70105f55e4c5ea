"""End-to-end training-corpus cleaning pipeline (SURVEY §2B [N]): the
composition a data-curation user actually runs —

    quality gate → near-dup clustering → canonical election

in one DataFrame-in/DataFrame-out call. Each stage is the already-tested
operator (functions.text quality expressions, dedup.minhash_lsh_pairs,
dedup.connected_components); this module only wires them, so the scale
properties are the stages' own: the quality gate is a map-only scan-side
filter (junk never reaches a shuffle), pair generation shuffles once on
uniform band hashes, clustering iterates join+agg on uniform ids, and the
canonical window partitions on bounded cluster ids.

The reference has no corpus pipeline — this is the [N] north-star surface
built from its dedup/merge primitives (idempotent-by-key ingest,
Trade.scala:56-57, generalized to similarity identity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from marketdb_spark.functions.text import punct_count, token_count, tokens
from marketdb_spark.operators.dedup import (
    connected_components,
    minhash_lsh_pairs,
)

EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")


def quality_keep(
    text_col: str = "text",
    min_tokens: int = 20,
    max_tokens: int = 1000,
    min_stop_ratio: float = 0.01,
    max_punct_ratio: float = 0.1,
) -> F.Column:
    """Boolean keep/drop column: in-band length, some stopwords (fluency
    proxy), not punctuation-soup. Integer-count ratios — engine-exact."""
    ntok = token_count(text_col)
    nchars = F.length(text_col).cast("long")
    nstop = F.size(
        F.filter(tokens(text_col), lambda t: t.isin(*EN_STOPWORDS))
    ).cast("long")
    stop_ratio = F.when(ntok > 0, nstop.cast("double") / ntok).otherwise(0.0)
    punct_ratio = F.when(
        nchars > 0, punct_count(text_col).cast("double") / nchars
    ).otherwise(0.0)
    return (
        ntok.between(min_tokens, max_tokens)
        & (stop_ratio >= min_stop_ratio)
        & (punct_ratio < max_punct_ratio)
    )


def clean_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    length_col: str = "n_chars",
    k: int = 16,
    bands: int = 8,
    shingle_n: int = 2,
) -> DataFrame:
    """Run the full cleaning pipeline; returns one row per SURVIVING
    (quality-passing) document: (doc_id, cluster_id, is_canonical).
    Downstream training reads `is_canonical` rows only; the cluster_id
    column keeps the dedup decision auditable."""
    kept = docs.filter(quality_keep(text_col))
    pairs = minhash_lsh_pairs(kept, id_col, text_col, k, bands, shingle_n)
    cc = connected_components(pairs, kept.select(F.col(id_col).alias("id")))
    labeled = cc.join(kept, cc["id"] == kept[id_col]).select(
        F.col(id_col),
        F.col("label").alias("cluster_id"),
        F.col(length_col),
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc(length_col), F.asc(id_col)
    )
    return (
        labeled.withColumn("rn", F.row_number().over(w))
        .select(
            id_col,
            "cluster_id",
            (F.col("rn") == 1).alias("is_canonical"),
        )
    )
