"""Deduplication operators for LLM training-data pipelines (SURVEY §2B [N]):
exact, MinHash+LSH, SimHash, and n-gram Jaccard — each shuffle-aware for
100 TB.

Design notes for scale:
  * exact dedup = hash-groupBy on a content fingerprint: one shuffle on the
    fingerprint (uniform keys — md5 output — so no skew).
  * MinHash+LSH: per-doc signature is a narrow array (k minima) computed
    map-side with zero shuffles; candidate generation is a self-join on
    (band_id, band_hash) — the join key is uniformly distributed, and the
    blow-up is bounded by the band collision rate, not n².
  * SimHash: 64-bit fingerprint map-side; near-dup = join on rotated
    prefixes or (here) banded fingerprint chunks + hamming verify.
  * all hashes derive from md5 (portable: the DuckDB oracle reproduces
    them bit-for-bit; see marketdb_spark.functions.text.token_hash64).

The exact-dedup identity mirrors the reference's idempotent-by-key ingest
(deterministic row+qualifier, marketdb-core/.../model/Trade.scala:56-57).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from marketdb_spark.functions.text import fingerprint, token_hash64, tokens

# MinHash parameters. p is a Mersenne prime > any (h mod p); a_i, b_i are
# fixed odd/offset sequences so Spark and the oracle agree exactly.
MINHASH_P = (1 << 31) - 1
MINHASH_A0, MINHASH_A_STEP = 1_234_567, 77
MINHASH_B0, MINHASH_B_STEP = 7_654_321, 131


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Group identical (normalized) texts; keep the minimum id as canonical.

    Returns (fingerprint, keep_id, n_copies). One shuffle on the md5 key."""
    return (
        df.withColumn("fp", fingerprint(text_col))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


def shingles(text_col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a document, space-joined."""
    toks = tokens(text_col)
    idx = F.sequence(F.lit(0), F.size(toks) - n)  # empty if too short
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
            ),
        )
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.05,
) -> DataFrame:
    """All-pairs n-gram Jaccard similarity above a threshold.

    O(n²) cross join — the *verification* primitive. At scale, candidate
    pairs come from minhash_lsh_pairs and this only runs on candidates."""
    sh = df.select(F.col(id_col).alias("id"), shingles(text_col, n).alias("sh"))
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "jaccard",
            F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0)),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    shingle_n: int = 2,
) -> DataFrame:
    """Per-document MinHash signature: k minima over the shingle set under
    k affine hash functions mod a prime, as columns m0..m{k-1}.

    Shape: explode shingles → hash each ONCE → groupBy(doc) with k min
    aggregates. The md5 runs once per (doc, shingle); the k affine
    transforms are cheap integer ops feeding map-side partial mins, and the
    single shuffle keys on doc id (uniform — no skew). Do NOT express this
    as nested array lambdas over a signature array: every downstream
    element_at would re-inline (and re-execute) the whole md5 pipeline.

    Documents with no shingles (< shingle_n tokens) produce no signature."""
    sh = shingles(text_col, shingle_n)
    hashed = df.select(F.col(id_col).alias("id"), F.explode(sh).alias("s")).select(
        "id", (token_hash64(F.col("s")) % MINHASH_P).alias("h")
    )
    aggs = [
        F.min(
            (
                F.lit(MINHASH_A0 + MINHASH_A_STEP * i) * F.col("h")
                + F.lit(MINHASH_B0 + MINHASH_B_STEP * i)
            )
            % MINHASH_P
        ).alias(f"m{i}")
        for i in range(k)
    ]
    return hashed.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 4,
    shingle_n: int = 2,
) -> DataFrame:
    """LSH candidate pairs: split the k-wide signature into ``bands`` bands
    of k/bands rows; documents sharing any band hash are candidates.

    The self-join key (band_id, band_hash) is md5-uniform → no skew; output
    is deduped (a pair may collide in several bands)."""
    rows = k // bands
    sigs = minhash_signatures(df, id_col, text_col, k, shingle_n)
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[F.col(f"m{b * rows + r}") for r in range(rows)],
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("id", "band.band_id", "band.band_hash")
    a = banded.select(
        F.col("id").alias("id_a"), "band_id", "band_hash"
    )
    b = banded.select(F.col("id").alias("id_b"), "band_id", "band_hash")
    return (
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def verified_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 8,
    shingle_n: int = 2,
    threshold: float = 0.2,
) -> DataFrame:
    """The full near-dup pipeline: MinHash+LSH candidate generation, then
    exact n-gram Jaccard verification of ONLY the candidates — the shape
    that scales: the O(n²) verify runs on the candidate set, not the corpus.

    Returns (id_a, id_b, jaccard) for verified pairs."""
    cand = minhash_lsh_pairs(df, id_col, text_col, k, bands, shingle_n)
    sh = df.select(F.col(id_col).alias("id"), shingles(text_col, shingle_n).alias("sh"))
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard",
            F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0)),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(text_col: Column | str, n_bits: int = 32) -> Column:
    """SimHash fingerprint over whitespace tokens: per bit j, sum ±1 across
    token hashes; bit set iff the sum is positive. Map-side only.

    n_bits=32 keeps the per-row work (tokens × bits) codegen-friendly and
    the fingerprint comfortably inside a positive BIGINT."""
    toks = tokens(text_col)
    hashed = F.transform(toks, token_hash64)

    # Per-bit ±1 vote sums. j is a Python int (F.shiftright requires a
    # literal shift), so this unrolls to n_bits aggregate expressions —
    # all JVM-side, map-only.
    def _bit_sum(j: int):
        return F.aggregate(
            hashed,
            F.lit(0).cast("long"),
            lambda acc, h: acc + (F.shiftright(h, j).bitwiseAND(1) * 2 - 1),
        )

    fp = F.lit(0).cast("long")
    for j in range(n_bits):
        fp = fp + F.when(_bit_sum(j) > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return fp
