"""Deduplication queries on `documents` (SURVEY §2B [N]): exact, n-gram
Jaccard, MinHash+LSH, SimHash. Spark implementations live in
marketdb_spark.operators.dedup; the oracles below reproduce the same
md5-derived hashes bit-for-bit in DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marketdb_spark.catalog import load
from marketdb_spark.operators.dedup import (
    MINHASH_A0,
    MINHASH_A_STEP,
    MINHASH_B0,
    MINHASH_B_STEP,
    MINHASH_P,
    candidate_jaccard,
    connected_components,
    contained_near_dups,
    exact_dedup,
    minhash_lsh_pairs,
    simhash_fingerprints,
    verified_near_dups,
)
from marketdb_spark.queries.llm_similarity import lsh_sql_ctes
from marketdb_spark.queries.registry import query

_TOKS = r"list_filter(string_split_regex(text, '\s+'), t -> t != '')"
# word 2-gram shingles, distinct (1-indexed lists in DuckDB)
_SHINGLES2 = (
    f"list_distinct(list_transform(range(1, len({_TOKS})), "
    f"i -> {_TOKS}[i] || ' ' || {_TOKS}[i+1]))"
)
# portable 60-bit hash of a string s (first 15 md5 hex digits)
_H64 = "CAST(('0x' || substring(md5({s}), 1, 15)) AS BIGINT)"


@query(
    "dedup_exact_docs",
    oracle=r"""
    SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY fp
    """,
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the content fingerprint, keep min id."""
    return exact_dedup(load(spark, sf_dir, "documents"))


# word 3-gram shingles, distinct (1-indexed lists in DuckDB); mirrors
# operators.dedup.shingles(n=3)
_SHINGLES3 = (
    f"list_distinct(list_transform(range(1, len({_TOKS}) - 1), "
    f"i -> {_TOKS}[i] || ' ' || {_TOKS}[i+1] || ' ' || {_TOKS}[i+2]))"
)
# hashed shingle sets — the verify-side representation (see
# operators.dedup.hashed_shingled): distinct 60-bit md5 hashes, identical
# bit-for-bit to Spark's token_hash64
_HASHED_SH2 = f"list_distinct(list_transform({_SHINGLES2}, s -> {_H64.format(s='s')}))"
_HASHED_SH3 = f"list_distinct(list_transform({_SHINGLES3}, s -> {_H64.format(s='s')}))"


def _minhash_oracle(src: str = "documents") -> str:
    """The MinHash+LSH candidate-pair pipeline as DuckDB SQL, over any
    document-shaped relation ``src`` (doc_id, text) — kept in lockstep
    with operators.dedup.minhash_lsh_pairs (k=16, 8 bands)."""
    return f"""
    WITH shingled AS (
      SELECT doc_id AS id, UNNEST({_SHINGLES2}) AS s
      FROM {src}
    ),
    hashed AS (
      SELECT id, {_H64.format(s='s')} % {MINHASH_P} AS h FROM shingled
    ),
    sig AS (
      SELECT id, i,
             MIN((({MINHASH_A0} + {MINHASH_A_STEP} * i) * h
                  + ({MINHASH_B0} + {MINHASH_B_STEP} * i)) % {MINHASH_P}) AS v
      FROM hashed CROSS JOIN (SELECT UNNEST(range(0, 16)) AS i)
      GROUP BY id, i
    ),
    banded AS (
      SELECT id, CAST(i // 2 AS INT) AS band_id,
             md5(string_agg(CAST(v AS VARCHAR), ',' ORDER BY i)) AS band_hash
      FROM sig
      GROUP BY id, i // 2
    )
    SELECT DISTINCT a.id AS id_a, b.id AS id_b
    FROM banded a
    JOIN banded b ON a.band_id = b.band_id AND a.band_hash = b.band_hash
    WHERE a.id < b.id
"""


_MINHASH_ORACLE = _minhash_oracle("documents")


@query("dedup_minhash_pairs", oracle=_MINHASH_ORACLE)
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidate pairs: k=16 minima over 2-gram shingles, 8
    bands × 2 rows. Map-side signatures; the only shuffle is the band join."""
    docs = load(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, k=16, bands=8, shingle_n=2)


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH cand AS ({_MINHASH_ORACLE}),
    sh AS (
      SELECT doc_id AS id, {_HASHED_SH3} AS s FROM documents
    )
    SELECT c.id_a, c.id_b,
           CASE WHEN len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) > 0
                THEN CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                     / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
                ELSE 0.0 END AS jaccard
    FROM cand c
    JOIN sh a ON a.id = c.id_a
    JOIN sh b ON b.id = c.id_b
    WHERE CASE WHEN len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) > 0
               THEN CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
               ELSE 0.0 END >= 0.05
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard verification over MinHash+LSH candidate pairs
    (operators.dedup.candidate_jaccard): the n-gram Jaccard primitive in
    its only scalable registration — two id-equi-joins over the candidate
    set, NO all-pairs join anywhere in the plan (gated by
    tests/test_plans.py: no CartesianProduct / BroadcastNestedLoopJoin).
    Distinct from dedup_verified_pairs by verify-shingle width (3 vs 2)
    and threshold (0.05 vs 0.2); int/int division only: engine-exact.
    The shared shingle-hash projection runs in parquet-TABLE mode (the
    100 TB shape — no session-lifetime storage-pinned blocks). The small
    RESULT is localCheckpoint'd so the corpus-sized shingle table can be
    rmtree'd before returning (the store_* query pattern) — no temp-dir
    leak per invocation."""
    import shutil
    import tempfile

    docs = load(spark, sf_dir, "documents")
    cand = minhash_lsh_pairs(docs, k=16, bands=8, shingle_n=2)
    tmp = tempfile.mkdtemp(prefix="shingle_hash_ngram_")
    try:
        return candidate_jaccard(
            docs, cand, n=3, threshold=0.05, shingle_table_path=tmp
        ).localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query(
    "dedup_verified_pairs",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id AS id, {_HASHED_SH2} AS s FROM documents
    ),
    cand AS ({_MINHASH_ORACLE})
    SELECT c.id_a, c.id_b,
           CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
    FROM cand c
    JOIN sh a ON a.id = c.id_a
    JOIN sh b ON b.id = c.id_b
    WHERE len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) > 0
      AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.2
    """,
)
def dedup_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup pipeline: LSH candidates → exact Jaccard verify
    (≥0.2) on candidates only — the scalable two-phase shape. Shingle
    hashes share via a parquet table (no storage-pinned blocks); the small
    result is localCheckpoint'd so the table can be rmtree'd on return."""
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="shingle_hash_pairs_")
    try:
        return verified_near_dups(
            load(spark, sf_dir, "documents"),
            threshold=0.2,
            shingle_table_path=tmp,
        ).localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query(
    "dedup_cluster_docs",
    oracle=f"""
    WITH RECURSIVE cand AS ({_MINHASH_ORACLE}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM cand
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM cand
    ),
    reach(id, label) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id
    )
    SELECT id AS doc_id, MIN(label) AS cluster_id
    FROM reach GROUP BY id
    """,
)
def dedup_cluster_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clustering: LSH candidate pairs → connected components →
    (doc_id, cluster_id); docs with no near-dup are singleton clusters.
    Min-label propagation (iterative joins, lineage-truncated); the oracle
    computes the same fixpoint with a recursive CTE. Shuffle partitions
    are sized to the label table for the eager CC rounds (same knob as
    dedup_cluster_chain — per-round scheduler overhead, ~20% of the wall
    clock at sf0.1, not data)."""
    docs = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, k=16, bands=8, shingle_n=2)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        cc = connected_components(pairs, docs.select(F.col("doc_id").alias("id")))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return cc.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))


@query(
    "dedup_cluster_chain",
    oracle="""
    WITH RECURSIVE edges AS (
      SELECT a.doc_id AS src, b.doc_id AS dst
      FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      WHERE a.doc_id % 100 <> 99
      UNION ALL
      SELECT b.doc_id, a.doc_id
      FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      WHERE a.doc_id % 100 <> 99
    ),
    reach(id, label) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id
    )
    SELECT id AS doc_id, MIN(label) AS cluster_id
    FROM reach GROUP BY id
    """,
)
def dedup_cluster_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adversarial-diameter connected components via alternating
    large-star/small-star rounds (operators.dedup.connected_components_star,
    Kiveris et al.) on a CHAIN-shaped graph: doc i links to doc i+1 except
    at every 100th id, so each component is a path of diameter ~100.
    Min-label propagation would need ~100 shuffle rounds here (one hop per
    round — it would exhaust its budget and raise); the star formulation
    converges in O(log diameter) ≈ 7. Mirrors the reference's
    adversarial-input testing style
    (marketdb-core MultipleTimeSeriesEnumeratorTest.scala:49-88); the
    oracle computes the same fixpoint with a recursive CTE. Shuffle
    partitions are sized to the edge table for the eager star rounds
    (thousands of rows here — 32 near-empty tasks per stage would pay
    ~2× the wall clock in scheduler overhead; at 100 TB the same knob
    tracks cluster parallelism instead)."""
    from marketdb_spark.operators.dedup import connected_components_star

    docs = load(spark, sf_dir, "documents")
    a = docs.select(F.col("doc_id").alias("id_a"))
    b = docs.select(F.col("doc_id").alias("id_b"))
    chain = a.join(
        b, b["id_b"] == a["id_a"] + F.lit(1), "inner"
    ).filter(F.col("id_a") % 100 != 99)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        cc = connected_components_star(
            chain, docs.select(F.col("doc_id").alias("id"))
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return cc.select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    )


_SIMHASH_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS ts FROM documents
    ),
    sums AS (
      SELECT doc_id,
             list_transform(range(0, 32), j ->
               list_reduce(
                 list_transform(ts, t ->
                   (({_H64.format(s='t')} >> j) & 1) * 2 - 1),
                 (acc, v) -> acc + v)) AS bit_sums
      FROM toks
    )
    SELECT doc_id,
           list_reduce(
             list_transform(range(0, 32), j ->
               CASE WHEN bit_sums[j + 1] > 0
                    THEN (CAST(1 AS BIGINT) << j) ELSE 0 END),
             (acc, v) -> acc + v) AS simhash
    FROM sums
"""


@query("dedup_simhash", oracle=_SIMHASH_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash fingerprints (map-side only; near-dup = small hamming
    distance, verified in tests/test_operators.py)."""
    docs = load(spark, sf_dir, "documents")
    return simhash_fingerprints(docs, n_bits=32)


_EMB_DOT = (
    "list_reduce(list_transform(range(1, len({a}) + 1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (acc, v) -> acc + v)"
)
_EMB_NORM = (
    "sqrt(list_reduce(list_transform(range(1, len({a}) + 1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE)), (acc, v) -> acc + v))"
)
@query(
    "dedup_embedding_pairs",
    oracle=f"""
    WITH {lsh_sql_ctes()}
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_EMB_DOT.format(a='a.embedding', b='b.embedding')}
             / ({_EMB_NORM.format(a='a.embedding')}
                * {_EMB_NORM.format(a='b.embedding')}) AS cosine_sim
    FROM lshb a JOIN lshb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {_EMB_DOT.format(a='a.embedding', b='b.embedding')}
            / ({_EMB_NORM.format(a='a.embedding')}
               * {_EMB_NORM.format(a='b.embedding')}) >= 0.35
    """,
)
def dedup_embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup (the fifth dedup modality, SURVEY §2B [N]):
    candidate pairs share a sign-LSH bucket — the ADAPTIVE occupancy-capped
    width (operators.similarity.lsh_bucketed: bits scale log2 with corpus
    size, over-cap buckets split on extra hyperplanes), so the candidate
    pair space grows LINEARLY with the corpus instead of the r10-flagged
    N²/256 of a fixed 8-bit width — then exact cosine ≥ threshold
    verifies. Same candidates→verify shape as dedup_verified_pairs, on
    vectors instead of shingles; cosine is a sequential double fold on
    both engines (bit-exact oracle)."""
    from marketdb_spark.operators.similarity import cosine, lsh_bucketed

    emb = load(spark, sf_dir, "embeddings")
    # both pair sides reference the bucketed frame; materialize the LSH
    # prep once (the pre-self-join device, see dedup_semantic_pairs).
    b = lsh_bucketed(emb).localCheckpoint()
    a_side = b.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("vec_a"),
        "bucket",
    )
    b_side = b.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vec_b"),
        F.col("bucket").alias("bucket_b"),
    )
    return (
        a_side.join(
            b_side,
            (F.col("bucket") == F.col("bucket_b")) & (F.col("id_a") < F.col("id_b")),
        )
        .withColumn("cosine_sim", cosine("vec_a", "vec_b"))
        .filter(F.col("cosine_sim") >= 0.35)
        .select("id_a", "id_b", "cosine_sim")
    )


@query(
    "dedup_canonical_docs",
    oracle=f"""
    WITH RECURSIVE cand AS ({_MINHASH_ORACLE}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM cand
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM cand
    ),
    reach(id, label) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id
    ),
    cc AS (SELECT id, MIN(label) AS cluster_id FROM reach GROUP BY id),
    ranked AS (
      SELECT cc.cluster_id, d.doc_id, d.n_chars,
             row_number() OVER (
               PARTITION BY cc.cluster_id
               ORDER BY d.n_chars DESC, d.doc_id
             ) AS rn
      FROM cc JOIN documents d ON d.doc_id = cc.id
    )
    SELECT cluster_id,
           MAX(CASE WHEN rn = 1 THEN doc_id END) AS keep_doc_id,
           COUNT(*) AS n_members,
           CAST(SUM(n_chars) AS BIGINT) AS cluster_chars
    FROM ranked GROUP BY cluster_id
    """,
)
def dedup_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The last step of corpus dedup: per duplicate cluster, elect one
    canonical document (longest text; ties → smallest id) — pairs →
    connected components → window top-1. Downstream training reads only
    keep_doc_id rows; n_members/cluster_chars quantify the reduction.
    The per-cluster window partitions on cluster_id (uniform, bounded
    groups), so the rank shuffle is skew-free at scale."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, k=16, bands=8, shingle_n=2)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        cc = connected_components(pairs, docs.select(F.col("doc_id").alias("id")))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    joined = cc.join(docs, cc["id"] == docs["doc_id"]).select(
        F.col("label").alias("cluster_id"), "doc_id", "n_chars"
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .groupBy("cluster_id")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("keep_doc_id"),
            F.count("*").alias("n_members"),
            F.sum("n_chars").alias("cluster_chars"),
        )
    )


# word 3-gram shingles, distinct (mirrors operators.dedup.shingles n=3)
_SHINGLES3 = (
    f"list_distinct(list_transform(range(1, len({_TOKS}) - 1), "
    f"i -> {_TOKS}[i] || ' ' || {_TOKS}[i+1] || ' ' || {_TOKS}[i+2]))"
)


@query(
    "dedup_contamination",
    oracle=f"""
    WITH ev AS (
      SELECT DISTINCT UNNEST({_SHINGLES3}) AS s
      FROM documents WHERE doc_id % 97 = 0
    ),
    tr AS (
      SELECT doc_id, {_SHINGLES3} AS sh FROM documents WHERE doc_id % 97 <> 0
    ),
    ex AS (SELECT doc_id, UNNEST(sh) AS s FROM tr),
    hits AS (
      SELECT ex.doc_id, COUNT(*) AS n_overlap
      FROM ex JOIN ev USING (s) GROUP BY ex.doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.sh) AS BIGINT) AS n_grams,
           CAST(coalesce(h.n_overlap, 0) AS BIGINT) AS n_overlap,
           CASE WHEN len(t.sh) > 0
                THEN CAST(coalesce(h.n_overlap, 0) AS DOUBLE) / len(t.sh)
                ELSE 0.0 END AS overlap_ratio,
           CASE WHEN len(t.sh) > 0
                THEN CAST(coalesce(h.n_overlap, 0) AS DOUBLE) / len(t.sh)
                ELSE 0.0 END >= 0.1 AS contaminated
    FROM tr t LEFT JOIN hits h USING (doc_id)
    """,
)
def dedup_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination: flag training documents sharing word
    3-grams with a held-out eval set (here: doc_id % 97 == 0 stands in for
    the benchmark corpus). Per train doc: its distinct 3-gram count, how
    many of those appear in ANY eval doc, and the overlap ratio (≥0.1 →
    contaminated — the n-gram-overlap decontamination rule used for LLM
    training corpora).

    Scale shape: the eval set is small by construction, so its distinct
    shingles broadcast — the overlap check is a map-side broadcast join on
    the exploded train shingles followed by a partial-agg count per doc;
    the only shuffle is that count. The train shingle projection is built
    twice (counts branch + explode branch) — at 100 TB you'd persist it or
    carry len(sh) through the explode."""
    from marketdb_spark.operators.dedup import shingled

    docs = load(spark, sf_dir, "documents")
    ev_sh = (
        shingled(docs.filter(F.col("doc_id") % 97 == 0), "doc_id", "text", 3)
        .select(F.explode_outer("sh").alias("s"))
        .filter(F.col("s").isNotNull())
        .distinct()
    )
    tr = shingled(docs.filter(F.col("doc_id") % 97 != 0), "doc_id", "text", 3)
    hits = (
        tr.select("id", F.explode_outer("sh").alias("s"))
        .filter(F.col("s").isNotNull())
        .join(F.broadcast(ev_sh), "s")
        .groupBy("id")
        .agg(F.count("*").alias("n_overlap"))
    )
    out = (
        tr.select("id", F.size("sh").cast("long").alias("n_grams"))
        .join(hits, "id", "left")
        .select(
            F.col("id").alias("doc_id"),
            "n_grams",
            F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long").alias("n_overlap"),
        )
    )
    ratio = F.when(
        F.col("n_grams") > 0,
        F.col("n_overlap").cast("double") / F.col("n_grams"),
    ).otherwise(0.0)
    return out.select(
        "doc_id",
        "n_grams",
        "n_overlap",
        ratio.alias("overlap_ratio"),
        (ratio >= 0.1).alias("contaminated"),
    )


# quality predicate kept in lockstep with operators.pipeline.quality_keep
_QUALITY_SQL = f"""
      len({_TOKS}) BETWEEN 20 AND 1000
      AND (CASE WHEN len({_TOKS}) > 0
                THEN CAST(len(list_filter({_TOKS},
                     t -> t IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
                     / len({_TOKS}) ELSE 0.0 END) >= 0.01
      AND (CASE WHEN LENGTH(text) > 0
                THEN CAST(LENGTH(text)
                     - LENGTH(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
                     / LENGTH(text) ELSE 0.0 END) < 0.1
"""


@query(
    "pipeline_clean_corpus",
    oracle=f"""
    WITH RECURSIVE kept AS (
      SELECT doc_id, text, n_chars FROM documents WHERE {_QUALITY_SQL}
    ),
    cand AS ({_minhash_oracle('kept')}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM cand
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM cand
    ),
    reach(id, label) AS (
      SELECT doc_id, doc_id FROM kept
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id
    ),
    cc AS (SELECT id, MIN(label) AS cluster_id FROM reach GROUP BY id),
    ranked AS (
      SELECT k.doc_id, cc.cluster_id,
             ROW_NUMBER() OVER (
               PARTITION BY cc.cluster_id
               ORDER BY k.n_chars DESC, k.doc_id
             ) AS rn
      FROM cc JOIN kept k ON k.doc_id = cc.id
    )
    SELECT doc_id, cluster_id, rn = 1 AS is_canonical FROM ranked
    """,
)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole corpus-cleaning pipeline in one call (operators.pipeline.
    clean_corpus): quality gate → MinHash+LSH pairs → connected components
    → per-cluster canonical election. One row per surviving doc with its
    cluster and canonical flag; the oracle replays every stage in SQL.
    Shuffle partitions sized to the label table for the eager CC rounds
    (see dedup_cluster_docs)."""
    from marketdb_spark.operators.pipeline import clean_corpus

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        return clean_corpus(load(spark, sf_dir, "documents"))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


@query(
    "dedup_edit_distance",
    oracle="""
    WITH t0 AS (
      SELECT doc_id,
             lower(substring(text, 1, 64)) AS p,
             substring(text, 1, 8) AS pre8,
             substring(text, 1, 32) AS pre32,
             len(text) // 64 AS blk_len
      FROM documents
    ),
    t AS (
      SELECT doc_id, p, blk_len,
             CASE WHEN COUNT(*) OVER (PARTITION BY pre8, blk_len) <= 256
                  THEN '8|' || pre8 ELSE '32|' || pre32 END AS blk
      FROM t0
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(a.p, b.p) AS INT) AS edit_dist
    FROM t a JOIN t b
      ON a.blk = b.blk AND a.blk_len = b.blk_len
     AND a.doc_id < b.doc_id
    WHERE levenshtein(a.p, b.p) <= 8
    """,
)
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup detection — the dedup modality for
    short-text/title corpora where token shingles are too coarse:
    documents BLOCKED by (prefix, length band), then exact levenshtein
    over the 64-char normalized prefix verified ONLY within blocks —
    the same candidates-then-verify shape as the LSH pipeline (never
    all-pairs; the equi-join on the block key is the manufactured hash
    key). Integer distances — engine-exact.

    The block key is FREQUENCY-REFINED (standard record-linkage
    blocking): blocks over 256 docs on the 8-char key — shared
    boilerplate prefixes, e.g. an HTML doctype or a copied header — are
    re-keyed by the 32-char prefix, so a boilerplate family spreads
    across fine blocks instead of degenerating to all-pairs within one.
    The round-9 sf0.3 sweep caught exactly this: a corpus where every
    replica shared an 8-char prefix ran 19.6× at 3× data (block² blowup,
    max block 701); refined, the max block is 4 and the query is back to
    ~linear. The refinement never fires on the base corpora (max block
    29 at sf0.1), so results there are unchanged; the trade is the
    standard blocking-recall one, now also applied between chars 9-32
    for oversized blocks only. Deeper boilerplate (shared 32+ chars)
    stays documented scope: those corpora belong to the shingle/LSH
    path, which is content-position-insensitive."""
    from pyspark.sql import Window as W

    docs = load(spark, sf_dir, "documents")
    w = W.partitionBy("pre8", "blk_len")
    t = (
        docs.select(
            "doc_id",
            F.lower(F.substring("text", 1, 64)).alias("p"),
            F.substring("text", 1, 8).alias("pre8"),
            F.substring("text", 1, 32).alias("pre32"),
            (F.length("text") / F.lit(64)).cast("long").alias("blk_len"),
        )
        .withColumn(
            "blk",
            F.when(
                F.count("*").over(w) <= 256,
                F.concat(F.lit("8|"), F.col("pre8")),
            ).otherwise(F.concat(F.lit("32|"), F.col("pre32"))),
        )
        .select("doc_id", "p", "blk", "blk_len")
    )
    a = t.select(
        F.col("doc_id").alias("id_a"),
        F.col("p").alias("p_a"),
        "blk",
        "blk_len",
    )
    b = t.select(
        F.col("doc_id").alias("id_b"),
        F.col("p").alias("p_b"),
        F.col("blk").alias("blk_b"),
        F.col("blk_len").alias("blk_len_b"),
    )
    # BOUNDED levenshtein: with the threshold, Spark computes only the
    # 2k+1 diagonal band and bails out early (O(k·n) per pair, not
    # O(n²)) and returns -1 past the bound — the verify step's cost per
    # candidate drops ~40% at sf0.1 and the bound is exactly the
    # emit predicate anyway
    dist = F.levenshtein("p_a", "p_b", 8)
    return (
        a.join(
            b,
            (F.col("blk") == F.col("blk_b"))
            & (F.col("blk_len") == F.col("blk_len_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .filter(dist >= 0)
        .select("id_a", "id_b", dist.cast("int").alias("edit_dist"))
    )


@query(
    "dedup_incremental_exact",
    oracle=r"""
    WITH old_docs AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
    new_docs AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
    store AS (
      SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
             MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      FROM old_docs GROUP BY fp
    ),
    batch AS (
      SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
             MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      FROM new_docs GROUP BY fp
    )
    SELECT fp, keep_id, n_copies, FALSE AS is_new FROM store
    UNION ALL
    SELECT b.fp, b.keep_id, b.n_copies, TRUE AS is_new
    FROM batch b WHERE b.fp NOT IN (SELECT fp FROM store)
    """,
)
def dedup_incremental_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup (operators.dedup.incremental_exact_dedup):
    docs with doc_id % 5 != 0 play the historical corpus, the rest are
    today's batch — the batch dedups against the store without touching
    historical text (one anti-join on the md5 key), and fingerprints
    first seen today come back flagged is_new. The shape a 100 TB corpus
    actually runs daily; full-rescan dedup is dedup_exact_docs."""
    from marketdb_spark.operators.dedup import incremental_exact_dedup

    docs = load(spark, sf_dir, "documents")
    store = exact_dedup(docs.filter(F.col("doc_id") % 5 != 0))
    return incremental_exact_dedup(
        store, docs.filter(F.col("doc_id") % 5 == 0)
    )


@query(
    "dedup_containment",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id AS id, {_HASHED_SH2} AS s FROM documents
    ),
    cand AS ({_MINHASH_ORACLE})
    SELECT c.id_a, c.id_b,
           CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / least(len(a.s), len(b.s)) AS containment
    FROM cand c
    JOIN sh a ON a.id = c.id_a
    JOIN sh b ON b.id = c.id_b
    WHERE least(len(a.s), len(b.s)) > 0
      AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / least(len(a.s), len(b.s)) >= 0.5
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment near-dup detection: LSH candidates -> exact containment
    |A∩B| / min(|A|,|B|) >= 0.5 over hashed shingle sets. The sub/superset
    duplicate class (a page quoted whole inside a larger page) that
    symmetric Jaccard structurally under-scores — the asymmetric metric
    every web-corpus dedup stack runs alongside Jaccard. Same 100 TB
    shape as dedup_verified_pairs: banded candidates, verify restricted
    to candidates, shingle hashes shared via parquet table (result
    localCheckpoint'd, table rmtree'd on return)."""
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="shingle_hash_contain_")
    try:
        return contained_near_dups(
            load(spark, sf_dir, "documents"),
            threshold=0.5,
            shingle_table_path=tmp,
        ).localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query(
    "dedup_simhash_pairs",
    oracle=f"""
    WITH fp AS ({_SIMHASH_ORACLE}),
    banded AS (
      SELECT doc_id, b.b AS band_id,
             (simhash >> (8 * b.b)) & 255 AS band_val
      FROM fp CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS b) b
    )
    SELECT DISTINCT a.doc_id AS id_a, bb.doc_id AS id_b,
           CAST(bit_count(xor(fa.simhash, fb.simhash)) AS BIGINT) AS hamming
    FROM banded a
    JOIN banded bb ON a.band_id = bb.band_id
                  AND a.band_val = bb.band_val
                  AND a.doc_id < bb.doc_id
    JOIN fp fa ON fa.doc_id = a.doc_id
    JOIN fp fb ON fb.doc_id = bb.doc_id
    WHERE bit_count(xor(fa.simhash, fb.simhash)) <= 3
    """,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup PAIR GENERATION by band-blocking: split each
    32-bit fingerprint into 4 bands of 8 bits; any pair within Hamming
    distance 3 must agree on at least one whole band (pigeonhole), so an
    exact-match self-join per band finds ALL such pairs with no
    all-pairs scan — the Google-crawl simhash dedup shape (Manku et al.,
    WWW'07). Candidates are then verified with bit_count(xor) <= 3 and
    de-duplicated across bands. At production scale the same code runs a
    64-bit fingerprint with 8 bands (finer buckets); 32 bits here keeps
    the DuckDB oracle's list-fold fingerprint mirror exact. Shape:
    map-side fingerprints + explode(4) → one shuffle on (band_id,
    band_val) for the self-join — never O(n²)."""
    docs = load(spark, sf_dir, "documents")
    fp = simhash_fingerprints(docs)  # (doc_id, simhash), map-only
    band = F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("band_id")
    banded = fp.select("doc_id", "simhash", band).withColumn(
        # F.shiftright only takes a literal shift; SQL form takes a column
        "band_val", F.expr("shiftright(simhash, band_id * 8) & 255")
    )
    a = banded.select(
        F.col("doc_id").alias("id_a"),
        F.col("simhash").alias("sh_a"),
        "band_id",
        "band_val",
    )
    b = banded.select(
        F.col("doc_id").alias("id_b"),
        F.col("simhash").alias("sh_b"),
        "band_id",
        "band_val",
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(b, ["band_id", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(hamming <= 3)
        .select("id_a", "id_b", hamming.cast("bigint").alias("hamming"))
        .distinct()
    )


@query(
    "dedup_source_matrix",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id AS id, {_HASHED_SH2} AS s FROM documents
    ),
    cand AS ({_MINHASH_ORACLE}),
    verified AS (
      SELECT c.id_a, c.id_b,
             CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
               AS jaccard
      FROM cand c
      JOIN sh a ON a.id = c.id_a
      JOIN sh b ON b.id = c.id_b
      WHERE len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) > 0
        AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
              / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.2
    )
    SELECT LEAST(da.source, db.source) AS source_x,
           GREATEST(da.source, db.source) AS source_y,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           MAX(v.jaccard) AS max_jaccard
    FROM verified v
    JOIN documents da ON da.doc_id = v.id_a
    JOIN documents db ON db.doc_id = v.id_b
    GROUP BY source_x, source_y
    """,
)
def dedup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-SOURCE duplication matrix — the corpus-curation report that
    tells you WHICH sources mirror each other (the decision input for
    per-source dedup order and crawl dedup budgets): verified near-dup
    pairs (the dedup_verified_pairs pipeline) are attributed to their
    unordered (source, source) cell with pair counts and the strongest
    overlap. Aggregates are order-insensitive (count, max) so the
    report is exact. Scale shape: the heavy lifting is the shared
    LSH→verify pipeline; the attribution is two broadcast-size joins on
    doc_id and an aggregation on the tiny source-pair key space."""
    import shutil
    import tempfile

    docs = load(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="shingle_hash_matrix_")
    try:
        pairs = verified_near_dups(
            docs, threshold=0.2, shingle_table_path=tmp
        )
        src = docs.select("doc_id", "source")
        attributed = (
            pairs.join(
                src.select(
                    F.col("doc_id").alias("id_a"),
                    F.col("source").alias("src_a"),
                ),
                "id_a",
            )
            .join(
                src.select(
                    F.col("doc_id").alias("id_b"),
                    F.col("source").alias("src_b"),
                ),
                "id_b",
            )
            .groupBy(
                F.least("src_a", "src_b").alias("source_x"),
                F.greatest("src_a", "src_b").alias("source_y"),
            )
            .agg(
                F.count("*").alias("n_pairs"),
                F.max("jaccard").alias("max_jaccard"),
            )
        )
        return attributed.localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
