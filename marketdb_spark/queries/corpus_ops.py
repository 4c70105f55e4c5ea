"""Corpus-curation queries on `documents` — the training-data-pipeline
surface beyond cleaning/dedup (SURVEY §2B [N]): deterministic shard
assignment, token-budgeted selection, per-domain caps, and link-graph
ranking over the near-dup graph. All exact-arithmetic (integer sums,
integer division, md5-derived hashes) so every query is oracle-checked
bit-for-bit against DuckDB.

Reference provenance: the reference has no corpus layer — these are the
"operations a large-scale training-data pipeline would need" mandated on
top of its query surface; the shapes (hash-mod sharding, windowed caps,
prefix-sum budgets, iterative rank propagation) are the standard public
designs (GFS-style sharding; CCNet/RefinedWeb-style domain caps; Gopher
token budgeting; PageRank as in the original Brin/Page formulation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from marketdb_spark.catalog import load
from marketdb_spark.functions.text import token_count
from marketdb_spark.queries.llm_dedup import _MINHASH_ORACLE
from marketdb_spark.queries.registry import query

# DuckDB fragments kept in lockstep with functions/text.py (same as
# llm_text._ORACLE_TOKENS / _ORACLE_NTOK)
_ORACLE_TOKENS = r"list_filter(string_split_regex(text, '\s+'), t -> t != '')"
_ORACLE_NTOK = f"CAST(len({_ORACLE_TOKENS}) AS BIGINT)"

_N_SHARDS = 16
# 60-bit md5-derived doc hash — portable across Spark and DuckDB
_ORACLE_DOCHASH = (
    "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"
)


@query(
    "corpus_shard_assign",
    oracle=f"""
    WITH t AS (
      SELECT {_ORACLE_DOCHASH} % {_N_SHARDS} AS shard,
             doc_id, {_ORACLE_NTOK} AS n FROM documents
    )
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS total_tokens,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM t GROUP BY shard
    """,
)
def corpus_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard assignment: shard = md5(doc_id) mod
    {N}. Content-independent and stable across re-runs, so incremental
    ingest lands each doc in the same shard forever (the property a
    resumable tokenize/pack pipeline needs). The registered query returns
    per-shard accounting; the production writer is
    ``df.repartition(N, shard).write.partitionBy("shard")`` — the hash is
    uniform, so shards are balanced by construction and the single
    shuffle is on a perfectly uniform key. Map-side hash + one {N}-key
    aggregation; survives 100 TB trivially (partial aggregation reduces
    each task to ≤{N} rows)."""
    docs = load(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    return (
        docs.select(
            (h % _N_SHARDS).alias("shard"),
            "doc_id",
            token_count("text").alias("n"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n").alias("total_tokens"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


_BUDGET = 5000


@query(
    "corpus_token_budget",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, {_ORACLE_NTOK} AS n_tokens FROM documents
    )
    SELECT doc_id, source, n_tokens,
           CAST(SUM(n_tokens) OVER (
             PARTITION BY source ORDER BY n_tokens DESC, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_tokens,
           (CAST(SUM(n_tokens) OVER (
             PARTITION BY source ORDER BY n_tokens DESC, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) <= {_BUDGET}) AS kept
    FROM t
    """,
)
def corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budgeted corpus selection (the Gopher/Chinchilla mixing
    step): per source, rank docs longest-first (doc_id tie-break — total
    order, so the window is deterministic) and keep while the running
    token total stays within the budget. One shuffle, partitioned by
    source; each source's window runs independently on its partition, so
    the op scales with the number of sources, not corpus size. A hot
    source at 100 TB bounds a single task — the mitigation (cap first
    via doc_domain_caps, or pre-filter by a quality floor) composes
    upstream; the budget itself guarantees the kept set is small.
    Integer sums only — engine-exact."""
    docs = load(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("n_tokens"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = docs.select(
        "doc_id", "source", token_count("text").alias("n_tokens")
    )
    cum = F.sum("n_tokens").over(w).cast("bigint")
    return t.select(
        "doc_id",
        "source",
        "n_tokens",
        cum.alias("cum_tokens"),
        (cum <= _BUDGET).alias("kept"),
    )


_CAP = 30


@query(
    "doc_domain_caps",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, {_ORACLE_NTOK} AS n FROM documents
    ),
    r AS (
      SELECT source, n,
             ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY n DESC, doc_id
             ) AS rk
      FROM t
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN rk <= {_CAP} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(SUM(CASE WHEN rk <= {_CAP} THEN n ELSE 0 END) AS BIGINT)
             AS tokens_kept,
           CAST(SUM(CASE WHEN rk > {_CAP} THEN n ELSE 0 END) AS BIGINT)
             AS tokens_dropped
    FROM r GROUP BY source
    """,
)
def doc_domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document caps with drop accounting (the CCNet /
    RefinedWeb "no domain dominates the corpus" rule): rank each source's
    docs longest-first and keep the top {CAP}, reporting kept/dropped
    token mass per source. One shuffle on source; the rank window and the
    rollup share the exchange (same partitioning). At 100 TB a hot domain
    makes one long-tasked partition — since only the top {CAP} survive,
    the scale mitigation is a per-partition pre-trim (local top-{CAP}
    before the shuffle, the operators/topk.py pattern), which changes no
    results; the registered form keeps the plan minimal."""
    docs = load(spark, sf_dir, "documents")
    t = docs.select("doc_id", "source", token_count("text").alias("n"))
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(F.desc("n"), F.asc("doc_id"))
    )
    r = t.select("source", "n", rk.alias("rk"))
    return r.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("rk") <= _CAP, 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(F.col("rk") <= _CAP, F.col("n")).otherwise(0)).alias(
            "tokens_kept"
        ),
        F.sum(F.when(F.col("rk") > _CAP, F.col("n")).otherwise(0)).alias(
            "tokens_dropped"
        ),
    )


_PR_SCALE = 1_000_000_000_000  # 1e12: fixed-point PageRank unit
_PR_ITERS = 3


def _pagerank_oracle() -> str:
    """Fixed-point PageRank over the near-dup graph as DuckDB SQL —
    integer arithmetic only (contributions use integer division, damping
    is (85·m)//100), so Spark's BIGINT and DuckDB's HUGEINT agree
    bit-for-bit. Chained CTEs unroll the {ITERS} iterations."""
    prev = "r0"
    steps = []
    for i in range(1, _PR_ITERS + 1):
        steps.append(
            f"""
    s{i} AS (
      SELECT e.dst AS id, SUM({prev}.r // deg.d) AS m
      FROM edges e
      JOIN {prev} ON {prev}.id = e.src
      JOIN deg ON deg.id = e.src
      GROUP BY e.dst
    ),
    r{i} AS (
      SELECT r0.id,
             (15 * (SELECT b FROM base)) // 100
               + (85 * COALESCE(s{i}.m, 0)) // 100 AS r
      FROM r0 LEFT JOIN s{i} ON s{i}.id = r0.id
    )"""
        )
        prev = f"r{i}"
    chain = ",".join(steps)
    return f"""
    WITH cand AS ({_MINHASH_ORACLE}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM cand
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM cand
    ),
    deg AS (
      SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY src
    ),
    base AS (
      SELECT {_PR_SCALE} // CAST(COUNT(*) AS BIGINT) AS b FROM documents
    ),
    r0 AS (
      SELECT doc_id AS id, (SELECT b FROM base) AS r FROM documents
    ),{chain}
    SELECT id AS doc_id, CAST(r AS BIGINT) AS pr_scaled FROM {prev}
    """


@query("graph_pagerank_dedup", oracle=_pagerank_oracle())
def graph_pagerank_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the near-duplicate graph ({ITERS} power iterations,
    damping 0.85): docs central to large duplicate families score high —
    a canonical-election signal that, unlike min-doc_id, prefers the hub
    the copies cluster around. Edges are the MinHash+LSH candidate pairs
    (banded — never all-pairs), symmetrized.

    Fixed-point integer arithmetic throughout (unit = 1e-12 of total
    rank): contribution = r div deg, damping = (85·m) div 100 — both
    engines floor identically, so the oracle is bit-exact; no float
    summation order to diverge. Dangling docs keep teleport mass only.

    Scale shape: each iteration is one join edges⋈ranks on the uniform
    src key + one groupBy dst — the standard distributed PageRank round
    (no driver data motion; the only driver scalar is N). The edge list
    is MATERIALIZED once (localCheckpoint — it is O(candidate pairs),
    tiny next to the corpus; at 100 TB it becomes a parquet edge table,
    the hashed_shingled table-mode pattern): without this, each round's
    lazy lineage re-embeds the whole MinHash candidate pipeline and the
    plan triples. Iteration count is fixed at {ITERS}, so the whole
    query is {ITERS} join+agg rounds deep over the cached edges; AQE
    handles the skewed-dst hot spots."""
    docs = load(spark, sf_dir, "documents")
    from marketdb_spark.operators.dedup import minhash_lsh_pairs

    cand = minhash_lsh_pairs(docs, k=16, bands=8, shingle_n=2)
    edges = cand.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionAll(
        cand.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    ).localCheckpoint()
    deg = edges.groupBy("src").agg(F.count("*").cast("bigint").alias("d"))
    n = docs.count()  # the one driver scalar: corpus size for the base rank
    base = _PR_SCALE // n
    nodes = docs.select(F.col("doc_id").alias("id"))
    ranks = nodes.select("id", F.lit(base).cast("bigint").alias("r"))
    teleport = (15 * base) // 100
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(ranks, edges.src == ranks.id)
            .join(deg, edges.src == deg.src)
            .select(
                F.col("dst").alias("id"), F.expr("r div d").alias("c")
            )
            .groupBy("id")
            .agg(F.sum("c").alias("m"))
        )
        ranks = (
            nodes.join(contrib, "id", "left")
            .select(
                "id",
                (
                    F.lit(teleport)
                    + F.expr("(85 * coalesce(m, 0)) div 100")
                ).cast("bigint").alias("r"),
            )
        )
    return ranks.select(F.col("id").alias("doc_id"), F.col("r").alias("pr_scaled"))
