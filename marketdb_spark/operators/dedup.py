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


def incremental_exact_dedup(
    existing_fps: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dedup a NEW batch of documents against an existing fingerprint
    store — the production increment shape: a daily batch dedups against
    the history without rescanning the corpus. ``existing_fps`` is a
    prior `exact_dedup` output (fp, keep_id, n_copies); returns the
    updated store — old rows unchanged (history is immutable: a new copy
    of a known fingerprint is simply dropped, the reference's
    idempotent-put semantics, Trade.scala:56-57), plus one row per
    fingerprint first seen in this batch, flagged ``is_new``.

    Scale shape: fingerprinting the batch is a map; the only joins are
    one groupBy on the batch's md5 keys and one LEFT ANTI join batch ⋈
    store on the same uniform key — cost is O(|batch| + |store-probe|),
    never O(|corpus|) recompute. With the store in the snapshot table
    (sources/snapshot.py), the is_new rows are exactly the CDC-append
    commit (read_changes exposes them downstream)."""
    batch_fps = exact_dedup(new_docs, text_col, id_col)
    fresh = batch_fps.join(existing_fps.select("fp"), "fp", "left_anti")
    return existing_fps.select(
        "fp", "keep_id", "n_copies", F.lit(False).alias("is_new")
    ).unionByName(
        fresh.select("fp", "keep_id", "n_copies", F.lit(True).alias("is_new"))
    )


def spread(df: DataFrame) -> DataFrame:
    """Repartition a *small* input up to the session's default parallelism
    before a CPU-bound map stage (hashing/shingling costs dominate IO here).

    A tiny parquet file arrives as 1-2 partitions, which would serialize the
    whole map stage on one core; at real scale inputs already carry ≥cores
    partitions and this is a no-op (no shuffle is inserted)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def shingles(text_col: Column | str, n: int = 3, distinct: bool = True) -> Column:
    """Word n-gram shingles of a document, space-joined (distinct by
    default; distinct=False keeps every positional occurrence — needed by
    repetition/quality metrics that count duplicates).

    IMPORTANT (plan shape): evaluate this on a *materialized token array
    column* (see tokenized()), not directly on raw text. Column expressions
    referenced from inside transform() lambdas are re-inlined per element by
    Catalyst, so building shingles straight off tokens(text) re-runs the
    regex split of the whole document once per shingle — O(tokens²) per doc.
    A bound column reference is free."""
    toks = F.col(text_col) if isinstance(text_col, str) else text_col
    idx = F.sequence(F.lit(0), F.size(toks) - n)  # empty if too short
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.array_distinct(grams) if distinct else grams


def tokenized(
    df: DataFrame, id_col: str, text_col: str, out_col: str = "toks"
) -> DataFrame:
    """Project (id, token array) once. Downstream shingle/hash expressions
    reference the array as a bound column — evaluated exactly once per row.
    (Catalyst's CollapseProject keeps the projection separate because the
    alias is expensive and multiply-referenced.)"""
    return spread(df).select(
        F.col(id_col).alias("id"), tokens(text_col).alias(out_col)
    )


def shingled(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    out_col: str = "sh",
    require_nonempty: bool = False,
) -> DataFrame:
    """Project (id, distinct n-gram shingle array) with single-evaluation
    tokens (see tokenized).

    require_nonempty drops docs shorter than n tokens *before* the token
    projection, as a deliberate scan-side filter on the raw text. Filtering
    later (on the array columns) would be re-inlined below the projections
    by predicate pushdown, recomputing the whole pipeline per row; this
    early filter costs one extra tokenization of each row and guarantees
    every downstream array aggregate (array_min in the minhash signature)
    is non-null."""
    src = spread(df)
    if require_nonempty:
        src = src.filter(F.size(tokens(text_col)) >= n)
    return src.select(F.col(id_col).alias("id"), tokens(text_col).alias("toks")).select(
        "id", shingles(F.col("toks"), n).alias(out_col)
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
    sh = shingled(df, id_col, text_col, n)
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


def hashed_shingled(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    materialize: bool = True,
    table_path: str | None = None,
) -> DataFrame:
    """Project (id, hs) with hs = the DISTINCT 60-bit hashes
    (functions.text.token_hash64 — md5-derived, DuckDB-reproducible) of
    the document's word n-gram shingles, computed ONCE and shared.

    This is the shared input of the whole LSH→verify pipeline: the
    signature branch and both verify-join branches read the same
    materialized long arrays instead of re-running tokenize→shingle→md5
    per branch (3 md5 passes → 1, measured ~2× on the full pipeline), and
    the verify-side set intersection runs over int64s instead of shingle
    strings — far cheaper per pair and ~10× fewer shuffle bytes. Set
    semantics are preserved up to 60-bit hash collisions (~2e-7 for a
    million-shingle corpus), and the oracle hashes identically, so the
    equality gate is unaffected.

    Three sharing modes:
    - ``table_path`` set → write the projection once as a PARQUET
      shingle-hash table and read it back: the 100 TB shape — executor
      storage holds NOTHING after the query; branches re-read columnar
      files (cheap, pruned) instead of storage-pinned blocks that would
      pin corpus-sized hash arrays for the session.
    - ``materialize=True`` (default, no table_path) → localCheckpoint:
      fastest when the corpus fits executor storage; blocks stay pinned
      until the caller/session releases them.
    - ``materialize=False`` → lazy; every branch recomputes the hashes.
    """
    sh = shingled(df, id_col, text_col, n, require_nonempty=True)
    hs = sh.select(
        "id",
        F.array_distinct(
            F.transform("sh", lambda s: token_hash64(s))
        ).alias("hs"),
    )
    if table_path is not None:
        hs.write.mode("overwrite").parquet(table_path)
        return df.sparkSession.read.parquet(table_path)
    return hs.localCheckpoint() if materialize else hs


def _signatures_from_hashed(shh: DataFrame, k: int) -> DataFrame:
    """MinHash signatures from a prepared (id, hs) hashed-shingle frame:
    identical values to _signatures_from_sh (the affine transforms apply
    to token_hash64 % p either way), but reading the shared cached hash
    array instead of re-hashing the shingle strings."""
    # SQL strings, not k nested Column lambdas: each F.transform(lambda)
    # costs ~20 ms of driver-side py4j expression building, so the k-slot
    # loop alone was ~0.3 s of driver time per query; one selectExpr
    # parses JVM-side in a single call. Values are identical (same long
    # arithmetic; hash-verified against the unchanged oracle).
    mins = [
        f"array_min(transform(hs, h -> "
        f"({MINHASH_A0 + MINHASH_A_STEP * i}L * (h % {MINHASH_P}L) "
        f"+ {MINHASH_B0 + MINHASH_B_STEP * i}L) % {MINHASH_P}L)) AS m{i}"
        for i in range(k)
    ]
    return shh.selectExpr("id", *mins)


def _metric_on_candidates(
    shh: DataFrame, cand: DataFrame, metric: str, threshold: float
) -> DataFrame:
    """Shared verify kernel: score ``metric`` over hashed shingle sets,
    restricted to a candidate pair frame — two id-equi-joins (uniform
    keys), O(|candidates|), never O(n²). ``metric`` is 'jaccard'
    (|A∩B| / |A∪B|) or 'containment' (|A∩B| / min(|A|, |B|)); one
    scaffold so every verify path keeps the same join shape."""
    a = shh.select(F.col("id").alias("id_a"), F.col("hs").alias("sh_a"))
    b = shh.select(F.col("id").alias("id_b"), F.col("hs").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    if metric == "jaccard":
        denom = F.size("sh_a") + F.size("sh_b") - inter
    elif metric == "containment":
        denom = F.least(F.size("sh_a"), F.size("sh_b"))
    else:
        raise ValueError(f"unknown metric {metric!r}")
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            metric,
            F.when(denom > 0, inter.cast("double") / denom).otherwise(
                F.lit(0.0)
            ),
        )
        .filter(F.col(metric) >= threshold)
        .select("id_a", "id_b", metric)
    )


def _jaccard_on_candidates(
    shh: DataFrame, cand: DataFrame, threshold: float
) -> DataFrame:
    return _metric_on_candidates(shh, cand, "jaccard", threshold)


def containment_on_candidates(
    shh: DataFrame, cand: DataFrame, threshold: float
) -> DataFrame:
    """Exact containment similarity |A∩B| / min(|A|, |B|) over hashed
    shingle sets, restricted to a candidate pair frame. Containment is
    the sub/superset detector Jaccard structurally misses: a page fully
    embedded in a 10× larger page has Jaccard ≤ 0.1 but containment 1.0
    — the "quoted-inside" duplicate class in web corpora. Same kernel as
    the Jaccard verify (_metric_on_candidates): two id-equi-joins,
    O(|candidates|)."""
    return _metric_on_candidates(shh, cand, "containment", threshold)


def candidate_jaccard(
    df: DataFrame,
    cand: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.05,
    shingle_table_path: str | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard verification restricted to a provided
    candidate-pair frame (id_a, id_b) — the jaccard_pairs kernel without
    its all-pairs join, over hashed shingle sets (see hashed_shingled).
    This is the only shape in which n-gram Jaccard should ever be
    *registered* as a query. ``shingle_table_path`` selects the
    parquet-table sharing mode (no storage-pinned blocks).

    Docs shorter than n tokens have no n-gram shingles; the inner joins
    drop their pairs, which is identical to scoring them (empty ∩ anything
    = 0) and filtering at any threshold > 0."""
    return _jaccard_on_candidates(
        hashed_shingled(df, id_col, text_col, n, table_path=shingle_table_path),
        cand,
        threshold,
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

    Documents with no shingles (< shingle_n tokens) produce no signature
    (dropped by the scan-side require_nonempty filter)."""
    return _signatures_from_sh(
        shingled(df, id_col, text_col, shingle_n, require_nonempty=True), k
    )


def _signatures_from_sh(sh: DataFrame, k: int) -> DataFrame:
    """Signatures from a prepared NON-EMPTY (id, sh) frame: hash every
    shingle once into a bound array column, then take the k affine minima
    with array_min — entirely MAP-SIDE, zero shuffles (the earlier
    explode→groupBy(id) formulation shuffled one row per (doc, shingle):
    ~50× the signature row count). Each array_min references the hash
    array as a cheap bound column, so the md5 pass still runs exactly once
    per shingle."""
    hashed = sh.select(
        "id",
        F.transform("sh", lambda s: token_hash64(s) % MINHASH_P).alias("hs"),
    )
    # SQL strings for the k-slot loop (same driver-side py4j economy as
    # _signatures_from_hashed; hs is pre-reduced mod P here)
    mins = [
        f"array_min(transform(hs, h -> "
        f"({MINHASH_A0 + MINHASH_A_STEP * i}L * h "
        f"+ {MINHASH_B0 + MINHASH_B_STEP * i}L) % {MINHASH_P}L)) AS m{i}"
        for i in range(k)
    ]
    return hashed.selectExpr("id", *mins)


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
    sigs = minhash_signatures(df, id_col, text_col, k, shingle_n)
    return _lsh_pairs_from_sigs(sigs, k, bands)


def _lsh_pairs_from_sigs(sigs: DataFrame, k: int, bands: int) -> DataFrame:
    rows = k // bands
    # explode_outer on purpose: the band array is a length-`bands` literal,
    # so outer ≡ inner — but inner explode would let InferFiltersFromGenerate
    # re-inline the whole signature expression into a pushed-down filter
    # (see minhash_signatures docstring; measured 2× the pipeline).
    band_structs = ", ".join(
        f"struct(CAST({b} AS INT) AS band_id, md5(concat_ws(',', "
        + ", ".join(f"m{b * rows + r}" for r in range(rows))
        + ")) AS band_hash)"
        for b in range(bands)
    )
    banded = sigs.selectExpr(
        "id", f"explode_outer(array({band_structs})) AS band"
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
    shingle_table_path: str | None = None,
) -> DataFrame:
    """The full near-dup pipeline: MinHash+LSH candidate generation, then
    exact n-gram Jaccard verification of ONLY the candidates — the shape
    that scales: the O(n²) verify runs on the candidate set, not the corpus.

    The shared hashed-shingle projection (hashed_shingled) feeds all three
    plan branches (signatures, verify left, verify right) from one
    materialized computation, and the verify intersects int64 hash sets
    instead of shingle strings — measured ~2× on the full pipeline vs the
    recompute-per-branch string form (the r03→r02 bench regression
    recovered). ``shingle_table_path`` selects the parquet-table sharing
    mode — the 100 TB shape with no session-lifetime storage pins.

    Returns (id_a, id_b, jaccard) for verified pairs (Jaccard over hashed
    shingle sets; exact up to 60-bit hash collisions)."""
    # non-empty required by the map-side signature; candidates (and hence
    # the verify join) can only involve docs that have shingles anyway
    shh = hashed_shingled(
        df, id_col, text_col, shingle_n, table_path=shingle_table_path
    )
    cand = _lsh_pairs_from_sigs(_signatures_from_hashed(shh, k), k, bands)
    return _jaccard_on_candidates(shh, cand, threshold)


def contained_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 8,
    shingle_n: int = 2,
    threshold: float = 0.5,
    shingle_table_path: str | None = None,
) -> DataFrame:
    """verified_near_dups with containment (|A∩B| / min|A|,|B|) instead of
    Jaccard as the verify metric — catches sub/superset duplicates (one
    document embedded in a larger one) that symmetric Jaccard dilutes.
    Same scale shape: LSH candidates, verify only candidates."""
    shh = hashed_shingled(
        df, id_col, text_col, shingle_n, table_path=shingle_table_path
    )
    cand = _lsh_pairs_from_sigs(_signatures_from_hashed(shh, k), k, bands)
    return containment_on_candidates(shh, cand, threshold)


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    node_id: str = "id",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components over an undirected edge list by iterative
    min-label propagation — the clustering step that turns near-dup *pairs*
    into duplicate *groups* (pick one representative per group to dedup a
    corpus).

    ``pairs`` is the (id_a, id_b) edge list (e.g. from minhash_lsh_pairs or
    verified_near_dups); ``nodes`` is the full id universe so that documents
    with no duplicates come back as singleton clusters. Returns
    (id, cluster_id) where cluster_id = min node id in the component.

    Shape per iteration: one shuffle join (edges ⋈ labels on src) + one
    groupBy(id) min — both key on uniformly-distributed ids. Lineage is
    truncated with localCheckpoint every round, otherwise the plan doubles
    per iteration and Catalyst analysis time dominates. Iteration count is
    bounded by the largest component's diameter; near-dup clusters are
    near-cliques (diameter ≤ ~3), so this converges in a handful of rounds.
    For adversarial long-chain graphs at 100 TB you would switch to the
    large-star/small-star algorithm (Kiveris et al., "Connected Components
    in MapReduce and Beyond") which converges in O(log n) rounds; the
    min-label loop is the right trade for dedup-shaped graphs.

    The reference has no graph step — its dedup is idempotent-by-key writes
    (marketdb-core/.../model/Trade.scala:56-57); this generalizes it to
    similarity-based identity ([N] mandate).
    """
    import uuid as _uuid

    spark = pairs.sparkSession
    par = spark.sparkContext.defaultParallelism
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        # union doubles the partition count; coalesce (no shuffle) so the
        # per-iteration join doesn't pay 2× task overhead on tiny tasks
        .coalesce(par)
        .localCheckpoint()  # also materializes: edges are re-read every round
    )
    labels = nodes.select(
        F.col(node_id).alias("id"), F.col(node_id).alias("label")
    ).localCheckpoint()
    # One propagation round as a single SQL string over temp views of the
    # (fixed) edge checkpoint and the previous round's label checkpoint:
    # the per-round DataFrame-API construction cost ~0.1 s of driver-side
    # py4j round-trips repeated every iteration (the queries/llm_* §10
    # single-parse device applied to the loop body; same operators, same
    # order, so values are identical). min(label) = propagated label;
    # min(prev) = the key's old label (present only on the self row) —
    # carrying it through the same aggregation makes the convergence check
    # a filter on the checkpointed result instead of a second join.
    tag = _uuid.uuid4().hex[:8]
    _ev, _lv = f"__cc_edges_{tag}", f"__cc_labels_{tag}"
    edges.createOrReplaceTempView(_ev)
    _ROUND_SQL = f"""
    SELECT id, min(label) AS label, min(prev) AS prev
    FROM (
      SELECT id, label, label AS prev FROM {_lv}
      UNION ALL
      SELECT e.dst AS id, l.label AS label, CAST(NULL AS BIGINT) AS prev
      FROM {_ev} e JOIN {_lv} l ON e.src = l.id
    )
    GROUP BY id
    """
    prev_ckpt = labels
    try:
        for _ in range(max_iter):
            labels.createOrReplaceTempView(_lv)
            new_labels = spark.sql(_ROUND_SQL).localCheckpoint(eager=False)
            # ONE driver round-trip per iteration: the lazy checkpoint is
            # materialized BY the convergence count — the filter needs
            # every partition of new_labels, so this single job computes,
            # persists (truncating lineage), and counts in one pass. (A
            # full count, not limit(1): an early-exit limit could leave
            # checkpoint partitions uncomputed, and the job count is what
            # we're minimizing anyway.)
            changed = new_labels.filter(
                F.col("label") < F.col("prev")
            ).count()
            # the superseded round's checkpoint blocks are dead now that
            # the new checkpoint is materialized — release them, or a
            # long-lived session pins O(iterations) copies of the labels
            _unpersist_checkpoint(prev_ckpt)
            prev_ckpt = new_labels
            labels = new_labels.select("id", "label")
            if changed == 0:
                break
        else:
            # Exhausting the budget without a fixpoint would return
            # silently WRONG labels (partially propagated) — fail loudly
            # instead. Only long-chain graphs hit this (propagation moves
            # one hop per round); dedup graphs are near-cliques and
            # converge in a handful.
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} "
                "rounds; the graph has a component with diameter > "
                "max_iter — raise max_iter, or use a large-star/"
                "small-star formulation for adversarial chain-shaped "
                "graphs"
            )
        _unpersist_checkpoint(edges)
        return labels
    finally:
        for v in (_ev, _lv):
            try:
                spark.catalog.dropTempView(v)
            except Exception:
                pass


def connected_components_star(
    pairs: DataFrame,
    nodes: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    node_id: str = "id",
    max_rounds: int = 40,
) -> DataFrame:
    """Connected components by alternating large-star/small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the O(log n)-round formulation for graphs whose diameter defeats
    min-label propagation (a chain of n nodes needs n rounds there, ~log n
    here, because both operators rewire whole neighborhoods onto local
    minima at once).

    Per round: large-star connects every neighbor LARGER than u to the
    minimum of u's neighborhood; small-star does the same for the
    smaller-or-equal neighbors. The edge set converges to stars centered
    at each component's minimum id. Same contract as connected_components:
    returns (id, label) over the full ``nodes`` universe (singletons map
    to themselves).

    Shape per round: two groupBy(min) + join passes over the edge list —
    heavier constants than the min-label loop, but round count is
    O(log n); prefer this for deep graphs, the min-label loop for
    near-clique dedup graphs.
    """
    import uuid as _uuid

    spark = pairs.sparkSession
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )

    # One large-star + small-star ROUND as a single SQL string over a temp
    # view of the previous round's checkpoint: the per-round DataFrame-API
    # construction cost ~0.2 s of driver-side py4j round-trips (~40 Column
    # ops), repeated every scheduler round and scaling with nothing — the
    # queries/llm_* §10 single-parse device applied to the loop body. The
    # resolved plan is the same operators in the same order:
    #   large-star: sym = e ∪ reverse(e); m = per-u least(min(v), u);
    #     emit (v → m) for v > u, drop self edges — NO distinct (duplicates
    #     are harmless to the small-star pass that always follows; its
    #     min-aggregation ignores them and its own distinct bounds the
    #     round's output — dropping the exchange saves one full shuffle per
    #     round; the chain-graph query's cost is scheduler rounds, not rows)
    #   small-star: le = sym₂ filtered v <= u; m = per-u least(min(v), u);
    #     rewired (v → m) ∪ self (u → m), drop self edges, ONE distinct.
    # least(min(v), first(u)) ≡ least(min(v), u) under GROUP BY u — the
    # group key is constant within its group.
    _view = f"__cc_star_{_uuid.uuid4().hex[:8]}"
    _ROUND_SQL = f"""
    WITH sym AS (
      SELECT u, v FROM {_view}
      UNION ALL
      SELECT v AS u, u AS v FROM {_view}
    ),
    lm AS (SELECT u, least(min(v), u) AS m FROM sym GROUP BY u),
    ls AS (
      SELECT s.v AS u, lm.m AS v
      FROM sym s JOIN lm ON s.u = lm.u
      WHERE s.v > s.u AND s.v <> lm.m
    ),
    sym2 AS (
      SELECT u, v FROM ls
      UNION ALL
      SELECT v AS u, u AS v FROM ls
    ),
    le AS (SELECT u, v FROM sym2 WHERE v <= u),
    sm AS (SELECT u, least(min(v), u) AS m FROM le GROUP BY u),
    uni AS (
      SELECT le.v AS u, sm.m AS v FROM le JOIN sm ON le.u = sm.u
      UNION ALL
      SELECT u, m AS v FROM sm
    )
    SELECT DISTINCT u, v FROM uni WHERE u <> v
    """

    def _sym(e: DataFrame) -> DataFrame:
        return e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))

    def _round(e: DataFrame) -> DataFrame:
        e.createOrReplaceTempView(_view)
        return spark.sql(_ROUND_SQL)

    def _fingerprint(e: DataFrame):
        # xor-fold of row hashes: order-independent and overflow-free
        # (a SUM of full-range xxhash64 longs overflows under ANSI mode).
        # Hashed UNDIRECTED — (least, greatest) — because both star
        # operators act on the symmetric closure, so the iteration is a
        # function of the undirected edge set: an orientation flip with
        # the same undirected set IS the fixpoint, and a directed
        # fingerprint would spend one extra round discovering it. A
        # star-forest round's output never carries both orientations of
        # an edge (every v is a local minimum), so the xor cannot cancel.
        row = e.agg(
            F.count("*").alias("n"),
            F.bit_xor(
                F.xxhash64(F.least("u", "v"), F.greatest("u", "v"))
            ).alias("h"),
        ).first()
        return (row.n, row.h)

    fp = _fingerprint(edges)
    try:
        for _ in range(max_rounds):
            # one job per round: the fingerprint aggregation scans every
            # partition, so it materializes the lazy checkpoint in the same
            # pass (same fold as connected_components' convergence count)
            new_edges = _round(edges).localCheckpoint(eager=False)
            new_fp = _fingerprint(new_edges)
            _unpersist_checkpoint(edges)
            edges = new_edges
            if new_fp == fp:
                break
            fp = new_fp
        else:
            raise RuntimeError(
                f"star rounds did not converge in {max_rounds} iterations"
            )

        centers = (
            _sym(edges)
            .groupBy("u")
            .agg(F.least(F.min("v"), F.first("u")).alias("label"))
            .select(F.col("u").alias("id"), "label")
        )
        labels = (
            nodes.select(F.col(node_id).alias("id"))
            .join(centers, "id", "left")
            .select("id", F.coalesce("label", F.col("id")).alias("label"))
        )
        out = labels.localCheckpoint()
        _unpersist_checkpoint(edges)
        return out
    finally:
        try:
            spark.catalog.dropTempView(_view)
        except Exception:
            pass


def _unpersist_checkpoint(df: DataFrame) -> None:
    """Release the storage blocks of a localCheckpoint'ed frame. The frame
    must never be computed again afterwards (its lineage was truncated)."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass  # best-effort: leaked blocks degrade memory, not correctness


def simhash_bits(hashed_col: Column | str, n_bits: int = 32) -> Column:
    """SimHash fingerprint from a *materialized* array of token hashes: per
    bit j, sum ±1 across hashes; bit set iff the sum is positive.

    Takes the hash array as a bound column on purpose: the expression
    references it n_bits times, and an inline transform(tokens, md5…) would
    be re-evaluated once per bit by Catalyst (32× the md5 work — measured).

    n_bits=32 keeps the per-row work (tokens × bits) codegen-friendly and
    the fingerprint comfortably inside a positive BIGINT.

    When given a column NAME, the n_bits-term expression is built as one
    SQL string parsed JVM-side — the per-bit Column-lambda loop cost
    ~0.5 s of driver-side py4j expression building per use (n_bits
    aggregate() lambdas); same long arithmetic, identical values. A
    Column argument keeps the original construction path."""
    if isinstance(hashed_col, str):
        terms = " + ".join(
            f"(CASE WHEN aggregate({hashed_col}, CAST(0 AS BIGINT), "
            f"(acc, h) -> acc + (shiftright(h, {j}) & 1) * 2 - 1) > 0 "
            f"THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
            for j in range(n_bits)
        )
        return F.expr(f"CAST(0 AS BIGINT) + {terms}")
    hashed = hashed_col

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


def simhash_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = 32,
) -> DataFrame:
    """(id, simhash) per document. Two projections: tokenize+hash once,
    then fold the bound hash array into the fingerprint. Map-side only —
    zero shuffles at any scale."""
    hashed = tokenized(df, id_col, text_col).select(
        "id", F.transform("toks", token_hash64).alias("hs")
    )
    return hashed.select(
        F.col("id").alias(id_col), simhash_bits("hs", n_bits).alias("simhash")
    )
