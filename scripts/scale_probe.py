#!/usr/bin/env python
"""Scale-sensitivity probe for the headline dedup/CC/pipeline queries:
run each at sf0.1 and at a synthetic ~3× corpus ("sf0.3": the sf0.1
documents/embeddings tables replicated 3× with remapped ids and
per-replica text perturbation, so near-dup structure scales instead of
degenerating into exact triplicates), and report the wall-time ratio.

The claim under test (VERDICT r7 item #6): the expensive queries' costs
are CONSTANTS (codegen, scheduler rounds, Python batch overhead) plus
~linear data terms — so a 3× corpus should cost ≤ ~3× (sub-linear where
a constant dominates), never super-linear. Quadratic shapes (all-pairs
joins, unblocked verifies) would show ≥9× and fail the gate here long
before they melt a 1000-executor cluster.

Writes the measured table to stdout as markdown (paste into
docs/SCALING.md) plus one JSON line for tooling.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "dedup_ngram_jaccard",
    "dedup_cluster_docs",
    "dedup_semantic_pairs",
    "pipeline_clean_corpus",
    "graph_pagerank_dedup",
    "dedup_minhash_pairs",
    "sim_knn_graph",
    "doc_tfidf_topterms",
]

# Streaming + storage headliners (VERDICT r8 item #6): self-fixturing
# queries whose cost claim is "per-batch / per-commit constants plus a
# ~linear data term" — probed against 3× events/customer/orders so a
# super-linear term (unbounded micro-batch, compaction rewriting
# everything, retention scanning data) would show as ≥9×.
STREAM_QUERIES = [
    "stream_queue_capped",
    "stream_delta_source",
    "stream_delta_capped",
    "store_compact_retention",
    "store_delta_optimize",
]

REPLICAS = 3


def build_scaled(spark, src: str, dst: str) -> None:
    """Materialize the ~3× corpus: every table hard-linked through
    spark reads except documents/embeddings, which are replicated with
    disjoint doc_id ranges and deterministic per-replica perturbation."""
    from pyspark.sql import functions as F

    os.makedirs(dst, exist_ok=True)
    docs = spark.read.parquet(f"{src}/documents.parquet")
    n = docs.count()
    emb = spark.read.parquet(f"{src}/embeddings.parquet")

    doc_parts = []
    for r in range(REPLICAS):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(r * n))
        if r:
            # perturb: prepend a replica token to the text so replicas are
            # NEAR-duplicates (shingle/minhash structure preserved) rather
            # than exact ones — keeps the dedup workload's character
            d = d.withColumn(
                "text", F.concat(F.lit(f"replica{r} "), F.col("text"))
            )
        doc_parts.append(d)
    out = doc_parts[0]
    for p in doc_parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{dst}/documents.parquet")

    m = emb.count()
    emb_parts = []
    for r in range(REPLICAS):
        e = emb.withColumn("vec_id", F.col("vec_id") + F.lit(r * m))
        if r:
            # rotate one coordinate deterministically so replicas aren't
            # bitwise-equal vectors (IVF/LSH bucket shapes stay realistic)
            e = e.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda v: v + F.lit(0.001) * F.lit(float(r)),
                ),
            )
        emb_parts.append(e)
    out = emb_parts[0]
    for p in emb_parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{dst}/embeddings.parquet")

    # the streaming/storage probes consume events/customer/orders:
    # replicate those with disjoint key ranges so queue lines, snapshot
    # rows and store partition contents really are 3× (event times /
    # order dates keep their distribution — partition counts stay
    # realistic, per-partition volume grows)
    for t, key in (("events", "event_id"), ("customer", "c_custkey"),
                   ("orders", "o_orderkey")):
        base_df = spark.read.parquet(f"{src}/{t}.parquet")
        n = base_df.count()
        parts = [
            base_df.withColumn(key, F.col(key) + F.lit(r * n))
            for r in range(REPLICAS)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")

    # the remaining TPC-H-ish tables ride along unscaled (none of the
    # probed queries read them, but the loaders expect the files)
    for t in "region nation supplier part lineitem".split():
        spark.read.parquet(f"{src}/{t}.parquet").limit(1).write.mode(
            "overwrite"
        ).parquet(f"{dst}/{t}.parquet")


def time_query(fn, spark, sf_dir: str, reps: int = 2) -> float:
    best = None
    for _ in range(reps):
        t = time.time()
        fn(spark, sf_dir).count()
        dt = time.time() - t
        best = dt if best is None or dt < best else best
    return best


def main() -> None:
    from marketdb_spark.queries import REGISTRY
    from marketdb_spark.session import get_session

    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    scaled = os.environ.get("SCALE_PROBE_DIR", "/tmp/scale_probe_sf03")
    group = sys.argv[1] if len(sys.argv) > 1 else "dedup"
    queries = {
        "dedup": QUERIES,
        "streaming": STREAM_QUERIES,
        "all": QUERIES + STREAM_QUERIES,
    }[group]
    spark = get_session(app_name="scale_probe")

    if not os.path.exists(f"{scaled}/embeddings.parquet"):
        build_scaled(spark, base, scaled)

    # warm shared codepaths so neither side pays one-time JIT; warm-up
    # must never fail the probe (same discipline as bench.py — the tiny
    # fixture may not exist on every host)
    try:
        REGISTRY["dedup_verified_pairs"].fn(
            spark, "/root/testdata/sf0.001"
        ).count()
    except Exception:
        pass

    rows = []
    for name in queries:
        fn = REGISTRY[name].fn
        t1 = time_query(fn, spark, base)
        t3 = time_query(fn, spark, scaled)
        rows.append((name, t1, t3, t3 / t1))
        print(f"# {name}: {t1:.2f}s -> {t3:.2f}s  ({t3 / t1:.2f}x)",
              file=sys.stderr)

    print("| query | sf0.1 (s) | ~sf0.3 (s) | ratio (3x data) |")
    print("|---|---|---|---|")
    for name, t1, t3, r in rows:
        print(f"| {name} | {t1:.2f} | {t3:.2f} | {r:.2f}x |")
    print(json.dumps({
        "replicas": REPLICAS,
        "queries": {n: {"sf0.1": round(t1, 3), "sf0.3": round(t3, 3),
                        "ratio": round(r, 3)} for n, t1, t3, r in rows},
    }))
    if os.environ.get("SCALE_PROBE_KEEP") != "1":
        shutil.rmtree(scaled, ignore_errors=True)


if __name__ == "__main__":
    main()
