#!/usr/bin/env python
"""Regenerate docs/PLANS.md: explain('formatted') for the headline queries,
annotated with the scale property each plan is supposed to exhibit. Run
after any plan-affecting change; tests/test_plans.py asserts the same
properties mechanically."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINERS = {
    "q01_pricing_summary": "single shuffle: partial agg → exchange → final agg; "
    "shipdate filter pushed to parquet",
    "q03_shipping_priority": "broadcast customer dim; one fact-fact shuffle on "
    "l_orderkey; TakeOrderedAndProject for the top-10",
    "q05_local_supplier_volume": "snowflake: 4+ broadcast joins, single "
    "orders⋈lineitem shuffle",
    "ts_scan_series": "PushedFilters carries key equality + both time bounds",
    "dedup_minhash_pairs": "map-side signatures (no per-shingle shuffle); "
    "band self-join on uniform md5 keys",
    "sim_ivf_topk": "broadcast centroids; candidate join keyed on cell_id",
    "unpivot_lineitem_metrics": "wide→long via map-side Expand; single "
    "small-key aggregation exchange",
    "agg_salted_two_phase": "skew-safe aggregation: (key, salt) partial "
    "exchange then key final exchange — hot keys spread over 16 reducers",
    "sample_stratified_det": "deterministic hash-sample predicate evaluated "
    "scan-side; rejected rows never reach the exchange",
    "doc_tfidf_topterms": "WindowGroupLimit pushes the per-doc top-3 "
    "map-side before the window exchange; corpus size N broadcast as a "
    "1-row cross join",
    "doc_chunk_overlap": "zero-shuffle plan: tokenize → sequence → explode "
    "→ hash, all map-side in one WholeStageCodegen span",
    "embed_kmeans_clusters": "zero-shuffle final assignment: centroids ride "
    "in as a one-row scalar subquery, argmin is array_min over "
    "struct(d2, cid) — the main plan is a pure projection over the corpus "
    "scan (every Exchange lives inside the k-sized centroid subqueries)",
    "embed_quantize_int8": "pure map over the corpus: per-vector scale, "
    "truncating int8 codes, integer squared norm — zero exchanges",
    "join_range_cells": "unkeyed interval×point range join as a HASH join "
    "on the manufactured epoch-anchored cell key; no BNLJ/cartesian",
    "join_interval_overlap": "unkeyed interval×interval overlap join: both "
    "sides explode onto one cell grid, hash join on the cell, anchor-cell "
    "filter gives exactly-once pairs with no dedup shuffle",
    "dedup_simhash_pairs": "Hamming≤3 pair generation as an exact-match "
    "band self-join (pigeonhole-complete) — map-side fingerprints, one "
    "shuffle on (band, value), never all-pairs",
    "agg_countmin_freq": "d×w count-min cells built by map-side explode + "
    "two-phase count (O(1) state per corpus size); probes join the "
    "broadcast cell table",
    "dedup_edit_distance": "levenshtein verify restricted to "
    "(prefix, length-band) blocks — equi-join on the frequency-refined "
    "block key (oversized boilerplate blocks re-key by the longer "
    "prefix via one window count), never all-pairs",
    "dedup_incremental_exact": "batch fingerprints anti-join the store on "
    "the uniform md5 key — O(batch) increment, no corpus rescan",
    "store_zorder_scan": "scan of the z-order clustered store: filters on "
    "BOTH clustered dimensions pushed to parquet; clustering concentrates "
    "row-group min/max so either predicate prunes",
    "ts_zscore_outliers": "per-key moments in one partial-agg exchange; "
    "stats broadcast back; the detection pass is map-only over the scan",
    "ts_resample_interp": "one-pass interpolation: backward + forward "
    "brackets from two window frames sharing ONE user_id sort "
    "(Sort→Window→Window, 2 exchanges total — the explicit user_id "
    "repartition feeds the dedup, span agg and windows via the subset "
    "rule) — not two as-of joins + a join",
    "corpus_shard_assign": "map-side md5 shard hash; ONE 16-key aggregation "
    "exchange (partial agg reduces each task to ≤16 rows)",
    "graph_pagerank_dedup": "3 fixed-point rounds, each one edges⋈ranks "
    "hash join + one groupBy(dst) — no driver data motion, no BNLJ; "
    "integer div arithmetic keeps the oracle bit-exact",
    "sim_knn_graph": "ADAPTIVE occupancy-capped LSH candidates (bucket "
    "width scales log2 with the corpus count via a scalar subquery; "
    "over-cap buckets re-key on extra hyperplanes → candidate pairs "
    "grow linearly, never corpus²/2^const); per-source top-k window; "
    "mutual check = one self-join of the edge list on the reversed key",
    "ts_changepoint_cusum": "order-dependent CUSUM recurrence as the "
    "Kadane max-subarray identity: three window passes sharing ONE "
    "user_id exchange, exact BIGINT arithmetic",
    "dedup_semantic_pairs": "SemDeDup: map-only kmeans assignment "
    "(centroids via scalar subquery) → within-cluster pair join on "
    "cluster_id (corpus²/k bound, k = ceil(N/64) DATA-DRIVEN so the "
    "bound is linear in N) with per-vector norms hoisted out of the "
    "join",
    "corpus_mixture_weights": "single corpus scan: two-phase strata "
    "aggregation, then totals from an empty-partition window over the "
    "|strata|-row frame — no scalar-subquery re-scans",
    "text_pmi_collocations": "one corpus scan feeds both count tables; "
    "corpus totals via empty-frame windows over the AGGREGATED "
    "vocab/bigram frames (never a corpus re-scan); vocab-bounded "
    "broadcast attachments; TakeOrderedAndProject top-20",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from marketdb_spark.plans.inspect import formatted_plan
    from marketdb_spark.queries import REGISTRY
    from marketdb_spark.session import get_session

    spark = get_session(app_name="explain_headliners")
    out = [
        "# Physical plans of headline queries",
        "",
        "Generated by `scripts/explain_headliners.py` (explain('formatted'), "
        f"sf dir `{sf_dir}`). Each plan's scale-critical property is stated "
        "first and enforced mechanically in `tests/test_plans.py`.",
        "",
    ]
    for name, prop in HEADLINERS.items():
        plan = formatted_plan(REGISTRY[name].fn(spark, sf_dir))
        out += [f"## {name}", "", f"**Property:** {prop}", "", "```", plan.rstrip(), "```", ""]
    with open("docs/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"wrote docs/PLANS.md ({len(HEADLINERS)} plans)")


if __name__ == "__main__":
    main()
