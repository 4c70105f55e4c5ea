#!/usr/bin/env python
"""Materialize a ~3× ("sf0.3") corpus for the REGISTRY-WIDE one-off
bench (VERDICT r8 item #8): every base table replicated 3× with JOIN
KEYS REMAPPED CONSISTENTLY across tables, so the TPC-H-ish joins keep
their selectivity (each replica joins only to its own replica's rows)
instead of fanning out 3×3. Dimension tables region/nation stay as-is
(they are genuinely fixed-cardinality at any SF, like real TPC-H).

documents/embeddings get the same per-replica perturbation as
scripts/scale_probe.py (near-duplicate structure scales instead of
collapsing into exact triplicates).

Usage: python scripts/build_sf03.py [src_dir] [dst_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICAS = 3


def main() -> None:
    from pyspark.sql import functions as F

    from marketdb_spark.session import get_session

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf0.3"
    spark = get_session(app_name="build_sf03")
    os.makedirs(dst, exist_ok=True)

    def count(t: str) -> int:
        return spark.read.parquet(f"{src}/{t}.parquet").count()

    # key-space strides: each replica's keys shift by r * stride, the
    # SAME stride on both sides of every join edge
    n_cust = count("customer")
    n_supp = count("supplier")
    n_part = count("part")
    n_ord = count("orders")
    n_ev = count("events")

    def write_flat(df, t: str) -> None:
        """Write as ONE flat file `<dst>/<t>.parquet`, matching the
        testdata layout — queries using pathGlobFilter-style file
        streaming (e.g. _events_stream) expect a leaf FILE named
        `<t>.parquet`, not a directory table."""
        import shutil

        stage = f"{dst}/_stage_{t}"
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        [part] = [
            f for f in os.listdir(stage) if f.endswith(".parquet")
        ]
        os.replace(os.path.join(stage, part), f"{dst}/{t}.parquet")
        shutil.rmtree(stage, ignore_errors=True)

    def replicate(t: str, shifts: dict[str, int], perturb=None) -> None:
        base = spark.read.parquet(f"{src}/{t}.parquet")
        parts = []
        for r in range(REPLICAS):
            d = base
            for col, stride in shifts.items():
                d = d.withColumn(col, F.col(col) + F.lit(r * stride))
            if perturb is not None and r:
                d = perturb(d, r)
            parts.append(d)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        write_flat(out, t)
        print(f"# {t}: x{REPLICAS}", file=sys.stderr)

    for t in ("region", "nation"):
        write_flat(spark.read.parquet(f"{src}/{t}.parquet"), t)

    replicate("customer", {"c_custkey": n_cust})
    replicate("supplier", {"s_suppkey": n_supp})
    replicate("part", {"p_partkey": n_part})
    replicate("orders", {"o_orderkey": n_ord, "o_custkey": n_cust})
    replicate(
        "lineitem",
        {"l_orderkey": n_ord, "l_partkey": n_part, "l_suppkey": n_supp},
    )
    # events: shift ids and user ids; timestamps keep their span so
    # per-user series get 3× the user population, same time range
    ev = spark.read.parquet(f"{src}/events.parquet")
    n_users = ev.select(F.max("user_id")).first()[0] + 1
    replicate("events", {"event_id": n_ev, "user_id": int(n_users)})

    docs = spark.read.parquet(f"{src}/documents.parquet")
    n_docs = docs.count()
    replicate(
        "documents",
        {"doc_id": n_docs},
        perturb=lambda d, r: d.withColumn(
            "text", F.concat(F.lit(f"replica{r} "), F.col("text"))
        ),
    )
    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    n_emb = emb.count()
    replicate(
        "embeddings",
        {"vec_id": n_emb},
        perturb=lambda d, r: d.withColumn(
            "embedding",
            F.transform("embedding", lambda v: v + F.lit(0.001) * F.lit(float(r))),
        ),
    )
    print(f"# built {dst}", file=sys.stderr)


if __name__ == "__main__":
    main()
