#!/usr/bin/env python
"""Per-query Spark-vs-DuckDB wall-clock ratio at a given SF — the local
mirror of the driver's ≤2× perf gate (BASELINE.md). Usage:

    python scripts/duck_ratio.py [sf_dir] [bench_json] [out_json]

Reads a prior bench.py output for Spark timings (so the two engines never
run concurrently) and times each oracle SQL in DuckDB here. When
``out_json`` is given, writes the full comparison there (committed as
DUCK_RATIO.json so the perf-gate evidence survives without a rerun).
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from marketdb_spark.catalog import TABLES  # noqa: E402
from marketdb_spark.queries import REGISTRY  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    bench_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bench3.json"
    spark_times = json.load(open(bench_json))["queries"]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    rows = []
    for name, spec in sorted(REGISTRY.items()):
        if spec.oracle is None or name not in spark_times:
            continue
        t0 = time.perf_counter()
        con.execute(spec.oracle).fetchall()
        duck = time.perf_counter() - t0
        rows.append((name, spark_times[name], duck))

    total_s = sum(r[1] for r in rows)
    total_d = sum(r[2] for r in rows)
    print(f"{'query':38s} {'spark':>8s} {'duck':>8s} {'ratio':>7s}")
    for name, s, d in sorted(rows, key=lambda r: -(r[1] / max(r[2], 1e-4))):
        print(f"{name:38s} {s:8.3f} {d:8.3f} {s / max(d, 1e-4):7.1f}")
    print(f"\nTOTAL spark={total_s:.1f}s duck={total_d:.1f}s "
          f"ratio={total_s / total_d:.2f}")

    if len(sys.argv) > 3:
        with open(sys.argv[3], "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "total_spark_sec": round(total_s, 3),
                    "total_duck_sec": round(total_d, 3),
                    "total_ratio": round(total_s / max(total_d, 1e-4), 4),
                    "queries": {
                        name: {
                            "spark_sec": round(s, 4),
                            "duck_sec": round(d, 4),
                            "ratio": round(s / max(d, 1e-4), 3),
                        }
                        for name, s, d in rows
                    },
                },
                f, indent=1, sort_keys=True,
            )


if __name__ == "__main__":
    main()
