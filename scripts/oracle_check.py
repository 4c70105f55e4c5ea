#!/usr/bin/env python
"""Hash-compare registered queries against their DuckDB oracles through
the driver contract (vanilla session — the grading driver's shape).

    python scripts/oracle_check.py [--sf=/root/testdata/sf0.01] [name ...]

No names → the full registry. PASS = "MISMATCHES: none".
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf = "/root/testdata/sf0.01"
    names: list[str] = []
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]
        else:
            names.append(a)

    import duckdb
    import pandas as pd
    from pyspark.sql import SparkSession

    import __spark_entry__ as mod

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]"
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def canon(df: pd.DataFrame):
        df = df.reindex(sorted(df.columns), axis=1)
        for c in df.columns:
            if pd.api.types.is_datetime64_any_dtype(df[c]):
                df[c] = df[c].astype("datetime64[us]")
        lines = sorted(
            ",".join(map(str, r))
            for r in df.itertuples(index=False, name=None)
        )
        return hashlib.md5("\n".join(lines).encode()).hexdigest(), len(df)

    qs, osql = mod.queries(), mod.oracle_sql()
    if not names:
        names = list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    bad = []
    for n in names:
        if n not in osql:
            print(f"# {n}: rows-only ({qs[n](spark, sf).count()} rows)")
            continue
        s = canon(qs[n](spark, sf).toPandas())
        d = canon(con.execute(osql[n]).fetchdf())
        status = "ok" if s == d else "MISMATCH"
        print(f"# {n}: {status} spark={s[1]} duck={d[1]}")
        if s != d:
            bad.append(n)
    print(f"MISMATCHES: {bad or 'none'} ({len(names)} queries, sf={sf})")


if __name__ == "__main__":
    main()
