"""Local mirror of the driver's t2 correctness gate: run a Spark query and
its DuckDB oracle side-by-side and compare row count, schema (column names),
and values — *bit-exact*, which is stricter than any value-hash the driver
can apply. Used by tests/test_oracle.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import duckdb
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from marketdb_spark.catalog import TABLES


@dataclass
class CompareResult:
    name: str
    ok: bool
    row_count: int
    problems: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK " if self.ok else "FAIL"
        msg = f"[{status}] {self.name}: {self.row_count} rows"
        for p in self.problems:
            msg += f"\n    - {p}"
        return msg


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize dtypes, sort rows — order-insensitive
    exact comparison form."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.astype("datetime64[us]")
        elif pd.api.types.is_object_dtype(s):
            s = s.map(lambda v: str(sorted(v)) if isinstance(v, (set,)) else str(v))
        elif pd.api.types.is_float_dtype(s):
            s = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            s = s.astype("Int64")
        out[c] = s
    res = pd.DataFrame(out)
    return res.sort_values(by=list(res.columns), kind="mergesort").reset_index(
        drop=True
    )


def compare(
    name: str,
    spark_df: DataFrame,
    oracle: str,
    con: duckdb.DuckDBPyConnection,
) -> CompareResult:
    sp = spark_df.toPandas()
    du = con.execute(oracle).fetchdf()
    problems: list[str] = []
    if len(sp) != len(du):
        problems.append(f"row count: spark={len(sp)} duckdb={len(du)}")
    sp_cols, du_cols = sorted(sp.columns), sorted(du.columns)
    if sp_cols != du_cols:
        problems.append(f"columns: spark={sp_cols} duckdb={du_cols}")
    if not problems:
        a, b = _canonicalize(sp), _canonicalize(du)
        for c in a.columns:
            av, bv = a[c], b[c]
            if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
                eq = (av.fillna(-0.123456789) == bv.fillna(-0.123456789)).all()
            else:
                eq = av.astype(str).equals(bv.astype(str))
            if not eq:
                bad = (
                    av.astype(str) != bv.astype(str)
                ) if not pd.api.types.is_float_dtype(av) else (
                    av.fillna(-0.123456789) != bv.fillna(-0.123456789)
                )
                idx = bad[bad].index[:3].tolist()
                examples = [
                    f"row {i}: spark={av.iloc[i]!r} duckdb={bv.iloc[i]!r}"
                    for i in idx
                ]
                problems.append(f"column {c!r} differs; " + "; ".join(examples))
    return CompareResult(name, not problems, len(sp), problems)


def run_all(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> list[CompareResult]:
    from marketdb_spark.queries import REGISTRY

    con = duckdb_connection(sf_dir)
    results = []
    for name, spec in REGISTRY.items():
        if names and name not in names:
            continue
        if spec.oracle is None:
            df = spec.fn(spark, sf_dir)
            results.append(CompareResult(name + " (rows-only)", True, df.count()))
            continue
        try:
            results.append(compare(name, spec.fn(spark, sf_dir), spec.oracle, con))
        except Exception as e:  # noqa: BLE001 — harness reports, doesn't die
            results.append(CompareResult(name, False, -1, [f"exception: {e}"]))
    return results
