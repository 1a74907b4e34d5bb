"""Local stand-in for the driver's t2 correctness gate: run each
queries() entry on Spark and its oracle_sql() on DuckDB, compare
row-count, schema (column names), and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def compare(name: str, sdf_pd: pd.DataFrame, odf_pd: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(sdf_pd.columns) != sorted(odf_pd.columns):
        problems.append(f"schema: spark={sorted(sdf_pd.columns)} oracle={sorted(odf_pd.columns)}")
        return problems
    if len(sdf_pd) != len(odf_pd):
        problems.append(f"rowcount: spark={len(sdf_pd)} oracle={len(odf_pd)}")
        return problems
    a, b = normalize(sdf_pd), normalize(odf_pd)
    # The driver's hash is serialization-based: int64 123 vs float64 123.0
    # can never match even when values are ==-equal.  Mirror that here by
    # requiring identical post-normalize dtypes (r2 lesson: DuckDB returns
    # SUM(<int>) as HUGEINT -> pandas float64, Spark sum(long) -> int64).
    for c in a.columns:
        if str(a[c].dtype) != str(b[c].dtype):
            problems.append(
                f"dtype[{c}]: spark={a[c].dtype} oracle={b[c].dtype}"
                " (would hash-mismatch in driver even if values are equal)"
            )
    if problems:
        return problems
    for c in a.columns:
        col_a, col_b = a[c].tolist(), b[c].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(col_a, col_b)) if not values_equal(x, y)
        ]
        if bad:
            i, x, y = bad[0]
            problems.append(f"values[{c}]: {len(bad)} diffs, first at {i}: spark={x!r} oracle={y!r}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from gratum_spark.session import get_spark

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            sdf_pd = sdf.toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf_pd)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            odf_pd = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        problems = compare(name, sdf_pd, odf_pd)
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems) + f" [{time.time()-t0:.1f}s]")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(sdf_pd)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
