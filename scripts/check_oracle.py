"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry at the given SF dir, runs the
matching oracle_sql() in DuckDB over the same parquet tables, and compares
row count, sorted column names, and exact values (rows sorted by all
columns). Floats are compared exactly first; on mismatch the max abs diff
is printed so rounding bugs are distinguishable from logic bugs.

Usage: python scripts/check_oracle.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize_df(pdf):
    import pandas as pd

    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)
    # unify integer-ish dtypes
    for c in pdf.columns:
        if pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
    return pdf


def compare(name, spark_pdf, duck_pdf):
    a, b = normalize_df(spark_pdf), normalize_df(duck_pdf)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT MISMATCH spark={len(a)} duck={len(b)}"
    issues = []
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(float)
            bv = bv.astype(float)
            neq = ~((av == bv) | (av.isna() & bv.isna()))
            if neq.any():
                diffs = (av[neq] - bv[neq]).abs()
                issues.append(f"col {c}: {int(neq.sum())} diffs, max={diffs.max():.3e}")
        else:
            neq = ~((av.astype(str) == bv.astype(str)) | (av.isna() & bv.isna()))
            if neq.any():
                i = neq.idxmax()
                issues.append(f"col {c}: {int(neq.sum())} diffs, e.g. row {i}: {av[i]!r} vs {bv[i]!r}")
    return "; ".join(issues) if issues else None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from ertransfer_spark.session import get_spark

    spark = get_spark("check-oracle", cpus=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_ok = n_bad = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"[FAIL] {name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            n_bad += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"[weak] {name}: rows={len(sdf)} ({dt:.1f}s) — no oracle (rows-only)")
            n_weak += 1
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: DUCKDB ERROR {type(e).__name__}: {str(e)[:300]}")
            n_bad += 1
            continue
        problem = compare(name, sdf, ddf)
        if problem:
            print(f"[FAIL] {name}: {problem}")
            n_bad += 1
        else:
            print(f"[ OK ] {name}: rows={len(sdf)} ({dt:.1f}s)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_weak} weak (rows-only), {n_bad} failed")
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
