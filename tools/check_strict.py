#!/usr/bin/env python
"""Dtype-exact lockstep check: the driver's value hash is stricter than
tools/check_oracles.py's round-6 canon (r3's quality_classifier red row
was a DuckDB HUGEINT→float64 vs Spark BIGINT dtype divergence at
IDENTICAL values).  This tool compares the RAW pandas frames of every
queries() entry against its oracle twin:

* column sets (case-insensitive, order-insensitive)
* pandas dtype per column (int64 vs int32 vs float64 vs object)
* exact values after a deterministic whole-row sort (floats compared
  bit-exactly first; if only float columns differ, reports the max abs
  delta so a benign ulp drift is distinguishable from a logic bug)

Usage: python tools/check_strict.py [sf_dir] [query ...]
Exit 1 on any dtype or value mismatch.
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    # nullable pandas extension dtypes (Int64 from DuckDB) → numpy
    for c in df.columns:
        if str(df[c].dtype) in ("Int64", "Int32", "boolean", "Float64"):
            if df[c].isna().any():
                df[c] = df[c].astype("float64")
            else:
                df[c] = df[c].astype(str(df[c].dtype).lower())
    sort_key = df.astype(str).apply(lambda r: "\x00".join(r), axis=1)
    return df.iloc[np.argsort(sort_key.values, kind="stable")].reset_index(
        drop=True
    )


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list:
    problems = []
    s, o = normalize(sdf), normalize(odf)
    if list(s.columns) != list(o.columns):
        return [f"columns: spark={list(s.columns)} oracle={list(o.columns)}"]
    if len(s) != len(o):
        return [f"rows: spark={len(s)} oracle={len(o)}"]
    for c in s.columns:
        ds, do = str(s[c].dtype), str(o[c].dtype)
        if ds != do:
            problems.append(f"dtype[{c}]: spark={ds} oracle={do}")
    for c in s.columns:
        a, b = s[c], o[c]
        if a.dtype == object or b.dtype == object:
            neq = a.astype(str) != b.astype(str)
        else:
            av, bv = a.to_numpy(), b.to_numpy()
            neq = ~((av == bv) | (pd.isna(av) & pd.isna(bv)))
        if neq.any():
            if np.issubdtype(a.dtype, np.floating) and np.issubdtype(
                b.dtype, np.floating
            ):
                d = np.nanmax(np.abs(a.to_numpy() - b.to_numpy()))
                problems.append(
                    f"values[{c}]: {int(neq.sum())}/{len(s)} differ "
                    f"(float, max|Δ|={d:.3e})"
                )
            else:
                i = int(np.argmax(neq.values if hasattr(neq, "values") else neq))
                problems.append(
                    f"values[{c}]: {int(neq.sum())}/{len(s)} differ "
                    f"(first: spark={a.iloc[i]!r} oracle={b.iloc[i]!r})"
                )
    return problems


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, ".")
    import __spark_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs = E.queries()
    oracles = E.oracle_sql()
    # explicitly-requested per-operator names resolve through the full
    # map + base twins, so suite members are strict-checkable alone
    if only:
        aq, base = E.all_queries(), E._base_oracle_sql()
        for name in only - set(qs):
            if name in aq:
                qs = {**qs, name: aq[name]}
                if name in base:
                    oracles = {**oracles, name: base[name]}
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle error: {ex}")
            failures += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            failures += 1
            print(f"FAIL {name}:")
            for p in problems:
                print(f"  {p}")
        else:
            print(f"OK   {name}: {len(sdf)} rows dtype+value exact")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
