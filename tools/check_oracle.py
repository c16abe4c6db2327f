#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: check_oracle.py [sfDir] [verifyOutDir]

Loads each SparkEntry query result (parquet written by graft.Verify), runs the
matching oracle SQL in DuckDB over the same testdata tables, and compares
schema + row values (exact order and row-sorted).
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
n_pass = n_fail = 0
for name in sorted(oracle):
    sql = oracle[name]
    try:
        files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        a = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    except Exception as e:
        print(f"FAIL {name}: spark read error {e}")
        n_fail += 1
        continue
    try:
        b = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        n_fail += 1
        continue
    a = a[sorted(a.columns)]
    b = b[sorted(b.columns)]
    if list(a.columns) != list(b.columns):
        print(f"FAIL {name}: columns spark={list(a.columns)} duck={list(b.columns)}")
        n_fail += 1
        continue
    if len(a) != len(b):
        print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
        n_fail += 1
        continue

    def norm(df):
        df = df.copy()
        for c in df.columns:
            if pd.api.types.is_float_dtype(df[c]):
                df[c] = df[c].astype("float64").round(9)
            elif pd.api.types.is_integer_dtype(df[c]):
                df[c] = df[c].astype("Int64")
            elif pd.api.types.is_datetime64_any_dtype(df[c]):
                df[c] = df[c].astype("datetime64[us]")
            else:
                df[c] = df[c].astype(object).where(df[c].notna(), None)
        return df

    na, nb = norm(a), norm(b)
    exact = na.reset_index(drop=True).equals(nb.reset_index(drop=True))
    sa = na.sort_values(list(na.columns), kind="mergesort").reset_index(drop=True)
    sb = nb.sort_values(list(nb.columns), kind="mergesort").reset_index(drop=True)
    sorted_eq = sa.equals(sb)
    if exact:
        n_pass += 1
        print(f"PASS {name} ({len(a)} rows)")
    elif sorted_eq:
        n_pass += 1
        print(f"PASS(row-order differs!) {name} ({len(a)} rows)")
    else:
        n_fail += 1
        diff = (sa != sb) & ~(sa.isna() & sb.isna())
        bad_cols = [c for c in sa.columns if diff[c].any()]
        print(f"FAIL {name}: value mismatch in {bad_cols}")
        idx = diff.any(axis=1)
        print("  spark:", sa[idx].head(3).to_dict("records"))
        print("  duck :", sb[idx].head(3).to_dict("records"))

print(f"\n{n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
