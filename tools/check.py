#!/usr/bin/env python3
"""Local driver-mimic: compare Verify's parquet dumps against DuckDB oracle.

Usage: python3 tools/check.py <sfDir> <outDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

Mirrors the driver's compare: sort columns by name, sort rows, hash values.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), key=lambda s: s.astype(str)).reset_index(drop=True)
    return df

fails = 0
for name, sql in sorted(oracle.items()):
    pq = f"{outdir}/{name}"
    if not glob.glob(f"{pq}/*.parquet"):
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got = con.sql(f"SELECT * FROM '{pq}/*.parquet'").df()
    except Exception as e:
        print(f"FAIL {name}: read spark output: {e}"); fails += 1; continue
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails += 1; continue
    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}"); fails += 1; continue
    if len(g) != len(e):
        print(f"FAIL {name}: rows {len(g)} != {len(e)}"); fails += 1; continue
    gs = g.astype(str).values.tolist()
    es = e.astype(str).values.tolist()
    if gs != es:
        n = 0
        for i, (a, b) in enumerate(zip(gs, es)):
            if a != b:
                print(f"FAIL {name}: row {i}: got {a} exp {b}")
                n += 1
                if n >= 3:
                    break
        fails += 1
        continue
    print(f"PASS {name} ({len(g)} rows, {len(g.columns)} cols)")
print("ALL PASS" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
