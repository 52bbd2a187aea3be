#!/usr/bin/env python3
"""Local driver-mimic: compare Verify's parquet dumps against DuckDB oracle.

Usage: python3 tools/check.py <sfDir> <outDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

Mirrors the driver's compare: sort columns by name, sort rows, hash values.

Also harvests per-query DuckDB wall time (min of 2 runs, materialized to a
DataFrame) into <outDir>/oracle_times.json — the single-node-engine side of
the engine-to-engine comparison in BASELINE.md. Caveat recorded there: the
oracle SQL is the SEMANTIC twin (e.g. recursive-CTE closures for the
component queries), not a hand-tuned DuckDB implementation, so per-query
times bound DuckDB from above on the algorithmic queries.
"""
import sys, json, glob, os, time
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
oracle_times = {}
for name, sql in sorted(oracle.items()):
    pq = f"{outdir}/{name}"
    if not glob.glob(f"{pq}/*.parquet"):
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got = con.sql(f"SELECT * FROM '{pq}/*.parquet'").df()
    except Exception as e:
        print(f"FAIL {name}: read spark output: {e}"); fails += 1; continue
    try:
        t0 = time.monotonic()
        exp = con.sql(sql).df()
        t1 = time.monotonic()
        # second run re-uses the OS page cache both runs share; min-of-2
        # matches the bench's noise stance (noise only ever adds time)
        con.sql(sql).df()
        oracle_times[name] = round(min(t1 - t0, time.monotonic() - t1), 3)
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
with open(f"{outdir}/oracle_times.json", "w") as f:
    json.dump({"sf_dir": sfdir, "unit": "sec", "runs": 2, "pick": "min",
               "queries": oracle_times}, f, indent=1, sort_keys=True)
print(f"oracle wall times -> {outdir}/oracle_times.json "
      f"(total {sum(oracle_times.values()):.1f}s over {len(oracle_times)} queries)")

# Engine-to-engine merge: Verify's noop-sink Spark times (written by
# graft.Verify alongside the dumps) joined with the DuckDB times above.
# ratio = spark/oracle (>1 → DuckDB faster). Spark carries JVM+planning
# fixed cost per query at this SF; the honest signal is the ratio TREND
# with SF, not any single sf0.01 row — see BASELINE.md.
st_path = f"{outdir}/spark_times.json"
if os.path.exists(st_path):
    st = json.load(open(st_path))
    rows = {n: {"spark_s": st["queries"][n], "oracle_s": oracle_times[n],
                "ratio": round(st["queries"][n] / max(oracle_times[n], 1e-3), 2)}
            for n in sorted(set(st["queries"]) & set(oracle_times))}
    with open(f"{outdir}/engine_compare.json", "w") as f:
        json.dump({"sf_dir": sfdir, "unit": "sec", "spark_cpus": st.get("cpus"),
                   "note": "min-of-2 each side; spark=noop sink (no write), "
                           "oracle=DuckDB materialized df; ratio=spark/oracle",
                   "queries": rows}, f, indent=1, sort_keys=True)
    sp, du = (sum(r["spark_s"] for r in rows.values()),
              sum(r["oracle_s"] for r in rows.values()))
    med = sorted(r["ratio"] for r in rows.values())[len(rows) // 2] if rows else 0
    print(f"engine compare -> {outdir}/engine_compare.json "
          f"(spark {sp:.1f}s vs duckdb {du:.1f}s over {len(rows)} queries; "
          f"median ratio {med})")
print("ALL PASS" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
