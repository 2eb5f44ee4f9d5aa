#!/usr/bin/env python3
"""Dev-only harness mimic: compare Verify.scala parquet dumps against the
DuckDB oracle (same contract as the driver's CORRECTNESS check: per-query
row count, schema, and value hash after sorting columns by name and rows
by value). Usage: check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb, pandas as pd
import hashlib

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    t = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def h(df):
    return hashlib.md5(df.to_csv(index=False, float_format="%.6f").encode()).hexdigest()

fails = 0
for name in sorted(oracle):
    got = pd.concat([pd.read_parquet(f) for f in
                     sorted(glob.glob(f"{out}/{name}/*.parquet"))], ignore_index=True)
    want = con.execute(oracle[name]).df()
    g, w = canon(got), canon(want)
    issues = []
    if list(g.columns) != list(w.columns):
        issues.append(f"cols {list(g.columns)} vs {list(w.columns)}")
    if len(g) != len(w):
        issues.append(f"rows {len(g)} vs {len(w)}")
    if not issues:
        gt, wt = [str(t) for t in g.dtypes], [str(t) for t in w.dtypes]
        if gt != wt:
            issues.append(f"dtypes {gt} vs {wt}")
        if h(g) != h(w):
            issues.append("hash mismatch")
            diff = (g != w) & ~(g.isna() & w.isna())
            for c in g.columns:
                if diff[c].any():
                    i = diff[c].idxmax()
                    issues.append(f"  first diff col={c} row={i}: {g[c][i]!r} vs {w[c][i]!r}")
    if issues:
        fails += 1
        print(f"FAIL {name}: " + "; ".join(issues))
    else:
        print(f"ok   {name} ({len(g)} rows)")
print(f"{len(oracle) - fails}/{len(oracle)} ok")
sys.exit(1 if fails else 0)
