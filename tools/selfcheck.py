#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: runs each oracle_sql.json
entry in DuckDB over the same parquet tables and compares (sorted columns,
sorted rows, stringified values) against the Verify parquet dumps.
Dev tool only -- NOT part of the shipped Scala library."""
import duckdb, json, os, sys
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
outdir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'

con = duckdb.connect()
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f'{outdir}/oracle_sql.json'))
fails = 0

def norm(df):
    # Strict, driver-equivalent stringification: Decimals keep their exact
    # textual representation (str(), NO float round-trip — a float() here
    # would hide the DECIMAL(38,x)-vs-float64 trailing-zero mismatch the
    # driver's hash catches); floats use repr() for full precision.
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(
            lambda x: repr(x) if isinstance(x, float) else str(x))
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

for name in sorted(os.listdir(outdir)):
    path = os.path.join(outdir, name)
    if not os.path.isdir(path):
        continue
    sp = pd.read_parquet(path)
    if name not in oracle:
        print(f"{name:28s} rows-only: {len(sp)} rows")
        continue
    try:
        du = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"{name:28s} ORACLE SQL ERROR: {e}")
        fails += 1
        continue
    spn, dun = norm(sp), norm(du)
    if list(spn.columns) != list(dun.columns):
        print(f"{name:28s} COLUMN MISMATCH spark={list(spn.columns)} duck={list(dun.columns)}")
        fails += 1
    elif len(spn) != len(dun):
        print(f"{name:28s} ROWCOUNT MISMATCH spark={len(spn)} duck={len(dun)}")
        fails += 1
    elif not spn.equals(dun):
        diff = (spn != dun)
        cols = [c for c in spn.columns if diff[c].any()]
        n = int(diff.any(axis=1).sum())
        print(f"{name:28s} VALUE MISMATCH {n} rows, cols={cols}")
        idx = diff.any(axis=1).idxmax()
        print(f"  spark: {spn.loc[idx].to_dict()}")
        print(f"  duck : {dun.loc[idx].to_dict()}")
        fails += 1
    else:
        print(f"{name:28s} OK ({len(spn)} rows)")

print(f"\n{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
