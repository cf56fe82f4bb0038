#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read Verify's parquet
dumps + oracle_sql.json, run each oracle in DuckDB over the same sf dir,
compare rows / schema (column names) / value hash with columns sorted by name.
Usage: check.py <outDir> <sfDir> [query ...]"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import hashlib

out_dir, sf_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return hashlib.md5(df.to_csv(index=False, float_format="%.6g").encode()).hexdigest()

# a typo'd filter name must fail loudly, not skip every entry and exit 0
# (the Verify side fails fast the same way — the targeted loop's twin guard)
unknown = only - set(oracle)
if unknown:
    sys.exit(f"unknown gate entries: {sorted(unknown)}")

fails = 0
for name in sorted(oracle):
    if only and name not in only:
        continue
    spark_dir = os.path.join(out_dir, name)
    files = glob.glob(os.path.join(spark_dir, "*.parquet"))
    if not files:
        print(f"{name}: SPARK OUTPUT MISSING"); fails += 1; continue
    sdf = pq.read_table(files).to_pandas()
    try:
        odf = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}"); fails += 1; continue
    rows = len(sdf) == len(odf)
    schema = sorted(sdf.columns) == sorted(odf.columns)
    h = canon(sdf) == canon(odf) if rows and schema else False
    status = "OK" if (rows and schema and h) else "FAIL"
    if status == "FAIL":
        fails += 1
    print(f"{name}: {status} rows={rows}({len(sdf)}/{len(odf)}) schema={schema} hash={h}")
    if not schema:
        print(f"   spark cols: {sorted(sdf.columns)}\n   oracle cols: {sorted(odf.columns)}")
sys.exit(1 if fails else 0)
