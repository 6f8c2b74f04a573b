#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir>

Loads each <name> parquet result written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB (tables registered
as views over the sfDir parquet files), sorts columns by name and rows
by all columns, and compares values.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    res_dir = f"{outdir}/{name}"
    if not os.path.isdir(res_dir):
        print(f"MISSING  {name} (no spark output)"); fails.append(name); continue
    got = pd.read_parquet(res_dir)
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"ORACLE-ERR {name}: {e}"); fails.append(name); continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"COLS     {name}: spark={list(got.columns)} oracle={list(exp.columns)}")
        fails.append(name); continue
    gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    es = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    if len(gs) != len(es):
        print(f"ROWS     {name}: spark={len(gs)} oracle={len(es)}"); fails.append(name); continue
    # normalize dtypes for compare
    for c in gs.columns:
        if str(gs[c].dtype).startswith("datetime") or str(es[c].dtype).startswith("datetime"):
            gs[c] = pd.to_datetime(gs[c]).astype("datetime64[us]")
            es[c] = pd.to_datetime(es[c]).astype("datetime64[us]")
    eq = gs.equals(es)
    if not eq:
        # find first diff
        diff_cols = [c for c in gs.columns if not gs[c].equals(es[c])]
        print(f"VALUES   {name}: differing cols {diff_cols}")
        for c in diff_cols[:2]:
            m = gs[c] != es[c]
            print(f"  {c}: spark={gs[c][m].head(3).tolist()} oracle={es[c][m].head(3).tolist()}")
        fails.append(name)
    else:
        print(f"OK       {name} ({len(gs)} rows)")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
