#!/usr/bin/env python3
"""Dev tool mirroring the driver's correctness gate: run graft.Verify,
then compare each dumped query against its DuckDB oracle on the same
parquet tables (sorted columns, sorted rows, exact values + dtypes).

Usage: python3 tools/compare_oracle.py [sfDir] [verifyOutDir]
Requires driver-side python (duckdb, pandas, pyarrow) — NOT part of the
Scala library.
"""
import duckdb, json, sys, glob, os
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
oracle = json.load(open(f'{out}/oracle_sql.json'))
# Closed under failure: a query that threw during graft.Verify is a
# recorded failure (_errors.json), never a silent absence — round 10
# lost 27 entries to exactly that gap.
errs = {}
if os.path.exists(f'{out}/_errors.json'):
    errs = json.load(open(f'{out}/_errors.json'))
bad = 0
for name in sorted(set(oracle) | set(errs)):
    if name in errs:
        print(f'{name}: QUERY ERROR: {errs[name]}'); bad += 1; continue
    path = f'{out}/{name}'
    parts = glob.glob(f'{path}/*.parquet')
    if not os.path.isdir(path) or not parts:
        print(f'{name}: MISSING spark output'); bad += 1; continue
    spark_df = pd.concat([pd.read_parquet(p) for p in parts])
    try:
        duck_df = con.sql(oracle[name]).df()
    except Exception as e:
        print(f'{name}: ORACLE SQL ERROR: {e}'); bad += 1; continue
    s = spark_df[sorted(spark_df.columns)]
    d = duck_df[sorted(duck_df.columns)]
    if list(s.columns) != list(d.columns):
        print(f'{name}: COLUMN MISMATCH {list(s.columns)} vs {list(d.columns)}'); bad += 1; continue
    if len(s) != len(d):
        print(f'{name}: ROWS {len(s)} vs {len(d)}'); bad += 1; continue
    if list(s.dtypes) != list(d.dtypes):
        # count the dtype failure once; value comparison on mismatched
        # dtypes would just double-count the same defect
        print(f'{name}: DTYPES {dict(s.dtypes)} vs {dict(d.dtypes)}'); bad += 1; continue
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    d = d.sort_values(by=list(d.columns)).reset_index(drop=True)
    if s.equals(d):
        print(f'{name}: OK ({len(s)} rows)')
    else:
        neq = (s != d) & ~(s.isna() & d.isna())
        rows = neq.any(axis=1)
        print(f'{name}: VALUE MISMATCH on {rows.sum()}/{len(s)} rows'); bad += 1
sys.exit(1 if bad else 0)
