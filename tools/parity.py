#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare:
runs each oracle SQL over the sf tables, loads the Verify parquet
output, normalizes (sorted columns, stringified, sorted rows), diffs."""
import duckdb, json, os, sys
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
oracle = json.load(open(f'{outdir}/oracle_sql.json'))

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)

fails = 0
for name in sorted(os.listdir(outdir)):
    path = f'{outdir}/{name}'
    if not os.path.isdir(path):
        continue
    spark_df = con.execute(f"SELECT * FROM '{path}/*.parquet'").fetchdf()
    if name not in oracle:
        print(f"{name:24s} rows-only rows={len(spark_df)}")
        if len(spark_df) == 0:
            print(f"  WARNING: zero rows")
        continue
    duck_df = con.execute(oracle[name]).fetchdf()
    a, b = norm(spark_df), norm(duck_df)
    if list(a.columns) != list(b.columns):
        print(f"{name:24s} COLUMN MISMATCH spark={list(a.columns)} duck={list(b.columns)}")
        fails += 1
        continue
    if a.equals(b):
        print(f"{name:24s} OK rows={len(a)}")
    else:
        fails += 1
        print(f"{name:24s} MISMATCH rows={len(a)}/{len(b)}")
        if len(a) == len(b):
            diff = (a != b).any(axis=1)
            idx = diff[diff].index[:3]
            for i in idx:
                print(f"  spark: {a.loc[i].to_dict()}")
                print(f"  duck : {b.loc[i].to_dict()}")
        else:
            only_a = pd.concat([a, b, b]).drop_duplicates(keep=False).head(3)
            print("  rows only in one side:", only_a.to_dict('records'))
print("FAILURES:", fails)
