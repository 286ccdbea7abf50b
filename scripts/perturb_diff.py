#!/usr/bin/env python3
"""Show differing rows between engine dump and DuckDB oracle for one
query (triage helper for perturb mismatches).
Usage: perturb_diff.py <dump_dir> <table_dir> <query> [--fullsort]"""
import sys, json, os
import duckdb
import pandas as pd

TABLES = ['region', 'nation', 'customer', 'supplier', 'part',
          'orders', 'lineitem', 'events', 'documents', 'embeddings']

dump, tdir, qname = sys.argv[1], sys.argv[2], sys.argv[3]
fullsort = '--fullsort' in sys.argv
con = duckdb.connect()
for t in TABLES:
    p = f'{tdir}/{t}.parquet'
    if os.path.isdir(p):
        p = f'{p}/*.parquet'
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
sql = json.load(open(f'{dump}/oracle_sql.json'))[qname]


def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        dt = str(df[c].dtype)
        if dt in ('int32', 'int16', 'int8'):
            df[c] = df[c].astype('int64')
        if dt == 'float32':
            df[c] = df[c].astype('float64')
    if fullsort:
        df = df.sort_values(by=list(df.columns), kind='mergesort',
                            na_position='last').reset_index(drop=True)
    return df


exp = norm(con.execute(sql).fetchdf())
got = norm(con.execute(
    f"SELECT * FROM read_parquet('{dump}/{qname}/*.parquet')").fetchdf())
print(f"oracle rows={len(exp)} engine rows={len(got)} cols={list(exp.columns)}")
m = exp.merge(got, how='outer', indicator=True,
              on=list(exp.columns) if len(exp.columns) else None)
only_exp = m[m['_merge'] == 'left_only']
only_got = m[m['_merge'] == 'right_only']
pd.set_option('display.width', 250)
pd.set_option('display.max_columns', 50)
print(f"--- oracle-only rows ({len(only_exp)}):")
print(only_exp.head(12).to_string())
print(f"--- engine-only rows ({len(only_got)}):")
print(only_got.head(12).to_string())
