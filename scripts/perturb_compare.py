#!/usr/bin/env python3
"""DuckDB oracle compare for a Verify/Perturb dump directory.

Replicates the driver's comparison (columns sorted by name, integer /
float width-insensitive) over an arbitrary (dump_dir, table_dir) pair,
so the same script referees base sweeps, data-variant sweeps (tables =
a perturbed dir from perturb_gen.py), and program-variant dumps from
graft.tools.Perturb (tables = the base dir).

Adds one robustness knob the base compare never needed: --fullsort
sorts BOTH frames by every column before comparing, for variant inputs
(dup) where a query's ORDER BY key is no longer unique and row order
within ties is legitimately engine-specific.

Usage:
  python3 scripts/perturb_compare.py <dump_dir> <table_dir> [--fullsort]
Exit 0 iff every query with an oracle matches; prints one line per
mismatch and a final summary line.
"""
import sys, json, glob, os
import duckdb

TABLES = ['region', 'nation', 'customer', 'supplier', 'part',
          'orders', 'lineitem', 'events', 'documents', 'embeddings']


def norm(df, fullsort):
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


def main(dump_dir, table_dir, fullsort):
    con = duckdb.connect()
    for t in TABLES:
        p = f'{table_dir}/{t}.parquet'
        # ScaleGen-style table DIRECTORIES need a glob
        if os.path.isdir(p):
            p = f'{p}/*.parquet'
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f'{dump_dir}/oracle_sql.json'))
    fails, errs, n = [], [], 0
    for name, sql in sorted(oracle.items()):
        out = f'{dump_dir}/{name}'
        if not glob.glob(f'{out}/*.parquet'):
            errs.append((name, 'no engine output'))
            continue
        try:
            exp = norm(con.execute(sql).fetchdf(), fullsort)
            got = norm(con.execute(
                f"SELECT * FROM read_parquet('{out}/*.parquet')").fetchdf(),
                fullsort)
        except Exception as e:
            errs.append((name, str(e).splitlines()[0][:200]))
            continue
        n += 1
        if not exp.equals(got):
            fails.append(name)
            print(f"MISMATCH {name} oracle_rows={len(exp)} "
                  f"engine_rows={len(got)}")
    for name, e in errs:
        print(f"ERROR {name}: {e}")
    print(f"SUMMARY compared={n} mismatches={len(fails)} errors={len(errs)} "
          f"dump={dump_dir} tables={table_dir}")
    return 1 if (fails or errs) else 0


if __name__ == '__main__':
    args = [a for a in sys.argv[1:] if a != '--fullsort']
    sys.exit(main(args[0], args[1], '--fullsort' in sys.argv))
