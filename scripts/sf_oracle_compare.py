#!/usr/bin/env python3
"""Per-query DuckDB oracle compare with isolation — one subprocess per
query (memory cap + timeout + fresh spill dir), the r16 big-SF sweep
discipline. Feasibility at large SFs varies per oracle shape; a query
whose naive oracle explodes records TIMEOUT/ERROR instead of blocking
the rest, and gets a referee-script row instead (paircore_referee.py,
triangle_referee.py).

Usage: python3 scripts/sf_oracle_compare.py <tableDir> <dumpDir>
           [q1,q2,...] [timeoutSec]
Reads <dumpDir>/oracle_sql.json; default = all entries; timeout 1800s.
"""
import sys, os, json, subprocess, tempfile

WORKER = r'''
import sys, os, json
import duckdb
table_dir, dump_dir, name, spill = sys.argv[1:5]
sql = json.load(open(os.path.join(dump_dir, 'oracle_sql.json')))[name]
con = duckdb.connect()
con.execute("SET memory_limit='40GB'")
con.execute(f"SET temp_directory='{spill}'")
for t in ['region','nation','customer','supplier','part','orders',
          'lineitem','events','documents','embeddings']:
    p = os.path.join(table_dir, t + '.parquet')
    if os.path.isdir(p):
        p = os.path.join(p, '*.parquet')
    if not (os.path.exists(p) or os.path.exists(os.path.dirname(p))):
        continue
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype) in ('int32', 'int16', 'int8'):
            df[c] = df[c].astype('int64')
        if str(df[c].dtype) == 'float32':
            df[c] = df[c].astype('float64')
    return df

exp = norm(con.execute(sql).fetchdf())
got = norm(con.execute(
    f"SELECT * FROM read_parquet('{os.path.join(dump_dir, name, '*.parquet')}')"
).fetchdf())
print('MATCH' if exp.equals(got) else 'MISMATCH', len(exp), len(got))
'''


def main():
    table_dir, dump_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(dump_dir, 'oracle_sql.json')))
    names = (sys.argv[3].split(',') if len(sys.argv) > 3 and sys.argv[3] != '-'
             else sorted(oracle.keys()))
    timeout = int(sys.argv[4]) if len(sys.argv) > 4 else 1800
    results = {}
    for name in names:
        if not os.path.isdir(os.path.join(dump_dir, name)):
            results[name] = 'NO_DUMP'
            print(name, 'NO_DUMP', flush=True)
            continue
        with tempfile.TemporaryDirectory(prefix='duckspill-') as spill:
            try:
                r = subprocess.run(
                    [sys.executable, '-c', WORKER, table_dir, dump_dir, name,
                     spill],
                    capture_output=True, text=True, timeout=timeout)
                out = (r.stdout.strip().splitlines() or ['ERROR'])[-1]
                results[name] = out if r.returncode == 0 else \
                    f'ERROR {r.stderr.strip().splitlines()[-1][:120] if r.stderr.strip() else out}'
            except subprocess.TimeoutExpired:
                results[name] = f'TIMEOUT {timeout}s'
        print(name, results[name], flush=True)
    bad = {k: v for k, v in results.items()
           if not v.startswith(('MATCH', 'TIMEOUT', 'NO_DUMP'))}
    print('SUMMARY total', len(results),
          'match', sum(1 for v in results.values() if v.startswith('MATCH')),
          'timeout', sum(1 for v in results.values() if v.startswith('TIMEOUT')),
          'bad', len(bad))
    sys.exit(1 if bad else 0)


if __name__ == '__main__':
    main()
