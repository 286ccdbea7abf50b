#!/usr/bin/env python3
"""Partition-invariance diff: compare two graft.Verify dumps (same
queries, same data, different partitioning knobs) bit-for-bit.

Both dumps come from the SAME engine, so no dtype normalization is
applied — any difference (values, row order, schema) is a real
partition-sensitivity: float drift from partition-order accumulation,
first-wins/last-wins ties, AQE-dependent sampling, etc.

Usage: invariance_compare.py <dump_base> <dump_adversarial>
"""
import sys
import os
import duckdb

base, adv = sys.argv[1], sys.argv[2]
con = duckdb.connect()
# union of BOTH dumps' query dirs: a query present only on one side
# (asymmetric dump — e.g. one run crashed mid-way) must be reported,
# not silently skipped (ADVICE r17)
def dirs(root):
    return {d for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d))}
names = sorted(dirs(base) | dirs(adv))
fails = 0
for name in names:
    missing = [lbl for lbl, root in (("base", base), ("adversarial", adv))
               if not os.path.isdir(os.path.join(root, name))]
    if missing:
        print(f"{name}: MISSING in {' and '.join(missing)} dump")
        fails += 1
        continue
    a = con.execute(
        f"SELECT * FROM read_parquet('{base}/{name}/*.parquet')").fetchdf()
    b = con.execute(
        f"SELECT * FROM read_parquet('{adv}/{name}/*.parquet')").fetchdf()
    ok = a.equals(b)
    fails += 0 if ok else 1
    print(f"{name}: identical={ok} rows={len(a)}/{len(b)}")
print(f"QUERIES: {len(names)}  FAILURES: {fails}")
sys.exit(1 if fails else 0)
