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
names = sorted(d for d in os.listdir(base)
               if os.path.isdir(os.path.join(base, d)))
fails = 0
for name in names:
    if not os.path.isdir(os.path.join(adv, name)):
        print(f"{name}: MISSING in adversarial dump")
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
