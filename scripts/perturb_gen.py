#!/usr/bin/env python3
"""Generate metamorphic DATA-variant table directories from a base SF dir.

Each variant rewrites every table through DuckDB (which round-trips the
driver's physical parquet types — µs timestamps, int32, list<float> —
faithfully, unlike a Spark rewrite which would rewrite events.ts to
BIGINT and break the oracle's epoch_ns(ts)). Both the engine and the
DuckDB oracle then read the SAME perturbed files, so every catalog
query's oracle SQL remains valid verbatim over the perturbed views:
any result mismatch is a genuine engine-vs-oracle semantics divergence
on a data shape the fixed-point catalog never exercised.

Variants:
  subset  — drop ~20% of rows per table, keyed on a deterministic
            row hash (different selectivities / empty-ish groups)
  dup     — double every fact-table row (multiplicity: non-distinct
            counts, tie behavior, weighted aggregates); dimension
            tables (region/nation/customer/supplier/part) keep their
            key uniqueness
  nullify — NULL out a slice of value columns (l_discount, l_tax,
            o_totalprice, events.value, events.props, documents.text)
            keyed on a deterministic hash: null-semantics divergence
            (SUM skipping, predicate three-valued logic, tokenizers on
            NULL text) across every query at once

Usage: python3 scripts/perturb_gen.py <base_sf_dir> <out_root>
Writes <out_root>/{subset,dup,nullify}/<table>.parquet
"""
import sys, os, duckdb

TABLES = ['region', 'nation', 'customer', 'supplier', 'part',
          'orders', 'lineitem', 'events', 'documents', 'embeddings']

DIMS = {'region', 'nation', 'customer', 'supplier', 'part'}

# stable per-table key column for deterministic row selection
KEY = {
    'region': 'r_regionkey', 'nation': 'n_nationkey',
    'customer': 'c_custkey', 'supplier': 's_suppkey', 'part': 'p_partkey',
    'orders': 'o_orderkey', 'lineitem': 'l_orderkey * 8 + l_linenumber',
    'events': 'event_id', 'documents': 'doc_id', 'embeddings': 'vec_id',
}

# nullify: per-table (column, modulus, residue) — NULL where key % m == r
NULLIFY = {
    'lineitem': [('l_discount', 10, 3), ('l_tax', 10, 7)],
    'orders': [('o_totalprice', 10, 4)],
    'events': [('value', 10, 2), ('props', 10, 5)],
    'documents': [('text', 20, 9)],   # 5% NULL text
}


def gen(base, out_root):
    con = duckdb.connect()
    for variant in ['subset', 'dup', 'nullify']:
        vdir = os.path.join(out_root, variant)
        os.makedirs(vdir, exist_ok=True)
        for t in TABLES:
            src = f"read_parquet('{base}/{t}.parquet')"
            key = KEY[t]
            if variant == 'subset' and t not in DIMS:
                # keep dims intact (FK integrity), drop ~20% of facts
                sql = f"SELECT * FROM {src} WHERE ({key}) % 5 != 2"
            elif variant == 'dup' and t not in DIMS:
                sql = (f"SELECT * FROM {src} UNION ALL SELECT * FROM {src}")
            elif variant == 'nullify' and t in NULLIFY:
                cols = con.execute(
                    f"DESCRIBE SELECT * FROM {src}").fetchdf()['column_name']
                rules = {c: (m, r) for c, m, r in NULLIFY[t]}
                proj = ', '.join(
                    (f"CASE WHEN ({key}) % {rules[c][0]} = {rules[c][1]} "
                     f"THEN NULL ELSE {c} END AS {c}") if c in rules else c
                    for c in cols)
                sql = f"SELECT {proj} FROM {src}"
            else:
                sql = f"SELECT * FROM {src}"
            con.execute(
                f"COPY ({sql}) TO '{vdir}/{t}.parquet' (FORMAT PARQUET)")
        print(f"[perturb_gen] wrote {vdir}")


if __name__ == '__main__':
    gen(sys.argv[1], sys.argv[2])
