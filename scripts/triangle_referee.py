#!/usr/bin/env python3
"""Per-row DuckDB referee for q_triangle_count at scales where the
enumeration-shaped committed oracle is infeasible (sf10: ~45M edges,
~1.7e10 triangles in the near-clique components).

For each of the 20 EMITTED rows, the referee independently recomputes
that node's triangle count as the number of adjacent neighbor pairs —
neighbors from the symmetric edge list, pair adjacency probed against
the canonical edge set — and compares the value. This verifies every
value the driver would hash. The top-20 SELECTION itself (no
unlisted node ranks higher) would need all ~1M node counts and is not
re-verified here; the selection plan (TakeOrderedAndProject over the
full per-node relation) is scale-independent and oracle-proven at
sf0.01/sf0.1/sf1.

Usage: python3 scripts/triangle_referee.py <tableDir> <dumpDir>
"""
import sys, os
import duckdb


def main():
    table_dir, dump_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET memory_limit='40GB'")
    p = os.path.join(table_dir, 'lineitem.parquet')
    if os.path.isdir(p):
        p = os.path.join(p, '*.parquet')
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{p}')")
    dump = os.path.join(dump_dir, 'q_triangle_count', '*.parquet')
    rows = con.execute(f"""
WITH li AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS sn FROM lineitem),
e AS MATERIALIZED (
  SELECT DISTINCT x.sn AS u, y.sn AS v
  FROM li x JOIN li y ON x.o = y.o AND x.sn < y.sn),
sym AS MATERIALIZED (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
tgt AS (SELECT supp_id, n_triangles FROM read_parquet('{dump}')),
nb AS MATERIALIZED (
  SELECT s.u AS node, s.v AS nbr FROM sym s JOIN tgt t ON s.u = t.supp_id),
tri AS (
  SELECT a.node, count(*) AS cnt
  FROM nb a JOIN nb b ON a.node = b.node AND a.nbr < b.nbr
  JOIN e ON e.u = a.nbr AND e.v = b.nbr
  GROUP BY a.node)
SELECT t.supp_id, t.n_triangles, coalesce(tri.cnt, 0) AS referee
FROM tgt t LEFT JOIN tri ON tri.node = t.supp_id
ORDER BY t.n_triangles DESC, t.supp_id
""").fetchall()
    bad = [r for r in rows if r[1] != r[2]]
    for r in rows[:5]:
        print('row', r)
    print(f'checked {len(rows)} emitted rows, mismatches {len(bad)}')
    for r in bad:
        print('MISMATCH', r)
    sys.exit(1 if bad or not rows else 0)


if __name__ == '__main__':
    main()
