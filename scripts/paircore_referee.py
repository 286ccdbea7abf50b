#!/usr/bin/env python3
"""Candidate-first DuckDB referee for the pair-core queries
(q_itemset_pairs / q_item_lift) on SKEWED table dirs, where the naive
pair oracle (per-basket self-join over a ~200k-item hot basket) needs
~2e10 pair materializations and fills the disk.

A pair can reach support >= 2 only via (a) one SMALL basket (<= 256
items: per-basket self-join is volume-bounded) or (b) TWO big baskets
(bounded by the pairwise big-basket intersections). Enumerate exactly
those candidates, then count big-basket containment with key joins —
mega-basket support-1 pairs are never materialized. This is the same
candidate algebra the engine's supportedPairs tiers implement, but
stated in SQL and evaluated by DuckDB; it was proven result-equal to
the committed NAIVE oracles at sf0.01 and sf0.1 (r16 precedent,
re-checked by --selfcheck here).

Usage:
  python3 scripts/paircore_referee.py <tableDir> <dumpDir>
      compares <dumpDir>/q_itemset_pairs and q_item_lift parquet
      against the candidate-first referee over <tableDir>/lineitem
  python3 scripts/paircore_referee.py <tableDir> --selfcheck
      asserts referee == committed naive oracle on a small dir
"""
import sys, os
import duckdb

BIG = 256

# shared candidate-first support>=2 pair relation (a < b, c_ab)
PAIRS_CTE = f"""
items AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
sizes AS MATERIALIZED (SELECT ok, count(*) AS n FROM items GROUP BY ok),
small AS MATERIALIZED (
  SELECT i.ok, i.pk FROM items i JOIN sizes s USING (ok) WHERE s.n <= {BIG}),
big AS MATERIALIZED (
  SELECT i.ok, i.pk FROM items i JOIN sizes s USING (ok) WHERE s.n > {BIG}),
small_pairs AS MATERIALIZED (
  SELECT a.pk AS a, b.pk AS b, count(*) AS c_small
  FROM small a JOIN small b USING (ok) WHERE a.pk < b.pk GROUP BY 1, 2),
big_inter AS MATERIALIZED (
  SELECT x.ok AS okx, y.ok AS oky, x.pk
  FROM big x JOIN big y USING (pk) WHERE x.ok < y.ok),
bigbig_cands AS MATERIALIZED (
  SELECT DISTINCT i1.pk AS a, i2.pk AS b
  FROM big_inter i1 JOIN big_inter i2 USING (okx, oky) WHERE i1.pk < i2.pk),
cands AS MATERIALIZED (
  SELECT a, b FROM small_pairs UNION SELECT a, b FROM bigbig_cands),
big_counts AS MATERIALIZED (
  SELECT c.a, c.b, count(*) AS c_big
  FROM cands c
  JOIN big ba ON ba.pk = c.a
  JOIN big bb ON bb.pk = c.b AND bb.ok = ba.ok
  GROUP BY 1, 2),
pr AS MATERIALIZED (
  SELECT c.a, c.b,
    coalesce(sp.c_small, 0) + coalesce(bc.c_big, 0) AS c_ab
  FROM cands c
  LEFT JOIN small_pairs sp ON sp.a = c.a AND sp.b = c.b
  LEFT JOIN big_counts bc ON bc.a = c.a AND bc.b = c.b
  WHERE coalesce(sp.c_small, 0) + coalesce(bc.c_big, 0) >= 2)
"""

ITEMSET_SQL = f"""WITH {PAIRS_CTE}
SELECT a AS p_a, b AS p_b, CAST(c_ab AS BIGINT) AS support
FROM pr ORDER BY support DESC, p_a, p_b LIMIT 50"""

LIFT_SQL = f"""WITH {PAIRS_CTE},
n0 AS (SELECT count(DISTINCT ok) AS n_orders FROM items),
marg AS (SELECT pk, count(*) AS c FROM items GROUP BY pk),
dr AS (SELECT a, b, c_ab FROM pr UNION ALL SELECT b, a, c_ab FROM pr),
sc AS (SELECT dr.a, dr.b, c_ab,
    CAST(CAST(c_ab AS HUGEINT) * n_orders * 1000000
      // (CAST(ma.c AS HUGEINT) * mb.c) AS BIGINT) AS lift_ppm
  FROM dr JOIN marg ma ON dr.a = ma.pk
    JOIN marg mb ON dr.b = mb.pk CROSS JOIN n0),
rk AS (SELECT a, b, c_ab, lift_ppm, row_number()
    OVER (PARTITION BY a ORDER BY lift_ppm DESC, b) AS rk FROM sc)
SELECT a, CAST(rk AS BIGINT) AS rk, b, CAST(c_ab AS BIGINT) AS c_ab, lift_ppm
FROM rk WHERE rk <= 3 ORDER BY a, rk"""

NAIVE_PAIRS = """
items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
pr AS (SELECT a.pk AS a, b.pk AS b, count(*) AS c_ab
  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY 1, 2 HAVING count(*) >= 2)
"""


def connect(table_dir):
    con = duckdb.connect()
    p = os.path.join(table_dir, 'lineitem.parquet')
    if os.path.isdir(p):
        p = os.path.join(p, '*.parquet')
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{p}')")
    return con


def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype) in ('int32', 'int16', 'int8'):
            df[c] = df[c].astype('int64')
    return df.reset_index(drop=True)


def main():
    table_dir = sys.argv[1]
    con = connect(table_dir)
    if len(sys.argv) > 2 and sys.argv[2] == '--selfcheck':
        for name, cand in (('itemset', ITEMSET_SQL), ('lift', LIFT_SQL)):
            naive = cand.replace(PAIRS_CTE, NAIVE_PAIRS)
            a = norm(con.execute(cand).fetchdf())
            b = norm(con.execute(naive).fetchdf())
            ok = a.equals(b)
            print(f'selfcheck {name}: candidate-first == naive: {ok} '
                  f'({len(a)} rows)')
            if not ok:
                sys.exit(1)
        return
    dump_dir = sys.argv[2]
    fails = 0
    for qname, sql in (('q_itemset_pairs', ITEMSET_SQL),
                       ('q_item_lift', LIFT_SQL)):
        exp = norm(con.execute(sql).fetchdf())
        got = norm(con.execute(
            f"SELECT * FROM read_parquet('{dump_dir}/{qname}/*.parquet')"
        ).fetchdf())
        ok = exp.equals(got)
        fails += 0 if ok else 1
        print(f'{qname} referee_match= {ok} rows {len(exp)} {len(got)}')
    print(f'FAILURES: {fails}')
    sys.exit(1 if fails else 0)


if __name__ == '__main__':
    main()
