#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the
matching SQL from oracle_sql.json in DuckDB against the sfDir tables,
and compares: column names (sorted), row counts, and values (rows
sorted by all columns; exact match, with float equality to 1e-12 rel).
"""
import decimal
import json
import math
import sys

import duckdb

def norm_cell(v):
    if isinstance(v, float):
        return ('f', v)
    if hasattr(v, 'timestamp'):  # datetime
        return ('t', str(v))
    if isinstance(v, bytes):
        return ('b', v.hex())
    if isinstance(v, decimal.Decimal):
        return ('d', str(v))
    return ('x', str(v) if v is not None else None)

def cmp_cell(a, b):
    # NULL equals only NULL — checked before the float branch so a
    # NULL-vs-float mismatch reports FAIL instead of raising TypeError.
    if a is None or b is None:
        return a is None and b is None
    ta, va = norm_cell(a)
    tb, vb = norm_cell(b)
    if ta == 'f' or tb == 'f':
        # float vs non-numeric is a type mismatch, not a near-equality;
        # Decimal IS numeric (a DECIMAL sum vs DOUBLE compares by value)
        # while bool is not (True must not equal 1.0).
        def _numeric(v):
            return (isinstance(v, (int, float, decimal.Decimal))
                    and not isinstance(v, bool))
        if not all(_numeric(v) for v in (a, b)):
            return False
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb or abs(fa - fb) <= 1e-12 * max(abs(fa), abs(fb), 1.0)
    # strict type-tag compare: int 1 must not equal varchar '1'
    if isinstance(a, (bool, int)) != isinstance(b, (bool, int)):
        return False
    return (ta, va) == (tb, vb)

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
              'lineitem', 'events', 'documents', 'embeddings']:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f'{out_dir}/oracle_sql.json'))
    if only:  # comma-separated names, pairs with Verify's SPARK_GRAFT_ONLY
        keep = set(only.split(','))
        oracle = {k: v for k, v in oracle.items() if k in keep}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = sorted(spark_rel.columns)
            spark_rows = con.sql(
                f"SELECT {', '.join(spark_cols)} FROM spark_rel ORDER BY ALL"
            ).fetchall()
        except Exception as e:
            print(f'FAIL {name}: spark output unreadable: {str(e)[:200]}')
            n_fail += 1
            continue
        try:
            duck_rel = con.sql(sql)
            duck_cols = sorted(duck_rel.columns)
            duck_rows = con.sql(
                f"SELECT {', '.join(duck_cols)} FROM duck_rel ORDER BY ALL"
            ).fetchall()
        except Exception as e:
            print(f'FAIL {name}: oracle sql error: {str(e)[:300]}')
            n_fail += 1
            continue
        if spark_cols != duck_cols:
            print(f'FAIL {name}: columns differ spark={spark_cols} duck={duck_cols}')
            n_fail += 1
            continue
        if len(spark_rows) != len(duck_rows):
            print(f'FAIL {name}: rowcount spark={len(spark_rows)} duck={len(duck_rows)}')
            n_fail += 1
            continue
        bad = None
        for i, (sr, dr) in enumerate(zip(spark_rows, duck_rows)):
            for c, (sv, dv) in enumerate(zip(sr, dr)):
                if not cmp_cell(sv, dv):
                    bad = (i, spark_cols[c], sv, dv)
                    break
            if bad:
                break
        if bad:
            print(f'FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} duck={bad[3]!r}')
            n_fail += 1
        else:
            print(f'PASS {name} ({len(spark_rows)} rows)')
            n_pass += 1
    print(f'== {n_pass} pass, {n_fail} fail ==')
    return 1 if n_fail else 0

if __name__ == '__main__':
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
