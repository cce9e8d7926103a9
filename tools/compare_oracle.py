#!/usr/bin/env python3
"""Local pre-check of the driver's correctness gate.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

Mirrors the driver: for each entry in oracle_sql.json, run the SQL in
DuckDB over the sf parquet tables, read the Spark result parquet, sort
columns by name then rows, and compare.
"""
import duckdb, json, os, sys
import pandas as pd

TABLES = ['region','nation','customer','supplier','part','orders',
          'lineitem','events','documents','embeddings']

def main(sf, out):
    con = duckdb.connect()
    for t in TABLES:
        p = f'{sf}/{t}.parquet'
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f'{out}/oracle_sql.json'))
    ok = fail = 0
    # rows-only checks for queries without oracle SQL
    for name in sorted(os.listdir(out)):
        pdir = os.path.join(out, name)
        if not os.path.isdir(pdir) or name in oracle:
            continue
        n = len(con.execute(f"SELECT * FROM read_parquet('{pdir}/*.parquet')").df())
        print(f"{name}: rows-only, {n} rows" + ("" if n > 0 else "  <-- EMPTY"))
        if n > 0: ok += 1
        else: fail += 1
    for name, sql in sorted(oracle.items()):
        pdir = f'{out}/{name}'
        if not os.path.isdir(pdir):
            print(f"{name}: MISSING spark output"); fail += 1; continue
        s = con.execute(f"SELECT * FROM read_parquet('{pdir}/*.parquet')").df()
        d = con.execute(sql).df()
        s = s[sorted(s.columns)]
        d = d[sorted(d.columns)]
        if list(s.columns) != list(d.columns):
            print(f"{name}: COLUMN MISMATCH spark={list(s.columns)} duck={list(d.columns)}")
            fail += 1; continue
        s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
        d = d.sort_values(by=list(d.columns)).reset_index(drop=True)
        if len(s) != len(d):
            print(f"{name}: ROWCOUNT spark={len(s)} duck={len(d)}"); fail += 1; continue
        # The driver hashes values exactly: an int64 Spark column vs a
        # float64 oracle column (e.g. DuckDB HUGEINT sums) hash-mismatches
        # even when numerically equal — catch that class here.
        kind_drift = [c for c in s.columns
                      if (ks := {s[c].dtype.kind, d[c].dtype.kind}) <= {'i', 'u', 'f'}
                      and 'f' in ks and len(ks) > 1]
        if kind_drift:
            print(f"{name}: DTYPE DRIFT int-vs-float on {kind_drift} "
                  f"(driver hash would mismatch — CAST the oracle column)")
            fail += 1; continue
        # Same class, datetimes: a tz-aware Spark dump (timestamp[us, tz=UTC])
        # vs DuckDB's naive timestamp[us] passes assert_frame_equal with
        # check_dtype=False but fails the driver's strict schema+hash gate
        # (this exact drift cost round 7 six queries). Flag any column pair
        # where one side is tz-aware and the other naive, or where only one
        # side is a datetime at all.
        def _tz(col):
            return getattr(col.dtype, 'tz', None)
        dt_drift = []
        for c in s.columns:
            sk, dk = s[c].dtype.kind, d[c].dtype.kind
            s_is_dt, d_is_dt = sk == 'M', dk == 'M'
            if s_is_dt != d_is_dt:
                dt_drift.append((c, f'{s[c].dtype}-vs-{d[c].dtype}'))
            elif s_is_dt and (_tz(s[c]) is None) != (_tz(d[c]) is None):
                dt_drift.append((c, f'{s[c].dtype}-vs-{d[c].dtype}'))
        if dt_drift:
            print(f"{name}: DTYPE DRIFT tz-aware-vs-naive on {dt_drift} "
                  f"(driver hash would mismatch — dump as TIMESTAMP_NTZ)")
            fail += 1; continue
        try:
            pd.testing.assert_frame_equal(s, d, check_dtype=False, check_exact=False, rtol=1e-9)
            ok += 1
        except AssertionError as e:
            print(f"{name}: VALUE MISMATCH {str(e)[:300]}"); fail += 1
    print(f"OK={ok} FAIL={fail}")
    return 1 if fail else 0

if __name__ == '__main__':
    sys.exit(main(sys.argv[1], sys.argv[2]))
