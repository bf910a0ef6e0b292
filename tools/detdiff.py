#!/usr/bin/env python3
"""Determinism diff: compare two graft.Verify output dirs query-by-query
with DuckDB EXCEPT ALL in both directions. Exit 0 iff every query's
parquet values are identical (bit-level for floats via EXCEPT ALL on
the raw columns)."""
import glob, json, os, sys
import duckdb

a_dir, b_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
names = sorted(d for d in os.listdir(a_dir) if os.path.isdir(os.path.join(a_dir, d)))
bad = 0
for name in names:
    fa = sorted(glob.glob(os.path.join(a_dir, name, "*.parquet")))
    fb = sorted(glob.glob(os.path.join(b_dir, name, "*.parquet")))
    if not fa or not fb:
        print(f"[MISS] {name}: missing output ({len(fa)} vs {len(fb)} files)")
        bad += 1
        continue
    ja, jb = json.dumps(fa), json.dumps(fb)
    d1 = con.execute(f"SELECT count(*) FROM (SELECT * FROM read_parquet({ja}) EXCEPT ALL SELECT * FROM read_parquet({jb}))").fetchone()[0]
    d2 = con.execute(f"SELECT count(*) FROM (SELECT * FROM read_parquet({jb}) EXCEPT ALL SELECT * FROM read_parquet({ja}))").fetchone()[0]
    if d1 or d2:
        print(f"[DIFF] {name}: {d1} rows only in A, {d2} only in B")
        bad += 1
print(f"{len(names) - bad}/{len(names)} identical")
sys.exit(1 if bad else 0)
