#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage:
  python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over the sfDir parquet tables,
and compares: row count, column names (sorted), and per-cell values with
columns sorted by name. Exit 0 iff everything matches.
"""
import json
import sys
import glob
import os

import duckdb


def load_spark_result(con, path):
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        return None
    return con.execute(
        "SELECT * FROM read_parquet(%s)" % json.dumps(files)
    ).fetch_arrow_table()


def norm(table):
    """Columns sorted by name; values as python lists (row-major)."""
    cols = sorted(table.column_names)
    data = [table.column(c).to_pylist() for c in cols]
    rows = list(zip(*data)) if data else []
    return cols, rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = os.path.join(sf_dir, t + ".parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    failures = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        spark_tbl = load_spark_result(con, os.path.join(out_dir, name))
        if spark_tbl is None:
            print(f"[FAIL] {name}: no spark parquet output")
            failures += 1
            continue
        if name not in oracle:
            n = spark_tbl.num_rows
            status = "ok" if n > 0 else "EMPTY"
            print(f"[rows-only] {name}: {n} rows ({status})")
            if n == 0:
                failures += 1
            continue
        try:
            duck_tbl = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            failures += 1
            continue
        sc, sr = norm(spark_tbl)
        dc, dr = norm(duck_tbl)
        # Output-type contract: DECIMAL in EITHER side's output is a hard
        # FAIL. The r13 assumption ("the driver normalizes Decimal->float
        # on both sides") was falsified by the r14 driver rows: the only
        # two red queries on the whole surface were the only two emitting
        # decimal(38,0) columns. Declared queries must emit
        # BIGINT/DOUBLE/STRING/BOOL/DATE/TS — never DECIMAL/HUGEINT.
        import decimal
        dec_fail = None
        # Scan ALL rows (ADVICE r15: a bounded [:64] scan let a decimal
        # column whose first rows are NULL slip past the gate while
        # canon() below still treats identical Decimal reprs as a match;
        # the zip comparison iterates every row anyway, so a full scan
        # costs nothing extra).
        for side, cols, rows in (("spark", sc, sr), ("duck", dc, dr)):
            for row in rows:
                for cname, v in zip(cols, row):
                    if isinstance(v, decimal.Decimal):
                        dec_fail = (side, cname)
                        break
                if dec_fail:
                    break
            if dec_fail:
                break
        if dec_fail:
            print(f"[FAIL] {name}: DECIMAL value in {dec_fail[0]} output "
                  f"column '{dec_fail[1]}' — forbidden output type; cast "
                  f"to BIGINT/DOUBLE on both engines")
            failures += 1
            continue
        if sc != dc:
            print(f"[FAIL] {name}: columns differ spark={sc} duck={dc}")
            failures += 1
            continue
        if len(sr) != len(dr):
            print(f"[FAIL] {name}: rows spark={len(sr)} duck={len(dr)}")
            failures += 1
            continue
        def canon(row):
            # Type-strict: int 3 vs float64 3.0 MUST fail (the
            # q_gopher_gate r12 escape — Python's bare 3 == 3.0 masked
            # it). No Decimal normalization: decimals hard-fail above,
            # and any that slip past the bounded scan fail here on type.
            return tuple((type(v).__name__, repr(v)) for v in row)
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(sr, dr))
               if canon(a) != canon(b)]
        if bad:
            i, a, b = bad[0]
            print(f"[FAIL] {name}: {len(bad)} mismatched rows; first at {i}:")
            print(f"   cols : {sc}")
            print(f"   spark: {a}")
            print(f"   duck : {b}")
            failures += 1
        else:
            print(f"[OK]   {name}: {len(sr)} rows match")
    print(f"\n{len(names) - failures}/{len(names)} pass")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
