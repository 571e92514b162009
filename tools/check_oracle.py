#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
corresponding oracle SQL from oracle_sql.json in DuckDB with views named after
the testdata tables, and compares: schema (column names), row count, and exact
values (columns sorted by name, rows sorted by all columns).

Reports EXACT vs CLOSE (float within 1e-9 rel) vs MISMATCH so cross-engine
float drift is visible even if the driver's hash would round.
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        return v
    return v

def rows_sorted(rows):
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))

def compare(name, spark_rows, spark_cols, duck_rows, duck_cols):
    if sorted(spark_cols) != sorted(duck_cols):
        return f"SCHEMA MISMATCH spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    if len(spark_rows) != len(duck_rows):
        return f"ROWCOUNT MISMATCH spark={len(spark_rows)} duck={len(duck_rows)}"
    # reorder columns by sorted name
    sidx = [spark_cols.index(c) for c in sorted(spark_cols)]
    didx = [duck_cols.index(c) for c in sorted(duck_cols)]
    s = rows_sorted([[r[i] for i in sidx] for r in spark_rows])
    d = rows_sorted([[r[i] for i in didx] for r in duck_rows])
    exact = True
    for rs, rd in zip(s, d):
        for a, b in zip(rs, rd):
            if a == b:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12):
                    exact = False
                    continue
            return f"VALUE MISMATCH e.g. {a!r} != {b!r} in row {rs} vs {rd}"
    return "EXACT" if exact else "CLOSE(float-drift)"

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "NO SPARK OUTPUT"
            continue
        try:
            sdf = con.execute(
                "SELECT * FROM read_parquet([" + ",".join(f"'{f}'" for f in files) + "])")
            spark_rows = sdf.fetchall()
            spark_cols = [c[0] for c in sdf.description]
            ddf = con.execute(oracle[name])
            duck_rows = ddf.fetchall()
            duck_cols = [c[0] for c in ddf.description]
            results[name] = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
        except Exception as e:
            results[name] = f"ERROR {type(e).__name__}: {e}"
    width = max(len(n) for n in results) if results else 0
    n_ok = 0
    for name in sorted(results):
        r = results[name]
        ok = r.startswith("EXACT") or r.startswith("CLOSE")
        n_ok += ok
        print(f"{'PASS' if ok else 'FAIL'}  {name:<{width}}  {r}")
    print(f"\n{n_ok}/{len(results)} pass")
    sys.exit(0 if n_ok == len(results) else 1)

main()
