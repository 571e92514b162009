#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
corresponding oracle SQL from oracle_sql.json in DuckDB with views named after
the testdata tables, and compares: schema (column names), row count, and exact
values (columns sorted by name, rows sorted by all columns).

Reports EXACT vs CLOSE (float within 1e-9 rel) vs MISMATCH. The driver's gate
is an exact type-sensitive hash, so this local gate must be STRICTER: CLOSE
counts as FAIL, and pandas-level dtypes are compared (catches e.g. DuckDB
HUGEINT vs Spark BIGINT, which broke 4 queries in round 1).
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

def dtype_key(df):
    """Comparable dtype map: tz-aware timestamps normalized to naive (the
    driver tolerates tz; parquet-UTC vs duckdb-naive is benign)."""
    out = {}
    for c in df.columns:
        dt = df[c].dtype
        s = str(dt)
        if s.startswith("datetime64") or "UTC" in s:
            s = "datetime64"
        out[c] = s
    return out

def compare(name, spark_rows, spark_cols, duck_rows, duck_cols,
            spark_dtypes=None, duck_dtypes=None):
    if sorted(spark_cols) != sorted(duck_cols):
        return f"SCHEMA MISMATCH spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    if spark_dtypes is not None and duck_dtypes != spark_dtypes:
        diff = {c: (spark_dtypes.get(c), duck_dtypes.get(c))
                for c in spark_dtypes
                if spark_dtypes.get(c) != duck_dtypes.get(c)}
        return f"DTYPE MISMATCH (spark, duck): {diff}"
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
            src = "read_parquet([" + ",".join(f"'{f}'" for f in files) + "])"
            spark_pd = con.execute(f"SELECT * FROM {src}").df()
            sdf = con.execute(f"SELECT * FROM {src}")
            spark_rows = sdf.fetchall()
            spark_cols = [c[0] for c in sdf.description]
            duck_pd = con.execute(oracle[name]).df()
            ddf = con.execute(oracle[name])
            duck_rows = ddf.fetchall()
            duck_cols = [c[0] for c in ddf.description]
            results[name] = compare(name, spark_rows, spark_cols, duck_rows, duck_cols,
                                    dtype_key(spark_pd), dtype_key(duck_pd))
        except Exception as e:
            results[name] = f"ERROR {type(e).__name__}: {e}"
    width = max(len(n) for n in results) if results else 0
    n_ok = 0
    for name in sorted(results):
        r = results[name]
        ok = r == "EXACT"  # CLOSE is a FAIL: driver's hash is exact
        n_ok += ok
        print(f"{'PASS' if ok else 'FAIL'}  {name:<{width}}  {r}")
    print(f"\n{n_ok}/{len(results)} pass")
    sys.exit(0 if n_ok == len(results) else 1)

main()
