#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
corresponding oracle SQL from oracle_sql.json in DuckDB with views named after
the testdata tables, and compares: column names, DuckDB logical types, row
count, and exact values (columns sorted by name, rows sorted by all columns).

The driver's gate is an exact type-sensitive hash, so this local gate must be
STRICTER:
  - CLOSE (float within 1e-9) counts as FAIL;
  - logical types come from DuckDB itself (one execution per side; pandas
    dtypes hid e.g. DECIMAL-vs-DOUBLE behind 'object');
  - any DECIMAL or HUGEINT *output* column fails the lint outright: their
    cross-engine physical representations have broken the driver's hash twice
    (round 1 HUGEINT sums, round 2 DECIMAL cos_sim) even with bit-identical
    values — cast to BIGINT/DOUBLE on both sides instead.
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

UNSAFE_WIRE_TYPES = ("DECIMAL", "HUGEINT")


def norm_type(t):
    """Comparable logical type: timestamps normalized (parquet-UTC vs duckdb
    naive/ns is benign to the driver), everything else verbatim."""
    s = str(t).upper()
    if s.startswith("TIMESTAMP"):
        return "TIMESTAMP"
    return s


def run_side(con, query):
    """One execution: (rows, columns, normalized types, raw types)."""
    rel = con.sql(query)
    types = [str(t) for t in rel.types]
    cols = list(rel.columns)
    rows = rel.fetchall()
    return rows, cols, [norm_type(t) for t in types], types


def rows_sorted(rows):
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))


def compare(spark, duck):
    s_rows, s_cols, s_types, s_raw = spark
    d_rows, d_cols, d_types, d_raw = duck
    for side, cols, raw in (("spark", s_cols, s_raw), ("duck", d_cols, d_raw)):
        bad = [f"{c}:{t}" for c, t in zip(cols, raw)
               if any(u in t.upper() for u in UNSAFE_WIRE_TYPES)]
        if bad:
            return f"UNSAFE WIRE TYPE ({side}): {bad} — driver hash is representation-sensitive; cast to BIGINT/DOUBLE"
    if sorted(s_cols) != sorted(d_cols):
        return f"SCHEMA MISMATCH spark={sorted(s_cols)} duck={sorted(d_cols)}"
    s_tmap = dict(zip(s_cols, s_types))
    d_tmap = dict(zip(d_cols, d_types))
    if s_tmap != d_tmap:
        diff = {c: (s_tmap.get(c), d_tmap.get(c))
                for c in s_tmap if s_tmap.get(c) != d_tmap.get(c)}
        return f"TYPE MISMATCH (spark, duck): {diff}"
    if len(s_rows) != len(d_rows):
        return f"ROWCOUNT MISMATCH spark={len(s_rows)} duck={len(d_rows)}"
    sidx = [s_cols.index(c) for c in sorted(s_cols)]
    didx = [d_cols.index(c) for c in sorted(d_cols)]
    s = rows_sorted([[r[i] for i in sidx] for r in s_rows])
    d = rows_sorted([[r[i] for i in didx] for r in d_rows])
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
            results[name] = compare(
                run_side(con, f"SELECT * FROM {src}"),
                run_side(con, oracle[name]))
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
