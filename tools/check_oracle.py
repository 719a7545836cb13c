#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query result parquet in <verifyOutDir>, runs the matching SQL from
oracle_sql.json in DuckDB (with the sfDir parquet files registered as views
named after the tables) and compares: row count, column names/types, and a
hash over rows with columns sorted by name (values rounded where float).
"""
import sys, json, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def fetch(con, sql):
    """Execute ONCE; return (cols, rows, normalized-arrow-type map).

    Arrow types are strict on the int/decimal/float axis (the class the
    driver's hash compare rejects — e.g. DuckDB windowed SUM → HUGEINT →
    decimal128(38,0) vs Spark int64), lenient on representation-only
    variance (string vs large_string, timestamp timezone annotation)."""
    tbl = con.execute(sql).arrow()
    types = {}
    for f in tbl.schema:
        t = str(f.type)
        t = t.replace("large_string", "string")
        if t.startswith("timestamp"):
            t = "timestamp"
        types[f.name] = t
    cols = tbl.schema.names
    rows = list(zip(*[tbl.column(i).to_pylist() for i in range(tbl.num_columns)])) \
        if tbl.num_columns else []
    return cols, rows, types

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(repr(v))
        out.append("|".join(vals))
    out.sort()
    return out

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only is not None:
        unknown = only - set(oracle)
        if unknown:
            print(f"FAIL: filter names not in oracle_sql.json: {sorted(unknown)}")
            return 1
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only is not None and name not in only:
            continue
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no result parquet"); n_bad += 1; continue
        try:
            got_cols, got_rows, got_types = fetch(con, f"SELECT * FROM read_parquet({files!r})")
            want_cols, want_rows, want_types = fetch(con, sql)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_bad += 1; continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)} vs {sorted(want_cols)}"); n_bad += 1; continue
        # Arrow physical-type strictness: repr()-level value equality is NOT
        # enough for the driver's hash compare (round-3 q_text_seq_pack:
        # decimal128(38,0) vs int64 hashed differently with equal values).
        bad_types = {c: (got_types.get(c), want_types.get(c))
                     for c in got_types if got_types.get(c) != want_types.get(c)}
        if bad_types:
            print(f"FAIL {name}: arrow type mismatch {bad_types}"); n_bad += 1; continue
        if len(got_rows) != len(want_rows):
            print(f"FAIL {name}: rows {len(got_rows)} vs {len(want_rows)}"); n_bad += 1; continue
        a, b = canon(got_rows, got_cols), canon(want_rows, want_cols)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: value mismatch, e.g. {diff}"); n_bad += 1; continue
        print(f"OK   {name}: {len(got_rows)} rows")
        n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
