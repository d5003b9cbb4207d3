#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify first
(dumps each query to parquet + oracle_sql.json), then this script replays
every oracle SQL in DuckDB over the same sf tables and compares strictly
(values stringified, columns sorted by name, rows sorted) — approximating
the driver's hash compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)  # full precision — mimics hash-exact compare
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output");  n_fail += 1;  continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet({spark_files!r})")
            g_cols, g_rows = canon(got.fetchall(), got.columns)
            want = con.sql(sql)
            w_cols, w_rows = canon(want.fetchall(), want.columns)
        except Exception as e:
            print(f"FAIL {name}: {e}");  n_fail += 1;  continue
        if g_cols != w_cols:
            print(f"FAIL {name}: cols {g_cols} != {w_cols}");  n_fail += 1;  continue
        if len(g_rows) != len(w_rows):
            print(f"FAIL {name}: rows {len(g_rows)} != {len(w_rows)}");  n_fail += 1;  continue
        bad = [(a, b) for a, b in zip(g_rows, w_rows) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)} mismatched rows; first: got={bad[0][0]} want={bad[0][1]}")
            n_fail += 1
        else:
            print(f"ok   {name} ({len(g_rows)} rows)");  n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
