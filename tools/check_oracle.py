#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify first
(dumps each query to parquet + oracle_sql.json), then this script replays
every oracle SQL in DuckDB over the same sf tables and compares the way the
DRIVER does:

  - Spark side read via pandas.read_parquet (pyarrow): DECIMAL columns come
    back as decimal.Decimal objects WITH scale ('136933.00'), ints with any
    NULL become float64, arrays become numpy.ndarray (which crashes
    sort_values — exactly like the driver).
  - Oracle side read via duckdb .df(): DECIMAL/HUGEINT collapse to float64
    ('136933.0').
  - Columns sorted by name, rows sorted by all columns, every cell str()'d,
    then compared exactly.

Round 1 shipped believing 58/58 were green because the old version of this
script read the Spark side back through DuckDB, collapsing both sides to
float64 and hiding the rendering class that failed 19 driver checks. Never
read the Spark side through DuckDB here.

The script also enforces the output-shape contract on the Spark parquet
schema itself: no DECIMAL, no LIST/ARRAY, and no int-vs-float dtype skew
between the two sides (a nullable integer aggregate shows up as exactly
that skew).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import pyarrow.parquet as pq
import pyarrow.types as pat

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def read_spark(files):
    """Driver-faithful read of Spark output: pandas via pyarrow."""
    frames = [pd.read_parquet(f) for f in sorted(files)]
    return pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]


def schema_violations(files):
    """Output-shape contract over the raw arrow schema (pre-pandas)."""
    bad = []
    for f in sorted(files):
        for field in pq.read_schema(f):
            t = field.type
            if pat.is_decimal(t):
                bad.append(f"{field.name}: DECIMAL({t.precision},{t.scale})")
            elif pat.is_list(t) or pat.is_large_list(t) or pat.is_fixed_size_list(t):
                bad.append(f"{field.name}: {t}")
        break  # one file's schema is enough; parts share it
    return bad


def dtype_kind(s):
    return s.dtype.kind  # 'i'/'u' int, 'f' float, 'O' object, 'b' bool...


def canon(df):
    """Driver shape: columns sorted by name, rows sorted, cells str()'d."""
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)  # crashes on arrays, like the driver
    return [[str(v) for v in row] for row in df.itertuples(index=False, name=None)]


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
        shape = schema_violations(spark_files)
        if shape:
            print(f"FAIL {name}: output-shape contract: {shape}");  n_fail += 1;  continue
        try:
            got_df = read_spark(spark_files)
            want_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: read: {e}");  n_fail += 1;  continue
        if sorted(got_df.columns) != sorted(want_df.columns):
            print(f"FAIL {name}: cols {sorted(got_df.columns)} != {sorted(want_df.columns)}")
            n_fail += 1;  continue
        skew = [c for c in got_df.columns
                if {dtype_kind(got_df[c]), dtype_kind(want_df[c])} == {"i", "f"}
                or {dtype_kind(got_df[c]), dtype_kind(want_df[c])} == {"u", "f"}]
        if skew:
            print(f"FAIL {name}: int-vs-float dtype skew (nullable int aggregate?): "
                  + ", ".join(f"{c} spark={got_df[c].dtype} oracle={want_df[c].dtype}" for c in skew))
            n_fail += 1;  continue
        try:
            g_rows = canon(got_df)
            w_rows = canon(want_df)
        except Exception as e:
            print(f"FAIL {name}: sort/stringify (driver would crash too): {e}")
            n_fail += 1;  continue
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
