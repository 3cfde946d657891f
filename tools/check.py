#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Usage: python tools/check.py [sfDir] [outDir]

Reads outDir/<name>/ parquet (Spark results from graft.Verify) and
outDir/oracle_sql.json, runs each oracle in DuckDB against the same
sfDir tables, and compares: column names (sorted), schema class, row
count, and exact values after sorting rows. Prints one line per query.
"""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes for comparison
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif isinstance(df[c].dtype, pd.DatetimeTZDtype):
            df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    sort_cols = list(df.columns)
    try:
        df = df.sort_values(by=sort_cols, kind="mergesort")
    except Exception:
        df = df.sort_values(by=sort_cols, key=lambda s: s.astype(str),
                            kind="mergesort")
    return df.reset_index(drop=True)

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = duckdb.connect().execute(
            f"SELECT * FROM read_parquet({files!r})").df()
        e_n, g_n = norm(exp), norm(got)
        if list(e_n.columns) != list(g_n.columns):
            print(f"FAIL {name}: columns exp={list(e_n.columns)} got={list(g_n.columns)}")
            n_fail += 1
            continue
        if len(e_n) != len(g_n):
            print(f"FAIL {name}: rows exp={len(e_n)} got={len(g_n)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(e_n, g_n, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(g_n)} rows)")
            n_pass += 1
        except AssertionError as a:
            msg = str(a).replace("\n", " | ")[:300]
            print(f"FAIL {name}: {msg}")
            n_fail += 1
    # rows-only queries (no oracle)
    for p in sorted(glob.glob(f"{out}/*/")):
        name = p.rstrip("/").split("/")[-1]
        if name not in oracle:
            files = glob.glob(f"{p}*.parquet")
            n = duckdb.connect().execute(
                f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] \
                if files else -1
            print(f"ROWS {name}: {n}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
