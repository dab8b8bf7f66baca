#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate: run graft.Verify
output against the DuckDB oracle SQL and compare per query.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    # normalize dtypes: ints may come back as int32/int64, floats as f32/f64
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        try:
            got = norm(con.sql(
                f"SELECT * FROM read_parquet({files!r})").df())
            want = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols spark={list(got.columns)} "
                  f"oracle={list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(want)}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(got, want, check_exact=True)
            print(f"ok   {name} ({len(got)} rows)")
        except AssertionError as e:
            # retry with tolerance to show whether it's a float-ulp issue
            try:
                pd.testing.assert_frame_equal(got, want, rtol=1e-9)
                print(f"FAIL {name}: exact mismatch but matches at rtol=1e-9 "
                      "(rounding both sides should fix)")
            except AssertionError:
                print(f"FAIL {name}: value mismatch\n{str(e)[:500]}")
            failures += 1
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
