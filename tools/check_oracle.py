#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate: run graft.Verify
output against the DuckDB oracle SQL and compare per query.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [--json <artifactPath>]

With --json, also writes a driver-style per-query artifact
({rows_match, schema_match, hash_match, spark_rows, oracle_rows, err})
so scale runs (e.g. sf0.1) leave committable evidence, not just prose.
"""
import glob
import json
import os
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


def main(sf_dir: str, out_dir: str, json_path: str = None,
         skip=(), timeout: float = None, sort_rows: bool = False) -> int:
    con = duckdb.connect()
    for t in TABLES:
        # driver-generated SFs are single files; Spark-written rescales
        # (tools.ScaleData output, e.g. /tmp/graft_sf1) are DIRECTORIES
        # of part files — glob those
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    for s in skip:
        oracle.pop(s, None)

    def run_sql(sql):
        """Run one oracle query, interrupting it after `timeout` s —
        a spilling DuckDB plan (e.g. an unrolled iteration oracle at
        10x scale) must surface as a per-query 'oracle timeout', not
        eat the disk."""
        if not timeout:
            return con.sql(sql).df()
        import threading
        # FRESH CURSOR per timed query: the watchdog interrupts only
        # this cursor, so a query finishing right as the timeout
        # elapses can no longer have a late interrupt() cancel the
        # NEXT statement on the shared connection; the done-flag
        # re-check under `lock` plus the join() keeps the interrupt
        # from outliving the query it was armed for
        cur = con.cursor()
        done = threading.Event()
        lock = threading.Lock()

        def watchdog():
            if not done.wait(timeout):
                with lock:
                    if not done.is_set():
                        cur.interrupt()
        t = threading.Thread(target=watchdog, daemon=True)
        t.start()
        try:
            df = cur.sql(sql).df()
        finally:
            with lock:
                done.set()
            t.join()
            cur.close()
        return df

    failures = 0
    records = {}
    for name, sql in sorted(oracle.items()):
        rec = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None,
               "oracle_rows": None, "err": None}
        records[name] = rec
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            rec["err"] = "no spark output"
            failures += 1
            continue
        try:
            got = norm(con.sql(
                f"SELECT * FROM read_parquet({files!r})").df())
            want = norm(run_sql(sql))
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            rec["err"] = f"oracle error {str(e)[:200]}"
            failures += 1
            continue
        if sort_rows and len(got.columns):
            # row-order-INSENSITIVE compare (fuzz mode): NULL sort keys
            # order NULLS FIRST in Spark and NULLS LAST in DuckDB — a
            # documented presentation divergence, not a value one —
            # so canonicalize both sides by a full-column sort
            got = got.sort_values(by=list(got.columns),
                                  na_position="last").reset_index(drop=True)
            want = want.sort_values(by=list(want.columns),
                                    na_position="last").reset_index(drop=True)
        rec["spark_rows"] = len(got)
        rec["oracle_rows"] = len(want)
        rec["schema_match"] = list(got.columns) == list(want.columns)
        rec["rows_match"] = len(got) == len(want)
        if not rec["schema_match"]:
            print(f"FAIL {name}: cols spark={list(got.columns)} "
                  f"oracle={list(want.columns)}")
            failures += 1
            continue
        if not rec["rows_match"]:
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(want)}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(got, want, check_exact=True)
            rec["hash_match"] = True
            print(f"ok   {name} ({len(got)} rows)")
        except AssertionError as e:
            # retry with tolerance to show whether it's a float-ulp issue
            try:
                pd.testing.assert_frame_equal(got, want, rtol=1e-9)
                print(f"FAIL {name}: exact mismatch but matches at rtol=1e-9 "
                      "(rounding both sides should fix)")
                rec["err"] = "exact mismatch, matches at rtol=1e-9"
            except AssertionError:
                print(f"FAIL {name}: value mismatch\n{str(e)[:500]}")
                rec["err"] = "value mismatch"
            failures += 1
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    if json_path:
        with open(json_path, "w") as f:
            json.dump(records, f, indent=2)
        print(f"artifact written: {json_path}")
    return 1 if failures else 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    jp = skip = None
    to = None
    drop = set()
    if "--json" in argv:
        jp = argv[argv.index("--json") + 1]
        drop.add(argv.index("--json") + 1)
    if "--skip" in argv:
        skip = argv[argv.index("--skip") + 1].split(",")
        drop.add(argv.index("--skip") + 1)
    if "--timeout" in argv:
        to = float(argv[argv.index("--timeout") + 1])
        drop.add(argv.index("--timeout") + 1)
    args = [a for i, a in enumerate(argv)
            if not a.startswith("--") and i not in drop]
    sys.exit(main(args[0], args[1], jp, skip or (), to,
                  "--sort-rows" in argv))
