#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB against a sf dir — finds oracles
whose cost would bloat the driver's correctness gate (e.g. DuckDB's
duplicate-CTE inlining re-evaluating unrolled iteration chains).

Usage: python3 tools/time_oracles.py <sfDir> <verifyOutDir> [minSecs]
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir, min_secs=0.5):
    con = duckdb.connect()
    for t in TABLES:
        # driver SFs are single files; ScaleData output is a DIRECTORY
        # of part files — glob those (same convention as check_oracle)
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    rows = []
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        try:
            con.sql(sql).df()
            rows.append((time.time() - t0, name, ""))
        except Exception as e:
            rows.append((time.time() - t0, name, f"ERR {str(e)[:80]}"))
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"total oracle time: {total:.1f}s over {len(rows)} queries")
    for secs, name, err in rows:
        if secs >= float(min_secs) or err:
            print(f"{secs:8.2f}s  {name} {err}")

if __name__ == "__main__":
    main(*sys.argv[1:])
