#!/usr/bin/env python3
"""Local pre-verification: mimic the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers the sf tables as DuckDB
views, runs each oracle SQL, loads the matching Spark parquet dump, and
compares (columns sorted by name, rows sorted by all columns — the SAME
compare the driver uses, including its pandas sort_values over the raw
frame, so a column type the driver cannot sort (e.g. arrays) fails HERE
first; float columns compared exactly too since our queries are
engineered deterministic).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Row-sort over the RAW frame exactly like the driver harness does --
    # unsortable column types (numpy arrays etc.) must raise here, locally,
    # not first in the driver's run.
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)

def main(sf_dir: str, out_dir: str, only=None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    failures = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark output")
            failures += 1
            continue
        try:
            expected = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"ORA-ERR  {name}: {e}")
            failures += 1
            continue
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        try:
            e, g = norm(expected), norm(got)
        except Exception as ex:
            print(f"SORT-ERR {name}: {type(ex).__name__}: {ex}")
            failures += 1
            continue
        if list(e.columns) != list(g.columns):
            print(f"SCHEMA   {name}: oracle={list(e.columns)} spark={list(g.columns)}")
            failures += 1
            continue
        if len(e) != len(g):
            print(f"ROWS     {name}: oracle={len(e)} spark={len(g)}")
            failures += 1
            continue
        # exact compare on stringified frames (order-sensitive; both ordered)
        es = e.astype(str).values.tolist()
        gs = g.astype(str).values.tolist()
        if es != gs:
            bad = next(i for i, (a, b) in enumerate(zip(es, gs)) if a != b)
            print(f"VALUES   {name}: first diff at row {bad}:")
            print(f"  oracle: {es[bad]}")
            print(f"  spark : {gs[bad]}")
            failures += 1
            continue
        print(f"OK       {name} ({len(e)} rows)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0

if __name__ == "__main__":
    keys = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], keys))
