#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Runs each oracle SQL in DuckDB against the same parquet tables and
compares with the Spark output parquet written by graft.Verify:
column names (sorted), dtypes, row counts, and exact values after
sorting rows by all columns.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df):
    # Mirror the driver's comparator exactly: sort the RAW frame by all
    # columns. No list-to-JSON coercion — an array-typed column makes
    # pandas raise "unhashable type: numpy.ndarray" here, the same
    # crash the driver's gate reports, so the pre-flight now fails on
    # exactly the shapes the driver fails on (r15: q104/q106/q108).
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        try:
            exp = con.sql(oracle[name]).df()
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            exp, got = norm(exp), norm(got)
            problems = []
            if list(exp.columns) != list(got.columns):
                problems.append(f"columns: oracle={list(exp.columns)} spark={list(got.columns)}")
            else:
                if len(exp) != len(got):
                    problems.append(f"rows: oracle={len(exp)} spark={len(got)}")
                for c in exp.columns:
                    if str(exp[c].dtype) != str(got[c].dtype):
                        problems.append(f"dtype[{c}]: oracle={exp[c].dtype} spark={got[c].dtype}")
                if not problems:
                    neq = (exp != got) & ~(exp.isna() & got.isna())
                    if neq.any().any():
                        bad_cols = [c for c in exp.columns if neq[c].any()]
                        idx = neq.any(axis=1).idxmax()
                        problems.append(
                            f"values differ in {bad_cols}; first row {idx}: "
                            f"oracle={exp.loc[idx].to_dict()} spark={got.loc[idx].to_dict()}")
            if problems:
                n_fail += 1
                print(f"FAIL {name}")
                for p in problems:
                    print(f"     {p}")
            else:
                n_pass += 1
                print(f"ok   {name} ({len(exp)} rows)")
        except Exception as e:
            n_fail += 1
            print(f"ERR  {name}: {str(e).splitlines()[0]}")
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
