#!/usr/bin/env python3
"""Local self-check harness (dev-only; the engine itself is pure Scala/Spark).

Mimics the driver's correctness gate: run `graft.Verify` first
(sbt "runMain graft.Verify <sfDir> <outDir>"), then this script replays
oracle_sql.json in DuckDB over the same parquet tables and diffs each
result against the Spark parquet dump (columns sorted by name, rows sorted
by all columns, exact value compare with a tiny float report).

Usage: python3 tools/check_oracle.py <sfDir> <outDir> [query ...]
"""
import json, math, sys, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    df = df.sort_values(by=cols, kind="mergesort", na_position="first").reset_index(drop=True)
    return df

def cmp_frames(name, spark_df, oracle_df):
    a, b = canon(spark_df), canon(oracle_df)
    if list(a.columns) != list(b.columns):
        print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
        return False
    if len(a) != len(b):
        print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
        return False
    ok = True
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            same = (x == y) or (x is None and y is None) \
                or (isinstance(x, float) and isinstance(y, float)
                    and (math.isnan(x) and math.isnan(y) or x == y))
            # pandas NaT/None normalization
            if not same and str(x) == str(y):
                same = True
            if not same:
                delta = ""
                if isinstance(x, float) and isinstance(y, float):
                    delta = f" (delta={x - y:.3e})"
                print(f"FAIL {name}: col {c} row {i}: spark={x!r} oracle={y!r}{delta}")
                ok = False
                break
    if ok:
        print(f"OK   {name}: {len(a)} rows x {len(a.columns)} cols")
    return ok

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        spark_path = f"{out_dir}/{name}"
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output at {spark_path}")
            n_fail += 1
            continue
        try:
            spark_df = con.sql(f"SELECT * FROM '{spark_path}/*.parquet'").df()
            oracle_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if cmp_frames(name, spark_df, oracle_df):
            n_ok += 1
        else:
            n_fail += 1
    print(f"== {n_ok} ok, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
