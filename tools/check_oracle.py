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

def cmp_frames(name, spark_df, oracle_df, rec=None):
    """Exact compare; when `rec` (a dict) is given, fill the driver's
    per-query record shape (rows/schema/hash match + row counts)."""
    if rec is None:
        rec = {}
    a, b = canon(spark_df), canon(oracle_df)
    rec.update({"rows_match": len(a) == len(b),
                "schema_match": list(a.columns) == list(b.columns),
                "hash_match": False,
                "spark_rows": len(a), "oracle_rows": len(b), "err": None})
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
    rec["hash_match"] = ok
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
    report = {}
    empty = {"rows_match": False, "schema_match": False, "hash_match": False,
             "spark_rows": None, "oracle_rows": None}
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        spark_path = f"{out_dir}/{name}"
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output at {spark_path}")
            report[name] = dict(empty, err=f"no spark output at {spark_path}")
            n_fail += 1
            continue
        try:
            spark_df = con.sql(f"SELECT * FROM '{spark_path}/*.parquet'").df()
            oracle_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            report[name] = dict(empty, err=str(e)[:500])
            n_fail += 1
            continue
        rec = {}
        if cmp_frames(name, spark_df, oracle_df, rec):
            n_ok += 1
        else:
            n_fail += 1
        report[name] = rec
    print(f"== {n_ok} ok, {n_fail} fail ==")
    # builder-side correctness record (same per-query shape as the
    # driver's CORRECTNESS_r{N}.json) — set CHECK_JSON=<path> to write it
    out_json = os.environ.get("CHECK_JSON")
    if out_json:
        with open(out_json, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"report -> {out_json}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
