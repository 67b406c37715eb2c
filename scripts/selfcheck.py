#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir>
Reads <verifyOutDir>/<name>/ parquet (Spark results) and
<verifyOutDir>/oracle_sql.json, runs each oracle in DuckDB with views
named after the tables in <sfDir>, sorts columns by name and rows by all
columns, and compares values exactly (floats bit-exact after round-trip).
"""
import sys, json, glob, math

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(x)}" for k, x in sorted(v.items())) + "}"
    return repr(v)


def table_rows(tbl):
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    rows = ["|".join(canon(v) for v in row) for row in zip(*data)]
    return cols, sorted(rows)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_rowsonly = 0
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        try:
            spark_tbl = pq.read_table(d)
        except Exception as e:
            print(f"FAIL  {name}: cannot read spark result: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"ROWS  {name}: rows={spark_tbl.num_rows} (no oracle)")
            n_rowsonly += 1
            continue
        try:
            duck_tbl = con.sql(oracle[name]).arrow()
        except Exception as e:
            print(f"FAIL  {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        scols, srows = table_rows(spark_tbl)
        dcols, drows = table_rows(duck_tbl)
        if scols != dcols:
            print(f"FAIL  {name}: columns differ spark={scols} duck={dcols}")
            n_fail += 1
            continue
        if srows == drows:
            print(f"PASS  {name}: rows={len(srows)}")
            n_pass += 1
        else:
            n_fail += 1
            diff = [(a, b) for a, b in zip(srows, drows) if a != b]
            print(f"FAIL  {name}: {len(diff)}/{max(len(srows),len(drows))} rows differ "
                  f"(spark={len(srows)} duck={len(drows)}) cols={scols}")
            for a, b in diff[:3]:
                print(f"      spark: {a[:200]}")
                print(f"      duck : {b[:200]}")
            if len(srows) != len(drows):
                only_s = set(srows) - set(drows)
                only_d = set(drows) - set(srows)
                for r in list(only_s)[:2]:
                    print(f"      only-spark: {r[:200]}")
                for r in list(only_d)[:2]:
                    print(f"      only-duck : {r[:200]}")
    print(f"== pass={n_pass} fail={n_fail} rows_only={n_rowsonly}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
