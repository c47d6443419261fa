#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles, mimicking the driver's
correctness gate: run graft.Verify first (writes <out>/<name>/ parquet and
<out>/oracle_sql.json), then this script runs each oracle SQL in DuckDB over
the same fixture parquet and compares row count, schema (loose), and a
value hash with columns sorted by name and rows sorted canonically.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    # NO timestamp/tz/unit normalization here: the driver's compare is
    # tz- and unit-strict, and round 1 proved a local tz_localize(None)
    # masks real driver failures (12 queries). Local red must equal
    # driver red — compared queries should never emit raw timestamps.
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def cell(v):
    if isinstance(v, float):
        return f"{v:.9g}"
    return str(v)

def table_hash(df: pd.DataFrame):
    return [tuple(cell(v) for v in row) for row in df.itertuples(index=False)]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        s, d = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}"); n_fail += 1; continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}"); n_fail += 1; continue
        hs, hd = table_hash(s), table_hash(d)
        if hs != hd:
            bad = [i for i, (a, b) in enumerate(zip(hs, hd)) if a != b][:3]
            print(f"FAIL {name}: value mismatch at rows {bad}")
            for i in bad:
                print(f"  spark: {hs[i]}")
                print(f"  duck : {hd[i]}")
            n_fail += 1; continue
        # strict dtype check (the driver compares schemas too)
        dt_s, dt_d = [str(x) for x in s.dtypes], [str(x) for x in d.dtypes]
        if dt_s != dt_d:
            bad = [t for t in zip(s.columns, dt_s, dt_d) if t[1] != t[2]]
            print(f"FAIL {name}: dtype mismatch {bad}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(s)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(oracles)} total")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
