#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB oracle compare.

Usage: compare.py <sfDir> <verifyOutDir>
For each oracle_sql.json entry: run SQL in DuckDB over {sfDir}/{table}.parquet
views, load the Spark parquet result, sort columns by name, compare values.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

def cell_eq(a, b):
    if isinstance(a, (list, np.ndarray)) or isinstance(b, (list, np.ndarray)):
        a = list(a) if a is not None else None
        b = list(b) if b is not None else None
        return a == b
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) or isinstance(b, float):
        return a == b  # exact: the driver hashes values
    return a == b

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        spark_df = canon(pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame())
        if name not in oracle:
            results[name] = f"rows-only: {len(spark_df)} rows"
            continue
        try:
            duck_df = canon(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            results[name] = f"ORACLE ERROR: {e}"
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            results[name] = f"SCHEMA MISMATCH: spark={list(spark_df.columns)} duck={list(duck_df.columns)}"
            continue
        if len(spark_df) != len(duck_df):
            results[name] = f"ROWCOUNT MISMATCH: spark={len(spark_df)} duck={len(duck_df)}"
            continue
        bad = None
        for ci, c in enumerate(spark_df.columns):
            # Strict dtype gate first: the driver's hash is dtype-sensitive
            # (int64 940298 vs float64 940298.0 hash differently even when
            # every value compares equal) — r12 shipped two queries local-green
            # that the driver hash failed on exactly this class.
            st, dt = str(spark_df[c].dtype), str(duck_df[c].dtype)
            if st != dt:
                bad = f"DTYPE MISMATCH col={c}: spark={st} duck={dt}"
                break
            sv, dv = spark_df[c].tolist(), duck_df[c].tolist()
            if st == "object":
                # object columns: cell python types must also agree (Decimal
                # vs float compares == but stringifies/hashes differently)
                for ri in range(len(sv)):
                    a, b = sv[ri], dv[ri]
                    if a is not None and b is not None and type(a) is not type(b) \
                       and not (isinstance(a, (list, np.ndarray)) and isinstance(b, (list, np.ndarray))):
                        bad = f"CELLTYPE MISMATCH col={c} row={ri}: spark={type(a).__name__} duck={type(b).__name__}"
                        break
                if bad:
                    break
            for ri in range(len(sv)):
                if not cell_eq(sv[ri], dv[ri]):
                    bad = f"VALUE MISMATCH col={c} row={ri}: spark={sv[ri]!r} duck={dv[ri]!r}"
                    break
            if bad:
                break
        results[name] = bad or f"OK ({len(spark_df)} rows)"
    width = max(len(k) for k in results) if results else 0
    nok = 0
    for k in sorted(results):
        print(f"{k:<{width}}  {results[k]}")
        if results[k].startswith("OK") or results[k].startswith("rows-only"):
            nok += 1
    print(f"-- {nok}/{len(results)} clean")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
