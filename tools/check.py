#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result) and runs the
matching SQL from oracle_sql.json in DuckDB with the sfDir parquet tables
registered as views. Sorts columns by name, sorts rows, and compares cell
values exactly (floats: bit-exact, mirroring a hash compare).
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def cmp(a: pd.DataFrame, b: pd.DataFrame) -> str:
    if sorted(a.columns) != sorted(b.columns):
        return f"SCHEMA cols spark={sorted(a.columns)} oracle={sorted(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} oracle={len(b)}"
    a, b = canon(a), canon(b)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
            av = av.astype(np.float64); bv = bv.astype(np.float64)
            neq = ~((av == bv) | (pd.isna(av) & pd.isna(bv)))
            if neq.any():
                i = int(np.argmax(neq))
                return f"VAL col={c} row={i} spark={av[i]!r} oracle={bv[i]!r} diff={av[i]-bv[i]!r} ({int(neq.sum())} cells)"
        else:
            aa, bb = a[c].astype(object), b[c].astype(object)
            neq = ~((aa == bb) | (aa.isna() & bb.isna()))
            if neq.any():
                i = int(np.argmax(neq.to_numpy()))
                return f"VAL col={c} row={i} spark={aa[i]!r} oracle={bb[i]!r} ({int(neq.sum())} cells)"
    return "OK"


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_ok = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"{name}: NO-SPARK-OUTPUT"); continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)],
                             ignore_index=True)
        if name not in oracles:
            print(f"{name}: rows-only ({len(spark_df)} rows)"); n_ok += 1; continue
        try:
            ora = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE-SQL-ERROR {e}"); continue
        r = cmp(spark_df, ora)
        print(f"{name}: {r}")
        if r == "OK":
            n_ok += 1
    print(f"== {n_ok}/{len(names)} ok ==")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
