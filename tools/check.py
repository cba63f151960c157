#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [only_name ...]

Reads each <verifyOutDir>/<name>/ parquet (Spark result) and runs the
matching SQL from oracle_sql.json in DuckDB with the sfDir parquet tables
registered as views. Sorts columns by name, sorts rows, and compares the
canonical VALUE REPRESENTATION of every cell — mirroring the driver's
representation hash. Decimal('2436.000000') vs float 2436.0 is a FAIL here
even though the values are numerically equal (this exact class cost 31
queries in round 1: CORRECTNESS_r01.json / VERDICT.md "What's wrong" #1).
Int width (int32 vs int64) canonicalizes to python int, matching a
value-string hash.
"""
import json, sys, glob, os, math
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def cell_repr(x):
    """Canonical per-cell representation: numpy scalars unwrap to python
    (int width is not representation), None/NaN/NaT fold to NULL, floats
    keep full repr (bit-sensitive), Decimal keeps scale (repr-sensitive)."""
    if x is None:
        return "NULL"
    if isinstance(x, np.generic):
        x = x.item()
    if isinstance(x, float):
        return "NULL" if math.isnan(x) else repr(x)
    try:
        if pd.isna(x):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return repr(x)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    key = df.apply(lambda row: tuple(cell_repr(v) for v in row), axis=1) \
        if len(df) else None
    if len(df):
        df = df.iloc[np.argsort(key.to_numpy(), kind="stable")]
    return df.reset_index(drop=True)


def cmp(a: pd.DataFrame, b: pd.DataFrame) -> str:
    if sorted(a.columns) != sorted(b.columns):
        return f"SCHEMA cols spark={sorted(a.columns)} oracle={sorted(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} oracle={len(b)}"
    a, b = canon(a), canon(b)
    for c in a.columns:
        ar = [cell_repr(v) for v in a[c]]
        br = [cell_repr(v) for v in b[c]]
        bad = [i for i, (x, y) in enumerate(zip(ar, br)) if x != y]
        if bad:
            i = bad[0]
            return (f"REPR col={c} row={i} spark={ar[i]} oracle={br[i]} "
                    f"({len(bad)} cells)")
    return "OK"


def main(sf_dir, out_dir, only=()):
    con = duckdb.connect()
    # co-location knobs (1000x-gate finding): DuckDB sizes memory_limit
    # off TOTAL RAM (~80%) regardless of co-resident engines — on a box
    # shared with a 48g Spark JVM the kernel OOM-kills it; a capped limit
    # spills to temp instead. GRAFT_DUCK_MEM, e.g. "48GB"; GRAFT_DUCK_TMP
    # points the spill at the roomiest volume.
    # Values are validated (not interpolated blindly) per ADVICE r14: a
    # stray quote would otherwise break the SET statement.
    mem = os.environ.get("GRAFT_DUCK_MEM")
    if mem:
        import re
        if not re.fullmatch(r"[0-9]+(\.[0-9]+)?\s*[KMGT]i?B", mem):
            raise SystemExit(f"GRAFT_DUCK_MEM invalid: {mem!r} (want e.g. 24GB)")
        con.execute(f"SET memory_limit = '{mem}'")  # validated above; SET takes no binds
    tmp = os.environ.get("GRAFT_DUCK_TMP")
    if tmp:
        if not os.path.isdir(tmp) or "'" in tmp:
            raise SystemExit(f"GRAFT_DUCK_TMP invalid or missing dir: {tmp!r}")
        con.execute(f"SET temp_directory = '{tmp}'")
    # Scale-gate knob: row order never matters to the compare (canon()
    # sorts), and preserve_insertion_order=false lets DuckDB stream
    # large materializations instead of buffering them ordered — the
    # documented memory reducer for exactly the >RAM oracle legs.
    if os.environ.get("GRAFT_DUCK_NO_ORDER"):
        con.execute("SET preserve_insertion_order = false")
    thr = os.environ.get("GRAFT_DUCK_THREADS")
    if thr:
        if not thr.isdigit():
            raise SystemExit(f"GRAFT_DUCK_THREADS invalid: {thr!r}")
        con.execute(f"SET threads = {int(thr)}")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    if only:
        names = [n for n in names if n in only]
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
    main(sys.argv[1], sys.argv[2], set(sys.argv[3:]))
