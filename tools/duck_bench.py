#!/usr/bin/env python3
"""Head-to-head baseline: run every oracle SQL from a Verify dump in DuckDB
(single-threaded) over the same parquet tables.

Usage: duck_bench.py SFDIR ORACLE_JSON [name ...]

The oracle_sql.json is the one graft.Verify writes; timing is per query
(warm connection, one untimed parse pass). Prints one JSON line:
{"total": sec, "queries": {name: sec}}.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> None:
    sfdir, oracle_path = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    sqls = json.load(open(oracle_path))
    con = duckdb.connect()
    con.execute("SET threads TO 1")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    con.execute("SET TimeZone = 'UTC'")
    times = {}
    for name, sql in sorted(sqls.items()):
        if only and name not in only:
            continue
        t0 = time.monotonic()
        con.execute(sql).fetchall()
        times[name] = round(time.monotonic() - t0, 3)
    print(json.dumps({"total": round(sum(times.values()), 2),
                      "queries": times}))


if __name__ == "__main__":
    main()
