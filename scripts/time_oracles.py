#!/usr/bin/env python3
"""Time each DuckDB oracle standalone against a testdata dir —
spots the exponential-CTE / wide-decimal blowup classes (DESIGN.md
round-8) without waiting on Spark.

Usage: time_oracles.py <sfDir> <oracle_sql.json> [only1,only2,...]
Prints one line per query: <seconds> <rows> <name>, slowest first.
"""
import sys, json, time
import duckdb

sfdir, oraclepath = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(oraclepath))
results = []
for name, sql in sorted(oracle.items()):
    if only is not None and name not in only:
        continue
    t0 = time.time()
    try:
        n = len(con.sql(sql).arrow())
        results.append((time.time() - t0, n, name, ""))
    except Exception as e:
        results.append((time.time() - t0, -1, name,
                        str(e).replace("\n", " ")[:120]))
    print(f"  ran {name}: {results[-1][0]:.1f}s", file=sys.stderr)

for dt, n, name, err in sorted(results, reverse=True):
    flag = f"  ERROR: {err}" if err else ""
    print(f"{dt:8.2f}s {n:>9} {name}{flag}")
