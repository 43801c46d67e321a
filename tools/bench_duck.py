#!/usr/bin/env python3
"""Time the DuckDB oracle for each Bench headline query at a given SF —
the comparison side of the r4/r5 bench methodology (min of two passes,
32 threads, same parquet tables). Usage:
  tools/bench_duck.py <sf_dir> <oracle_sql.json> [names_csv]
Prints one JSON line {name: sec, ...} plus a total."""
import sys, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, oracle_path, names_csv=None):
    con = duckdb.connect()
    con.sql("SET threads TO 32")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    names = names_csv.split(",") if names_csv else sorted(oracle.keys())
    out = {}
    for _pass in range(2):
        for n in names:
            if n not in oracle:
                continue
            t0 = time.time()
            try:
                con.sql(oracle[n]).fetchall()
                dt = time.time() - t0
            except Exception as e:
                print(f"[duck] {n}: {e}", file=sys.stderr)
                dt = -1.0
            prev = out.get(n)
            out[n] = dt if prev is None or (0 <= dt < prev) else prev
    total = sum(v for v in out.values() if v >= 0)
    print(json.dumps({"total": total, "queries": out}))

if __name__ == "__main__":
    main(*sys.argv[1:])
