#!/usr/bin/env python3
"""Two-sided bench: time each headline entry's DuckDB oracle at a given SF
and compare against the Spark numbers in BENCH_DETAIL.json.

Usage: python3 tools/bench_oracle.py <sf_dir> <oracle_sql.json> [reps]

The oracle SQL is the exact replay the correctness gate runs — identical
semantics by construction — so ratios here are the honest
Spark-vs-single-node-engine comparison the round verdicts use. Entries
whose oracle is a pure SQL *replay artifact* (e.g. a recursive closure or
sequential-fold reformulation far slower than the engine's native plan)
are reported but should be read with the r4/r5 caveats.
"""
import sys, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, oracle_path, reps=2):
    con = duckdb.connect()
    con.sql(f"SET threads TO 32")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    detail = json.load(open("BENCH_DETAIL.json"))
    spark = detail["queries"]
    rows = []
    for name, ssec in spark.items():
        if name not in oracle:
            rows.append((name, ssec, None, None))
            continue
        best = None
        err = None
        for _ in range(reps):
            t0 = time.time()
            try:
                con.sql(oracle[name]).fetchall()
            except Exception as e:
                err = str(e).splitlines()[0][:80]
                break
            el = time.time() - t0
            best = el if best is None else min(best, el)
        rows.append((name, ssec, best, err))
    total_s = sum(r[1] for r in rows if r[1] is not None and r[1] >= 0)
    total_d = sum(r[2] for r in rows if r[2] is not None)
    both = [(n, s, d) for n, s, d, e in rows if d is not None and s >= 0]
    print(f"{'entry':<28} {'spark':>7} {'duck':>7} {'ratio':>7}")
    for n, s, d in sorted(both, key=lambda r: -(r[1] / max(r[2], 1e-9))):
        print(f"{n:<28} {s:>7.3f} {d:>7.3f} {s/max(d,1e-9):>7.2f}")
    for n, s, d, e in rows:
        if e:
            print(f"{n:<28} ORACLE-ERROR {e}")
        elif d is None:
            print(f"{n:<28} NO-ORACLE spark={s:.3f}")
    real = [(n, s, d) for n, s, d in both if d >= 0.2]
    print(f"\nspark total {total_s:.1f}s  duck total {total_d:.1f}s  "
          f"ratio {total_s/max(total_d,1e-9):.2f}")
    if real:
        rs = sum(r[1] for r in real)
        rd = sum(r[2] for r in real)
        print(f"where duck >= 0.2s ({len(real)} queries): spark {rs:.1f}s "
              f"duck {rd:.1f}s ratio {rs/rd:.2f}")
    weak = [(n, s, d) for n, s, d in real if s / d >= 3.0 and s >= 1.0]
    print(f"weak (>=3x and >=1s where duck does real work): "
          f"{[(n, round(s/d,1)) for n, s, d in weak]}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 2)
