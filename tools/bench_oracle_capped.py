#!/usr/bin/env python3
"""Capped two-sided bench — `bench_oracle.py` with the judge's method:
each oracle runs in its OWN subprocess under a wall cap (default 20 s),
min of 2 reps, 32 DuckDB threads. Replay-artifact oracles (deliberately
naive SQL closures/brute-force replays where DuckDB needs minutes while
Spark finishes in seconds) hit the cap and are listed separately instead
of dominating the run: the uncapped `bench_oracle.py` spends >2 CPU-hours
on them at sf0.1.

Usage: python3 tools/bench_oracle_capped.py <sf_dir> <oracle_sql.json>
           [detail_json=BENCH_DETAIL.json] [cap_sec=20]
"""
import sys, json, subprocess

sf_dir = sys.argv[1]
oracle_path = sys.argv[2]
detail_path = sys.argv[3] if len(sys.argv) > 3 else "BENCH_DETAIL.json"
cap = float(sys.argv[4]) if len(sys.argv) > 4 else 20.0
oracle = json.load(open(oracle_path))
spark = json.load(open(detail_path))["queries"]

RUN = r'''
import sys, json, time, duckdb
sf_dir = sys.argv[1]
q = sys.stdin.read()
con = duckdb.connect()
con.sql("SET threads TO 32")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
t0 = time.time()
con.sql(q).fetchall()
print(json.dumps({"sec": time.time() - t0}))
'''

results = {}
for name, ssec in sorted(spark.items()):
    if name not in oracle:
        results[name] = (ssec, None, "NO-ORACLE")
        continue
    best, err = None, None
    for _ in range(2):
        try:
            p = subprocess.run([sys.executable, "-c", RUN, sf_dir],
                input=oracle[name], capture_output=True, text=True,
                timeout=cap)
            if p.returncode != 0:
                err = (p.stderr.strip().splitlines() or ["?"])[-1][:80]
                break
            out = p.stdout.strip().splitlines()
            if not out:
                err = "EMPTY-OUTPUT"
                break
            sec = json.loads(out[-1])["sec"]
            best = sec if best is None else min(best, sec)
        except subprocess.TimeoutExpired:
            err = f"CAP>{cap}s"
            break
    results[name] = (ssec, best, err)

both = [(n, s, d) for n, (s, d, e) in results.items() if d is not None]
capped = [n for n, (s, d, e) in results.items()
          if e and e.startswith("CAP")]
errs = [(n, e) for n, (s, d, e) in results.items()
        if e and not e.startswith("CAP") and e != "NO-ORACLE"]
ts = sum(s for _, s, _ in both)
td = sum(d for _, _, d in both)
print(f"comparable {len(both)}: spark {ts:.1f}s duck {td:.1f}s "
      f"ratio {ts/td:.2f}")
real = [(n, s, d) for n, s, d in both if d >= 0.2]
rs = sum(s for _, s, _ in real)
rd = sum(d for _, _, d in real)
print(f"duck>=0.2s ({len(real)}): spark {rs:.1f}s duck {rd:.1f}s "
      f"ratio {rs/rd:.2f}")
print(f"capped replay artifacts (duck>{cap}s):")
for n in capped:
    print(f"  {n}: spark {results[n][0]:.2f}s")
if errs:
    print("oracle errors:", errs)
weak = sorted([(n, s, d, s / d) for n, s, d in real
               if s / d >= 3.0 and s >= 1.0], key=lambda t: -t[3])
print("weak (>=3x and >=1s where duck does real work):")
for n, s, d, r in weak:
    print(f"  {n:30s} spark {s:.2f} duck {d:.2f} ratio {r:.1f}")
