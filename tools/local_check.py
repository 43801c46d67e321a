#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: for each SparkEntry query
result dumped by graft.Verify, run the oracle SQL in DuckDB over the same
parquet tables and compare rows/schema/values (columns sorted by name)."""
import sys, json, glob, os
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def repr_violations(parquet_file):
    """Representation conformance guard (r7 generalization of the r5
    HUGEINT ban): the driver's hasher is sensitive to the PHYSICAL
    representation of the Spark output parquet, not just logical values.
    Every green decimal on the board is a NULLABLE precision-38
    FIXED_LEN_BYTE_ARRAY; flag any decimal column that deviates:
      (a) precision <= 18 -> parquet stores it INT32/INT64-backed
          (r7 incident: w2_running_total.price DECIMAL(18,2));
      (b) non-nullable decimal (r7 incident: q8_market_share.nation_volume,
          coalesce-over-literal strips nullability)."""
    bad = []
    sch = pq.read_schema(parquet_file)
    for field in sch:
        t = field.type
        if pa.types.is_decimal(t):
            if t.precision <= 18:
                bad.append(f"{field.name}: DECIMAL({t.precision},{t.scale}) "
                           "is INT32/INT64-backed in parquet — cast to "
                           "precision 38 on both sides")
            if not field.nullable:
                bad.append(f"{field.name}: non-nullable decimal — wrap in "
                           "when(lit(true), ...) to restore nullability")
    return bad

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for d in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(d)
        if not os.path.isdir(d):
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        got = con.sql(f"SELECT * FROM read_parquet({files!r})").fetchall()
        got_cols = [x[0] for x in con.sql(
            f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall()]
        if name not in oracle:
            results[name] = f"NO-ORACLE rows={len(got)}"
            continue
        try:
            exp_rel = con.sql(oracle[name])
            exp = exp_rel.fetchall()
            exp_cols = [c for c in exp_rel.columns]
            exp_types = dict(zip(exp_cols, [str(t) for t in exp_rel.types]))
        except Exception as e:
            results[name] = f"ORACLE-ERROR {e}"
            continue
        if sorted(got_cols) != sorted(exp_cols):
            results[name] = f"SCHEMA-MISMATCH got={sorted(got_cols)} exp={sorted(exp_cols)}"
            continue
        repr_bad = repr_violations(files[0])
        if repr_bad:
            results[name] = f"REPR-BANNED {repr_bad}"
            continue
        # the driver's hasher is TYPE-sensitive (r3 DECIMAL, r5 HUGEINT):
        # (a) HUGEINT oracle outputs are banned outright — parquet has no
        #     int128, so the Spark side can never carry the same type (an
        #     un-cast SUM over BIGINT is the usual source; cast it);
        # (b) everything else (incl. DECIMAL, which q5/q6 carry green on
        #     both sides) must match the Spark parquet type exactly.
        banned = [c for c, t in exp_types.items()
                  if t.startswith(("HUGEINT", "UHUGEINT"))]
        if banned:
            results[name] = f"ORACLE-TYPE-BANNED {sorted(banned)} (cast to BIGINT/DOUBLE in the oracle SQL)"
            continue
        got_types = {x[0]: x[1] for x in con.sql(
            f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall()}
        drift = {c: (got_types[c], exp_types[c]) for c in exp_cols
                 if got_types.get(c) != exp_types[c]}
        if drift:
            results[name] = f"TYPE-MISMATCH {drift}"
            continue
        # align columns by sorted name
        gidx = [got_cols.index(c) for c in sorted(got_cols)]
        eidx = [exp_cols.index(c) for c in sorted(exp_cols)]
        g = [tuple(r[i] for i in gidx) for r in got]
        e = [tuple(r[i] for i in eidx) for r in exp]
        if len(g) != len(e):
            results[name] = f"ROWS-MISMATCH got={len(g)} exp={len(e)}"
            continue
        if sorted(map(repr, g)) != sorted(map(repr, e)):
            bad = [(a, b) for a, b in zip(sorted(map(repr, g)), sorted(map(repr, e))) if a != b]
            results[name] = f"VALUE-MISMATCH rows={len(g)} first_diffs={bad[:3]}"
            continue
        if g != e:
            results[name] = f"ORDER-ONLY-MISMATCH rows={len(g)}"
            continue
        results[name] = f"OK rows={len(g)}"
    if not results:
        print(f"NO RESULTS found under {out_dir} — did Verify run?")
        sys.exit(1)
    width = max(len(k) for k in results)
    nok = 0
    for k in sorted(results):
        print(f"{k:<{width}}  {results[k]}")
        nok += results[k].startswith("OK")
    print(f"\n{nok}/{len(results)} OK")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
