#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs DuckDB on oracle_sql.json against the same parquet tables and
compares each query's Spark parquet output: schema (column names), row
count, and exact values after sorting columns by name and rows by all
columns. Usage: selfcheck.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, math, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def cell_eq(a, b):
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    return a == b

def error_marker(name):
    """Verify writes <name>/_ERROR.json when the query threw (round-4
    lesson: a failed query must red a row, never shrink the report)."""
    p = f"{outdir}/{name}/_ERROR.json"
    if os.path.exists(p):
        try:
            return json.load(open(p)).get("err", "unknown error")
        except Exception:
            return "unreadable _ERROR.json"
    return None

fails = 0
for name, sql in sorted(oracle.items()):
    err = error_marker(name)
    if err is not None:
        print(f"FAIL {name}: spark query threw: {err}"); fails += 1; continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output (query silently absent)"); fails += 1; continue
    try:
        got = canon(pd.concat([pd.read_parquet(f) for f in files], ignore_index=True))
        exp = canon(con.sql(sql).df())
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: cols spark={list(got.columns)} oracle={list(exp.columns)}"); fails += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}"); fails += 1; continue
    # normalize datetime-ish columns to comparable form
    for c in got.columns:
        for df in (got, exp):
            if str(df[c].dtype).startswith("datetime"):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    bad = None
    for c in got.columns:
        for i, (a, b) in enumerate(zip(got[c], exp[c])):
            if not cell_eq(a, b):
                bad = (c, i, a, b); break
        if bad: break
    if bad:
        c, i, a, b = bad
        print(f"FAIL {name}: value mismatch col={c} row={i} spark={a!r} oracle={b!r}")
        fails += 1
    else:
        # the driver's hash is TYPE-sensitive (round-2 lesson: DuckDB
        # HUGEINT vs Spark int64 reds the gate with identical values) —
        # surface dtype divergence as a warning so it's visible locally
        tw = [f"{c}: spark={got[c].dtype} oracle={exp[c].dtype}"
              for c in got.columns if str(got[c].dtype) != str(exp[c].dtype)]
        suffix = f"  TYPEWARN {'; '.join(tw)}" if tw else ""
        print(f"PASS {name} ({len(got)} rows){suffix}")
# Queries declared in SparkEntry.queries but WITHOUT an oracle get the
# driver's weaker rows-only check; here we at least require non-thrown
# output so a broken non-oracle query cannot hide.
total = len(oracle)
qlist = f"{outdir}/queries.json"
if os.path.exists(qlist):
    for name in json.load(open(qlist)):
        if name in oracle:
            continue
        total += 1
        err = error_marker(name)
        if err is not None:
            print(f"FAIL {name}: (no oracle) spark query threw: {err}"); fails += 1
        elif not glob.glob(f"{outdir}/{name}/*.parquet"):
            print(f"FAIL {name}: (no oracle) no spark output"); fails += 1
        else:
            print(f"PASS {name} (rows-only: no oracle)")

print(f"\n{total-fails}/{total} passed")
sys.exit(1 if fails else 0)
