#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, compare to the Spark parquet dump (rows,
schema-insensitive column-sorted value hash). Usage:
  python3 tools/oracle_check.py <sfdir> <verify_outdir>
"""
import sys, json, glob, os, threading
import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
# Per-oracle wall-clock budget: one pathological oracle (e.g. an
# exponentially-inlined CTE chain) must cost ONE red row, never hang the
# whole gate. duckdb's interrupt() aborts the running query, which then
# raises and is reported as an ORACLE SQL ERROR for that row only.
ORACLE_TIMEOUT_S = float(os.environ.get("ORACLE_TIMEOUT_S", "30"))
con = duckdb.connect()

def run_oracle(sql):
    timer = threading.Timer(ORACLE_TIMEOUT_S, con.interrupt)
    timer.start()
    try:
        return con.execute(sql).fetchdf()
    finally:
        timer.cancel()
for t in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(t)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if np.issubdtype(s.dtype, np.datetime64):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.astype(str)
        elif np.issubdtype(s.dtype, np.floating):
            df[c] = s.round(9)
        elif s.dtype == bool:
            df[c] = s.astype(int)
        elif str(s.dtype).startswith("int") or str(s.dtype).startswith("uint"):
            df[c] = s.astype("int64")
    return df

fails = 0
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    spark_df = pd.concat([pd.read_parquet(p) for p in glob.glob(f"{d}/*.parquet")]) \
        if glob.glob(f"{d}/*.parquet") else pd.DataFrame()
    if name not in oracle:
        print(f"{name:28s} rows={len(spark_df):7d}  (rows-only check: {'OK' if len(spark_df) > 0 else 'EMPTY!'})")
        if len(spark_df) == 0:
            fails += 1
        continue
    try:
        ora_df = run_oracle(oracle[name])
    except Exception as e:
        print(f"{name:28s} ORACLE SQL ERROR: {e}")
        fails += 1
        continue
    a, b = norm(spark_df.copy()), norm(ora_df.copy())
    rows_ok = len(a) == len(b)
    cols_ok = list(a.columns) == list(b.columns)
    # Driver-faithful dtype parity: the driver hashes raw values, so an
    # integer column on one side vs a float on the other (the DuckDB
    # sum(BIGINT)->HUGEINT->float widening class — 3 rounds, 3 slips)
    # hash-mismatches even when every value is numerically identical.
    # Flag any column whose normalized dtype kind is int on one side and
    # float on the other.
    dtype_bad = []
    if cols_ok:
        for c in a.columns:
            ka, kb = a[c].dtype.kind, b[c].dtype.kind
            if {ka, kb} == {"i", "f"} or {ka, kb} == {"u", "f"}:
                dtype_bad.append((c, str(spark_df[c].dtype) if c in spark_df else "?",
                                  str(ora_df[c].dtype) if c in ora_df else "?"))
    val_ok = False
    if rows_ok and cols_ok:
        try:
            pd.testing.assert_frame_equal(
                a.reset_index(drop=True), b.reset_index(drop=True),
                check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9)
            val_ok = True
        except AssertionError as e:
            val_ok = False
            err = str(e).split("\n")[0:6]
    status = "OK" if (rows_ok and cols_ok and val_ok and not dtype_bad) else "FAIL"
    if status == "FAIL":
        fails += 1
    print(f"{name:28s} rows={len(a):7d}/{len(b):7d} cols_ok={cols_ok} vals_ok={val_ok} dtype_ok={not dtype_bad} {status}")
    if not cols_ok:
        print(f"   spark cols: {list(a.columns)}\n   ora cols:   {list(b.columns)}")
    elif rows_ok and not val_ok:
        print("   " + "\n   ".join(err))
    for c, sd, od in dtype_bad:
        print(f"   DTYPE MISMATCH col={c}: spark={sd} oracle={od} "
              f"(DuckDB HUGEINT widening? add ::BIGINT to the oracle)")
# a query that failed inside Verify leaves NO dump dir at all — that
# must read as a failure, not silently vanish from the report
dumped = {n for n in os.listdir(outdir) if os.path.isdir(os.path.join(outdir, n))}
for name in sorted(set(oracle) - dumped):
    print(f"{name:28s} MISSING DUMP (query failed in Verify?) FAIL")
    fails += 1

print(f"\n{fails} failures")
sys.exit(1 if fails else 0)
