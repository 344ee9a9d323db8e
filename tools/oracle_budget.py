#!/usr/bin/env python3
"""Oracle cost budget: execute EVERY oracle SQL in DuckDB over the sf
tables under a per-oracle wall-clock budget, with no Spark dump needed.
This is the pre-round guard against pathological oracles (round 9's
q_markov_attribution chained 20 non-materialized CTEs through correlated
scalar subqueries — exponential under DuckDB's CTE inlining — and its
>15 min hang zeroed the whole round's correctness gate to `{}`).

A budget violation or SQL error here is ONE red row; the exit code gates
CI / pre-commit. Also catches syntax-valid-but-unplannable oracles,
since DuckDB plans before it executes.

Usage:
  sbt "runMain graft.DumpOracles /tmp/oracles.json"
  python3 tools/oracle_budget.py /root/testdata/sf0.001 /tmp/oracles.json [budget_s]
"""
import sys, json, glob, os, threading, time
import duckdb

sfdir, oracle_path = sys.argv[1], sys.argv[2]
budget_s = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0

con = duckdb.connect()
for t in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(t)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")

oracle = json.load(open(oracle_path))

fails, slowest = 0, []
for name in sorted(oracle):
    # Dtype-parity lint: Spark can never emit int128, so any oracle whose
    # OUTPUT column types include HUGEINT/UHUGEINT (DuckDB's silent
    # sum(BIGINT) widening) is a guaranteed driver hash-mismatch — the
    # fetchdf side dumps it as float while Spark dumps BIGINT. Plan-only
    # check via the lazy relation, no execution cost.
    try:
        bad = [(c, str(t)) for c, t in
               zip(con.sql(oracle[name]).columns, con.sql(oracle[name]).types)
               if str(t).upper() in ("HUGEINT", "UHUGEINT")]
        if bad:
            print(f"{name:32s} HUGEINT OUTPUT {bad} — cast ::BIGINT FAIL")
            fails += 1
            continue
    except Exception:
        pass  # planning error surfaces below in the execution path
    timer = threading.Timer(budget_s, con.interrupt)
    timer.start()
    t0 = time.time()
    try:
        n = len(con.execute(oracle[name]).fetchall())
        dt = time.time() - t0
        slowest.append((dt, name))
        if dt > budget_s:
            print(f"{name:32s} OVER BUDGET {dt:6.1f}s (budget {budget_s}s) FAIL")
            fails += 1
    except duckdb.InterruptException:
        print(f"{name:32s} TIMED OUT at {budget_s}s FAIL")
        fails += 1
    except Exception as e:
        print(f"{name:32s} ERROR: {str(e).splitlines()[0][:120]} FAIL")
        fails += 1
    finally:
        timer.cancel()

slowest.sort(reverse=True)
print(f"\nchecked {len(oracle)} oracles at {sfdir}, budget {budget_s}s each")
print("slowest 5:", ", ".join(f"{n}={d:.2f}s" for d, n in slowest[:5]))
print(f"{fails} failures")
sys.exit(1 if fails else 0)
