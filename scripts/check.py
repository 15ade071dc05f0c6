#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query result parquet, executes the oracle SQL in DuckDB over
the same sf tables and compares sorted rows (columns sorted by name).

Every oracle also carries a wall-clock budget (ORACLE_BUDGET_S, 30 s
at sf0.01): the driver's capture window is finite, and round 15
proved a single slow oracle (q_pipeline_ccnet's re-inlined CTEs,
540 s) can blank the WHOLE correctness file on a throttled box. A
budget breach here is a FAIL even when the rows match — fix the
oracle (AS MATERIALIZED on multi-referenced CTEs is the usual lever),
don't wait for the driver to time out.
"""
import json, sys, glob, os, time
import duckdb
import pyarrow.parquet as pq

ORACLE_BUDGET_S = float(os.environ.get("ORACLE_BUDGET_S", "30"))

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0
oracle_times = {}
for name, sql in sorted(oracle.items()):
    res_dir = f"{out_dir}/{name}"
    files = glob.glob(f"{res_dir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no result parquet"); fail += 1; continue
    try:
        got = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").df()
        t0 = time.monotonic()
        exp = con.sql(sql).df()
        oracle_s = time.monotonic() - t0
        oracle_times[name] = oracle_s
    except Exception as e:
        print(f"FAIL {name}: {e}"); fail += 1; continue
    if oracle_s > ORACLE_BUDGET_S:
        print(f"FAIL {name}: oracle took {oracle_s:.1f}s "
              f"(budget {ORACLE_BUDGET_S:.0f}s) — a slow oracle can "
              f"blank the driver's correctness capture")
        fail += 1
        continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        print(f"FAIL {name}: columns {gc} vs {ec}"); fail += 1; continue
    g = got[gc].sort_values(gc, ignore_index=True)
    e = exp[ec].sort_values(ec, ignore_index=True)
    if len(g) != len(e):
        print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); fail += 1; continue
    try:
        import pandas as pd
        pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                      check_exact=True)
        print(f"OK   {name} ({len(g)} rows)"); ok += 1
    except AssertionError as ex:
        print(f"FAIL {name}: values differ: {str(ex)[:300]}"); fail += 1

slow = sorted(oracle_times.items(), key=lambda kv: -kv[1])[:5]
print("\nslowest oracles: " +
      ", ".join(f"{n}={s:.1f}s" for n, s in slow))
print(f"{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
