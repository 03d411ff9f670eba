#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB oracles and compare strictly (columns sorted by name, rows
sorted, values stringified). Usage:
    python3 tools/check.py [verify_out_dir] [sf_dir]
Run graft.Verify first:
    sbt 'runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out'
"""
import duckdb, glob, json, sys, math
import pandas as pd

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
results = {}
for name in sorted(oracle):
    sql = oracle[name]
    try:
        spark_df = pd.read_parquet(f"{out}/{name}")
    except Exception as e:
        results[name] = f"NO-SPARK-OUTPUT {e}"
        continue
    try:
        duck_df = con.execute(sql).df()
    except Exception as e:
        results[name] = f"ORACLE-SQL-ERROR {e}"
        continue
    a = spark_df[sorted(spark_df.columns)]
    b = duck_df[sorted(duck_df.columns)]
    if list(a.columns) != list(b.columns):
        results[name] = f"COLS spark={list(a.columns)} duck={list(b.columns)}"
        continue
    if len(a) != len(b):
        results[name] = f"ROWS spark={len(a)} duck={len(b)}"
        continue
    a = a.sort_values(by=list(a.columns), kind="mergesort").reset_index(drop=True)
    b = b.sort_values(by=list(b.columns), kind="mergesort").reset_index(drop=True)
    astr = a.astype(str)
    bstr = b.astype(str)
    if astr.equals(bstr):
        results[name] = "OK"
    else:
        diff = (astr != bstr).any(axis=1)
        i = diff.idxmax()
        results[name] = (f"VALUES first-diff row {i}: "
                         f"spark={a.loc[i].to_dict()} duck={b.loc[i].to_dict()}")

n_ok = sum(1 for v in results.values() if v == "OK")
rows_only = [q for q in json.load(open(f"{out}/oracle_sql.json")) if False]
for name, v in results.items():
    print(("PASS " if v == "OK" else "FAIL ") + name + ("" if v == "OK" else "  " + v))
# queries without oracles get a rows-only check
import os
all_out = set(os.path.basename(p) for p in glob.glob(f"{out}/*") if os.path.isdir(p))
no_oracle = all_out - set(oracle)
for name in sorted(no_oracle):
    try:
        n = len(pd.read_parquet(f"{out}/{name}"))
        print(f"ROWS-ONLY {name} rows={n}" + (" (EMPTY!)" if n == 0 else ""))
    except Exception as e:
        print(f"ROWS-ONLY {name} UNREADABLE {e}")
print(f"== {n_ok}/{len(oracle)} oracle queries OK, {len(no_oracle)} rows-only ==")
sys.exit(0 if n_ok == len(oracle) else 1)
