#!/usr/bin/env python3
"""10x-scale oracle sweep: like check.py but with a per-oracle timeout so
the deliberately-quadratic DuckDB replays (brute-force KNN/pair oracles,
documented since round 5) exclude themselves instead of hanging the run.
Usage: python3 tools/sweep.py [verify_out_dir] [sf_dir] [timeout_s]
"""
import duckdb, json, sys, multiprocessing as mp
import pandas as pd

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_sf01"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 120


def run_one(name, sql, q):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    try:
        spark_df = pd.read_parquet(f"{out}/{name}")
    except Exception as e:
        q.put(f"NO-SPARK-OUTPUT {e}"); return
    try:
        duck_df = con.execute(sql).df()
    except Exception as e:
        q.put(f"ORACLE-SQL-ERROR {e}"); return
    a = spark_df[sorted(spark_df.columns)]
    b = duck_df[sorted(duck_df.columns)]
    if list(a.columns) != list(b.columns):
        q.put(f"COLS spark={list(a.columns)} duck={list(b.columns)}"); return
    if len(a) != len(b):
        q.put(f"ROWS spark={len(a)} duck={len(b)}"); return

    # same strict compare as check.py: sort rows, stringify, equality
    a = a.sort_values(by=list(a.columns), kind="mergesort").reset_index(drop=True)
    b = b.sort_values(by=list(b.columns), kind="mergesort").reset_index(drop=True)
    q.put("OK" if a.astype(str).equals(b.astype(str)) else "VALUES-MISMATCH")


def main():
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    ok, fail, skipped = [], [], []
    for name in sorted(oracle):
        q = mp.Queue()
        p = mp.Process(target=run_one, args=(name, oracle[name], q))
        p.start(); p.join(timeout)
        if p.is_alive():
            p.terminate(); p.join()
            skipped.append(name)
            print(f"SKIP {name}  (oracle > {timeout}s — quadratic replay)")
            continue
        res = q.get() if not q.empty() else "NO-RESULT"
        if res == "OK":
            ok.append(name); print(f"PASS {name}")
        else:
            fail.append(name); print(f"FAIL {name}  {res}")
    print(f"== {len(ok)} PASS / {len(fail)} FAIL / {len(skipped)} SKIP "
          f"(quadratic oracles) ==")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
