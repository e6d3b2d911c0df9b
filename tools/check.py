#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/check.py [sfDir] [outDir] [only...]
Run graft.Verify first (sbt "runMain graft.Verify <sfDir> <outDir>").
"""
import duckdb, json, sys, glob
import pandas as pd
import numpy as np

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name in sorted(oracle):
    if only and name not in only:
        continue
    sql = oracle[name]
    try:
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            fails += 1
            continue
        mine = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
        ref = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {str(e)[:200]}")
        fails += 1
        continue
    mc, rc = sorted(map(str.lower, mine.columns)), sorted(map(str.lower, ref.columns))
    if mc != rc:
        print(f"FAIL {name}: columns {mc} vs {rc}")
        fails += 1
        continue
    mine.columns = [c.lower() for c in mine.columns]
    ref.columns = [c.lower() for c in ref.columns]
    mine = mine[mc].sort_values(mc, na_position="first").reset_index(drop=True)
    ref = ref[mc].sort_values(mc, na_position="first").reset_index(drop=True)
    if len(mine) != len(ref):
        print(f"FAIL {name}: rows {len(mine)} vs {len(ref)}")
        fails += 1
        continue
    ok = True
    for c in mc:
        a, b = mine[c], ref[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            a = a.astype(float); b = b.astype(float)
            bad = ~((a == b) | (a.isna() & b.isna()))
            if bad.any():
                d = (a - b).abs().max()
                print(f"FAIL {name}: col {c} {int(bad.sum())} diffs, maxabs={d}")
                ok = False
        else:
            av = a.astype(str); bv = b.astype(str)
            bad = av != bv
            if bad.any():
                i = bad.idxmax()
                print(f"FAIL {name}: col {c} {int(bad.sum())} diffs e.g. {av[i]!r} vs {bv[i]!r}")
                ok = False
    if ok:
        print(f"PASS {name} ({len(mine)} rows)")
    else:
        fails += 1
print(f"{'ALL PASS' if fails == 0 else str(fails) + ' FAILURES'}")
sys.exit(1 if fails else 0)
