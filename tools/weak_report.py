#!/usr/bin/env python3
"""Self-computing weak-query report (BASELINE.md's floor-calibrated rule).

Reads a blessed bench detail (per-query min seconds + floor_stage_sec),
the matching DuckDB baseline json, and the committed scan watchlist's
__exchanges__/__bcasts__ stage counts, then applies:

    eff = spark_sec - floor_stage_sec * (exchanges + bcasts + 1)
    weak (perf)  iff  eff > 2 * duckdb_sec  AND  eff >= 1.5 s

Usage: python3 tools/weak_report.py [bench_detail_sf1.json] \
         [BASELINE_sf1_duckdb.json] [src/test/resources/plan_scan_watchlist.tsv]
"""
import json, sys

bench_p = sys.argv[1] if len(sys.argv) > 1 else "bench_detail_sf1.json"
base_p = sys.argv[2] if len(sys.argv) > 2 else "BASELINE_sf1_duckdb.json"
tsv_p = sys.argv[3] if len(sys.argv) > 3 else "src/test/resources/plan_scan_watchlist.tsv"

bench = json.load(open(bench_p))
base = json.load(open(base_p))
per_oracle = base.get("queries", base)

stages = {}
for line in open(tsv_p):
    parts = line.rstrip("\n").split("\t")
    if len(parts) != 3:
        continue
    q, f, n = parts
    if f in ("__exchanges__", "__bcasts__"):
        stages[q] = stages.get(q, 1) + int(n)  # exchanges + bcasts + 1

floors = bench.get("floor_stage_sec", [])
floor = sorted(floors)[len(floors) // 2] if floors else 0.0

weak = []
for q, t in sorted(bench["queries"].items()):
    twin = per_oracle.get(q)
    if twin is None:
        continue
    n_stages = stages.get(q, 1)
    eff = t - floor * n_stages
    if eff > 2 * twin and eff >= 1.5:
        weak.append((eff / max(twin, 1e-9), q, t, eff, twin, n_stages))

print(f"floor_stage_sec={floor:.3f}  queries={len(bench['queries'])}  "
      f"weak={len(weak)}  (rule: eff > 2x twin AND eff >= 1.5s)")
for ratio, q, t, eff, twin, n in sorted(weak, reverse=True):
    print(f"  {q:30s} spark={t:7.2f}  eff={eff:7.2f}  twin={twin:7.2f}  "
          f"stages={n:2d}  eff/twin={ratio:6.1f}")
