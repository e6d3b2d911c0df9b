#!/usr/bin/env python3
"""Fold the 12 re-timed (3600s-class cap) sf1 oracle queries into
BASELINE_sf1_duckdb.json, replacing the round-11 300s floors with either
a real measurement or a documented power-law extrapolation.

Method, per query that was floored at 300s in round 11:
  - if the re-time at sf1 COMPLETED: use the measured time.
  - if it timed out / died (OOM) even at the bigger cap: extrapolate from
    two measured anchors, t(sf0.1) (BASELINE_duckdb.json) and t(sf0.3)
    (RETIME_sf03_duckdb.json): alpha = ln(t03/t01)/ln(3) is the measured
    scaling exponent, and t(sf1) = t03 * (10/3)^alpha. Each estimate is
    recorded with its anchors and exponent in the "estimated" map.
  The elapsed-at-death floor is strictly LOWER than either number, so
  both replacements only make the baseline more honest, and the
  extrapolation is conservative in the sense that the query in fact
  DNF'd (true single-node cost on this box: unbounded).

Usage: python3 tools/merge_sf1_retime.py <retime_dir> [repo_dir]
  retime_dir must hold RETIME_sf03_duckdb.json and one or more
  RETIME_sf1*_duckdb.json shards (a re-time interrupted and resumed with
  a different cap produces several; they are disjoint by query name).
"""
import glob, json, math, sys

rdir = sys.argv[1]
repo = sys.argv[2] if len(sys.argv) > 2 else "/root/repo"

base01 = json.load(open(f"{repo}/BASELINE_duckdb.json"))["queries"]
sf1 = json.load(open(f"{repo}/BASELINE_sf1_duckdb.json"))
r03 = json.load(open(f"{rdir}/RETIME_sf03_duckdb.json"))
r1 = {"queries": {}, "timeouts": [], "dnf": {}, "timeout_floor_sec": 900.0}
for shard in sorted(glob.glob(f"{rdir}/RETIME_sf1*_duckdb.json")):
    s = json.load(open(shard))
    r1["queries"].update(s["queries"])
    r1["timeouts"] += s.get("timeouts", [])
    r1["dnf"].update(s.get("dnf", {}))

unresolved = set(r1.get("timeouts", [])) | set(r1.get("dnf", {}))
estimated = {}
for name in r1["queries"]:
    if name in unresolved:
        t01, t03 = base01[name], r03["queries"][name]
        alpha = math.log(t03 / t01) / math.log(3.0)
        # the query RAN for r1.queries[name] seconds before dying, so the
        # true cost is at least that — a power law that undershoots the
        # observed elapsed (OOM-thrash grows faster than the fit) is
        # floored at it
        est = max(t03 * (10.0 / 3.0) ** alpha, r1["queries"][name])
        sf1["queries"][name] = round(est, 1)
        estimated[name] = {
            "sf0.1_sec": t01, "sf0.3_sec": t03, "exponent": round(alpha, 2),
            "estimate_sec": round(est, 1),
            "outcome_at_sf1": r1.get("dnf", {}).get(name, f"timeout at cap {r1['timeout_floor_sec']}s"),
        }
    else:
        sf1["queries"][name] = r1["queries"][name]

sf1["duckdb_total_sec"] = round(sum(sf1["queries"].values()), 3)
sf1["timeouts"] = []
sf1["dnf"] = {}
sf1["estimated"] = estimated
# companion for skeptics: the total over MEASURED queries only — gate
# the ratio on this (excluding the same queries from the Spark side)
# to use zero extrapolated numbers
sf1["duckdb_total_measured_only_sec"] = round(
    sum(v for k, v in sf1["queries"].items() if k not in estimated), 3)
sf1["retime_note"] = (
    "round 12: the 12 round-11 300s floors were re-timed with a "
    f"{r1['timeout_floor_sec']:.0f}s cap; completions are measured, the rest are "
    "power-law extrapolations from measured sf0.1/sf0.3 anchors (see 'estimated')")
json.dump(sf1, open(f"{repo}/BASELINE_sf1_duckdb.json", "w"), indent=1)

top = sorted(sf1["queries"].items(), key=lambda kv: -kv[1])[:15]
est_lines = "\n".join(
    f"  - `{k}`: t(sf0.1)={v['sf0.1_sec']}s, t(sf0.3)={v['sf0.3_sec']}s → exponent "
    f"{v['exponent']} → **{v['estimate_sec']}s** ({v['outcome_at_sf1']})"
    for k, v in sorted(estimated.items()))
measured_lines = ", ".join(
    f"{k} {sf1['queries'][k]}s" for k in sorted(r1["queries"]) if k not in estimated)
md = f"""# BASELINE_sf1 — DuckDB single-node oracle timings (10x stress set)

Round-12 revision: the round-11 capture floored 12 queries at a 300s
timeout, which made the headline ratio a non-number. Those 12 were
re-timed with a {r1['timeout_floor_sec']:.0f}s cap (24 threads, 80GB memory limit,
50GB spill). {len(r1['queries']) - len(estimated)} completed and carry real measurements:
{measured_lines}.

The remaining {len(estimated)} could not finish on this box even at the bigger
cap; each carries a power-law extrapolation from two measured anchors
(t(sf0.1) from BASELINE_duckdb.json, t(sf0.3) from a 3x subset run):
alpha = ln(t03/t01)/ln 3, t(sf1) = t03 * (10/3)^alpha — the growth the
query actually exhibited between the two scales it COULD run at —
floored at the time the sf1 attempt ran before dying (a fit that
undershoots the observed elapsed is replaced by the elapsed):
{est_lines}

Every other query keeps its round-11 min-of-passes measurement (all
cores, 300s cap, none hit it).

- **sfDir**: `/tmp/sf1` (tools/make_sf1.py: 10 key-offset copies of the
  sf0.1 fact tables, dims intact — dup floods included by design)
- **queries timed**: {len(sf1["queries"])}
- **duckdb_total_sec**: **{sf1["duckdb_total_sec"]}** (zero floors; {len(estimated)}
  documented extrapolations, listed above)
- **duckdb_total_measured_only_sec**: **{sf1["duckdb_total_measured_only_sec"]}**
  — the companion total over measured queries only; gate on this
  (excluding the same {len(estimated)} queries from the Spark total) to use zero
  extrapolated numbers.

Comparison caveats are unchanged from BASELINE.md (the oracle runs the
uncapped brute-force twins of Spark's blocked/banded plans; the
extrapolated queries are exactly those twins — at 10x data the quadratic
+ brute-force designs exceed this box while every Spark twin finishes in
1-31s, which is the scale evidence the "would it survive 100x" question
needs).

## 15 most expensive oracle queries (seconds)

| query | duckdb_sec |
|---|---|
""" + "\n".join(f"| {k} | {v} |" for k, v in top) + """

Full per-query map: `BASELINE_sf1_duckdb.json`.
"""
open(f"{repo}/BASELINE_sf1.md", "w").write(md)
print(f"merged: total={sf1['duckdb_total_sec']}s, estimated={sorted(estimated)}")
