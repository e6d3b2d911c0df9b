#!/usr/bin/env python3
"""Bench-capture noise gate: bless or reject a bench JSON by its sentinels.

The bench embeds a host-noise sentinel (median-of-3 of a fixed 64M-row
modular sum, zero IO) before each timed pass. Quiet captures of this box
read 0.068-0.092 s per sentinel across rounds 4-8; the round-9 driver
capture read 0.084/0.465/0.652 s and its totals were +43% on untouched
queries — contention, not code. This gate makes that adjudication
mechanical: a capture whose sentinels leave the quiet band is REJECTED
and must be re-run, so round-over-round deltas stay comparable.

Usage:
  python3 tools/bench_stability.py [bench_json ...]   # default bench_detail.json
  python3 tools/bench_stability.py --preflight        # check box load before a run

Exit 0 = BLESSED (or quiet box for --preflight), 1 = REJECTED.
"""
import json, os, sys

# Quiet band for sentinel_sec on this box (local[32], 64M-row sum):
# observed 0.068-0.092 quiet across rounds 4-8, 0.098-0.136 on the
# (still otherwise-idle) round-10 host, one benign 0.14 blip in r7; the
# r9 contaminated capture read 0.465/0.652. Gate on the MEDIAN (a single
# blip is scheduling noise, a shifted median is a loaded box) plus a
# hard per-sentinel ceiling well below the contention readings.
SENTINEL_MEDIAN_MAX = 0.12   # median above this ⇒ loaded box
SENTINEL_MAX = 0.25          # any single sentinel above this ⇒ reject


def preflight():
    load1, load5, _ = os.getloadavg()
    ncpu = os.cpu_count() or 1
    quiet = load1 < 0.5 * ncpu
    print(f"load1={load1:.1f} load5={load5:.1f} ncpu={ncpu} -> "
          f"{'QUIET' if quiet else 'LOADED - do not bench now'}")
    return 0 if quiet else 1


def judge(path):
    with open(path) as f:
        raw = f.read()
    doc = json.loads(raw)
    if "sentinel_sec" not in doc and "tail" in doc:
        # driver BENCH_r{N}.json wraps the bench line inside a "tail"
        # capture: take the last {...} line that parses as JSON
        for line in reversed(doc["tail"].strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                try:
                    doc = json.loads(line)
                    break
                except json.JSONDecodeError:
                    continue
    sent = doc.get("sentinel_sec")
    if not sent:
        print(f"{path}: REJECTED - no sentinel_sec field (pre-round-5 capture?)")
        return 1
    med = sorted(sent)[len(sent) // 2]
    hi = max(sent)
    reasons = []
    if med > SENTINEL_MEDIAN_MAX:
        reasons.append(f"median sentinel {med:.3f}s > {SENTINEL_MEDIAN_MAX}s quiet band")
    if hi > SENTINEL_MAX:
        reasons.append(f"max sentinel {hi:.3f}s > {SENTINEL_MAX}s ceiling")
    verdict = "REJECTED" if reasons else "BLESSED"
    print(f"{path}: {verdict} sentinels={[round(s, 3) for s in sent]}"
          + (" - " + "; ".join(reasons) if reasons else ""))
    return 1 if reasons else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    if args and args[0] == "--preflight":
        sys.exit(preflight())
    paths = args or ["bench_detail.json"]
    sys.exit(max(judge(p) for p in paths))
