#!/usr/bin/env python3
"""Full-surface 10x-stress oracle sweep -> CORRECTNESS_sf1.json.

Usage: python3 tools/check_sf1.py [sfDir] [outDir] [jsonOut] [only...]
Run the Spark side first: SPARK_DRIVER_MEM=48g sbt "runMain graft.Verify /tmp/sf1 /tmp/graft_verify_sf1"
(and /tmp/sf1 itself comes from tools/make_sf1.py).

Same cell-wise compare as tools/check.py, with three 10x-survival
adaptations on the ORACLE side only (the Spark outputs are untouched):

1. **Shared-CTE materialization.** The LSH candidate builds explode at
   10x: the dup-flood multiplies every band bucket by ~10, so the bands
   self-join emits ~100x the rows (measured: the single `epairs` build
   ran 40+ min and 60+ GB). Ten oracles share the byte-identical
   minhash-pairs CTE chain and six share the embedding-pairs chain, so
   each chain materializes ONCE into a temp table and the oracle SQL is
   rewritten (exact-substring replacement, verified tail-reference-free)
   to read it. Same rows, paid once — the DuckDB analogue of the Spark
   side's shared frozen views.

2. **Union-find closure.** The five graph oracles' recursive `reach`
   CTEs materialize every (node, reachable-label) pair per step and
   spilled 60 GB at a prior 10x attempt. The edge set still comes from
   DuckDB (the oracle's own non-recursive prefix), the transitive
   closure runs as a Python union-find with min-label semantics (the
   identical fixpoint), and the oracle's final SELECT — its own text
   after the `comp` CTE — runs over the materialized component table.
   Marked method="unionfind" in the JSON.

3. **Timeout + spill caps.** memory_limit=60GB with a temp_directory so
   heavy builds spill instead of OOMing the box; a per-query interrupt
   (default 1200 s, 3600 s for the materialize steps) records
   err="oracle timeout" — single-node resource evidence, not a Spark
   correctness failure.

Results stream into jsonOut after every query; re-running skips queries
already recorded green (delete the file for a fresh sweep).
"""
import duckdb, json, os, re, sys, glob, threading
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify_sf1"
json_out = sys.argv[3] if len(sys.argv) > 3 else "CORRECTNESS_sf1.json"
only = set(sys.argv[4:])

QUERY_TIMEOUT_S = int(os.environ.get("SF1_QUERY_TIMEOUT_S", "1200"))
MAT_TIMEOUT_S = int(os.environ.get("SF1_MAT_TIMEOUT_S", "3600"))

GRAPH = {"dedup_clusters", "dedup_cluster_survivors",
         "sample_cluster_downweight", "data_kfold_grouped",
         "embedding_knn_clusters"}

con = duckdb.connect()
con.sql("SET memory_limit='60GB'")
con.sql("SET temp_directory='/tmp/duckdb_sf1_spill'")
for t in ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")


def run_sql(sql, timeout_s):
    """con.sql with a wall-clock interrupt (DuckDB honors interrupt())."""
    timer = threading.Timer(timeout_s, con.interrupt)
    timer.start()
    try:
        return con.sql(sql).df()
    finally:
        timer.cancel()


oracle = json.load(open(f"{out}/oracle_sql.json"))

# ---- shared-CTE materialization (adaptation 1) -------------------------
# canonical segments extracted from known carriers; exact-substring match
# is safe because every consumer interpolates the same Scala string.
SEGMENTS = []
if "dedup_survivors" in oracle:
    s = oracle["dedup_survivors"]
    seg = s[s.index("WITH") + 5: s.index(">= 0.5)") + len(">= 0.5)")]
    # keep the leading `tok` CTE (one cheap doc scan): two consumers'
    # tails reference it directly; everything else in the chain is only
    # reachable through `pairs`
    tok = seg[: seg.index(", sh AS")]
    SEGMENTS.append(("pairs05_mat", seg,
                     tok + ", pairs AS (SELECT * FROM pairs05_mat)",
                     "WITH " + seg + " SELECT * FROM pairs"))
if "ann_knn_join" in oracle:
    s = oracle["ann_knn_join"]
    head = s[: s.index("bands AS")]          # keeps nrm/sigs CTEs (cheap)
    seg = s[s.index("bands AS"): s.index(">= 0.4)") + len(">= 0.4)")]
    SEGMENTS.append(("epairs_mat", seg,
                     "epairs AS (SELECT * FROM epairs_mat)",
                     head + seg + " SELECT * FROM epairs"))


def rewrite(sql):
    for table, seg, replacement, _ in SEGMENTS:
        if seg in sql:
            sql = sql.replace(seg, replacement)
    return sql


def materialize():
    for table, seg, _, build_sql in SEGMENTS:
        needed = any(seg in v for k, v in oracle.items()
                     if (not only or k in only) and not already_green(k))
        if not needed:
            continue
        print(f"materializing {table} ...", flush=True)
        timer = threading.Timer(MAT_TIMEOUT_S, con.interrupt)
        timer.start()
        try:
            con.sql(f"CREATE TEMP TABLE {table} AS {build_sql}")
            n = con.sql(f"SELECT count(*) FROM {table}").fetchone()[0]
            print(f"  {table}: {n} rows", flush=True)
        finally:
            timer.cancel()


def union_find_oracle(sql):
    """Replace the recursive reach/comp closure with a Python union-find."""
    sql = rewrite(sql)
    cut = sql.index("reach(id, lbl) AS")
    edges_prefix = sql[:cut].rstrip().rstrip(",")
    edges = run_sql(edges_prefix + " SELECT src, dst FROM edges",
                    QUERY_TIMEOUT_S).values.tolist()

    parent = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    nodes = set()
    for a, b in edges:
        nodes.add(a)
        nodes.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min id: the root IS the component's min label
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    m = re.search(r"comp AS \(SELECT id AS (\w+), min\(lbl\) AS cluster_id"
                  r" FROM reach GROUP BY 1\)", sql)
    if not m:
        raise ValueError("comp CTE not found in oracle SQL")
    id_col = m.group(1)
    comp = pd.DataFrame({id_col: sorted(nodes)}).astype("int64")
    comp["cluster_id"] = [find(n) for n in comp[id_col]]
    con.register("comp", comp)

    tail = sql[m.end():].lstrip()
    query = "WITH " + tail[1:].lstrip() if tail.startswith(",") else tail
    try:
        return run_sql(query, QUERY_TIMEOUT_S)
    finally:
        con.unregister("comp")


def compare(name, mine, ref):
    """tools/check.py's cell-wise compare; returns the result record."""
    rec = {"rows_match": False, "schema_match": False, "hash_match": False,
           "spark_rows": len(mine), "oracle_rows": len(ref), "err": None}
    mc = sorted(map(str.lower, mine.columns))
    rc = sorted(map(str.lower, ref.columns))
    if mc != rc:
        rec["err"] = f"columns {mc} vs {rc}"
        return rec
    rec["schema_match"] = True
    mine.columns = [c.lower() for c in mine.columns]
    ref.columns = [c.lower() for c in ref.columns]
    mine = mine[mc].sort_values(mc, na_position="first").reset_index(drop=True)
    ref = ref[mc].sort_values(mc, na_position="first").reset_index(drop=True)
    if len(mine) != len(ref):
        rec["err"] = f"rows {len(mine)} vs {len(ref)}"
        return rec
    rec["rows_match"] = True
    diffs = []
    for c in mc:
        a, b = mine[c], ref[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            a = a.astype(float)
            b = b.astype(float)
            bad = ~((a == b) | (a.isna() & b.isna()))
            if bad.any():
                diffs.append(f"col {c}: {int(bad.sum())} diffs, "
                             f"maxabs={(a - b).abs().max()}")
        else:
            bad = a.astype(str) != b.astype(str)
            if bad.any():
                i = bad.idxmax()
                diffs.append(f"col {c}: {int(bad.sum())} diffs "
                             f"e.g. {a.astype(str)[i]!r} vs {b.astype(str)[i]!r}")
    if diffs:
        rec["err"] = "; ".join(diffs)[:300]
    else:
        rec["hash_match"] = True
    return rec


results = {}
if os.path.exists(json_out):
    results = json.load(open(json_out))


def already_green(name):
    return results.get(name, {}).get("hash_match") is True


materialize()

fails = 0
for name in sorted(oracle):
    if only and name not in only:
        continue
    if already_green(name):
        print(f"SKIP {name} (already green in {json_out})", flush=True)
        continue
    try:
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            raise RuntimeError("no spark output")
        mine = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
        ref = (union_find_oracle(oracle[name]) if name in GRAPH
               else run_sql(rewrite(oracle[name]), QUERY_TIMEOUT_S))
        rec = compare(name, mine, ref)
    except Exception as e:  # oracle-side resource death != spark wrong
        rec = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None, "oracle_rows": None,
               "err": str(e)[:300]}
    if name in GRAPH:
        rec["method"] = "unionfind"
    results[name] = rec
    json.dump(results, open(json_out, "w"), indent=1)
    ok = rec["hash_match"]
    fails += 0 if ok else 1
    print(f"{'PASS' if ok else 'FAIL'} {name}"
          + (f" ({rec['spark_rows']} rows)" if ok else f": {rec['err']}"),
          flush=True)

n_green = sum(1 for r in results.values() if r.get("hash_match"))
print(f"{n_green}/{len(results)} green -> {json_out}"
      + ("" if fails == 0 else f" ({fails} not green this run)"))
sys.exit(1 if fails else 0)
