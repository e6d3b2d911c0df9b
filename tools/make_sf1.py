#!/usr/bin/env python3
"""Synthesize a 10x stress set ("sf1") from the driver's sf0.1 tables.

One-off boundary-flush harness (the round-4 precedent: a real .005
rounding-boundary bug surfaced only at 10x the oracle's usual scale):
ten key-offset copies of every fact table, dims kept as-is, so all FK
relationships stay intact and every query/oracle pair runs unmodified
against the bigger directory. Duplicated documents/embeddings are exact
dup floods — realistic crawl behavior the dedup caps must absorb.

Usage: python3 tools/make_sf1.py [srcDir] [dstDir] [copies]
"""
import duckdb, os, sys

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
os.makedirs(dst, exist_ok=True)

con = duckdb.connect()
con.sql(f"CREATE VIEW c AS SELECT unnest(generate_series(0, {n - 1})) AS i")

# per-table key-offset spec: column -> per-copy stride (disjoint ranges)
OFF = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": 10_000_000},
    "supplier": {"s_suppkey": 100_000},
    "part": {"p_partkey": 1_000_000},
    "orders": {"o_orderkey": 100_000_000, "o_custkey": 10_000_000},
    "lineitem": {"l_orderkey": 100_000_000, "l_partkey": 1_000_000,
                 "l_suppkey": 100_000},
    "events": {"event_id": 10_000_000, "user_id": 10_000_000},
    "documents": {"doc_id": 100_000},
    "embeddings": {"vec_id": 100_000},
}

for t, off in OFF.items():
    cols = [c[0] for c in con.sql(
        f"describe select * from '{src}/{t}.parquet'").fetchall()]
    if not off:  # dims: single copy, FKs (nationkey/regionkey) stay valid
        con.sql(f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    else:
        sel = ", ".join(
            f"({c} + i * {off[c]})::BIGINT AS {c}" if c in off else c
            for c in cols)
        con.sql(f"COPY (SELECT {sel} FROM '{src}/{t}.parquet' CROSS JOIN c) "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    rows = con.sql(f"select count(*) from '{dst}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {rows} rows")
print(f"done -> {dst}")
