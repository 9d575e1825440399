#!/usr/bin/env python3
"""Deterministic sf1 scale-up of the driver's sf0.1 testdata (dev tool,
round-6 verdict task: "one full-contract run at sf1"). The driver ships
sf{0.001,0.01,0.1} only; this replicates sf0.1 tenfold with
replica-offset key remapping so every key space grows 10x while
referential integrity, value distributions, and dimension tables are
preserved exactly:

  - region/nation: copied (fixed dimensions, as in TPC-H at every SF)
  - customer/supplier/part/orders/lineitem/events/documents/embeddings:
    10 replicas; every key/foreign key k becomes k + r*ceil(table) where
    ceil = max key + 1 of the source table - disjoint, collision-free,
    and deterministic (no RNG anywhere)

Non-key columns are copied verbatim, so per-row statistics (Benford
digits, token distributions, price curves) match sf0.1 exactly and any
super-linear runtime at sf1 is attributable to the PLAN, not to a
distribution shift. Text/embeddings replicate verbatim too: each source
doc yields 10 exact clones across replicas - clusters of size 10, the
realistic dup structure a crawled corpus has, and a live stress of the
dedup caps at scale.

Usage: python3 tools/make_sf1.py [outDir]   (default /root/repo/scratch/sf1)
"""
import sys, os
import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scratch/sf1"
R = 10  # replicas

con = duckdb.connect()
os.makedirs(OUT, exist_ok=True)

def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"

def ceil_of(t, key):
    return con.execute(f"SELECT max({key}) + 1 FROM {src(t)}").fetchone()[0]

C = ceil_of("customer", "c_custkey")
S = ceil_of("supplier", "s_suppkey")
P = ceil_of("part", "p_partkey")
O = ceil_of("orders", "o_orderkey")
E = ceil_of("events", "event_id")
U = ceil_of("events", "user_id")
D = ceil_of("documents", "doc_id")
V = ceil_of("embeddings", "vec_id")

def emit(t, remap):
    # Preserve the source's exact column ORDER (SchemaContractsSpec pins
    # it) - build the select list from the parquet schema, remapping only
    # the key columns.
    cols = [r[0] for r in
            con.execute(f"DESCRIBE SELECT * FROM {src(t)}").fetchall()]
    sel = ", ".join(
        f"{c} + r*{remap[c]} AS {c}" if c in remap else c for c in cols)
    q = (f"COPY (SELECT {sel} FROM {src(t)}, generate_series(0, {R-1}) g(r) "
         f"ORDER BY r) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    con.execute(q)
    n = con.execute(f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n} rows")

for t in ("region", "nation"):
    con.execute(f"COPY (SELECT * FROM {src(t)}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    print(t, "copied")

emit("customer", {"c_custkey": C})
emit("supplier", {"s_suppkey": S})
emit("part", {"p_partkey": P})
emit("orders", {"o_orderkey": O, "o_custkey": C})
emit("lineitem", {"l_orderkey": O, "l_partkey": P, "l_suppkey": S})
emit("events", {"event_id": E, "user_id": U})
emit("documents", {"doc_id": D})
emit("embeddings", {"vec_id": V})
print("done:", OUT)
