#!/usr/bin/env python3
"""Synthesized scale-stress corpus (r15, r14 verdict #2): replicate the
sf0.1 tables N x with SALTED KEYS and VERBATIM payloads, producing the
mirror-crawl pathology at a scale where the occupancy caps engage
organically (every replica of a document is an exact near-dup of every
other -- the worst case the LSH/occupancy-cap design argues it degrades
gracefully under).

Key salting keeps every invariant the operators rely on:
  documents   doc_id' = doc_id + k*1e9            (text/lang/source verbatim)
  embeddings  vec_id' = vec_id + k*1e9            (vector/label verbatim)
  events      user_id' = user_id + k*1e9          (-> new segments; sequence
              event_id' = event_id + k*1e9         is DERIVED per segment, so
                                                   contiguity holds by
                                                   construction)
  customer    c_custkey' = c_custkey + k*1e9
  orders      o_orderkey' = o_orderkey + k*1e9, o_custkey' likewise
  lineitem    l_orderkey' = l_orderkey + k*1e9    (part/supp keys unchanged
                                                   -- dims are not inflated)
  region/nation/part/supplier copied as-is (dimension tables).

Replica k=0 is the original byte-for-byte, so every 1x result is a
subset of the inflated corpus's world.

Usage: python3 tools/stress/inflate.py N OUTDIR   (e.g. 20 /tmp/graft_sf2.0)
"""
import sys, os, duckdb

N = int(sys.argv[1])
OUT = sys.argv[2]
SRC = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
OFF = 10**9
os.makedirs(OUT, exist_ok=True)

con = duckdb.connect()
con.sql(f"CREATE TABLE reps AS SELECT unnest(range({N})) AS k")

def inflate(table, salted_cols, cast_int=()):
    src = f"'{SRC}/{table}.parquet'"
    cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM {src}").fetchall()]
    sel = []
    for c in cols:
        if c in salted_cols:
            expr = f"t.{c} + reps.k * {OFF}"
            if c in cast_int:
                expr = f"CAST({expr} AS INTEGER)"
            sel.append(f"{expr} AS {c}")
        else:
            sel.append(f"t.{c}")
    q = f"COPY (SELECT {', '.join(sel)} FROM {src} t CROSS JOIN reps) " \
        f"TO '{OUT}/{table}.parquet' (FORMAT PARQUET)"
    con.sql(q)
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows ({N}x)")

def copy(table):
    con.sql(f"COPY (SELECT * FROM '{SRC}/{table}.parquet') "
            f"TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    print(f"{table}: copied")

inflate("documents", {"doc_id"})
inflate("embeddings", {"vec_id"})
inflate("events", {"event_id", "user_id"})
inflate("customer", {"c_custkey"})
inflate("orders", {"o_orderkey", "o_custkey"})
inflate("lineitem", {"l_orderkey"})
for t in ["region", "nation", "part", "supplier"]:
    copy(t)
print(f"done: {OUT} at {N}x {SRC}")
