#!/usr/bin/env python3
"""Single-query iteration aid: run graft.Verify for a comma-separated
query subset, then compare just those against their DuckDB oracles.
Usage: python3 tools/check_one.py q1,q2 [sfDir]"""
import json, math, subprocess, sys, glob, os

NAMES = sys.argv[1].split(",")
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
OUT = "/tmp/graft_verify_one"

r = subprocess.run(
    ["sbt", "-batch", f'runMain graft.Verify {SF_DIR} {OUT} {sys.argv[1]}'],
    capture_output=True, text=True, cwd="/root/repo",
    env={**os.environ, "SPARK_GRAFT_CPUS": "8"})
if r.returncode != 0:
    print(r.stdout[-4000:]); print(r.stderr[-4000:]); sys.exit(1)
for line in r.stderr.splitlines():
    if "[verify]" in line:
        print(line)

import duckdb, pandas as pd
con = duckdb.connect()
for t in glob.glob(f"{SF_DIR}/*.parquet"):
    name = os.path.basename(t).replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, float):
            return round(v, 9)
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, (list, tuple)):
            return tuple(norm(x) for x in v)
        return v
    rows = [tuple(norm(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple((x is None, str(type(x)), x) for x in r))

fails = 0
for name in NAMES:
    path = f"{OUT}/{name}"
    if not os.path.isdir(path):
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    if name not in oracle:
        n = len(pd.read_parquet(path))
        print(f"ROWS {name} ({n} rows, no oracle)"); continue
    try:
        got = pd.read_parquet(path)
        want = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    if sorted(got.columns) != sorted(want.columns):
        print(f"FAIL {name}: cols spark={sorted(got.columns)} oracle={sorted(want.columns)}")
        fails += 1; continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows spark={len(got)} oracle={len(want)}")
        fails += 1; continue
    g, w = canon(got), canon(want)
    if g != w:
        bad = [(a, b) for a, b in zip(g, w) if a != b][:3]
        print(f"FAIL {name}: values differ, e.g. {bad}")
        fails += 1; continue
    print(f"OK   {name} ({len(got)} rows)")
sys.exit(1 if fails else 0)
