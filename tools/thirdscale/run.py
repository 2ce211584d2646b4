#!/usr/bin/env python3
"""THIRD-scale oracle verification (r15 verdict #3): inflate sf0.1 Nx
(tools/stress/inflate.py -- salted keys, verbatim payloads), run
graft.Verify over the inflated corpus, compare EVERY oracle SQL in
DuckDB, and write a committed JSON artifact a future round can diff.

This is the run that catches order-dependent aggregates the sf0.01 /
sf0.1 gates cannot: more addends per group means more draws near a
rounding boundary (r20: part_revenue_topk passed BOTH gate scales and
landed one cent off at 2x -- the catch that drove the exact-integer
money rewrite).

DuckDB sharding recipe (the r19 caveat, baked in): concurrent compare
processes MUST NOT share a temp_directory (fatal IOException on
collision), so each worker gets its own spill dir; budget ~60 GB spill
headroom for the doc_similar pair-formulation oracles above 2x.

Usage:
  python3 tools/thirdscale/run.py 2                       # full 2x run
  python3 tools/thirdscale/run.py 2 --skip-inflate --skip-verify
  python3 tools/thirdscale/run.py 4 --workers 4
Artifacts: tools/thirdscale/thirdscale_{N}x_<tag>.json
"""
import json, math, os, subprocess, sys, time
from concurrent.futures import ProcessPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
N = int(sys.argv[1]) if len(sys.argv) > 1 else 2
ARGS = set(a for a in sys.argv[2:] if a.startswith("--"))
WORKERS = int(sys.argv[sys.argv.index("--workers") + 1]) \
    if "--workers" in sys.argv else 2
TAG = os.environ.get("THIRDSCALE_TAG", time.strftime("%Y%m%d"))
SRC = os.environ.get("THIRDSCALE_SRC", "/root/testdata/sf0.1")
SF_DIR = f"/tmp/graft_thirdscale_{N}x"
OUT = f"/tmp/graft_thirdscale_verify_{N}x"
ART = os.path.join(REPO, "tools", "thirdscale",
                   f"thirdscale_{N}x_{TAG}.json")

if "--skip-inflate" not in ARGS or not os.path.isdir(SF_DIR):
    print(f"== inflating {SRC} {N}x -> {SF_DIR}", flush=True)
    subprocess.run([sys.executable,
                    os.path.join(REPO, "tools", "stress", "inflate.py"),
                    str(N), SF_DIR, SRC], check=True)

if "--skip-verify" not in ARGS or not os.path.isdir(OUT):
    print(f"== running graft.Verify over {SF_DIR}", flush=True)
    t0 = time.time()
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {SF_DIR} {OUT}"],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "SPARK_GRAFT_CPUS": "16"})
    if r.returncode != 0:
        print(r.stdout[-4000:]); print(r.stderr[-4000:]); sys.exit(1)
    print(f"== verify done in {time.time() - t0:.0f}s", flush=True)

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
all_names = json.load(open(f"{OUT}/queries.json")) \
    if os.path.exists(f"{OUT}/queries.json") else []


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
    rows = [tuple(norm(v) for v in row)
            for row in df.itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple(
        (x is None, str(type(x)), x) for x in r))


def compare_chunk(chunk_id_and_names):
    """One worker: own DuckDB connection, own PRIVATE temp dir (the
    sharding recipe -- shared temp dirs collide fatally)."""
    chunk_id, names = chunk_id_and_names
    import duckdb, pandas as pd, glob
    tmp = f"/tmp/graft_thirdscale_duck_{N}x_{chunk_id}"
    os.makedirs(tmp, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"SET temp_directory='{tmp}'")
    # MEASURED (r21): do NOT set memory_limit, and bound threads — the
    # doc_similar_topk pair oracle at 2x runs 277s with ZERO spill at
    # threads=16/default memory, but spills > 79 GB (fatal on this box)
    # under 32 threads or an explicit memory_limit. Workers also split
    # the thread budget so concurrent heavy oracles don't stack RAM.
    con.sql(f"SET threads="
            f"{16 if chunk_id == 'retry' else max(4, 32 // WORKERS)}")
    for t in glob.glob(f"{SF_DIR}/*.parquet"):
        name = os.path.basename(t).replace(".parquet", "")
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")
    out = {}
    for name in names:
        path = f"{OUT}/{name}"
        t0 = time.time()
        if not os.path.isdir(path):
            out[name] = "fail: no spark output"; continue
        try:
            got = pd.read_parquet(path)
            want = con.sql(oracle[name]).df()
        except Exception as e:
            out[name] = f"fail: {str(e)[:200]}"; continue
        if sorted(got.columns) != sorted(want.columns):
            out[name] = (f"fail: cols spark={sorted(got.columns)} "
                         f"oracle={sorted(want.columns)}")
        elif len(got) != len(want):
            out[name] = f"fail: rows spark={len(got)} oracle={len(want)}"
        elif canon(got) != canon(want):
            bad = [(a, b) for a, b in zip(canon(got), canon(want))
                   if a != b][:2]
            out[name] = f"fail: values differ, e.g. {str(bad)[:300]}"
        else:
            out[name] = f"ok ({len(got)} rows, {time.time() - t0:.1f}s)"
        print(f"[{chunk_id}] {name}: {out[name]}", flush=True)
    return out

# round-robin by sorted name so the expensive pair-join oracles spread
names = sorted(oracle)
chunks = [(i, names[i::WORKERS]) for i in range(WORKERS)]
results = {}
with ProcessPoolExecutor(max_workers=WORKERS) as ex:
    for out in ex.map(compare_chunk, chunks):
        results.update(out)

# spill-failed oracles get one SERIAL retry with the whole box (the
# heavy pair-join formulations are disk-bound only under contention)
retry = [n for n, v in results.items()
         if v.startswith("fail") and ("No space left" in v
                                      or "IO Error" in v)]
if retry:
    print(f"== serial retry for {retry}", flush=True)
    results.update(compare_chunk(("retry", retry)))

rows_only = {}
import pandas as pd
for name in sorted(set(all_names) - set(oracle)):
    path = f"{OUT}/{name}"
    if not os.path.isdir(path):
        rows_only[name] = "fail: no spark output"
    else:
        try:
            n = len(pd.read_parquet(path))
            rows_only[name] = f"rows ({n})" if n else "warn: 0 rows"
        except Exception as e:
            rows_only[name] = f"fail: {str(e)[:200]}"

ok = sum(1 for v in results.values() if v.startswith("ok"))
artifact = {
    "scale": N, "src": SRC, "tag": TAG,
    "n_oracle": len(oracle), "n_oracle_ok": ok,
    "n_rows_only": len(rows_only),
    "oracle": results, "rows_only": rows_only,
}
os.makedirs(os.path.dirname(ART), exist_ok=True)
json.dump(artifact, open(ART, "w"), indent=1, sort_keys=True)
print(f"\n{ok}/{len(oracle)} oracle queries match at {N}x -> {ART}")
sys.exit(0 if ok == len(oracle) else 1)
