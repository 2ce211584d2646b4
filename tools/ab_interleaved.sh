#!/bin/bash
# Interleaved A/B of the WORKING TREE vs HEAD on a bench filter set.
# A = HEAD (stash), B = working tree. usage: ab_interleaved.sh <filter> [rounds]
set -e
F="$1"; N="${2:-2}"
cd /root/repo
for round in $(seq 1 "$N"); do
  git stash -q
  sbt compile -batch >/dev/null 2>&1
  SPARK_GRAFT_BENCH_FILTER="$F" SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_OUT="/tmp/abx_A_$round.json" \
    sbt -batch 'runMain graft.Bench' >/dev/null 2>&1 || true
  git stash pop -q
  sbt compile -batch >/dev/null 2>&1
  SPARK_GRAFT_BENCH_FILTER="$F" SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_OUT="/tmp/abx_B_$round.json" \
    sbt -batch 'runMain graft.Bench' >/dev/null 2>&1 || true
  echo "round $round done"
done
python3 - "$N" <<'PYEOF'
import json, sys
n = int(sys.argv[1])
def mins(tag):
    runs = []
    for i in range(1, n + 1):
        try:
            for l in open(f'/tmp/abx_{tag}_{i}.json'):
                d = json.loads(l)
                if 'queries' in d:
                    runs.append(d)
        except FileNotFoundError:
            pass
    cold = {k: min(r['queries'][k] for r in runs) for k in runs[0]['queries']}
    warm = {}
    for k in runs[0].get('warm', {}):
        vs = [r['warm'][k] for r in runs if k in r.get('warm', {})]
        if vs:
            warm[k] = min(vs)
    return cold, warm
ca, wa = mins('A')
cb, wb = mins('B')
print(f"{'query':34} {'A.cold':>7} {'B.cold':>7} {'A.warm':>7} {'B.warm':>7}")
for k in sorted(ca):
    print(f"{k:34} {ca[k]:7.2f} {cb.get(k,0):7.2f} "
          f"{wa.get(k,0):7.2f} {wb.get(k,0):7.2f}")
print('A cold sum', round(sum(ca.values()),1), ' B cold sum', round(sum(cb.values()),1))
PYEOF
