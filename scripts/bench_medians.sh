#!/usr/bin/env bash
# Pinned headline-bench protocol (round 10, VERDICT r9 item 6): N full
# passes of graft.Bench in ONE serialized chain — quiesce is built into
# the Bench main, the query order is fixed by Bench.headline, and NO pass
# is cherry-picked: the artifact records every pass total in a `runs`
# field and the headline is the per-query MEDIAN across passes, whatever
# it comes out to be.
#
# Usage: scripts/bench_medians.sh [outJson]   (BENCH_PASSES=3 by default)
set -euo pipefail
N="${BENCH_PASSES:-3}"
OUT="${1:-BENCH_MEDIANS_r10.json}"
SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
tmp=$(mktemp -d)
trap 'rm -rf "$tmp"' EXIT
sbt -batch compile > /dev/null
for i in $(seq 1 "$N"); do
  echo "[medians] pass $i/$N" >&2
  SPARK_GRAFT_SF_DIR="$SF" sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep -F '"metric"' | sed 's/^\[info\] //' > "$tmp/pass$i.json"
done
python3 - "$OUT" "$tmp" "$N" <<'EOF'
import json, sys, statistics, glob
out, tmp, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
passes = [json.load(open(f)) for f in sorted(glob.glob(tmp + "/pass*.json"))]
names = list(passes[0]["queries"].keys())
med = {q: statistics.median([p["queries"][q] for p in passes]) for q in names}
doc = dict(passes[-1])          # carry detail/env fields from the last pass
doc["queries"] = med
doc["value"] = sum(med.values())
doc["runs"] = [p["value"] for p in passes]
doc["protocol"] = (
    f"median per query across {n} full Bench passes (each itself a "
    "median of runs_per_query samples), fixed Bench.headline order, one "
    "serialized chain, no pass selection; all pass totals in 'runs'")
json.dump(doc, open(out, "w"))
print(json.dumps({"total": round(doc["value"], 3), "runs": doc["runs"]}))
EOF
