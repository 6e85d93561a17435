#!/usr/bin/env bash
# Scaling-evidence harness (BASELINE.json north rule): run the identical
# job — repo-table synthesis + sha stamp + co-occurrence extraction +
# hedonic to convergence + PageRank — at two parallelism levels, local[8]
# ("N") and local[32] ("4N"), on the same deterministic input, and report
# throughput at both plus the scaling efficiency.
#
# Usage: tools/scaling.sh [OUT_DIR] ; graph size via SPARK_GRAFT_BENCH_BLOCKS.
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/scaling}
mkdir -p "$OUT"
for CPUS in 8 32; do
  echo "=== local[$CPUS] ==="
  SPARK_GRAFT_CPUS=$CPUS \
    sbt -batch "runMain graft.ScalingBench" 2>/dev/null \
    | grep -o '{"cpus".*}' | tee "$OUT/scaling_$CPUS.json"
done
python3 - "$OUT" <<'EOF'
import json, sys, pathlib
out = pathlib.Path(sys.argv[1])
a = json.loads((out/"scaling_8.json").read_text())
b = json.loads((out/"scaling_32.json").read_text())
for metric in ("hedonic_edges_per_sec", "pagerank_edges_per_sec"):
    sp = b[metric] / a[metric]
    eff = sp / 4.0
    print(f"{metric}: N(8)={a[metric]:.0f}/s 4N(32)={b[metric]:.0f}/s "
          f"speedup={sp:.2f}x efficiency={eff:.2f}")
EOF
