#!/usr/bin/env bash
# One-command scaling evidence (the BASELINE.json north rule, CI-shaped):
# host memory-bandwidth curve + the 1x1-core-vs-4x1-core local-cluster
# legs on the same input, emitted as ONE JSON of BASELINE.md table rows —
# so a code change can't silently regress the 0.95/0.96 numbers.
#
# MUST run SOLO on an idle host (round-4 finding: a 4x1 leg overlapping a
# concurrent local[32] job came in 1.8x slower on every phase). The
# script refuses to start if load average says otherwise; override with
# SPARK_GRAFT_FORCE=true.
#
# Usage: tools/scaling_evidence.sh [OUT_DIR]   (default /tmp/scaling_evidence)
# Env:   SPARK_GRAFT_EDGES_DIR  edge parquet (default the cached dense
#                               137M-edge table /tmp/graft_scaling/edges_b5000_c32)
#        SPARK_GRAFT_PR_ITERS   PageRank iterations per leg (default 20)
#        SPARK_GRAFT_MAX_SS     hedonic superstep cap (default 30)
# Requires `sbt compile` first (runs from target/scala-2.13/classes).
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/scaling_evidence}
mkdir -p "$OUT"
EDGES=${SPARK_GRAFT_EDGES_DIR:-/tmp/graft_scaling/edges_b5000_c32}
[ -d "$EDGES" ] || { echo "edge table $EDGES missing" >&2; exit 1; }

LOAD=$(cut -d' ' -f1 /proc/loadavg)
if [ "${SPARK_GRAFT_FORCE:-false}" != "true" ] && \
   python3 -c "import sys; sys.exit(0 if float('$LOAD') > 2.0 else 1)"; then
  echo "host not idle (load $LOAD > 2.0) - legs must run solo; set SPARK_GRAFT_FORCE=true to override" >&2
  exit 1
fi

# 1) hardware denominator: triad bandwidth at the leg thread counts
( cd tools/membw && javac -encoding UTF-8 MemBw.java )
: > "$OUT/membw.txt"
for t in 1 4; do
  ( cd tools/membw && java -Xmx8g MemBw "$t" 192 5 ) | tee -a "$OUT/membw.txt"
done

# 2) both legs, back-to-back, same input, shared CSR pack
SPARK_GRAFT_WORKERS_LIST="1 4" SPARK_GRAFT_CORES_PER_WORKER=1 \
SPARK_GRAFT_EDGES_DIR="$EDGES" SPARK_GRAFT_SHARE_PACK=true \
SPARK_GRAFT_PR_ITERS="${SPARK_GRAFT_PR_ITERS:-20}" \
SPARK_GRAFT_MAX_SS="${SPARK_GRAFT_MAX_SS:-30}" \
SPARK_GRAFT_STEP_TIMING=true \
  tools/scaling_cluster.sh "$OUT"

# 3) one JSON: throughput at N and 4N, efficiency, membw normalization
python3 - "$OUT" <<'EOF'
import json, re, pathlib, sys
out = pathlib.Path(sys.argv[1])
a = json.loads((out / "cluster_1.json").read_text())
b = json.loads((out / "cluster_4.json").read_text())
bw = dict(re.findall(r"threads=(\d+) triad_GBps=([\d.]+)",
                     (out / "membw.txt").read_text()))
bw = {int(k): float(v) for k, v in bw.items()}
bw_ratio = bw.get(4, 0) / bw[1] if bw.get(1) else None
rows = {}
for metric in ("hedonic_iter_edges_per_sec", "hedonic_iter_supersteps_per_sec",
               "pagerank_iter_edges_per_sec"):
    if a.get(metric) and b.get(metric):
        sp = b[metric] / a[metric]
        rows[metric] = {"n1": a[metric], "n4": b[metric],
                        "speedup": round(sp, 3), "efficiency": round(sp / 4, 3)}
for phase in ("shared_pack_sec", "hedonic_build_sec", "pagerank_build_sec"):
    if a.get(phase) and b.get(phase):
        sp = a[phase] / b[phase]
        rows[phase] = {"n1": a[phase], "n4": b[phase],
                       "speedup": round(sp, 3), "efficiency": round(sp / 4, 3)}
evidence = {
    "legs": "local-cluster 1x1-core vs 4x1-core (separate executor JVMs)",
    "edges": a.get("edges"), "vertices": a.get("vertices"),
    "hedonic_supersteps": a.get("hedonic_supersteps"),
    "pagerank_iters": a.get("pagerank_iters"),
    "membw_GBps": bw, "membw_1_to_4_ratio": round(bw_ratio, 3) if bw_ratio else None,
    "rows": rows,
}
p = out / "evidence.json"
p.write_text(json.dumps(evidence, indent=2) + "\n")
print(p.read_text())
EOF
