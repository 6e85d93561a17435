#!/usr/bin/env bash
# Multi-JVM scaling evidence (BASELINE.json north rule): the SAME full
# pipeline at N and 4N EXECUTOR PROCESSES via Spark's local-cluster mode —
# separate executor JVMs with their own heaps, shuffle-IO paths and torrent
# broadcast, i.e. the honest sandbox stand-in for "spark-submit on a
# multi-executor cluster at N and 4N executors". Contrast tools/
# scaling_java.sh, the single-JVM local[8]-vs-local[32] proxy.
#
# Default legs: 2 workers x 4 cores (N=8 cores) vs 8 workers x 4 cores
# (4N=32). That shape puts 32 cores on this single-socket host at the big
# leg, where the measured DRAM ceiling (tools/membw, BASELINE.md round 4)
# caps ANY memory-traffic workload at ~1.5x from 8 to 32 threads. For the
# bandwidth-proportional regime a real 4N-executor cluster provides by
# construction, use SPARK_GRAFT_WORKERS_LIST="1 4" with
# SPARK_GRAFT_CORES_PER_WORKER=1 (1 executor vs 4, where the host's
# bandwidth scales at 0.95 across the pair).
#
# Env knobs: SPARK_GRAFT_WORKERS_LIST ("2 8"), SPARK_GRAFT_CORES_PER_WORKER
# (4), SPARK_GRAFT_WORKER_MB (12288), plus everything ScalingBench reads
# (SPARK_GRAFT_EDGES_DIR to reuse a pre-extracted edge parquet,
# SPARK_GRAFT_MAX_SS, SPARK_GRAFT_SKIP_PR / SPARK_GRAFT_SKIP_HED, ...).
# Requires `sbt compile` first. Usage: tools/scaling_cluster.sh [OUT_DIR]
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/scaling_cluster}
mkdir -p "$OUT"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
CP="target/scala-2.13/classes:/opt/spark/jars/*"
EXEC_MEM_MB=${SPARK_GRAFT_WORKER_MB:-12288}
CPW=${SPARK_GRAFT_CORES_PER_WORKER:-4}
WORKERS_LIST=${SPARK_GRAFT_WORKERS_LIST:-"2 8"}
for WORKERS in $WORKERS_LIST; do
  CORES=$((WORKERS * CPW))
  echo "=== local-cluster[$WORKERS,$CPW,$EXEC_MEM_MB] ($CORES cores) ==="
  SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  SPARK_GRAFT_MASTER="local-cluster[$WORKERS,$CPW,$EXEC_MEM_MB]" \
  SPARK_GRAFT_EXEC_MEM="${EXEC_MEM_MB}m" \
  SPARK_GRAFT_CPUS=$CORES \
    java $ADD_OPENS -Xmx${SPARK_DRIVER_MEM:-10g} \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Dspark.network.timeout=600s \
    -Dspark.cleaner.periodicGC.interval=2min \
    -cp "$CP" graft.ScalingBench 2>"$OUT/cluster_$WORKERS.err" \
    | grep -o '{"cpus".*}' | tee "$OUT/cluster_$WORKERS.json"
done
set -- $WORKERS_LIST
# Single-leg runs (probes) have nothing to compare — and "$2" would trip
# `set -u`.
if [ $# -lt 2 ]; then exit 0; fi
python3 - "$OUT" "$1" "$2" "$CPW" <<'EOF'
import json, sys, pathlib
out = pathlib.Path(sys.argv[1])
a = json.loads((out/f"cluster_{sys.argv[2]}.json").read_text())
b = json.loads((out/f"cluster_{sys.argv[3]}.json").read_text())
la, lb, cpw = sys.argv[2], sys.argv[3], sys.argv[4]
ratio = int(lb) / int(la)
for metric in ("hedonic_edges_per_sec", "hedonic_iter_edges_per_sec",
               "pagerank_edges_per_sec", "pagerank_iter_edges_per_sec"):
    if a.get(metric, 0) and b.get(metric, 0):
        sp = b[metric] / a[metric]
        print(f"{metric}: N({la}x{cpw})={a[metric]:.0f}/s "
              f"4N({lb}x{cpw})={b[metric]:.0f}/s "
              f"speedup={sp:.2f}x efficiency={sp/ratio:.2f}")
# Build phases scale differently from iterations (shuffle-bound one-time
# cost); report them alongside so the table in BASELINE.md is one paste.
for phase in ("hedonic_build_sec", "pagerank_build_sec"):
    if a.get(phase, 0) and b.get(phase, 0):
        sp = a[phase] / b[phase]
        print(f"{phase}: N={a[phase]:.1f}s 4N={b[phase]:.1f}s "
              f"speedup={sp:.2f}x efficiency={sp/ratio:.2f}")
EOF
