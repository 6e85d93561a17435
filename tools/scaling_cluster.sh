#!/usr/bin/env bash
# Multi-JVM scaling evidence (BASELINE.json north rule): the SAME full
# pipeline at N and 4N EXECUTOR PROCESSES via Spark's local-cluster mode —
# separate executor JVMs with their own heaps, shuffle-IO paths and torrent
# broadcast, i.e. the honest sandbox stand-in for "spark-submit on a
# multi-executor cluster at N and 4N executors". Contrast tools/
# scaling_java.sh, the single-JVM local[8]-vs-local[32] proxy.
#
# Legs: 2 workers x 4 cores (N=8 cores) vs 8 workers x 4 cores (4N=32).
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
# Executor-process counts for the two legs (N and 4N executors). The
# default 2-vs-8 puts 32 cores on the host at the big leg — the mandated
# shape, but DRAM-saturated on this single-socket box; 1-vs-4 (4 vs 16
# cores) keeps per-executor memory bandwidth roughly constant across the
# legs, which is what a real 4N-executor cluster provides by construction.
WORKERS_LIST=${SPARK_GRAFT_WORKERS_LIST:-"2 8"}
for WORKERS in $WORKERS_LIST; do
  CORES=$((WORKERS * 4))
  echo "=== local-cluster[$WORKERS,4,$EXEC_MEM_MB] ($CORES cores) ==="
  SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  SPARK_GRAFT_MASTER="local-cluster[$WORKERS,4,$EXEC_MEM_MB]" \
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
python3 - "$OUT" "$1" "$2" <<'EOF'
import json, sys, pathlib
out = pathlib.Path(sys.argv[1])
a = json.loads((out/f"cluster_{sys.argv[2]}.json").read_text())
b = json.loads((out/f"cluster_{sys.argv[3]}.json").read_text())
for metric in ("hedonic_edges_per_sec", "hedonic_iter_edges_per_sec",
               "pagerank_edges_per_sec", "pagerank_iter_edges_per_sec"):
    if a.get(metric, 0) and b.get(metric, 0):
        sp = b[metric] / a[metric]
        print(f"{metric}: N(2x4)={a[metric]:.0f}/s 4N(8x4)={b[metric]:.0f}/s "
              f"speedup={sp:.2f}x efficiency={sp/4.0:.2f}")
EOF
