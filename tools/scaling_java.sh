#!/usr/bin/env bash
# Same job as tools/scaling.sh but launched via plain `java` against the
# compiled classes (sbt stays free for iteration). Requires `sbt compile`
# first. Usage: tools/scaling_java.sh [OUT_DIR]
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/scaling}
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
for CPUS in 8 32; do
  echo "=== local[$CPUS] ==="
  SPARK_GRAFT_CPUS=$CPUS \
    java $ADD_OPENS -Xmx${SPARK_DRIVER_MEM:-32g} \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Dspark.network.timeout=600s \
    -Dspark.cleaner.periodicGC.interval=2min \
    -cp "$CP" graft.ScalingBench 2>"$OUT/scaling_$CPUS.err" \
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
