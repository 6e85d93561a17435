#!/usr/bin/env bash
# Host memory-bandwidth scaling curve (see MemBw.java). Prints triad GB/s
# at 1/2/4/8/16/32 threads — the hardware ceiling against which the
# N-vs-4N job-scaling legs in tools/scaling_cluster.sh are normalized.
set -euo pipefail
cd "$(dirname "$0")"
javac -encoding UTF-8 MemBw.java
for t in 1 2 4 8 16 32; do
  java -Xmx24g MemBw "$t" 192 5
done
