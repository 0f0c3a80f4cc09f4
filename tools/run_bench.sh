#!/bin/bash
# Drive graft.Bench from the already-compiled classes (no sbt, so the
# in-progress working copy never recompiles mid-measurement).
# Usage: tools/run_bench.sh [sf_dir] [out_json]
set -euo pipefail
SF_DIR="${1:-/root/testdata/sf0.1}"
OUT="${2:-/root/repo/bench_full_local.json}"
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  -Djdk.reflect.useDirectMethodHandle=false \
  -Dio.netty.tryReflectionSetAccessible=true"
SPARK_GRAFT_SF_DIR="$SF_DIR" java -Xmx24g $OPENS -cp "$CP" graft.Bench \
  > /tmp/bench_stdout.log 2>/tmp/bench_stderr.log || {
    echo "bench failed; stderr tail:"; tail -20 /tmp/bench_stderr.log; exit 1; }
grep '"metric"' /tmp/bench_stdout.log | tail -1 > "$OUT"
cat "$OUT"
