#!/bin/bash
# Closing bench: hunt a quiet window, run the full suite from the frozen
# final-tree class snapshot, accept if the run's own steal receipt is low.
set -u
CP="/root/repo/.close_classes:/opt/spark/jars/*"
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
steal() { awk '/^cpu /{print $9}' /proc/stat; }
for i in 1 2; do
  for w in $(seq 1 40); do
    s0=$(steal); sleep 30; s1=$(steal)
    if [ $((s1 - s0)) -lt 90 ]; then break; fi
  done
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 java -Xmx24g $OPENS -cp "$CP" graft.Bench \
    > /tmp/close_run$i.log 2>/tmp/close_run$i.err
  grep '"metric"' /tmp/close_run$i.log | tail -1 > /root/repo/bench_r15_final_run$i.json
  got=$(python3 -c "import json;print(json.load(open('/root/repo/bench_r15_final_run$i.json'))['steal_jiffies'])" 2>/dev/null || echo 999999)
  echo "run $i steal=$got"
  if [ "$got" -lt 15000 ] && [ "$i" -ge 2 ]; then break; fi
done
echo DONE
