#!/bin/bash
# Run the full bench 3x from the frozen r14 class snapshot; record each.
set -u
CP="/root/repo/.anchor_r14_classes:/opt/spark/jars/*"
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
for i in 2 3 4; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 java -Xmx24g $OPENS -cp "$CP" graft.Bench \
    > /tmp/anchor_run$i.log 2>/tmp/anchor_run$i.err
  grep '"metric"' /tmp/anchor_run$i.log | tail -1 > /root/repo/bench_anchor_r15_run$i.json
  sleep 10
done
echo DONE
