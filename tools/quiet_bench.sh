#!/bin/bash
# Hunt a quiet window: sample host steal; when the 30s rate is low,
# run the full bench; accept the run only if its own steal receipt is
# under the bar. Up to $MAX_TRIES attempts.
set -u
SF_DIR="${1:-/root/testdata/sf0.1}"
OUT="${2:-/root/repo/bench_anchor_r15_quiet.json}"
BAR="${3:-15000}"
MAX_TRIES="${4:-6}"
steal() { awk '/^cpu /{print $9}' /proc/stat; }
for i in $(seq 1 "$MAX_TRIES"); do
  # wait for a quiet 30s window (rate < 3 jiffies/s), up to 20 min
  for w in $(seq 1 40); do
    s0=$(steal); sleep 30; s1=$(steal)
    rate=$(( (s1 - s0) ))
    if [ "$rate" -lt 90 ]; then break; fi
  done
  echo "try $i: launching at 30s-steal=$rate"
  /root/repo/tools/run_bench.sh "$SF_DIR" /tmp/quiet_try.json || continue
  got=$(python3 -c "import json;print(json.load(open('/tmp/quiet_try.json'))['steal_jiffies'])")
  echo "try $i: run steal_jiffies=$got"
  if [ "$got" -lt "$BAR" ]; then
    cp /tmp/quiet_try.json "$OUT"
    echo "accepted as $OUT"
    exit 0
  fi
done
echo "no quiet window found in $MAX_TRIES tries"
exit 1
