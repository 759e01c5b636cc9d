#!/bin/bash
# Round-11 measurement tail: interleave [default, G1HeapRegionSize-pinned]
# full bench runs x5. The default runs double as the closing Spark pair
# (per-query min over 5 strictly-sequential same-tree runs); the pinned
# runs are the session-shaped G1 A/B the round-10 verdict asked for
# (ask #3) — interleaving means both configs sample the same weather.
set -u
cd /root/repo
OUT=/tmp/r11_pair
mkdir -p "$OUT"
for i in 1 2 3 4 5; do
  echo "=== default run $i $(date +%H:%M:%S) ==="
  python bench.py > "$OUT/default_$i.json" 2> "$OUT/default_$i.err"
  tail -c 120 "$OUT/default_$i.json"; echo
  echo "=== pinned run $i $(date +%H:%M:%S) ==="
  SPARK_GRAFT_DRIVER_JAVA_OPTIONS="-XX:G1HeapRegionSize=16m" \
    python bench.py > "$OUT/pinned_$i.json" 2> "$OUT/pinned_$i.err"
  tail -c 120 "$OUT/pinned_$i.json"; echo
done
echo ALL-DONE $(date +%H:%M:%S)
