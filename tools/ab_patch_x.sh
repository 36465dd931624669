#!/bin/bash
# patch_x A/B on the chip: 32 (default re-check), 24, 16. Serialized.
cd /root/repo
OUT=docs/bench_logs/ab_patch_x_r4.log
: > $OUT
for PX in 32 24 16; do
  echo "=== BENCH_PATCH_X=$PX $(date -u +%H:%M:%S) ===" >> $OUT
  BENCH_PATCH_X=$PX timeout 1200 python bench.py >> $OUT 2>&1
  echo "rc=$?" >> $OUT
done
echo "DONE $(date -u +%H:%M:%S)" >> $OUT
