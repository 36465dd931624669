#!/bin/bash
# Round-5 chip phase 4: A3-merge A/B, env-count knee regen, windowed-history
# at the knee extreme.
#   nohup bash tools/r5_chip_phase4.sh > /tmp/r5_phase4.log 2>&1 &
cd "$(dirname "$0")/.."

run() {
  echo "=== $1 $(date +%H:%M:%S) ==="
  shift
  timeout 1800 env "$@" python bench.py
  echo "rc=$?"
}

run "two-dot stage2 (BENCH_MERGE3=0) 4096"  BENCH_MERGE3=0
run "knee 8192 default"                     BENCH_NUM_ENVS=8192
run "knee 16384 default"                    BENCH_NUM_ENVS=16384
run "knee 16384 windowed history"           BENCH_NUM_ENVS=16384 BENCH_WINDOW=1
run "knee 16384 cheap shuffle"              BENCH_NUM_ENVS=16384 BENCH_SHUFFLE=1
echo "=== phase4 done $(date +%H:%M:%S) ==="
