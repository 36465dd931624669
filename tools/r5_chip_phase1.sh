#!/bin/bash
# Round-5 chip phase 1: bench A/B ladder for the perf restructures.
#   nohup bash tools/r5_chip_phase1.sh > /tmp/r5_phase1.log 2>&1 &
# One chip process at a time; each bench does its own 2-warmup protocol.
cd "$(dirname "$0")/.."

run() {
  echo "=== $1 $(date +%H:%M:%S) ==="
  shift
  timeout 1200 env "$@" python bench.py
  echo "rc=$?"
}

run "default r5 4096"
run "interleaved OFF 4096"      BENCH_INTERLEAVED=0
run "ppo-new OFF 4096"          BENCH_SHUFFLE=0 BENCH_WINDOW=0
run "all r4 paths 4096"         BENCH_INTERLEAVED=0 BENCH_SHUFFLE=0 BENCH_WINDOW=0
run "default r5 2048"           BENCH_NUM_ENVS=2048
run "default r5 8192"           BENCH_NUM_ENVS=8192
run "default r5 16384"          BENCH_NUM_ENVS=16384
echo "=== phase1 done $(date +%H:%M:%S) ==="
