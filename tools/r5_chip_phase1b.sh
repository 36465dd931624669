#!/bin/bash
# Round-5 chip phase 1b: isolate each new path at 4096 envs after the
# wp=128 lane-full fix to the interleaved table.
#   nohup bash tools/r5_chip_phase1b.sh > /tmp/r5_phase1b.log 2>&1 &
cd "$(dirname "$0")/.."

run() {
  echo "=== $1 $(date +%H:%M:%S) ==="
  shift
  timeout 1200 env "$@" python bench.py
  echo "rc=$?"
}

run "interleaved128 only"   BENCH_SHUFFLE=0 BENCH_WINDOW=0
run "shuffle only"          BENCH_INTERLEAVED=0 BENCH_WINDOW=0
run "window only"           BENCH_INTERLEAVED=0 BENCH_SHUFFLE=0
run "all new (wp128)"
echo "=== phase1b done $(date +%H:%M:%S) ==="
