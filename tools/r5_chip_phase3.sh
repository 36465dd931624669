#!/bin/bash
# Round-5 chip phase 3 (after the goal 10k run): W-cast bench A/B, 2048
# anomaly recheck, hierarchy run with the stalling-sign fix, goal eval.
#   nohup bash tools/r5_chip_phase3.sh > /tmp/r5_phase3.log 2>&1 &
cd "$(dirname "$0")/.."

echo "=== bench default (bf16-W) 4096 $(date +%H:%M:%S) ==="
timeout 1200 python bench.py
echo "rc=$?"
echo "=== bench default 2048 recheck $(date +%H:%M:%S) ==="
BENCH_NUM_ENVS=2048 timeout 1200 python bench.py
echo "rc=$?"
echo "=== pms bench 4096 (quadform survives) $(date +%H:%M:%S) ==="
BENCH_PMS=1 timeout 1200 python bench.py
echo "rc=$?"

echo "=== goal eval_reached (best ckpt, final dist) $(date +%H:%M:%S) ==="
timeout 3600 python scripts/eval_reached.py --logdir runs/goal_r5_10k --ckpt ac_weights_best.pkl 2>&1 | tail -8
echo "rc=$?"
echo "=== goal eval_reached at 1.6 m $(date +%H:%M:%S) ==="
timeout 3600 python scripts/eval_reached.py --logdir runs/goal_r5_10k --ckpt ac_weights_best.pkl --target_dist 1.6 2>&1 | tail -8
echo "rc=$?"

echo "=== hierarchy 1024x10k (stalling-sign fix) $(date +%H:%M:%S) ==="
timeout 14400 python scripts/train_hierarchy.py --num_envs 1024 --iterations 10000 \
  --logdir runs/hier_r5_10k 2>&1 | tail -30
echo "rc=$?"
echo "=== phase3 done $(date +%H:%M:%S) ==="
