#!/bin/bash
# Staged-sigma velocity/MoB training recipe (docs/TRAINING_NOTES.md).
#
# Why staged: the reference's as-committed ji22 shaping (sigma_rew_neg=0.02)
# passes usable positive-reward signal only once the per-step negative sum is
# above ~-0.05 (rew = pos * exp(neg/sigma)); a cold-start policy sits at
# ~-0.27/step, so 0.02 is a fine-tuning regime, not a cold-start one.  The
# stages anneal sigma 0.5 -> 0.1 -> 0.02 as the gait cleans up, each resuming
# the previous stage's checkpoint; entropy is dropped to 0 after stage 1 and
# the std ceiling guards against entropy-driven inflation throughout.
#
# Run on the chip (ONE chip process at a time):
#   nohup bash tools/velocity_recipe.sh > /tmp/vel_recipe.log 2>&1 &
set -e
cd "$(dirname "$0")/.."
ENVS=${ENVS:-2048}
S1=${S1:-1500}; S2=${S2:-1000}; S3=${S3:-1500}

echo "=== stage 1: sigma 0.5, entropy on ($S1 iters) ==="
timeout 7200 python scripts/train_velocity_tracking.py \
  --num_envs $ENVS --iterations $S1 --sigma_rew_neg 0.5 \
  --max_noise_std 1.0 --logdir runs/vel_stage1

echo "=== stage 2: sigma 0.1, entropy 0, std 0.3 ($S2 iters) ==="
timeout 5400 python scripts/train_velocity_tracking.py \
  --num_envs $ENVS --iterations $S2 --sigma_rew_neg 0.1 \
  --entropy_coef 0 --reset_action_std 0.3 --max_noise_std 1.0 \
  --resume runs/vel_stage1/ac_weights_last.pkl --logdir runs/vel_stage2

echo "=== stage 3: sigma 0.02 (reference), entropy 0 ($S3 iters) ==="
timeout 7200 python scripts/train_velocity_tracking.py \
  --num_envs $ENVS --iterations $S3 --sigma_rew_neg 0.02 \
  --entropy_coef 0 --max_noise_std 1.0 \
  --resume runs/vel_stage2/ac_weights_last.pkl --logdir runs/vel_stage3

echo "=== recipe done: runs/vel_stage3/ac_weights_last.pkl ==="
