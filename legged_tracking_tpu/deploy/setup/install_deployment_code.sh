#!/bin/bash
# Install the deployment stack on the Go1's onboard Jetson
# (equivalent of go1_gym_deploy/installer/install_deployment_code.sh).
set -euo pipefail

ROBOT=${1:-unitree@192.168.123.15}
REPO_ROOT="$(cd "$(dirname "$0")/../../.." && pwd)"

echo "== copying deployment code to $ROBOT =="
rsync -av --exclude build \
    "$REPO_ROOT/legged_tracking_tpu/deploy" \
    "$REPO_ROOT/legged_tracking_tpu/utils" \
    "$REPO_ROOT/legged_tracking_tpu/physics/go1_model_data.py" \
    "$REPO_ROOT/scripts/deploy_traj_policy.py" \
    "$ROBOT:~/legged_tracking_tpu/"

echo "== building the C++ bridge on the robot =="
ssh "$ROBOT" 'cd ~/legged_tracking_tpu/deploy/bridge && mkdir -p build && cd build \
  && cmake .. -DUNITREE_SDK_DIR=$HOME/unitree_legged_sdk && make -j'

echo "done — start with deploy/setup/start_bridge.sh on the robot"
