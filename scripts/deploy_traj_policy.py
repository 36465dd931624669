"""On-robot trajectory-policy deployment entry point.

Equivalent of ``go1_gym_deploy/scripts/deploy_traj_policy.py``: loads
``parameters.pkl`` + the exported policy from a training run, wires
StateEstimator + LCMAgent + command profile + DeploymentRunner over the LCM
bus shared with the C++ bridge (deploy/bridge/go1_bridge.cpp).

Runs with numpy only — no jax/torch required on the Jetson.
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_and_run_policy(logdir: str, profile_name: str = "random_trajectory",
                        max_steps: int = 10_000_000):
    from legged_tracking_tpu.deploy.command_profiles import (
        DummyFrontGoalProfile, RandomTrajectoryProfile, RCControllerProfile)
    from legged_tracking_tpu.deploy.deployment_runner import DeploymentRunner
    from legged_tracking_tpu.deploy.lcm_agent import LCMAgent
    from legged_tracking_tpu.deploy.lcm_lite import LCMLite
    from legged_tracking_tpu.deploy.policy_runtime import PolicyRuntime
    from legged_tracking_tpu.deploy.state_estimator import StateEstimator

    with open(os.path.join(logdir, "parameters.pkl"), "rb") as f:
        cfg = pickle.load(f)

    lc = LCMLite()
    se = StateEstimator(lc)
    se.spin()

    dt = cfg.control.decimation * cfg.sim.dt
    profiles = {
        "front_goal": lambda: DummyFrontGoalProfile(dt),
        "random_trajectory": lambda: RandomTrajectoryProfile(dt, se),
        "rc": lambda: RCControllerProfile(dt, se),
    }
    profile = profiles[profile_name]()
    agent = LCMAgent(cfg, se, profile, lc)

    policy = PolicyRuntime(os.path.join(logdir, "policy.npz"))

    runner = DeploymentRunner(se=se, log_root=logdir)
    runner.add_control_agent(agent, "hardware")
    runner.add_policy(policy)
    runner.add_command_profile(profile)
    runner.run(max_steps=max_steps)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--logdir", required=True)
    p.add_argument("--profile", default="random_trajectory",
                   choices=["front_goal", "random_trajectory", "rc"])
    p.add_argument("--max_steps", type=int, default=10_000_000)
    args = p.parse_args()
    load_and_run_policy(args.logdir, args.profile, args.max_steps)
