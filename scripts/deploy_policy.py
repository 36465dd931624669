"""On-robot velocity-policy (walk-these-ways) deployment entry point.

Equivalent of ``go1_gym_deploy/scripts/deploy_policy.py``: loads
``parameters.pkl`` + the exported policy from a velocity-tracking training
run (scripts/train_velocity_tracking.py) and drives the robot from the RC
sticks through the 15-dim gait-clock command path of
``deploy/lcm_agent.py``. The stick->command state machine (gait selection,
frequency, body height, stance width, footswing) lives in
``deploy/state_estimator.py:get_command`` — the reference's
RCControllerProfile mapping (go1_gym_deploy/utils/command_profile.py:238-330).

Runs with numpy only — no jax/torch required on the Jetson.
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_and_run_policy(logdir: str, max_vel: float = 1.0,
                        max_yaw_vel: float = 1.0,
                        max_steps: int = 10_000_000):
    from legged_tracking_tpu.deploy.command_profiles import RCControllerProfile
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
    # reference deploy_policy.py:33 uses y_scale=0.6 fixed
    profile = RCControllerProfile(dt, se, x_scale=max_vel, y_scale=0.6,
                                  yaw_scale=max_yaw_vel)
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
    p.add_argument("--max_vel", type=float, default=1.0)
    p.add_argument("--max_yaw_vel", type=float, default=1.0)
    p.add_argument("--max_steps", type=int, default=10_000_000)
    args = p.parse_args()
    load_and_run_policy(args.logdir, args.max_vel, args.max_yaw_vel,
                        args.max_steps)
