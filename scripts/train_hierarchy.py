"""Hierarchical waypoint-tracking training (the 'pms' / planner stack).

TPU equivalent of the reference ``eval_scripts/train_hierarchy_2.py``:
terminate-on-reach trajectory tracking over random_pyramid tunnels with the
TrajectoryTrackingRewards container (reach/explore/stalling terms) and the
batched sampling-based local planner.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_cfg(args):
    from legged_tracking_tpu.config import Cfg, config_go1

    cfg = config_go1(Cfg())
    cfg.seed = args.seed
    cfg.terrain.measured_points_x = np.linspace(-1, 1, 21)
    cfg.terrain.measured_points_y = np.linspace(-0.5, 0.5, 11)
    cfg.env.observe_heights = True
    cfg.env.num_envs = args.num_envs
    cfg.env.command_type = "xy"
    cfg.env.num_observation_history = 1
    cfg.env.terminate_end_of_trajectory = True
    cfg.env.episode_length_s = 20
    cfg.terrain.measure_front_half = True

    cfg.asset.penalize_contacts_on = ["thigh", "calf", "base"]
    cfg.asset.terminate_after_contacts_on = []

    # rewards (reference train_hierarchy_2.py:64-88)
    cfg.rewards.reward_container_name = "TrajectoryTrackingRewards"
    cfg.rewards.T_reach = 200
    cfg.rewards.small_vel_threshold = 0.1
    cfg.rewards.large_dist_threshold = 0.5
    cfg.rewards.only_positive_rewards = False
    cfg.rewards.use_terminal_body_height = False
    cfg.rewards.exploration_steps = float("inf")

    rs = cfg.reward_scales
    for k, _ in list(rs.items()):
        rs.set(k, 0.0)
    rs.set("stalling", args.r_stalling)
    rs.set("reaching_local_goal", 100.0)
    rs.set("reach_goal", 100.0)
    rs.set("exploration", args.r_explore)
    rs.set("dof_acc", -2.5e-7 * 2)
    rs.set("torques", -1e-5 * 2)
    rs.set("dof_pos_limits", -10.0 * 2)
    rs.set("collision", -1.0)
    rs.set("action_rate", -0.01)

    # terrain: random_pyramid tunnels (reference :90-115)
    if args.no_tunnel:
        cfg.terrain.mesh_type = "plane"
    else:
        cfg.terrain.mesh_type = "trimesh"
        cfg.terrain.terrain_type = "random_pyramid"
        cfg.terrain.num_cols = args.terrain_cols
        cfg.terrain.num_rows = args.terrain_rows
        cfg.terrain.terrain_length = [3.0, 4.0, 5.0][min(args.difficulty_level, 2)]
        cfg.terrain.terrain_width = 1.6
        cfg.terrain.terrain_ratio_x = 0.5
        cfg.terrain.terrain_ratio_y = 1.0
        cfg.terrain.ceiling_height = 0.8
        cfg.terrain.top.pyramid_num_x = 3
        cfg.terrain.top.pyramid_num_y = 5
        cfg.terrain.top.pyramid_var_x = 0.3
        cfg.terrain.top.pyramid_var_y = 0.3
        cfg.terrain.top.pyramid_height_min = 0.15
        cfg.terrain.top.pyramid_height_max = 0.35
        cfg.terrain.bottom.pyramid_num_x = 3
        cfg.terrain.bottom.pyramid_num_y = 5
        cfg.terrain.bottom.pyramid_var_x = 0.3
        cfg.terrain.bottom.pyramid_var_y = 0.3
        cfg.terrain.bottom.pyramid_height_min = 0.15
        cfg.terrain.bottom.pyramid_height_max = 0.35

    # hierarchical planning over candidate local goals (reference
    # train_hierarchy_2.py:117-139: fixed_target at 3.5 m ± 0.4,
    # plan_interval 100, switch_dist 0.20, base_z 0.29)
    cfg.commands.traj_function = "fixed_target"
    cfg.commands.traj_length = 1
    cfg.commands.num_interpolation = 1
    cfg.commands.x_mean = 3.5
    cfg.commands.base_x = 3.5
    cfg.commands.y_mean = 0.0
    cfg.commands.x_range = 0.4
    cfg.commands.y_range = 0.0
    cfg.commands.base_z = 0.29
    cfg.commands.switch_dist = 0.20
    cfg.commands.sampling_based_planning = not args.no_planner
    cfg.commands.plan_interval = args.plan_interval

    # fix-target curriculum over the goal distance (round 5). The reference
    # config block carries curriculum values (cl_start 1.2, cl_goal 3.2,
    # delta 0.2, threshold 0.6 — train_hierarchy_2.py:140-144) but ships
    # with cl_fix_target=False, and the task never bootstraps at a fixed
    # 3.5 m: the stock-parity 10k run (docs/hierarchy_r5_stock_metrics.jsonl)
    # settles into abstention (stand + eat the stalling penalty) with zero
    # reaches. --no_curriculum restores the stock-parity behavior.
    if not args.no_curriculum:
        ct = cfg.curriculum_thresholds
        ct.cl_fix_target = True
        # 0.6 m bootstrap (not the reference block's 1.2): the goal task
        # bootstraps from 0.6 in ~400 iterations on this engine; at a 1.2 m
        # start the hierarchy run showed positive goal-ward exploration but
        # zero reaches in 2k iterations
        ct.cl_start_target_dist = 0.6
        ct.cl_goal_target_dist = 3.2
        ct.cl_switch_delta = 0.2
        ct.cl_switch_threshold = 0.6
        ct.cl_downstep_threshold = 0.3
        ct.cl_dist_mix = 0.25
        ct.cl_stagnation_probe = 600
        # retention at the wall: stage-B died collapsing on the second
        # 1.0 m (pit-edge) window — restore the peak snapshot on downstep
        ct.cl_restore_best_on_downstep = True

    cfg.control.control_type = "actuator_net" if not args.pd_control else "P"
    cfg.domain_rand.randomize_lag_timesteps = True
    cfg.normalization.clip_actions = 10.0
    return cfg


def main(args):
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from legged_tracking_tpu.envs import LeggedEnv
    from legged_tracking_tpu.learn import ACArgs, PPOArgs, Runner, RunnerArgs

    cfg = build_cfg(args)
    env = LeggedEnv(cfg)
    print(f"env: {env.num_envs} envs | obs {env.num_obs} | rewards {env.reward_names}")
    # std ceiling + zero entropy: the goal-task round-5 lessons (the std
    # rides the ceiling under entropy 0.01 and the maximally-noisy policy
    # cannot hold precision goals — docs/TRAINING_NOTES.md round 5)
    runner = Runner(env,
                    runner_args=RunnerArgs(
                        resume=args.resume,
                        critic_warmup_iters=args.critic_warmup),
                    ppo_args=PPOArgs(learning_rate=args.learning_rate,
                                     entropy_coef=args.entropy_coef),
                    ac_args=ACArgs(max_noise_std=1.0), logdir=args.logdir,
                    seed=args.seed, num_devices=args.num_devices)
    return runner.learn(num_learning_iterations=args.iterations)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--logdir", type=str, default=None)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--seed", type=int, default=11)
    p.add_argument("--iterations", type=int, default=10000)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--num_envs", type=int, default=4000)
    p.add_argument("--terrain_rows", type=int, default=20)
    p.add_argument("--terrain_cols", type=int, default=20)
    p.add_argument("--difficulty_level", type=int, default=2)
    p.add_argument("--no_tunnel", action="store_true")
    p.add_argument("--no_planner", action="store_true")
    p.add_argument("--plan_interval", type=int, default=100,
                   help="reference pms branch replans every 100 control "
                        "steps (train_hierarchy_2.py:131)")
    p.add_argument("--pd_control", action="store_true")
    # POSITIVE scale (reference :182 default 1.0): the stalling TERM is
    # already -1 when stalling, so a negative scale PAYS the policy to
    # stand still — the exact bug behind the round-4 zero-reach run
    # (docs/hierarchy_r4_metrics.jsonl: rew_stalling +13.6/episode,
    # episode_length pinned at timeout)
    p.add_argument("--r_stalling", type=float, default=1.0)
    p.add_argument("--r_explore", type=float, default=1.0,
                   help="dense progress shaping toward the local goal "
                        "(reference default 0.0; 1.0 is our trained-in "
                        "default — the only dense positive term otherwise "
                        "is the sparse local-goal bonus)")
    p.add_argument("--num_devices", type=int, default=None)
    p.add_argument("--no_curriculum", action="store_true",
                   help="stock reference parity: fixed 3.5 m goals, no "
                        "fix-target curriculum (never bootstraps — see "
                        "build_cfg)")
    p.add_argument("--resume", type=str, default="",
                   help="checkpoint to resume (curriculum state included)")
    p.add_argument("--critic_warmup", type=int, default=0)
    p.add_argument("--entropy_coef", type=float, default=0.0)
    main(p.parse_args())
