"""Hierarchical (planner-in-the-loop) sim rollout of a trained policy.

Equivalent of the reference's archived ``deploy_hierarchical.py``
(scripts_archived_1/deploy_hierarchical.py:115-180): rebuild the env from a
run's parameters with ``sampling_based_planning`` ON (the batched local
planner picks intermediate target poses from candidate_target_poses every
``plan_interval`` steps), roll the policy, and write a video + metrics.
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(args):
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from legged_tracking_tpu.envs import LeggedEnv
    from legged_tracking_tpu.io.render import (record_rollout, render_frames,
                                               write_mp4)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from eval import load_policy

    with open(os.path.join(args.logdir, "parameters.pkl"), "rb") as f:
        cfg = pickle.load(f)
    # planner-in-the-loop eval config (reference deploy_hierarchical.py:83-128)
    cfg.env.num_envs = args.num_envs
    cfg.terrain.num_rows = max(int(np.sqrt(args.num_envs)), 1)
    cfg.terrain.num_cols = max(args.num_envs // cfg.terrain.num_rows, 1)
    for k in list(vars(cfg.domain_rand)):
        if k.startswith("randomize"):
            setattr(cfg.domain_rand, k, False)
    cfg.noise.add_noise = False
    cfg.commands.traj_function = "fixed_target"
    cfg.commands.traj_length = 1
    cfg.commands.num_interpolation = 1
    cfg.commands.base_x = 5.0
    cfg.commands.base_y = 0.0
    cfg.commands.sampling_based_planning = True
    cfg.commands.plan_interval = args.plan_interval
    cfg.commands.switch_dist = 0.25
    cfg.curriculum_thresholds.cl_fix_target = False
    cfg.parse()

    env = LeggedEnv(cfg)
    _, _, policy = load_policy(env, args.logdir)
    env.reset(randomize_ep_len=False)

    frames = record_rollout(env, policy, args.steps,
                            env_ids=range(env.num_envs))
    outdir = os.path.join(args.logdir, "hierarchical")
    os.makedirs(outdir, exist_ok=True)
    sums = np.asarray(env.state.episode_sums)
    names = env.metric_names
    rec = {n: float(sums[:, i].mean()) for i, n in enumerate(names)}
    print({k: round(v, 3) for k, v in rec.items()
           if k in ("exploration", "reaching_local_goal", "total")
           or k.startswith("reach")})

    if not args.no_video:
        imgs = render_frames(frames, env.terrain,
                             tile_idx=int(np.asarray(env.terrain.env_tile)[0]))
        path = write_mp4(imgs, os.path.join(outdir, "output.mp4"))
        print(f"wrote {path}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--logdir", required=True)
    p.add_argument("--num_envs", type=int, default=1)
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--plan_interval", type=int, default=100)
    p.add_argument("--no_video", action="store_true")
    p.add_argument("--cpu", action="store_true")
    main(p.parse_args())
