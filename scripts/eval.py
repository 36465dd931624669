"""Evaluation: load a checkpoint, roll policies, write videos + plots.

TPU-native equivalent of ``scripts/eval.py``: rebuilds the env from the run's
``parameters.pkl`` (16 envs over a 4x4 terrain grid, DR off, :70-108), loads
the actor-critic weights (:38-66), rolls 500 steps and writes per-env mp4s +
velocity/roll/pitch plots (:133-196).
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_env(logdir, num_envs=16):
    with open(os.path.join(logdir, "parameters.pkl"), "rb") as f:
        cfg = pickle.load(f)
    # eval config: small grid, DR off (reference eval.py:81-106)
    cfg.env.num_envs = num_envs
    cfg.terrain.num_rows = 4
    cfg.terrain.num_cols = 4
    for k in list(vars(cfg.domain_rand)):
        if k.startswith("randomize"):
            setattr(cfg.domain_rand, k, False)
    cfg.noise.add_noise = False
    cfg.parse()
    from legged_tracking_tpu.envs import LeggedEnv
    from legged_tracking_tpu.envs.velocity_env import VelocityTrackingEnv

    if cfg.env.command_type == "velocity":
        return VelocityTrackingEnv(cfg)
    return LeggedEnv(cfg)


def load_policy(env, logdir):
    import jax
    from legged_tracking_tpu.learn import (ACCnnArgs, ACRmaArgs,
                                           ActorCriticCNN, ActorCriticRMA,
                                           PPO, PPOArgs)

    path = os.path.join(logdir, "ac_weights_last.pkl")
    with open(path, "rb") as f:
        ckpt = pickle.load(f)
    params = jax.tree.map(np.asarray, ckpt["params"])

    # reconstruct the actor-critic family from the checkpoint's param tree
    # (reference eval.py:38-66 picks ppo_cse vs ppo_cse_cnn from flags)
    top = params.get("params", {})
    ac = None
    if "height_map_encoder" in top:
        enc = top["height_map_encoder"]
        cfg = env.cfg
        nx = len(cfg.terrain.measured_points_x)
        ny = len(cfg.terrain.measured_points_y)
        if cfg.terrain.measure_front_half:
            nx = nx - (nx // 2 + 1)
        ac = ActorCriticCNN(
            num_obs=env.num_obs, num_privileged_obs=env.num_privileged_obs,
            num_obs_history=env.num_obs_history, num_actions=env.num_actions,
            args=ACCnnArgs(use_cnn="Conv_0" in enc, use_gru="gru" in top,
                           height_map_shape=(2, nx, ny)))
    elif "env_factor_encoder" in top:
        ac = ActorCriticRMA(num_obs=env.num_obs,
                            num_privileged_obs=env.num_privileged_obs,
                            num_obs_history=env.num_obs_history,
                            num_actions=env.num_actions, args=ACRmaArgs())
    alg = PPO(env, args=PPOArgs(), ac=ac)
    policy = jax.jit(lambda obs, hist: alg.act_inference(params, obs, hist))
    return policy


def main(args):
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from legged_tracking_tpu.io.render import record_rollout, render_frames, write_mp4
    from legged_tracking_tpu.learn import eval_metrics

    env = load_env(args.logdir, args.num_envs)
    policy = load_policy(env, args.logdir)
    env.reset(randomize_ep_len=False)

    frames = record_rollout(env, policy, args.steps, env_ids=range(args.num_envs))
    outdir = os.path.join(args.logdir, "eval")
    os.makedirs(outdir, exist_ok=True)

    # per-env quantitative metrics from the final state
    m = {name: np.asarray(fn(env.state)).mean()
         for name, fn in eval_metrics.METRICS_FNS.items()
         if env.state.commands is not None or not name.endswith("rmsd")}
    print({k: round(float(v), 4) for k, v in m.items()})

    if not args.no_video:
        imgs = render_frames(frames, env.terrain,
                             tile_idx=int(np.asarray(env.terrain.env_tile)[0]))
        write_mp4(imgs, os.path.join(outdir, "env0.mp4"))
        print(f"wrote {outdir}/env0.mp4")

    # velocity / roll / pitch plots (reference eval.py:176-196)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    base = np.stack([f["base_pos"] for f in frames])   # (T, N, 3)
    quat = np.stack([f["base_quat"] for f in frames])
    from legged_tracking_tpu.utils import quat as qt
    import jax.numpy as jnp
    rpy = np.asarray(qt.quaternion_to_roll_pitch_yaw(jnp.asarray(quat)))
    fig, axes = plt.subplots(3, 1, figsize=(8, 8))
    axes[0].plot(base[:, 0, 0], label="x")
    axes[0].plot(base[:, 0, 2], label="z")
    axes[0].legend(); axes[0].set_title("base position (env 0)")
    axes[1].plot(rpy[:, 0, 0], label="roll")
    axes[1].plot(rpy[:, 0, 1], label="pitch")
    axes[1].legend()
    axes[2].plot(np.stack([f["rew"] for f in frames])[:, 0])
    axes[2].set_title("reward")
    fig.savefig(os.path.join(outdir, "plots.png"), dpi=100)
    print(f"wrote {outdir}/plots.png")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--logdir", required=True)
    p.add_argument("--num_envs", type=int, default=16)
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--no_video", action="store_true")
    p.add_argument("--cpu", action="store_true")
    main(p.parse_args())
