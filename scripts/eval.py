"""Evaluation: load a checkpoint, roll policies, write videos + plots + report.

TPU-native equivalent of ``scripts/eval.py``: rebuilds the env from the run's
``parameters.pkl`` (16 envs over a 4x4 terrain grid, DR off, :70-108), loads
the actor-critic weights (:38-66), rolls 500 steps and writes per-env mp4s +
velocity/roll/pitch plots (:133-196).  ``--dr_profile``/``--dr_sweep`` apply
the reference's evaluation DR regimes
(go1_gym_learn/eval_metrics/domain_randomization.py:4-120) and write a
metrics table (eval_report.json) including the adaptation loss the reference
logs at ~0.332 (BASELINE.md).
"""

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_env(logdir, num_envs=16, dr_profile=None):
    with open(os.path.join(logdir, "parameters.pkl"), "rb") as f:
        cfg = pickle.load(f)
    # eval config: small grid, DR off (reference eval.py:81-106)
    cfg.env.num_envs = num_envs
    for k in list(vars(cfg.domain_rand)):
        if k.startswith("randomize"):
            setattr(cfg.domain_rand, k, False)
    cfg.noise.add_noise = False
    if dr_profile:
        from legged_tracking_tpu.learn.domain_randomization_profiles import \
            DR_PROFILES
        cfg = DR_PROFILES[dr_profile](cfg)
    # the eval terrain grid wins over any profile's row/col override (our
    # terrain builder tiles envs over the grid; teleport/border knobs from
    # base_set don't apply to the tunnel tasks).  Grid adapts so the env
    # count stays divisible by the tile count (16 envs -> reference's 4x4).
    g = 4
    while g > 1 and num_envs % (g * g):
        g -= 1
    cfg.terrain.num_rows = g
    cfg.terrain.num_cols = g
    cfg.terrain.teleport_robots = False
    cfg.parse()
    from legged_tracking_tpu.envs import LeggedEnv
    from legged_tracking_tpu.envs.velocity_env import VelocityTrackingEnv

    if cfg.env.command_type == "velocity":
        return VelocityTrackingEnv(cfg)
    return LeggedEnv(cfg)


def load_policy(env, logdir):
    """Returns (alg, params, jitted inference policy); the actor-critic family
    is reconstructed from the checkpoint's param tree (reference eval.py:38-66
    picks ppo_cse vs ppo_cse_cnn from flags)."""
    import jax
    from legged_tracking_tpu.learn import (ACCnnArgs, ACRmaArgs,
                                           ActorCriticCNN, ActorCriticRMA,
                                           PPO, PPOArgs)

    path = os.path.join(logdir, "ac_weights_last.pkl")
    with open(path, "rb") as f:
        ckpt = pickle.load(f)
    params = jax.tree.map(np.asarray, ckpt["params"])

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
    return alg, params, policy


def rollout_metrics(env, alg, params, policy, steps):
    """Roll ``steps`` and return scalar metrics incl. adaptation loss and the
    recorded frames."""
    from legged_tracking_tpu.io.render import record_rollout
    from legged_tracking_tpu.learn import eval_metrics

    env.reset(randomize_ep_len=False)
    frames = record_rollout(env, policy, steps,
                            env_ids=range(env.num_envs))
    m = {name: float(np.asarray(fn(env.state)).mean())
         for name, fn in eval_metrics.METRICS_FNS.items()
         if env.state.commands is not None or not name.endswith("rmsd")}
    obs = env._observe_jit(env.state)
    m["adaptation_loss"] = float(np.asarray(
        eval_metrics.adaptation_loss(alg, params, obs)).mean())
    return m, frames


def main(args):
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from legged_tracking_tpu.io.render import render_frames, write_mp4

    outdir = os.path.join(args.logdir, "eval")
    os.makedirs(outdir, exist_ok=True)
    report = {}

    env = load_env(args.logdir, args.num_envs, dr_profile=args.dr_profile)
    alg, params, policy = load_policy(env, args.logdir)
    m, frames = rollout_metrics(env, alg, params, policy, args.steps)
    report["nominal" if not args.dr_profile else args.dr_profile] = m
    print({k: round(v, 4) for k, v in m.items()})

    # per-env videos (reference eval.py:133-196 writes all 16 envs)
    if not args.no_video:
        n_vid = min(args.video_envs, env.num_envs)
        tiles = np.asarray(env.terrain.env_tile)
        for i in range(n_vid):
            imgs = render_frames(frames, env.terrain, env_id_pos=i,
                                 tile_idx=int(tiles[i]))
            write_mp4(imgs, os.path.join(outdir, f"env{i}.mp4"))
        print(f"wrote {outdir}/env[0-{n_vid - 1}].mp4")

    # velocity / roll / pitch plots for every env (reference eval.py:176-196)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import jax.numpy as jnp
    from legged_tracking_tpu.utils import quat as qt
    base = np.stack([f["base_pos"] for f in frames])   # (T, N, 3)
    quat = np.stack([f["base_quat"] for f in frames])
    rew = np.stack([f["rew"] for f in frames])
    rpy = np.asarray(qt.quaternion_to_roll_pitch_yaw(jnp.asarray(quat)))
    fig, axes = plt.subplots(3, 1, figsize=(8, 8))
    for i in range(env.num_envs):
        axes[0].plot(base[:, i, 0], alpha=0.4)
        axes[0].plot(base[:, i, 2], alpha=0.4)
        axes[1].plot(rpy[:, i, 0], alpha=0.4)
        axes[1].plot(rpy[:, i, 1], alpha=0.4)
        axes[2].plot(rew[:, i], alpha=0.4)
    axes[0].set_title("base x/z (all envs)")
    axes[1].set_title("roll/pitch")
    axes[2].set_title("reward")
    fig.tight_layout()
    fig.savefig(os.path.join(outdir, "plots.png"), dpi=100)
    print(f"wrote {outdir}/plots.png")

    # DR-profile sweep (reference eval_metrics DR regimes): metrics-only
    # rollouts under each profile
    if args.dr_sweep:
        from legged_tracking_tpu.learn.domain_randomization_profiles import \
            DR_PROFILES
        for name in DR_PROFILES:
            if name == "base_set":
                continue
            env_p = load_env(args.logdir, args.num_envs, dr_profile=name)
            alg_p, params_p, policy_p = load_policy(env_p, args.logdir)
            m_p, _ = rollout_metrics(env_p, alg_p, params_p, policy_p,
                                     args.sweep_steps)
            report[name] = m_p
            print(name, {k: round(v, 4) for k, v in m_p.items()})

    with open(os.path.join(outdir, "eval_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {outdir}/eval_report.json")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--logdir", required=True)
    p.add_argument("--num_envs", type=int, default=16)
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--sweep_steps", type=int, default=250)
    p.add_argument("--video_envs", type=int, default=16)
    p.add_argument("--no_video", action="store_true")
    p.add_argument("--dr_profile", default=None,
                   choices=[None, "base_set", "rand_regular", "rand_large",
                            "static_low", "static_mid", "static_high"])
    p.add_argument("--dr_sweep", action="store_true")
    p.add_argument("--cpu", action="store_true")
    main(p.parse_args())
