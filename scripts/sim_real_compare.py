"""Sim-vs-real observation comparison.

Capability port of ``test_scripts/sim_real_compare.py`` (which embeds
hardcoded logged arrays): given a real-robot deployment log (the
``deploy_log.pkl`` list-of-dicts written by DeploymentRunner, entries with
"t"/"obs"/"action" keys) and a training run directory, replays the logged
action sequence through the TPU sim from a nominal reset and overlays
per-channel observation traces for calibration inspection.

Exercisable without a robot: ``tests/test_sim_real.py`` generates a log in
the deploy format from the engine itself and runs this comparison end-to-end
(sim-replay-of-sim must give ~zero RMSE on proprioceptive channels).
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def compare(logdir: str, real_log: str, steps: int = 250, channels: int = 45,
            plot: bool = True):
    """Replay the logged actions through the sim; return (rmse, sim, real)."""
    import jax.numpy as jnp

    with open(os.path.join(logdir, "parameters.pkl"), "rb") as f:
        cfg = pickle.load(f)
    with open(real_log, "rb") as f:
        log = pickle.load(f)

    real_obs = np.stack([np.asarray(e["obs"]).reshape(-1) for e in log])
    actions = np.stack([np.asarray(e["action"]).reshape(-1) for e in log])
    T = min(len(real_obs), steps)

    cfg.env.num_envs = 1
    cfg.terrain.mesh_type = "plane"
    cfg.noise.add_noise = False
    for k in list(vars(cfg.domain_rand)):
        if k.startswith("randomize"):
            setattr(cfg.domain_rand, k, False)
    cfg.parse()
    from legged_tracking_tpu.envs import LeggedEnv
    env = LeggedEnv(cfg)
    env.reset(randomize_ep_len=False)

    sim_obs = []
    for t in range(T):
        od, rew, done, info = env.step(jnp.asarray(actions[t][None]))
        sim_obs.append(np.asarray(od["obs"][0]))
    sim_obs = np.stack(sim_obs)

    n = min(sim_obs.shape[1], real_obs.shape[1], channels)
    rmse = np.sqrt(np.mean((sim_obs[:T, :n] - real_obs[:T, :n]) ** 2, axis=0))

    if plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        rows = int(np.ceil(n / 3))
        fig, axes = plt.subplots(rows, 3, figsize=(14, 2.2 * rows))
        for i in range(n):
            ax = axes.flat[i]
            ax.plot(real_obs[:T, i], label="real", lw=0.8)
            ax.plot(sim_obs[:T, i], label="sim", lw=0.8)
            ax.set_title(f"obs[{i}]", fontsize=8)
        axes.flat[0].legend()
        out = os.path.join(logdir, "sim_real_compare.png")
        fig.tight_layout()
        fig.savefig(out, dpi=100)
        print(f"wrote {out}")

    return rmse, sim_obs[:T, :n], real_obs[:T, :n]


def main(args):
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    rmse, _, _ = compare(args.logdir, args.real_log, args.steps, args.channels)
    print("per-channel RMSE (first 12):", np.round(rmse[:12], 4))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--logdir", required=True)
    p.add_argument("--real_log", required=True)
    p.add_argument("--steps", type=int, default=250)
    p.add_argument("--channels", type=int, default=45)
    p.add_argument("--cpu", action="store_true")
    main(p.parse_args())
