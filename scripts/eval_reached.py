"""Deterministic goal-reach evaluation for trajectory-tracking checkpoints.

Rolls the DETERMINISTIC student policy under training conditions (DR + noise
on, unlike eval.py's DR-off artifacts) and reports the done-masked reached
fraction — the number the reference's wandb `reached` corresponds to, but
without action-sampling noise.
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main(args):
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    with open(os.path.join(args.logdir, "parameters.pkl"), "rb") as f:
        cfg = pickle.load(f)
    cfg.env.num_envs = args.num_envs
    cfg.parse()
    from legged_tracking_tpu.envs import LeggedEnv
    from eval import load_policy

    env = LeggedEnv(cfg)
    alg, params, _ = load_policy(env, args.logdir) if args.ckpt is None else \
        _load_ckpt(env, args.logdir, args.ckpt)
    policy = jax.jit(lambda o, h: alg.act_inference(params, o, h))

    st = env._reset_jit(jax.random.key(args.seed), True)
    if args.target_dist is not None:
        # evaluate at a specific curriculum goal distance: re-reset so the
        # trajectories are drawn at the requested target_dist
        st = st._replace(target_dist=jnp.asarray(args.target_dist, jnp.float32))
    obs0 = env._observe_jit(st)

    # ONE jitted scan — per-step host dispatch over the axon tunnel is slow
    @jax.jit
    def rollout(st, obs):
        def body(carry, _):
            st, obs = carry
            a = alg.act_inference(params, obs["obs"], obs["obs_history"])
            st, out = env.step_fn(st, a)
            nobs = {"obs": out.obs, "obs_history": out.obs_history,
                    "privileged_obs": out.privileged_obs}
            d = out.done
            stats = jnp.stack([jnp.sum(d), jnp.sum(d & out.info["reached"]),
                               jnp.sum(d * out.info["episode_length"])])
            return (st, nobs), stats
        (st, obs), stats = jax.lax.scan(body, (st, obs), None,
                                        length=args.steps)
        return (st, obs), jnp.sum(stats, axis=0)

    (st, obs0), stats = rollout(st, obs0)
    if args.target_dist is not None and args.steps > 501:
        # first call was burn-in: episodes begun at the cfg-start distance
        # have all terminated; count a fresh window at the requested distance
        (st, obs0), stats = rollout(st, obs0)
    n_done, n_reached, ep_len_sum = np.asarray(stats)
    reached = n_reached / max(n_done, 1)
    print({"episodes": int(n_done), "reached": round(float(reached), 4),
           "mean_ep_len": round(float(ep_len_sum / max(n_done, 1)), 1),
           "ckpt": args.ckpt or "last",
           "target_dist": args.target_dist or "cfg-start"})
    return reached


def _load_ckpt(env, logdir, name):
    """Point eval.load_policy's family reconstruction at a specific ckpt."""
    import shutil
    import tempfile

    from eval import load_policy
    tmp = tempfile.mkdtemp()
    shutil.copy(os.path.join(logdir, name),
                os.path.join(tmp, "ac_weights_last.pkl"))
    alg, params, _ = load_policy(env, tmp)
    return alg, params, None


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--logdir", required=True)
    p.add_argument("--ckpt", default=None,
                   help="checkpoint filename inside logdir (default: last)")
    p.add_argument("--num_envs", type=int, default=1024)
    p.add_argument("--steps", type=int, default=1200)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--target_dist", type=float, default=None,
                   help="evaluate at this curriculum goal distance")
    p.add_argument("--cpu", action="store_true")
    main(p.parse_args())
