"""Watch a training run's CURRENT policy: render the latest checkpoint on
demand (optionally following the run as new checkpoints land).

The TPU-native answer to the reference's interactive Isaac Gym viewer
(go1_gym/envs/base/base_task.py:74-137 — a live window with keyboard
control): training runs headless at full throughput on the chip, and this
script gives the "watch it now" loop on CPU without touching the chip —
point it at the logdir of a LIVE run:

    python scripts/watch.py --logdir runs/goal_10k --follow

renders ``ac_weights_last.pkl`` to ``<logdir>/watch/latest.mp4`` whenever the
checkpoint file changes (runner saves it every ``save_interval`` iterations
and at exit).  One-shot mode (no --follow) renders once and exits.
"""

import argparse
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def render_once(args, tag=""):
    import numpy as np

    from legged_tracking_tpu.io.render import render_frames, write_mp4

    from eval import load_env, load_policy, rollout_metrics

    env = load_env(args.logdir, num_envs=args.num_envs)
    alg, params, policy = load_policy(env, args.logdir)
    metrics, frames = rollout_metrics(env, alg, params, policy, args.steps)
    outdir = os.path.join(args.logdir, "watch")
    os.makedirs(outdir, exist_ok=True)
    out = os.path.join(outdir, f"latest{tag}.mp4")
    tiles = np.asarray(env.terrain.env_tile)
    imgs = render_frames(frames[:: args.every], env.terrain,
                         env_id_pos=args.env_id,
                         tile_idx=int(tiles[args.env_id]))
    write_mp4(imgs, out)
    line = " | ".join(f"{k} {v:.3f}" for k, v in sorted(metrics.items()))
    print(f"wrote {out}  [{line}]", flush=True)
    return out


def main(args):
    import jax
    jax.config.update("jax_platforms", "cpu")  # never contend for the chip

    ckpt = os.path.join(args.logdir, "ac_weights_last.pkl")
    if not os.path.exists(ckpt):
        sys.exit(f"no checkpoint yet at {ckpt}")
    if not args.follow:
        render_once(args)
        return
    last_mtime = 0.0
    while True:
        m = os.path.getmtime(ckpt)
        if m > last_mtime:
            last_mtime = m
            tag = f"_{time.strftime('%H%M%S')}" if args.keep_history else ""
            try:
                render_once(args, tag)
            except (EOFError, pickle.UnpicklingError):
                time.sleep(2.0)  # checkpoint mid-write; retry next poll
                last_mtime = 0.0
        time.sleep(args.poll_s)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--logdir", required=True)
    p.add_argument("--steps", type=int, default=250)
    p.add_argument("--num_envs", type=int, default=4)
    p.add_argument("--env_id", type=int, default=0)
    p.add_argument("--every", type=int, default=2,
                   help="render every Nth control step")
    p.add_argument("--follow", action="store_true",
                   help="keep polling for new checkpoints and re-render")
    p.add_argument("--poll_s", type=float, default=30.0)
    p.add_argument("--keep_history", action="store_true",
                   help="timestamped mp4 per checkpoint instead of overwrite")
    main(p.parse_args())
