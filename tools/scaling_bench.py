"""Data-parallel scaling evidence on the virtual 8-device CPU mesh.

Real multi-chip is unavailable in this environment (one v5e via the axon
tunnel), so this tool measures what a virtual mesh CAN prove: the *overhead*
of partitioning + XLA collectives in the jitted train iteration. All virtual
devices share the same host cores, so at FIXED TOTAL WORK the ideal sharded
runtime equals the single-device runtime; any excess is sharding cost
(collective scheduling, layout changes, rendezvous). Low overhead here +
the bitwise invariance tests (tests/test_distributed.py) is the plumbing
proof; real weak-scaling efficiency (BASELINE.md ≥0.85 target) must be
re-measured on hardware with the same script via --devices.

Usage (CPU, 8 virtual devices — conftest-style env is set automatically):
    python tools/scaling_bench.py [--total_envs 512] [--iters 3]

Writes a JSON summary to stdout and (with --out) a file consumed by
docs/SCALING.md.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(args):
    import jax
    jax.config.update("jax_platforms", "cpu")
    if len(jax.devices()) < 8:
        print("need XLA_FLAGS=--xla_force_host_platform_device_count=8 "
              "before jax backend init", file=sys.stderr)

    from legged_tracking_tpu.config import Cfg, config_go1
    from legged_tracking_tpu.envs import LeggedEnv
    from legged_tracking_tpu.learn import PPO, PPOArgs
    from legged_tracking_tpu.parallel import make_mesh, replicate, shard_batch

    cfg = config_go1(Cfg())
    cfg.env.num_envs = args.total_envs
    cfg.terrain.mesh_type = "plane"
    cfg.env.command_type = "xy"
    cfg.control.control_type = "P"
    env = LeggedEnv(cfg)
    alg = PPO(env, args=PPOArgs(num_steps_per_env=args.steps_per_env))

    results = {}
    for n in args.devices:
        mesh = make_mesh(n)
        ts = replicate(alg.init(jax.random.key(0)), mesh)
        es = shard_batch(env.reset_fn(jax.random.key(1), False),
                         args.total_envs, mesh)
        obs = shard_batch(jax.jit(env.observe)(es), args.total_envs, mesh)
        key = jax.random.key(2)
        # 2 warmups: compile + steady state
        for _ in range(2):
            key, k = jax.random.split(key)
            ts, es, obs, m = alg.train_iteration_jit(ts, es, obs, k)
        jax.block_until_ready(m["value_loss"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            key, k = jax.random.split(key)
            ts, es, obs, m = alg.train_iteration_jit(ts, es, obs, k)
        jax.block_until_ready(m["value_loss"])
        dt = (time.perf_counter() - t0) / args.iters
        results[n] = dt
        print(f"n_devices={n}: {dt*1e3:.1f} ms/iter "
              f"({args.total_envs} envs total)", file=sys.stderr)

    t1 = results[args.devices[0]]
    summary = {
        "total_envs": args.total_envs,
        "iters": args.iters,
        "ms_per_iter": {str(n): round(results[n] * 1e3, 2) for n in results},
        # fixed total work on shared cores: sharding overhead vs 1 device
        "sharding_overhead": {str(n): round(results[n] / t1 - 1.0, 4)
                              for n in results},
        "note": "virtual CPU mesh: devices share host cores, so ideal "
                "sharded time == single-device time at fixed total work; "
                "overhead>0 is the cost of partitioning + collectives",
    }
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--total_envs", type=int, default=512)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--steps_per_env", type=int, default=24)
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--out", default=None)
    main(p.parse_args())
