"""Reproducible FLOP/roofline model for the bench workload.

Backs the MFU statement in docs/CHIP_RUNBOOK.md: counts the exact
model-matmul FLOPs of one PPO train iteration (CSE adaptation module +
actor + critic over rollout fwd and the 5-epoch update) and compares with
a measured iteration time.

Usage:
  python tools/roofline.py [--ms-per-iter 266.6] [--num-envs 4096]
  python tools/roofline.py --from-trace /tmp/prof /tmp/hlo/*.txt --iters 3

--from-trace ingests a profile_bench --trace/--hlo pair (the same inputs as
tools/analyze_trace.py) and pulls ms-per-iter and the flax-Dense attribution
out of the live trace, so each BENCH round regenerates the measured | ceiling
| MFU table in one command.
"""

import argparse

V5E_BF16_PEAK = 197e12     # FLOP/s
V5P_BF16_PEAK = 459e12


def model_flops_per_iter(num_envs=4096, steps=24, epochs=5,
                         num_obs=261, history=15, num_priv=6, num_actions=12,
                         hidden=(512, 256, 128), adapt_hidden=(256, 128)):
    """Total Dense FLOPs per train iteration (fwd rollout + fwd/bwd update)."""
    H = num_obs * history
    adapt = H * adapt_hidden[0]
    for a, b in zip(adapt_hidden[:-1], adapt_hidden[1:]):
        adapt += a * b
    adapt += adapt_hidden[-1] * num_priv

    def mlp(inp, out):
        mac = inp * hidden[0]
        for a, b in zip(hidden[:-1], hidden[1:]):
            mac += a * b
        return mac + hidden[-1] * out

    actor = mlp(H + num_priv, num_actions)
    critic = mlp(H + num_priv, 1)
    per_step_mac = adapt + actor + critic
    samples = num_envs * steps
    rollout = per_step_mac * samples * 2                 # fwd FLOPs
    update = rollout * 3 * epochs                        # fwd + 2 bwd matmuls
    return rollout + update, per_step_mac


def from_trace(trace_dir, hlo_path, iters):
    """(ms_per_iter, dense_ms) from a live profile_bench trace/HLO pair."""
    import collections
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from analyze_trace import hlo_source_map, load_trace_events, \
        xla_op_durations
    dur = xla_op_durations(load_trace_events(trace_dir))
    src = hlo_source_map(hlo_path)
    total_us = sum(dur.values())
    by_file = collections.Counter()
    for op, us in dur.items():
        loc = src.get(op.lstrip("%"), "<unattributed>")
        by_file[loc.split(":")[0]] += us
    dense_us = by_file.get("linear.py", 0)
    return total_us / 1e3 / iters, dense_us / 1e3 / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ms-per-iter", type=float, default=266.6,
                   help="measured iteration time (trace or bench)")
    p.add_argument("--num-envs", type=int, default=4096)
    p.add_argument("--dense-ms", type=float, default=89.0,
                   help="trace-attributed flax Dense time (linear.py)")
    p.add_argument("--from-trace", nargs=2, metavar=("TRACE_DIR", "HLO_TXT"),
                   help="derive --ms-per-iter and --dense-ms from a "
                        "profile_bench --trace/--hlo pair")
    p.add_argument("--iters", type=int, default=3,
                   help="train iterations inside the traced dispatch")
    args = p.parse_args()
    if args.from_trace:
        args.ms_per_iter, args.dense_ms = from_trace(
            args.from_trace[0], args.from_trace[1], args.iters)
        print(f"[from-trace] {args.ms_per_iter:.1f} ms/iter, "
              f"Dense {args.dense_ms:.1f} ms/iter")

    total, per_step = model_flops_per_iter(args.num_envs)
    t = args.ms_per_iter / 1e3
    print(f"model matmuls: {per_step / 1e6:.2f}M MAC/env-step, "
          f"{total / 1e12:.2f} TFLOP/iter")
    print(f"v5e bf16 floor: {total / V5E_BF16_PEAK * 1e3:.1f} ms "
          f"(v5p: {total / V5P_BF16_PEAK * 1e3:.1f} ms)")
    print(f"Dense-subset utilization: "
          f"{100 * total / V5E_BF16_PEAK / (args.dense_ms / 1e3):.0f}% "
          f"of bf16 roofline over the attributed {args.dense_ms:.1f} ms")
    print(f"whole-program: {total / t / 1e12:.1f} TFLOP/s sustained = "
          f"{100 * total / t / V5E_BF16_PEAK:.0f}% MFU at "
          f"{args.ms_per_iter:.1f} ms/iter")
    steps = args.num_envs * 24
    print(f"ceiling if non-matmul time were zero: "
          f"{steps / (total / V5E_BF16_PEAK) / 1e6:.2f}M env-steps/s per v5e")


if __name__ == "__main__":
    main()
