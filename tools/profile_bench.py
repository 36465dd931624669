"""Profile the bench workload on the chip: HLO report + optional trace.

Chip-time is scarce (CLAUDE.md: the tunnel wedges under sustained load), so
this packages the round-2 HLO-grep methodology into one command:

  python tools/profile_bench.py --hlo            # compile-only HLO report
  python tools/profile_bench.py --trace DIR      # 3 timed iterations traced
  BENCH_LANE=1 ... --hlo                         # lane-engine variant

The HLO report compiles ONE train iteration and prints:
- `while(` loops (serialized scatter/gather patterns) with source metadata,
- fusion count + the largest fusions by instruction count,
- gather/scatter/dot/dynamic-slice tallies per source line.
Compile-only needs no bench run, so it is safe even on a freshly recovered
tunnel; --trace launches jax.profiler around a short timed loop (the known
wedge trigger is SUSTAINED multi-thousand-iteration traces; 3 iterations
has been safe).

The highest-yield analysis joins a --trace with a --hlo --out dump offline:
aggregate per-op durations from the trace's "XLA Ops" thread, map op names
to source_file:line via the HLO metadata, and sum by line (this attribution
found the round-2 sampling/minibatch wins — docs/ARCHITECTURE.md).
"""

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# HLO result types may be tuples whose rendering contains spaces:
#   %f = (f32[...]{...}, f32[...]{...}) fusion(...)
_RESULT = r"= (?:\S+|\(.*?\)) "


def _src_tag(line):
    m = re.search(r'source_file="([^"]+)".*?source_line=(\d+)', line)
    return f"{os.path.basename(m.group(1))}:{m.group(2)}" if m else "<no metadata>"


def hlo_report(text, top=15):
    lines = text.splitlines()
    n_fusion = sum(1 for l in lines if re.search(_RESULT + r"fusion\(", l))
    print(f"total instructions: {len(lines)}, fusions: {n_fusion}")

    whiles = [l for l in lines if re.search(_RESULT + r"while\(", l)]
    print(f"\n`while(` loops: {len(whiles)}")
    for l in whiles[:top]:
        meta = re.search(r'metadata=\{[^}]*\}', l)
        print("  " + (meta.group(0)[:160] if meta else l.strip()[:160]))

    per_line = collections.Counter()
    for op in ("gather(", "scatter(", "dot(", "dynamic-slice(",
               "dynamic-update-slice("):
        ops = [l for l in lines if re.search(_RESULT + re.escape(op), l)]
        print(f"\n{op} count: {len(ops)}")
        for l in ops:
            per_line[f"{op[:-1]} @ {_src_tag(l)}"] += 1
        for l in ops[:top]:
            shape = re.search(r"= (\S+|\(.*?\)) " + re.escape(op), l)
            print(f"  {shape.group(1)[:40] if shape else '?':40s} {_src_tag(l)}")

    print("\nop tallies per source line (top 25):")
    for tag, n in per_line.most_common(25):
        print(f"  {n:5d}  {tag}")

    # largest fusion bodies by instruction count
    fus_sizes = collections.Counter()
    cur = None
    for l in lines:
        if l.strip().startswith("%fused_computation") or (
                "fused_computation" in l and l.rstrip().endswith("{")):
            cur = l.strip().split()[0].lstrip("%")
        elif cur is not None:
            if l.strip() == "}":
                cur = None
            else:
                fus_sizes[cur] += 1
    print("\nlargest fusion bodies (instructions):")
    for name, n in fus_sizes.most_common(10):
        print(f"  {n:5d}  {name[:100]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hlo", action="store_true")
    ap.add_argument("--trace", default=None, help="profiler trace output dir")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--out", default=None, help="also dump HLO text here")
    args = ap.parse_args()
    # validate BEFORE bench.build(): the build costs minutes of chip time
    if not args.hlo and not args.trace:
        ap.error("pass --hlo and/or --trace DIR")
    if args.trace and args.iters < 1:
        ap.error("--trace needs --iters >= 1")

    import jax
    if os.environ.get("PROFILE_CPU") == "1":  # smoke-test off-chip
        jax.config.update("jax_platforms", "cpu")
    import bench

    env, alg, ts, env_state, obs = bench.build()
    jfn = jax.jit(alg.train_iteration, donate_argnums=(0,))
    key = jax.random.key(2)

    if args.hlo:
        lowered = jfn.lower(ts, env_state, obs, key)
        compiled = lowered.compile()
        txt = compiled.as_text()
        if args.out:
            with open(args.out, "w") as f:
                f.write(txt)
            print(f"wrote {args.out} ({len(txt)} bytes)")
        hlo_report(txt)

    if args.trace:
        import time
        # warmup 2 calls (compile + steady signature)
        for _ in range(2):
            key, k = jax.random.split(key)
            ts, env_state, obs, m = jfn(ts, env_state, obs, k)
        jax.block_until_ready(m["value_loss"])
        with jax.profiler.trace(args.trace):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                key, k = jax.random.split(key)
                ts, env_state, obs, m = jfn(ts, env_state, obs, k)
            jax.block_until_ready(m["value_loss"])
            print(f"{args.iters} iters in {time.perf_counter() - t0:.3f}s")
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
