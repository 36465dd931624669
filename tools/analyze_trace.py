"""Join a jax.profiler trace with an HLO dump: time per source line.

This is the attribution that found the round-2 wins (docs/ARCHITECTURE.md
"Trace-attribution methodology"): per-op durations come from the trace's
"XLA Ops" device thread, op names map to source_file:line via the HLO
metadata, and durations sum by line / by file.

  python tools/profile_bench.py --trace /tmp/prof --hlo --out /tmp/hlo.txt
  python tools/analyze_trace.py /tmp/prof /tmp/hlo.txt [--iters 3]

``--iters`` divides totals into per-iteration numbers (pass the iteration
count the trace captured; profile_bench --trace default is 3).
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re


def load_trace_events(trace_dir):
    paths = glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(sorted(paths)[-1]) as f:
        return json.load(f)["traceEvents"]


def xla_op_durations(events):
    """{op_name: total_us} from the device's "XLA Ops" thread."""
    tids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"]["name"]
    dur = collections.Counter()
    for e in events:
        if (e.get("ph") == "X"
                and tids.get((e["pid"], e["tid"])) == "XLA Ops"):
            dur[e["name"]] += e.get("dur", 0)
    return dur


def hlo_source_map(hlo_path):
    """{hlo_op_name: "file.py:line"} from HLO metadata."""
    src = {}
    pat = re.compile(
        r"%([\w.\-]+) = .*?source_file=\"([^\"]+)\".*?source_line=(\d+)")
    with open(hlo_path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                src[m.group(1)] = (
                    f"{os.path.basename(m.group(2))}:{m.group(3)}")
    return src


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("hlo_dump")
    ap.add_argument("--iters", type=int, default=3,
                    help="iterations captured in the trace (for /iter numbers)")
    ap.add_argument("--top", type=int, default=35)
    args = ap.parse_args()

    dur = xla_op_durations(load_trace_events(args.trace_dir))
    src = hlo_source_map(args.hlo_dump)

    by_line = collections.Counter()
    for name, d in dur.items():
        if name.startswith("while"):      # outer loops double-count their body
            continue
        tag = src.get(name, "<unattributed:" + name.split(".")[0] + ">")
        by_line[tag] += d
    total = sum(by_line.values())
    n = args.iters
    print(f"attributed device time: {total / 1e3:.1f} ms "
          f"({total / n / 1e3:.1f} ms/iter at --iters {n})")

    by_file = collections.Counter()
    for tag, d in by_line.items():
        by_file[tag.split(":")[0]] += d
    print("\nby file (ms/iter):")
    for tag, d in by_file.most_common(25):
        print(f"  {d / n / 1e3:8.2f}  {tag}")
    print(f"\ntop {args.top} source lines (ms/iter):")
    for tag, d in by_line.most_common(args.top):
        print(f"  {d / n / 1e3:8.2f}  {tag}")


if __name__ == "__main__":
    main()
