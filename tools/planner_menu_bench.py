"""Comparative planner-menu benchmark on a synthetic tunnel set.

Runs every allocate_planner name (reference allocatePlanner,
go1_gym/utils/planner.py:156-178) over randomized slalom tunnels and writes
success rate / mean path cost / mean wall time to docs/PLANNER_MENU.md.

Usage: python tools/planner_menu_bench.py [n_tunnels]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from legged_tracking_tpu.utils.planner import allocate_planner, path_cost  # noqa: E402

NAMES = ["rrt", "rrtconnect", "rrtstar", "informedrrtstar", "sorrtstar",
         "prmstar", "bitstar", "fmtstar", "bfmtstar"]


def make_tunnel(rng, nx=80, ny=30, hs=0.05, ceiling=0.8):
    """Random slalom: staggered part-width walls with alternating gaps.

    Walls sit in slots >= 1.0 m apart (the Go1 ellipsoid is 0.75 m long, so
    it must fully fit between consecutive walls to shift lanes) and, like the
    reference's valid_tunnel_only terrain filter (tunnel.py:107-124),
    candidates are regenerated until the BFS validity check passes (bounded
    attempts; the filter rejects only rare edge geometries)."""
    from legged_tracking_tpu.utils.planner import valid_checking

    from legged_tracking_tpu.utils.planner import _pose_valid

    start = np.array([-1.6, 0, 0.27, 0, 0, 0, 1.0])
    goal = np.array([1.6, 0, 0.27, 0, 0, 0, 1.0])
    for _ in range(50):
        emap = np.zeros((2, nx, ny))
        emap[0] = ceiling
        # wall slots keep >=0.45 m of clearance to start (0.4 m) and goal
        # (3.6 m): the robot half-LENGTH is 0.38 m, so endpoints nearer a
        # wall row are invalid poses, not hard tunnels
        for i, slot in enumerate((19, 38, 57)):
            x = slot + rng.randint(-1, 2)
            free = rng.randint(12, 16)          # 0.60-0.75 m gap
            if i % 2 == 0:
                emap[1, x:x + 2, :ny - free] = 0.7
            else:
                emap[1, x:x + 2, free:] = 0.7
        if (_pose_valid(emap, hs, 0.4, 0.75, 0.27, 0.0)
                and _pose_valid(emap, hs, 3.6, 0.75, 0.27, 0.0)
                and valid_checking(emap, start, goal, 4.0, 1.5, 0.5, hs)):
            return emap, hs
    raise RuntimeError("no traversable slalom found in 50 attempts")


def main():
    n_tunnels = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    rows = {n: {"ok": 0, "cost": [], "t": []} for n in NAMES}
    for t in range(n_tunnels):
        rng = np.random.RandomState(100 + t)
        emap, hs = make_tunnel(rng)
        start = np.array([0.4, 0.75, 0.27, 0.0])
        goal = np.array([3.6, 0.75, 0.27, 0.0])
        for name in NAMES:
            fn = allocate_planner(name)
            # comparable budgets: graph planners get a roadmap sized to the
            # narrow-passage yaw fraction, tree planners more iterations
            kw = ({"num_samples": 1500} if name in
                  ("prmstar", "bitstar", "fmtstar", "bfmtstar")
                  else {"max_iters": 4000})
            t0 = time.perf_counter()
            path, cost = fn(emap, start, goal, hs, seed=t, **kw)
            dt = time.perf_counter() - t0
            rows[name]["t"].append(dt)
            if path is not None:
                rows[name]["ok"] += 1
                rows[name]["cost"].append(
                    path_cost(path, "pathlength"))

    out = ["# Planner menu — comparative benchmark",
           "",
           f"{n_tunnels} randomized 3-wall slalom tunnels (4.0 m x 1.5 m, "
           "0.05 m cells, 0.8 m ceiling), start (0.4, 0.75) -> goal "
           "(3.6, 0.75), pathlength objective. Same native menu as the "
           "reference's OMPL allocatePlanner "
           "(go1_gym/utils/planner.py:156-178). bitstar is a real Batch "
           "Informed Trees implementation (utils/planner.py plan_bit_star, "
           "round 5); the rows marked \"alias\" dispatch to the named "
           "native algorithm rather than a distinct implementation.",
           "",
           "| planner | success | mean path length (m) | mean time (s) |",
           "|---|---|---|---|"]
    ALIAS = {"fmtstar": "prmstar", "bfmtstar": "prmstar",
             "sorrtstar": "informedrrtstar"}
    for name in NAMES:
        r = rows[name]
        mc = np.mean(r["cost"]) if r["cost"] else float("nan")
        label = (f"{name} (alias of {ALIAS[name]})" if name in ALIAS
                 else name)
        out.append(f"| {label} | {r['ok']}/{n_tunnels} | {mc:.3f} | "
                   f"{np.mean(r['t']):.3f} |")
    out.append("")
    out.append("Regenerate: `python tools/planner_menu_bench.py`. "
               "Correctness + objective coverage: tests/test_planner.py.")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "PLANNER_MENU.md")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print("\n".join(out))


if __name__ == "__main__":
    main()
