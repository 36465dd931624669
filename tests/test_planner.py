"""Planner tests: validity BFS and RRT on synthetic tunnels."""

import numpy as np

from legged_tracking_tpu.utils.planner import _pose_valid, plan, valid_checking


def make_tunnel(nx=60, ny=30, hs=0.05, ceiling=0.8, blocked=False):
    emap = np.zeros((2, nx, ny))
    emap[0] = ceiling
    if blocked:
        emap[1, nx // 2 - 2: nx // 2 + 2, :] = 0.7   # full-width wall
    return emap, hs


def test_pose_validity():
    emap, hs = make_tunnel()
    assert _pose_valid(emap, hs, 1.5, 0.75, 0.27, 0.0)
    # squeezed between floor wall and ceiling -> invalid
    emap2, _ = make_tunnel(blocked=True)
    assert not _pose_valid(emap2, hs, 1.5, 0.75, 0.27, 0.0)


def test_valid_checking_open_and_blocked():
    emap, hs = make_tunnel()
    start = np.array([-1.1, 0, 0.27, 0, 0, 0, 1.0])
    goal = np.array([1.1, 0, 0.27, 0, 0, 0, 1.0])
    assert valid_checking(emap, start, goal, 3.0, 1.5, 0.5, hs)
    emap2, _ = make_tunnel(blocked=True)
    assert not valid_checking(emap2, start, goal, 3.0, 1.5, 0.5, hs)


def test_rrt_plan():
    emap, hs = make_tunnel()
    start = np.array([0.4, 0.75, 0.27, 0.0])
    goal = np.array([2.4, 0.75, 0.27, 0.0])
    path = plan(emap, start, goal, hs, seed=1)
    assert path is not None
    assert np.linalg.norm(path[-1][:2] - goal[:2]) < 0.2
    # consecutive waypoints are close
    steps = np.linalg.norm(np.diff(path[:, :3], axis=0), axis=1)
    assert steps.max() < 0.5
