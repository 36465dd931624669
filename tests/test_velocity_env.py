"""Velocity-tracking (walk-these-ways) env tests."""

import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from legged_tracking_tpu.tasks.curriculum import (DeviceCurriculum,
                                                  HostRewardThresholdCurriculum)
from legged_tracking_tpu.tasks.gaits import step_contact_targets


def make_env(num_envs=4, terrain="plane"):
    import train_velocity_tracking as tv
    args = tv.parse_args(["--num_envs", str(num_envs), "--terrain", terrain,
                          "--terrain_rows", "2", "--terrain_cols", "2",
                          "--pd_control", "--cpu"])
    cfg = tv.build_cfg(args)
    cfg.env.episode_length_s = 2.0
    from legged_tracking_tpu.envs.velocity_env import VelocityTrackingEnv
    return VelocityTrackingEnv(cfg)


def test_velocity_obs_dims():
    env = make_env()
    # reference train_velocity_tracking.py:88 — 70-dim obs
    assert env.num_obs == 70, env.num_obs
    assert env.num_privileged_obs == 2


def test_velocity_step_and_gaits():
    env = make_env()
    env.reset(randomize_ep_len=False)
    assert env.state.commands.shape == (4, 15)
    # commands within limits
    cm = np.asarray(env.state.commands)
    assert (np.abs(cm[:, 0]) <= 5.0 + 1e-6).all()
    a = jnp.zeros((4, 12))
    for _ in range(5):
        od, rew, done, info = env.step(a)
        assert bool(jnp.all(jnp.isfinite(od["obs"])))
        assert od["obs"].shape == (4, 70)
    # gait state advanced and desired contacts in [0, 1]
    d = np.asarray(env.state.desired_contact_states)
    assert (d >= -1e-6).all() and (d <= 1 + 1e-6).all()
    assert np.asarray(env.state.gait_indices).max() > 0


def test_gait_clock_math():
    """Trot: diagonal feet share phase; duration warp halves at d=0.5."""
    commands = jnp.zeros((1, 15))
    commands = commands.at[0, 4].set(3.0)   # frequency
    commands = commands.at[0, 5].set(0.5)   # phase (trot)
    commands = commands.at[0, 8].set(0.5)   # duration
    g = step_contact_targets(jnp.zeros(1), commands, 0.02, 0.07)
    fi = np.asarray(g.foot_indices)[0]
    # feet 0 (phase+off+bound=0.5) and 3 (phase=0.5) share phase; 1,2 share
    assert abs(fi[0] - fi[3]) < 1e-6
    assert abs(fi[1] - fi[2]) < 1e-6
    assert abs((fi[0] - fi[1]) % 1.0 - 0.5) < 1e-6


def test_device_curriculum_matches_host_update():
    ranges = [(-1, 1, 5), (-1, 1, 3)]
    host = HostRewardThresholdCurriculum(0, x=(-1, 1, 5), y=(-1, 1, 3))
    host.set_to(np.array([-0.5, -0.5]), np.array([0.5, 0.5]))
    dev = DeviceCurriculum(ranges, [-0.5, -0.5], [0.5, 0.5],
                           np.array([0.5, 0.5]), num_categories=1)
    assert np.allclose(np.asarray(dev.init_weights[0]), host.weights)

    # success in bin 7 bumps the same neighbourhood
    bins = np.array([7])
    host.update(bins, [np.array([1.0])], [0.5], local_range=np.array([0.5, 0.5]))
    w = dev.curriculum_update_test = dev.update(
        dev.init_weights, jnp.zeros(1, jnp.int32), jnp.asarray(bins),
        jnp.ones(1, bool))
    assert np.allclose(np.asarray(w[0]), host.weights)


def test_velocity_trimesh_terrain():
    env = make_env(num_envs=4, terrain="trimesh")
    env.reset(randomize_ep_len=False)
    a = jnp.zeros((4, 12))
    for _ in range(3):
        od, rew, done, info = env.step(a)
    assert bool(jnp.all(jnp.isfinite(od["obs"])))
