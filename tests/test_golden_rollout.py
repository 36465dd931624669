"""Golden-trajectory regression under fixed seed.

SURVEY.md §4 test strategy: a fixed-seed rollout must reproduce the recorded
trajectory bit-for-bit-ish across refactors (BASELINE.json demands trajectory
reproduction).  The golden is regenerated intentionally via
``python tests/test_golden_rollout.py`` when a physics-semantics change is
deliberate — the diff then shows up in review.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "assets", "goldens",
                      "tunnel_rollout_v1.npz")


def make_env():
    from legged_tracking_tpu.config import Cfg, config_go1
    from legged_tracking_tpu.envs import LeggedEnv

    cfg = config_go1(Cfg())
    cfg.env.num_envs = 4
    cfg.terrain.mesh_type = "trimesh"
    cfg.terrain.terrain_type = "single_path"
    cfg.terrain.num_rows = 2
    cfg.terrain.num_cols = 2
    cfg.terrain.terrain_length = 4.0
    cfg.terrain.terrain_width = 2.0
    cfg.terrain.terrain_ratio_x = 0.9
    cfg.terrain.terrain_ratio_y = 0.5
    cfg.terrain.ceiling_height = 0.8
    cfg.terrain.start_loc = 0.32
    cfg.env.command_type = "xy"
    cfg.terrain.measure_front_half = True
    cfg.control.control_type = "actuator_net"
    cfg.env.episode_length_s = 4.0
    cfg.seed = 7
    return LeggedEnv(cfg, seed=7)


def rollout():
    env = make_env()
    state = env.reset_fn(jax.random.key(7), False)
    step = jax.jit(env.step_fn)
    traj = []
    a = jnp.tile(jnp.asarray([0.1, -0.2, 0.3, -0.1, 0.2, -0.3] * 2)[None], (4, 1))
    for t in range(20):
        state, out = step(state, a * jnp.cos(0.1 * t))
        traj.append(np.asarray(state.phys.base_pos))
    return np.stack(traj), np.asarray(out.obs), np.asarray(out.rew)


def test_golden_rollout():
    traj, obs, rew = rollout()
    if not os.path.exists(GOLDEN):
        import pytest
        pytest.skip("golden not generated yet")
    g = np.load(GOLDEN)
    assert np.allclose(traj, g["traj"], atol=1e-3), np.abs(traj - g["traj"]).max()  # 1e-3: float-reassociation headroom
    assert np.allclose(rew, g["rew"], atol=1e-5)


if __name__ == "__main__":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    jax.config.update("jax_platforms", "cpu")
    traj, obs, rew = rollout()
    np.savez(GOLDEN, traj=traj, obs=obs, rew=rew)
    print(f"wrote {GOLDEN}: traj {traj.shape}")
