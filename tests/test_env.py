"""Environment-layer tests: obs dims, terrain build, stepping, auto-reset.

The reference has no test suite (SURVEY.md §4); these encode its runtime
asserts (obs width vs num_observations, legged_robot_trajectory_tracking.py:475)
plus JAX-specific invariants (jit purity, finite outputs, auto-reset).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legged_tracking_tpu.config import Cfg, config_go1
from legged_tracking_tpu.envs import LeggedEnv
from legged_tracking_tpu.terrain.tunnel import build_terrain


def make_cfg(terrain="plane", command_type="xy", front_half=True, num_envs=4):
    cfg = config_go1(Cfg())
    cfg.env.num_envs = num_envs
    cfg.env.command_type = command_type
    cfg.terrain.measure_front_half = front_half
    cfg.control.control_type = "P"
    cfg.env.episode_length_s = 2.0
    if terrain == "plane":
        cfg.terrain.mesh_type = "plane"
    else:
        cfg.terrain.mesh_type = "trimesh"
        cfg.terrain.terrain_type = terrain
        cfg.terrain.num_rows = 2
        cfg.terrain.num_cols = 2
        cfg.terrain.terrain_length = 4.0
        cfg.terrain.terrain_width = 2.0
        cfg.terrain.terrain_ratio_x = 0.9
        cfg.terrain.terrain_ratio_y = 0.5
        cfg.terrain.ceiling_height = 0.8
        cfg.terrain.start_loc = 0.32
    return cfg


def test_obs_dims_match_reference():
    """Obs widths must reproduce scripts/train.py:51-60 (261/503 xy, 265/507 6dof)."""
    for ct, fh, expect in [("xy", True, 261), ("xy", False, 503),
                           ("6dof", True, 265), ("6dof", False, 507)]:
        cfg = make_cfg(command_type=ct, front_half=fh)
        env = LeggedEnv(cfg)
        assert env.num_obs == expect, (ct, fh, env.num_obs, expect)
    # blind variant: 41 scalars for xy
    cfg = make_cfg()
    cfg.env.observe_heights = False
    env = LeggedEnv(cfg)
    assert env.num_obs == 41


def test_tunnel_terrain_build():
    cfg = make_cfg(terrain="single_path", num_envs=8)
    t = build_terrain(cfg, 8, seed=3)
    tiles = np.asarray(t.tiles)
    assert tiles.shape == (4, 2, 80, 40)
    # ceiling everywhere >= 0.05 above floor-level zero and <= ceiling height
    assert tiles[:, 0].min() >= 0.05 - 1e-6
    assert tiles[:, 0].max() <= cfg.terrain.ceiling_height + 1e-6
    # floor border walls at 0.5
    assert np.allclose(tiles[:, 1, 0, :], 0.5)
    # spawn region inside the window must be (mostly) flat floor
    origins = np.asarray(t.env_origin)
    assert origins.shape == (8, 3)
    # env origin local x = (0.5 - 0.32) * 4 = 0.72 m
    assert np.allclose(origins[0, 0], 0.72)


def test_step_and_autoreset():
    cfg = make_cfg(num_envs=4)
    env = LeggedEnv(cfg)
    obs = env.reset(randomize_ep_len=False)
    assert obs["obs"].shape == (4, env.num_obs)
    assert obs["privileged_obs"].shape == (4, env.num_privileged_obs)
    a = jnp.zeros((4, 12))
    saw_done = False
    max_len = int(cfg.env.max_episode_length)
    for i in range(max_len + 2):
        od, rew, done, info = env.step(a)
        assert bool(jnp.all(jnp.isfinite(od["obs"])))
        assert bool(jnp.all(jnp.isfinite(rew)))
        if bool(jnp.any(done)):
            saw_done = True
    assert saw_done  # episode timeout must fire
    # after timeout resets, episode lengths must have wrapped
    assert int(jnp.max(env.state.episode_length)) <= max_len + 1


def test_tunnel_env_steps():
    cfg = make_cfg(terrain="single_path", num_envs=4)
    env = LeggedEnv(cfg)
    env.reset(randomize_ep_len=False)
    a = jnp.zeros((4, 12))
    for _ in range(5):
        od, rew, done, info = env.step(a)
    # robot must stay between floor and ceiling
    z = np.asarray(env.state.phys.base_pos[:, 2])
    assert (z > -0.05).all() and (z < 1.0).all()
    # height scan must see the ceiling (top layer < 1.0 somewhere)
    h = env._get_heights(env.state.phys.base_pos,
                         jnp.zeros((4, 3)))
    # + bf16 height quantization of the patch store (heightfield.py)
    assert np.asarray(h)[:, 0].max() <= cfg.terrain.ceiling_height * (1 + 2**-8)


def test_reward_scales_wired():
    cfg = make_cfg()
    cfg.reward_scales.set("exploration_lin", 1.0)
    cfg.reward_scales.set("exploration_yaw", 0.4)
    env = LeggedEnv(cfg)
    assert "exploration_lin" in env.reward_names
    env.reset(randomize_ep_len=False)
    od, rew, done, info = env.step(jnp.zeros((4, 12)))
    assert info["episode_sums"].shape == (4, len(env.metric_names))


def test_step_deterministic():
    """Same state + action -> identical results (pure function)."""
    cfg = make_cfg(num_envs=2)
    env = LeggedEnv(cfg)
    env.reset(randomize_ep_len=False)
    s0 = env.state
    a = jnp.full((2, 12), 0.1)
    s1, out1 = env.step_fn(s0, a)
    s2, out2 = env.step_fn(s0, a)
    assert np.allclose(np.asarray(out1.obs), np.asarray(out2.obs))
    assert np.allclose(np.asarray(s1.phys.base_pos), np.asarray(s2.phys.base_pos))


def test_cl_dist_mix_rehearsal_slice():
    """cl_dist_mix: leading train envs sample U[cl_start, target] goal
    distances; the frontier slice stays at the target distance; PPO emits
    frontier_* metrics that exclude the rehearsal slice."""
    import jax
    import numpy as np
    from legged_tracking_tpu.config import Cfg, config_go1
    from legged_tracking_tpu.envs import LeggedEnv

    cfg = config_go1(Cfg())
    cfg.env.num_envs = 16
    cfg.env.command_type = "xy"
    cfg.terrain.mesh_type = "trimesh"
    cfg.terrain.terrain_type = "single_path"
    cfg.terrain.num_rows = 2
    cfg.terrain.num_cols = 2
    cfg.terrain.terrain_length = 6.0
    cfg.terrain.terrain_width = 2.0
    cfg.terrain.terrain_ratio_x = 0.9
    cfg.terrain.terrain_ratio_y = 0.5
    cfg.terrain.ceiling_height = 0.8
    cfg.terrain.start_loc = 0.2
    cfg.terrain.x_init_range = 0.0
    cfg.terrain.y_init_range = 0.0
    cfg.commands.traj_function = "fixed_target"
    cfg.commands.traj_length = 1
    cfg.commands.x_range = 0.0
    cfg.commands.y_range = 0.0
    ct = cfg.curriculum_thresholds
    ct.cl_fix_target = True
    ct.cl_start_target_dist = 0.6
    ct.cl_dist_mix = 0.5
    env = LeggedEnv(cfg)
    state = env._reset_jit(jax.random.key(0), True)
    # push the curriculum to 3.0 and resample via a fresh reset
    state = state._replace(target_dist=jax.numpy.asarray(3.0))
    phys, act, traj = env._reset_values(state.rng, state.target_dist)
    dx = np.asarray(traj[:, 0, 0] - phys.base_pos[:, 0])
    n_mix = 8
    assert np.all(dx[n_mix:] > 2.9), dx[n_mix:]          # frontier at target
    assert np.all(dx[:n_mix] > 0.5) and np.all(dx[:n_mix] < 3.01)
    assert dx[:n_mix].std() > 0.3, dx[:n_mix]            # genuinely mixed

    from legged_tracking_tpu.learn import PPO, PPOArgs
    alg = PPO(env, args=PPOArgs(num_steps_per_env=2))
    assert alg.n_mix == 8
    ts = alg.init(jax.random.key(1))
    obs = env._observe_jit(state)
    ts, state2, _, metrics = alg.train_iteration_jit(
        ts, state, obs, jax.random.key(2))
    assert "frontier_reached_mean" in metrics


def test_sampling_planner_stored_scan():
    """pms path: the local planner consumes the height scan stored by the
    previous step (EnvState.measured_heights) instead of re-scanning, so each
    step pays ONE _get_heights where the reference pays two (:789 and :357).
    The stored scan must equal a fresh scan at the state's own base pose."""
    cfg = make_cfg(terrain="single_path", num_envs=4)
    cfg.commands.sampling_based_planning = True
    cfg.commands.plan_interval = 2
    env = LeggedEnv(cfg)
    state = env._reset_jit(jax.random.key(0), False)
    assert state.measured_heights is not None
    assert state.measured_heights.shape == (4, 2) + env.height_grid_shape

    step = jax.jit(env.step_fn)
    a = jnp.zeros((4, 12))
    for _ in range(3):
        state, out = step(state, a)
        assert bool(jnp.all(jnp.isfinite(out.obs)))
        assert bool(jnp.all(jnp.isfinite(out.rew)))
    # invariant: stored scan == fresh scan at the post-step (post-reset) pose
    from legged_tracking_tpu.utils import quat as qt
    rpy = qt.quaternion_to_roll_pitch_yaw(state.phys.base_quat)
    fresh = env._get_heights(state.phys.base_pos, rpy)
    np.testing.assert_allclose(np.asarray(state.measured_heights),
                               np.asarray(fresh), atol=1e-6)
    # the planner actually planned: local target differs from raw waypoint
    # for at least the planning envs, and plan_length advanced
    assert state.local_target_poses.shape == (4, 6)


def test_pallas_scan_env_obs_match():
    """sim.pallas_scan swaps the obs-scan implementation only: observations
    must match the patch path exactly (same bf16-quantized table)."""
    cfg_a = make_cfg(terrain="single_path", num_envs=4)
    cfg_b = make_cfg(terrain="single_path", num_envs=4)
    cfg_b.sim.pallas_scan = True
    env_a, env_b = LeggedEnv(cfg_a), LeggedEnv(cfg_b)
    sa = env_a._reset_jit(jax.random.key(0), False)
    sb = env_b._reset_jit(jax.random.key(0), False)
    oa = env_a._observe_jit(sa)
    ob = env_b._observe_jit(sb)
    np.testing.assert_allclose(np.asarray(oa["obs"]), np.asarray(ob["obs"]),
                               rtol=0, atol=1e-6)
    a = jnp.full((4, 12), 0.03)
    for _ in range(3):
        sa, outa = env_a._step_jit(sa, a)
        sb, outb = env_b._step_jit(sb, a)
    np.testing.assert_allclose(np.asarray(outa.obs), np.asarray(outb.obs),
                               rtol=0, atol=1e-6)


def test_granule_gather_env_match():
    """sim.granule_gather swaps patch extraction only: physics and obs must
    match the row-gather path exactly (the granule window is a superset of
    the row window for in-envelope points)."""
    cfg_a = make_cfg(terrain="single_path", num_envs=4)
    cfg_b = make_cfg(terrain="single_path", num_envs=4)
    cfg_b.sim.granule_gather = True
    env_a, env_b = LeggedEnv(cfg_a), LeggedEnv(cfg_b)
    sa = env_a._reset_jit(jax.random.key(0), False)
    sb = env_b._reset_jit(jax.random.key(0), False)
    a = jnp.full((4, 12), 0.03)
    for _ in range(3):
        sa, outa = env_a._step_jit(sa, a)
        sb, outb = env_b._step_jit(sb, a)
    np.testing.assert_allclose(np.asarray(sa.phys.base_pos),
                               np.asarray(sb.phys.base_pos), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(outa.obs), np.asarray(outb.obs),
                               rtol=0, atol=0)


def test_planner_quadform_matches_direct():
    """The precomputed quadratic form must reproduce the direct
    rotate-and-normalize candidate collision test (same math, reorganized;
    the effective yaw is the QUAT yaw incl. the roll/pitch shift)."""
    from legged_tracking_tpu.utils import quat as qt

    cfg = make_cfg(terrain="single_path", num_envs=4)
    cfg.commands.sampling_based_planning = True
    env = LeggedEnv(cfg)
    cands = env._candidate_poses
    rng = np.random.RandomState(3)
    pts = jnp.asarray(rng.uniform(-1.2, 1.2, (4, 60, 3)).astype(np.float32))

    # direct form (the pre-round-4 path)
    cq = qt.quat_from_euler_xyz(cands[:, 3], cands[:, 4], cands[:, 5])
    d = pts[:, None, :, :] - cands[None, :, None, :3]
    d = qt.quat_apply_yaw_inverse(cq[None, :, None, :], d)
    quad_direct = jnp.sum(jnp.square(d / env._robot_size), axis=-1)  # (N,C,2P)
    valid_direct = jnp.all(quad_direct > 1.0, axis=-1)

    # quadform
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    F = jnp.stack([x * x, y * y, z * z, x * y, x, y, z,
                   jnp.ones_like(x)], axis=-1)
    q = jnp.einsum("npf,fc->ncp", F, env._cand_quad_w,
                   precision=jax.lax.Precision.HIGHEST)
    valid_quad = jnp.all(q > 1.0, axis=-1)

    np.testing.assert_allclose(np.asarray(q), np.asarray(quad_direct),
                               rtol=2e-4, atol=2e-4)
    mismatch = int(jnp.sum(valid_direct != valid_quad))
    assert mismatch == 0, mismatch
