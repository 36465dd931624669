"""Round-5 data-path restructures: equality + invariants.

Covers the three perf-path rewrites (VERDICT r4 items 1 and 4):
  - GranuleSampler interleaved extraction == legacy granule extraction
    (bitwise heights/grads for in-window points; exercised on tunnel AND
    velocity-terrain tile shapes)
  - windowed obs-history reconstruction == stored-history minibatches
    (bitwise train-state equality over full train iterations)
  - the sort-free shuffle is a bijection and decorrelates (t, env) blocks
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legged_tracking_tpu.config import Cfg, config_go1


def _small_cfg(num_envs=8):
    cfg = config_go1(Cfg())
    cfg.env.num_envs = num_envs
    cfg.terrain.mesh_type = "trimesh"
    cfg.terrain.terrain_type = "single_path"
    cfg.terrain.num_rows = 2
    cfg.terrain.num_cols = 2
    cfg.terrain.terrain_length = 4.0
    cfg.terrain.terrain_width = 2.0
    cfg.terrain.ceiling_height = 0.8
    cfg.env.episode_length_s = 2.0
    cfg.commands.traj_function = "fixed_target"
    cfg.commands.traj_length = 1
    cfg.noise.add_noise = False
    cfg.domain_rand.randomize_friction = False
    return cfg


def test_cheap_perm_is_bijection():
    from legged_tracking_tpu.learn.ppo import _cheap_perm
    for B, T, N in [(96, 24, 4), (98304, 24, 4096), (360, 24, 15)]:
        p = np.asarray(_cheap_perm(jax.random.key(3), B, T, N))
        assert p.shape == (B,)
        assert np.array_equal(np.sort(p), np.arange(B))


def test_cheap_perm_mixes_time_and_env():
    """A minibatch slice must not be a single-env or single-step block."""
    from legged_tracking_tpu.learn.ppo import _cheap_perm
    B, T, N = 24 * 64, 24, 64
    p = np.asarray(_cheap_perm(jax.random.key(0), B, T, N))
    mb = p[: B // 4]
    t_idx, n_idx = mb // N, mb % N
    assert len(np.unique(t_idx)) == T          # every step represented
    assert len(np.unique(n_idx)) > N // 2      # most envs represented


@pytest.mark.parametrize("tile_hw", [(80, 40), (160, 72)])
def test_interleaved_extraction_matches_granule(tile_hw):
    """Bitwise heights/grads vs the legacy granule path (both bf16 tables),
    on the tunnel (80x40 -> wp=64) and velocity (160x72 -> wp=128) shapes."""
    from legged_tracking_tpu.terrain.heightfield import (
        GranuleSampler, TerrainArrays, extract_patches_batched_granule,
        sample_patch_bilinear_fused, transpose_patch)

    h, w = tile_hw
    rng = np.random.default_rng(1)
    tiles = rng.uniform(0.0, 0.5, (3, 2, h, w)).astype(np.float32)
    tiles[:, 0] += 0.6                          # ceiling above floor
    N = 16
    env_tile = jnp.asarray(rng.integers(0, 3, N), jnp.int32)
    origin = jnp.zeros((N, 3), jnp.float32)
    terrain = TerrainArrays(
        tiles=jnp.asarray(tiles), env_tile=env_tile,
        env_origin=origin, env_terrain_origin=origin,
        horizontal_scale=0.05, is_plane=False)
    gs = GranuleSampler(terrain)
    base = jnp.asarray(
        rng.uniform([1.0, 0.7], [h * 0.05 - 1.0, w * 0.05 - 0.7],
                    (N, 2)).astype(np.float32))
    pts = base[:, None, :] + jnp.asarray(
        rng.uniform(-0.45, 0.45, (N, 48, 2)).astype(np.float32))

    pz_new, xs_n, ys_n = gs.extract(env_tile, origin, base, 24, 16, 0.05)
    p_old, xs_o, ys_o = extract_patches_batched_granule(
        terrain, env_tile, origin, base, 24, 16)
    f = jax.vmap(sample_patch_bilinear_fused,
                 in_axes=(0, 0, 0, None, None, None, 0, 0))
    h_n, g_n = f(pz_new, xs_n, ys_n, 0.05, h, w, origin, pts)
    h_o, g_o = f(transpose_patch(p_old), xs_o, ys_o, 0.05, h, w, origin, pts)
    assert jnp.all(h_n == h_o)
    assert jnp.all(g_n == g_o)


def test_windowed_history_matches_stored():
    """Full train iterations with windowed_history on/off produce equal
    params/opt state (the reconstructed minibatch histories are bitwise the
    stored rows, and everything downstream is the same program)."""
    from legged_tracking_tpu.envs import LeggedEnv
    from legged_tracking_tpu.learn import PPO, PPOArgs

    cfg = _small_cfg()
    env = LeggedEnv(cfg)
    outs = {}
    for windowed in (False, True):
        alg = PPO(env, args=PPOArgs(windowed_history=windowed,
                                    cheap_shuffle=True))
        ts = alg.init(jax.random.key(0))
        es = env._reset_jit(jax.random.key(1), True)
        obs = env._observe_jit(es)
        key = jax.random.key(2)
        for _ in range(2):
            key, k = jax.random.split(key)
            ts, es, obs, m = alg.train_iteration(ts, es, obs, k)
        outs[windowed] = (ts.params, m["value_loss"])
    leaves_a = jax.tree.leaves(outs[False][0])
    leaves_b = jax.tree.leaves(outs[True][0])
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.0, atol=0.0)
    np.testing.assert_allclose(np.asarray(outs[False][1]),
                               np.asarray(outs[True][1]), rtol=0, atol=0)


def test_interleaved_env_rollout_matches_legacy():
    """20-step env rollout under the interleaved default equals the legacy
    granule path bitwise (same actions, same seeds)."""
    from legged_tracking_tpu.envs import LeggedEnv

    states = {}
    for interleaved in (False, True):
        cfg = _small_cfg()
        cfg.sim.interleaved_gather = interleaved
        env = LeggedEnv(cfg)
        es = env._reset_jit(jax.random.key(1), True)
        key = jax.random.key(5)
        for t in range(20):
            key, k = jax.random.split(key)
            a = jax.random.uniform(k, (cfg.env.num_envs, 12),
                                   minval=-1.0, maxval=1.0)
            es, out = env._step_jit(es, a)
        states[interleaved] = es
    a, b = states[False], states[True]
    assert jnp.all(a.phys.base_pos == b.phys.base_pos)
    assert jnp.all(a.phys.qj == b.phys.qj)
    assert jnp.all(a.obs_history == b.obs_history)
