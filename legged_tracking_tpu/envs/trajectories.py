"""Batched waypoint/trajectory generators.

Pure-functional equivalents of the reference ``TrajectoryFunctions``
(go1_gym/envs/trajectories/trajectory_function.py:10-93): each returns
``(N, traj_length, 6)`` poses ``[x, y, z, roll, pitch, yaw]`` in world frame,
sampled per env from its own PRNG key — resampled on reset
(``_resample_trajectory``, legged_robot_trajectory_tracking.py:949-955).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..terrain.heightfield import TerrainArrays


def fixed_target(key, base_pos, cfg, terrain: TerrainArrays, env_tile,
                 env_terrain_origin, target_dist):
    """Fixed delta between waypoints (trajectory_function.py:14-26).

    ``target_dist`` overrides base_x when the fix-target curriculum is active
    (update_curriculum, reference :186-196).
    """
    c = cfg.commands
    L = c.traj_length
    n = jnp.arange(1, L + 1, dtype=jnp.float32)
    base_x = target_dist if cfg.curriculum_thresholds.cl_fix_target else c.base_x
    x = n * base_x + base_pos[0]
    y = n * c.base_y + base_pos[1]
    z = jnp.full((L,), c.base_z)
    roll = jnp.full((L,), c.base_roll)
    pitch = jnp.full((L,), c.base_pitch)
    yaw = jnp.zeros((L,))
    return jnp.stack([x, y, z, roll, pitch, yaw], axis=1)


def random_goal(key, base_pos, cfg, terrain, env_tile, env_terrain_origin, target_dist):
    """Random xy goal + random yaw (trajectory_function.py:28-40)."""
    c = cfg.commands
    L = c.traj_length
    kx, ky, kyaw = jax.random.split(key, 3)
    x_mean = target_dist if cfg.curriculum_thresholds.cl_fix_target else c.x_mean
    x = (jax.random.uniform(kx, (L,)) - 0.5) * c.x_range + x_mean + base_pos[0]
    y = (jax.random.uniform(ky, (L,)) - 0.5) * c.y_range + c.y_mean + base_pos[1]
    z = jnp.full((L,), c.base_z)
    yaw = jax.random.uniform(kyaw, (L,)) * 2 * c.yaw_range - c.yaw_range
    zero = jnp.zeros((L,))
    return jnp.stack([x, y, z, zero, zero, yaw], axis=1)


def valid_goal(key, base_pos, cfg, terrain: TerrainArrays, env_tile,
               env_terrain_origin, target_dist):
    """Goal at the y with the widest floor-to-ceiling opening at a random x
    (trajectory_function.py:42-67)."""
    c = cfg.commands
    L = c.traj_length
    tile = terrain.tiles[env_tile]                       # (2, h, w)
    openings = tile[0] - tile[1]                         # (h, w)
    h, w = openings.shape
    x_mean = target_dist if cfg.curriculum_thresholds.cl_fix_target else c.x_mean
    x = (jax.random.uniform(key, (L,)) - 0.5) * c.x_range + x_mean
    x = x + base_pos[0] - env_terrain_origin[0]
    xp = jnp.clip((x / terrain.horizontal_scale).astype(jnp.int32), 0, h - 1)
    row = openings[xp]                                   # (L, w)
    edge = jnp.clip(jnp.linspace(-0.01, 0.01, w), 0, 1) + jnp.clip(
        jnp.linspace(0.01, -0.01, w), 0, 1)
    yp = jnp.argmax(row - edge, axis=1)
    y = yp * terrain.horizontal_scale
    x = x + env_terrain_origin[0]
    y = y + env_terrain_origin[1]
    z = jnp.full((L,), c.base_z)
    zero = jnp.zeros((L,))
    return jnp.stack([x, y, z, zero, zero, zero], axis=1)


def random_target(key, base_pos, cfg, terrain, env_tile, env_terrain_origin, target_dist):
    """Random 6-DoF waypoints with linear interpolation
    (trajectory_function.py:70-93)."""
    c = cfg.commands
    ni = c.num_interpolation
    assert c.traj_length % ni == 0
    nt = c.traj_length // ni + 1
    ks = jax.random.split(key, 6)
    ranges = jnp.array([c.x_range, c.y_range, c.z_range,
                        c.roll_range, c.pitch_range, c.yaw_range])
    dims = [jax.random.uniform(ks[i], (nt,)) * 2 * ranges[i] - ranges[i] for i in range(6)]
    tp = jnp.stack(dims, axis=1)                         # (nt, 6)
    tp = tp.at[0].set(0.0)
    delta = (tp[1:] - tp[:-1]) / ni                      # (nt-1, 6)
    steps = jnp.arange(1, ni + 1, dtype=jnp.float32)     # (ni,)
    interp = tp[:-1, None, :] + steps[None, :, None] * delta[:, None, :]
    interp = interp.reshape(-1, 6)                       # (traj_length, 6)
    return interp.at[:, :3].add(base_pos)


TRAJ_FUNCTIONS = {
    "fixed_target": fixed_target,
    "random_goal": random_goal,
    "valid_goal": valid_goal,
    "random_target": random_target,
}
