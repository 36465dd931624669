"""Learner utilities: trajectory padding + running obs normalization.

Ports of ``go1_gym_learn/utils/utils.py`` (split_and_pad_trajectories /
unpad_trajectories — used by recurrent minibatch generators) and
``running_average.py`` (RunningMeanStd, Chan's parallel variance), expressed
with static shapes: the padded output always has T columns (the maximum
possible trajectory length inside a T-step buffer) so it jits cleanly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def split_and_pad_trajectories(tensor, dones):
    """Split (T, N, ...) at dones, pad to T, return (T, n_traj_max, ...) + mask.

    Unlike the torch version the number of trajectory slots is static
    (T * N upper bound); empty slots have all-False masks — callers weight by
    the mask, so the extra slots are inert.
    """
    T, N = dones.shape[:2]
    dones = dones.astype(bool).at[-1].set(True)
    flat = jnp.moveaxis(tensor, 0, 1).reshape((T * N,) + tensor.shape[2:])
    flat_dones = jnp.moveaxis(dones, 0, 1).reshape(-1)

    # trajectory id per element = count of dones before it (env-major order)
    starts = jnp.concatenate([jnp.zeros(1, bool), flat_dones[:-1]])
    traj_id = jnp.cumsum(starts.astype(jnp.int32))
    # position within trajectory
    idx = jnp.arange(T * N)
    start_idx = jnp.where(starts, idx, 0)
    start_of_traj = jax.lax.associative_scan(jnp.maximum, start_idx)
    pos = idx - start_of_traj

    n_slots = T * N
    padded = jnp.zeros((n_slots, T) + tensor.shape[2:], tensor.dtype)
    padded = padded.at[traj_id, pos].set(flat)
    mask = jnp.zeros((n_slots, T), bool).at[traj_id, pos].set(True)
    return jnp.moveaxis(padded, 0, 1), mask.T  # (T, n_slots, ...), (T, n_slots)


def unpad_trajectories(trajectories, masks, num_envs: int):
    """Inverse of split_and_pad_trajectories back to (T, N, ...)."""
    T = trajectories.shape[0]
    flat = jnp.moveaxis(trajectories, 0, 1)[jnp.moveaxis(masks, 0, 1)]
    out = flat.reshape((num_envs, T) + trajectories.shape[2:])
    return jnp.moveaxis(out, 0, 1)


class RunningMeanStd(NamedTuple):
    """Streaming mean/var (running_average.py:4-60) as an immutable pytree."""
    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray

    @staticmethod
    def create(shape, epsilon: float = 1e-2):
        return RunningMeanStd(mean=jnp.zeros(shape), var=jnp.ones(shape),
                              count=jnp.asarray(epsilon))

    def update(self, arr):
        batch_mean = jnp.mean(arr, axis=0)
        batch_var = jnp.var(arr, axis=0)
        batch_count = arr.shape[0]
        delta = batch_mean - self.mean
        tot = self.count + batch_count
        new_mean = self.mean + delta * batch_count / tot
        m2 = (self.var * self.count + batch_var * batch_count
              + jnp.square(delta) * self.count * batch_count / tot)
        return RunningMeanStd(mean=new_mean, var=m2 / tot, count=tot)

    def normalize(self, obs):
        return (obs - self.mean) / jnp.sqrt(self.var + 1e-8)
