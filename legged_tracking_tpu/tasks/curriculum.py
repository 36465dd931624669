"""Grid-bin command curricula.

Two implementations of the reference's curriculum framework
(go1_gym/envs/base/curriculum.py):

- :class:`HostCurriculum` / :class:`HostRewardThresholdCurriculum` — direct
  numpy parity ports of ``Curriculum`` (:17-89) and
  ``RewardThresholdCurriculum`` (:113-159) for offline tooling and tests.

- :class:`DeviceCurriculum` — the TPU-native form: the weight vector lives in
  the env state as a ``(num_categories, num_bins)`` array; sampling is a
  batched categorical + per-cell uniform, and the success-driven weight bump
  (bin + neighbours within ``local_range``, +0.2 clipped to [0,1],
  reference :135-154) is a masked scatter-add.  Divergence: simultaneous
  successes accumulate additively before the clip instead of sequentially —
  monotonically equivalent under the [0,1] clip.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def _make_grid(key_ranges):
    """Bin-centre grid (n_bins, d) + bin sizes (d,) (reference :28-55)."""
    centres = []
    sizes = []
    for lo, hi, n in key_ranges:
        size = (hi - lo) / n
        centres.append(np.linspace(lo + size / 2, hi - size / 2, n))
        sizes.append(size)
    mesh = np.meshgrid(*centres, indexing="ij")
    grid = np.stack([m.ravel() for m in mesh], axis=1)  # (n_bins, d)
    return grid.astype(np.float32), np.asarray(sizes, dtype=np.float32)


class HostCurriculum:
    """Numpy parity port of the reference ``Curriculum``."""

    def __init__(self, seed, **key_ranges):
        self.rng = np.random.RandomState(seed)
        self.keys = list(key_ranges.keys())
        self.grid, self.bin_sizes = _make_grid(list(key_ranges.values()))
        self.lows = np.array([r[0] for r in key_ranges.values()])
        self.highs = np.array([r[1] for r in key_ranges.values()])
        self.weights = np.zeros(self.grid.shape[0])
        self.indices = np.arange(self.grid.shape[0])

    def __len__(self):
        return self.grid.shape[0]

    def set_to(self, low, high, value=1.0):
        inds = np.logical_and(self.grid >= low[None, :],
                              self.grid <= high[None, :]).all(axis=1)
        assert inds.any(), "empty initialization domain"
        self.weights[inds] = value

    def sample_bins(self, batch_size, low=None, high=None):
        w = self.weights
        if low is not None and high is not None:
            valid = np.logical_and(self.grid >= low[None, :],
                                   self.grid <= high[None, :]).all(axis=1)
            w = np.where(valid, w, 0.0)
        inds = self.rng.choice(self.indices, batch_size, p=w / w.sum())
        return self.grid[inds], inds

    def sample(self, batch_size, low=None, high=None):
        centroids, inds = self.sample_bins(batch_size, low=low, high=high)
        samples = np.stack([
            self.rng.uniform(c + self.bin_sizes / 2, c - self.bin_sizes / 2)
            for c in centroids])
        return samples, inds


class HostRewardThresholdCurriculum(HostCurriculum):
    def get_local_bins(self, bin_inds, ranges=0.1):
        if isinstance(ranges, float):
            ranges = np.ones(self.grid.shape[1]) * ranges
        bin_inds = np.asarray(bin_inds).reshape(-1)
        near = np.logical_and(
            self.grid[None, :, :] >= self.grid[bin_inds][:, None, :] - ranges[None, None, :],
            self.grid[None, :, :] <= self.grid[bin_inds][:, None, :] + ranges[None, None, :],
        ).all(axis=2)
        return near  # (len(bin_inds), n_bins)

    def update(self, bin_inds, task_rewards, success_thresholds, local_range=0.5):
        if len(success_thresholds) == 0:
            return
        is_success = np.ones(len(bin_inds), dtype=bool)
        for r, t in zip(task_rewards, success_thresholds):
            is_success &= np.asarray(r) > t
        self.weights[bin_inds[is_success]] = np.clip(
            self.weights[bin_inds[is_success]] + 0.2, 0, 1)
        for near in self.get_local_bins(bin_inds[is_success], ranges=local_range):
            self.weights[near] = np.clip(self.weights[near] + 0.2, 0, 1)


class DeviceCurriculumConst(NamedTuple):
    """Trace-time constants for the on-device curriculum."""
    grid: jnp.ndarray        # (n_bins, d) bin centres
    bin_sizes: jnp.ndarray   # (d,)
    neighbour: jnp.ndarray   # (n_bins, n_bins) bool: within local_range


class DeviceCurriculum:
    """On-device RewardThresholdCurriculum over category-wise weight arrays."""

    def __init__(self, key_ranges, init_low, init_high, local_range,
                 num_categories: int):
        grid, sizes = _make_grid(key_ranges)
        lr = np.asarray(local_range, dtype=np.float32)
        near = np.logical_and(
            grid[None, :, :] >= grid[:, None, :] - lr[None, None, :],
            grid[None, :, :] <= grid[:, None, :] + lr[None, None, :],
        ).all(axis=2)
        self.const = DeviceCurriculumConst(
            grid=jnp.asarray(grid), bin_sizes=jnp.asarray(sizes),
            neighbour=jnp.asarray(near))
        init = np.logical_and(grid >= np.asarray(init_low)[None, :],
                              grid <= np.asarray(init_high)[None, :]).all(axis=1)
        assert init.any(), "empty initialization domain"
        self.init_weights = jnp.asarray(
            np.tile(init.astype(np.float32), (num_categories, 1)))
        self.num_bins = grid.shape[0]
        self.num_categories = num_categories

    def sample(self, key, weights, categories):
        """Per-env draw: bin ~ categorical(weights[category]), value ~ U(cell).

        key: (N,) per-env keys; categories: (N,) int32.
        Returns (commands (N, d), bins (N,)).
        """
        w = weights[categories]                          # (N, n_bins)
        logits = jnp.log(jnp.maximum(w, 1e-12))

        def draw(k, lg):
            k1, k2 = jax.random.split(k)
            b = jax.random.categorical(k1, lg)
            c = self.const.grid[b]
            u = jax.random.uniform(k2, c.shape, minval=-0.5, maxval=0.5)
            return c + u * self.const.bin_sizes, b

        return jax.vmap(draw)(key, logits)

    def update(self, weights, categories, bins, success):
        """Masked scatter bump of successful bins + their neighbourhoods."""
        hits = self.const.neighbour[bins] | jax.nn.one_hot(
            bins, self.num_bins, dtype=bool)               # (N, n_bins)
        bump = jnp.zeros_like(weights)
        cat_oh = jax.nn.one_hot(categories, self.num_categories,
                                dtype=weights.dtype)       # (N, C)
        contrib = (hits & success[:, None]).astype(weights.dtype)
        bump = jnp.einsum("nc,nb->cb", cat_oh, contrib)
        # reference stacking semantics (curriculum.py:148-154): each successful
        # env bumps every bin in its neighbourhood by +0.2, and overlapping
        # neighbourhoods accumulate additively before the clip
        return jnp.clip(weights + 0.2 * bump, 0.0, 1.0)
