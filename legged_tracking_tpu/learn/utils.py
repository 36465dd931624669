"""Learner utilities: running obs normalization.

Port of ``go1_gym_learn/utils/running_average.py`` (RunningMeanStd, Chan's
parallel variance) as an immutable pytree.  The reference's
split_and_pad_trajectories (utils/utils.py) exists only for recurrent
minibatch generators; the GRU path here consumes in-state obs history
instead, so it is deliberately not ported.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


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
        arr = arr.astype(self.mean.dtype)   # f32 stats even for bf16 streams
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
