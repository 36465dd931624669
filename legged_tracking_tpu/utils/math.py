"""Misc batched math helpers (reference go1_gym/utils/math_utils.py semantics)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_scale_shift(rng):
    """Normalization scale/shift from a [lo, hi] range (math_utils.py:35-38)."""
    scale = 2.0 / (rng[1] - rng[0])
    shift = (rng[1] + rng[0]) / 2.0
    return scale, shift


def rand_uniform(key, lo, hi, shape):
    return jax.random.uniform(key, shape, minval=lo, maxval=hi)


def rand_sqrt_uniform(key, lo, hi, shape):
    """sqrt-shaped distribution in [lo, hi] (math_utils.py:27-32)."""
    r = jax.random.uniform(key, shape, minval=-1.0, maxval=1.0)
    r = jnp.where(r < 0.0, -jnp.sqrt(-r), jnp.sqrt(r))
    r = (r + 1.0) / 2.0
    return (hi - lo) * r + lo
