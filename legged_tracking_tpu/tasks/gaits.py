"""Gait clocks and von-Mises desired contact states.

Pure batched version of ``_step_contact_targets`` (reference
legged_robot_velocity_tracking.py:844-920): per-foot phase variables driven by
the commanded frequency/phase/offset/bound, duration-warped so stance occupies
[0, 0.5) and swing [0.5, 1), sinusoidal clock inputs, and smoothed desired
contact probabilities via a Normal(0, kappa) CDF.

Foot order everywhere is the URDF traversal order FR, FL, RR, RL; the phase
assignment matches the reference's positional pairing of ``foot_indices[i]``
with ``feet_indices[i]`` (:855-866).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class GaitState(NamedTuple):
    gait_indices: jnp.ndarray            # (N,)
    foot_indices: jnp.ndarray            # (N, 4) UNwarped phases (reward-facing)
    clock_inputs: jnp.ndarray            # (N, 4)
    doubletime_clock_inputs: jnp.ndarray  # (N, 4)
    halftime_clock_inputs: jnp.ndarray   # (N, 4)
    desired_contact_states: jnp.ndarray  # (N, 4)


def _normal_cdf(x, kappa):
    return 0.5 * (1.0 + jax.lax.erf(x / (kappa * jnp.sqrt(2.0))))


def step_contact_targets(gait_indices, commands, dt, kappa, pacing_offset=False):
    """Advance gait clocks one control step."""
    frequencies = commands[:, 4]
    phases = commands[:, 5]
    offsets = commands[:, 6]
    bounds = commands[:, 7]
    durations = commands[:, 8]
    gait_indices = jnp.remainder(gait_indices + dt * frequencies, 1.0)

    if pacing_offset:
        raw = jnp.stack([gait_indices + phases + offsets + bounds,
                         gait_indices + bounds,
                         gait_indices + offsets,
                         gait_indices + phases], axis=1)
    else:
        raw = jnp.stack([gait_indices + phases + offsets + bounds,
                         gait_indices + offsets,
                         gait_indices + bounds,
                         gait_indices + phases], axis=1)
    foot_indices = jnp.remainder(raw, 1.0)

    # duration-warp: stance -> [0, 0.5), swing -> [0.5, 1).  The reference
    # stores the UNwarped phase on the env (used by feet_clearance / raibert)
    # but computes clocks + desired-contact smoothing from the WARPED phase
    # (:869-878 warp in place the list later read at :880-890).
    d = durations[:, None]
    stance = foot_indices < d
    warped = jnp.where(stance,
                       foot_indices * (0.5 / d),
                       0.5 + (foot_indices - d) * (0.5 / (1.0 - d)))

    clock = jnp.sin(2 * jnp.pi * warped)
    clock2 = jnp.sin(4 * jnp.pi * warped)
    clock_half = jnp.sin(jnp.pi * warped)

    cdf = lambda x: _normal_cdf(x, kappa)
    fi = warped
    desired = (cdf(fi) * (1 - cdf(fi - 0.5)) + cdf(fi - 1.0) * (1 - cdf(fi - 1.5)))

    return GaitState(gait_indices=gait_indices, foot_indices=foot_indices,
                     clock_inputs=clock, doubletime_clock_inputs=clock2,
                     halftime_clock_inputs=clock_half,
                     desired_contact_states=desired)
