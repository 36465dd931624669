"""Offline evaluation metrics.

Port of ``go1_gym_learn/eval_metrics/metrics.py``: velocity-tracking RMSDs,
base height, torque/power statistics, cost of transport, Froude number, and
adaptation loss — as pure functions of the batched env state (the reference
passes the live env object; here the :class:`EnvState` + step extras carry the
same quantities).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils import quat as qt

GO1_MASS = 11.309932  # kg, sum of URDF link masses


def _base_vels(state):
    blv = qt.quat_rotate_inverse(state.phys.base_quat, state.phys.v[:, :3])
    bav = qt.quat_rotate_inverse(state.phys.base_quat, state.phys.v[:, 3:6])
    return blv, bav


def lin_vel_rmsd(state):
    blv, _ = _base_vels(state)
    return jnp.sqrt((blv[:, 0] - state.commands[:, 0]) ** 2)


def ang_vel_rmsd(state):
    _, bav = _base_vels(state)
    return jnp.sqrt((bav[:, 2] - state.commands[:, 2]) ** 2)


def lin_vel_x(state):
    return _base_vels(state)[0][:, 0]


def ang_vel_yaw(state):
    return _base_vels(state)[1][:, 2]


def base_height(state):
    return state.phys.base_pos[:, 2]


def max_torques(state):
    return jnp.max(jnp.abs(state.torques), axis=1)


def power_consumption(state):
    return jnp.sum(state.torques * state.phys.v[:, 6:], axis=1)


def cost_of_transport(state):
    """P / (m g v) (reference metrics.py:41-48)."""
    P = power_consumption(state)
    m = GO1_MASS + state.payload
    blv, _ = _base_vels(state)
    v = jnp.linalg.norm(blv[:, :2], axis=1)
    return P / (m * 9.8 * v)


def froude_number(state, h: float = 0.30):
    v = lin_vel_x(state)
    return v ** 2 / (9.8 * h)


def adaptation_loss(alg, params, obs_dict):
    pred = alg.ac.apply(params, obs_dict["obs_history"], method=alg._m.adapt)
    target = alg.ac.apply(params, obs_dict["privileged_obs"],
                          method=alg._m.adaptation_target)
    return jnp.mean(jnp.square(pred - target), axis=1)


METRICS_FNS = {
    "lin_vel_rmsd": lin_vel_rmsd,
    "ang_vel_rmsd": ang_vel_rmsd,
    "lin_vel_x": lin_vel_x,
    "ang_vel_yaw": ang_vel_yaw,
    "base_height": base_height,
    "max_torques": max_torques,
    "power_consumption": power_consumption,
    "CoT": cost_of_transport,
    "froude_number": froude_number,
}
