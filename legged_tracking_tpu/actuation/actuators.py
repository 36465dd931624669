"""Torque models: PD controller and the Go1 actuator network.

Mirrors reference ``_compute_torques`` semantics
(legged_robot_trajectory_tracking.py:957-996): action scaling with hip
reduction, a per-substep action lag buffer (DR), then either a PD law or the
learned actuator net (softsign MLP 6->32->32->1, weights converted from
``resources/actuator_nets/unitree_go1.pt`` into assets/actuator_nets/*.npz),
motor-strength scaling and torque clipping.

All functions are single-env pure functions over an ``ActuatorState`` pytree;
the env vmaps them.  The actuator-net history (q_err/qdot at t, t-1, t-2;
reference :1311-1327) lives in the state.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

_ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "assets", "actuator_nets")


class ActuatorNetParams(NamedTuple):
    w0: jnp.ndarray
    b0: jnp.ndarray
    w1: jnp.ndarray
    b1: jnp.ndarray
    w2: jnp.ndarray
    b2: jnp.ndarray


def load_actuator_net(name: str = "unitree_go1") -> ActuatorNetParams:
    path = os.path.join(_ASSET_DIR, f"{name}.npz")
    if os.path.exists(path):
        d = np.load(path)
        return ActuatorNetParams(*(jnp.asarray(d[k]) for k in ["w0", "b0", "w1", "b1", "w2", "b2"]))
    # fallback: a fresh net with the same architecture (deterministic init)
    rng = np.random.RandomState(0)
    def lin(i, o):
        return jnp.asarray(rng.uniform(-1, 1, (o, i)) / np.sqrt(i)), jnp.zeros(o)
    w0, b0 = lin(6, 32)
    w1, b1 = lin(32, 32)
    w2, b2 = lin(32, 1)
    return ActuatorNetParams(w0, b0, w1, b1, w2, b2)


def _softsign(x):
    return x / (1.0 + jnp.abs(x))


def actuator_net_torque(p: ActuatorNetParams, x: jnp.ndarray) -> jnp.ndarray:
    """x (..., 12, 6) = (q_err, q_err_last, q_err_last2, qd, qd_last, qd_last2)."""
    h = _softsign(x @ p.w0.T + p.b0)
    h = _softsign(h @ p.w1.T + p.b1)
    return (h @ p.w2.T + p.b2)[..., 0]


class ActuatorState(NamedTuple):
    """Per-env actuator memory (folded into EnvState)."""
    lag_buffer: jnp.ndarray          # (lag+1, 12) scaled-action delay line
    joint_pos_err_last: jnp.ndarray  # (12,)
    joint_pos_err_last2: jnp.ndarray
    joint_vel_last: jnp.ndarray
    joint_vel_last2: jnp.ndarray
    joint_pos_target: jnp.ndarray    # (12,) current PD target (for rewards)


def init_actuator_state(lag_timesteps: int) -> ActuatorState:
    z = jnp.zeros(12)
    return ActuatorState(
        lag_buffer=jnp.zeros((lag_timesteps + 1, 12)),
        joint_pos_err_last=z, joint_pos_err_last2=z,
        joint_vel_last=z, joint_vel_last2=z,
        joint_pos_target=z,
    )


def scale_actions(actions, action_scale: float, hip_scale_reduction: float):
    """action -> scaled joint-angle offsets, hips scaled down
    (legged_robot_trajectory_tracking.py:969-970). Hip dofs are 0,3,6,9."""
    scaled = actions[..., :12] * action_scale
    hip_mask = jnp.zeros(12).at[jnp.array([0, 3, 6, 9])].set(1.0)
    return scaled * (1.0 + (hip_scale_reduction - 1.0) * hip_mask)


def actuator_net_torque_lanes(p: ActuatorNetParams, x: jnp.ndarray) -> jnp.ndarray:
    """Lane-major actuator net: x (6, 12, E) feature-leading.  The contraction
    folds the (joint, env) axes into one MXU N dimension of 12*E columns —
    one large matmul per layer instead of E batched 12x6 tiles."""
    six, twelve, E = x.shape
    flat = x.reshape(six, twelve * E)
    h = _softsign(p.w0 @ flat + p.b0[:, None])
    h = _softsign(p.w1 @ h + p.b1[:, None])
    out = p.w2 @ h + p.b2[:, None]
    return out.reshape(twelve, E)


def make_torque_fn_lanes(
    control_type: str,
    net: ActuatorNetParams,
    default_dof_pos: jnp.ndarray,   # (12,)
    p_gain: float,
    d_gain: float,
    torque_limits: jnp.ndarray,     # (12,)
    randomize_lag: bool,
):
    """Lane-major mirror of make_torque_fn: every carry array has the env
    axis TRAILING ((L,12,E) lag buffer, (12,E) per-joint arrays)."""
    ddp = default_dof_pos[:, None]
    tl = torque_limits[:, None]

    def torque_fn(qj, qdj, carry):
        st, motor_strength, motor_offset, kp_f, kd_f, actions_scaled = carry
        if randomize_lag:
            lag = jnp.concatenate([st.lag_buffer[1:], actions_scaled[None]], axis=0)
            target = lag[0] + ddp
        else:
            lag = st.lag_buffer
            target = actions_scaled + ddp

        if control_type == "actuator_net":
            q_err = qj - target + motor_offset
            x = jnp.stack(
                [q_err, st.joint_pos_err_last, st.joint_pos_err_last2,
                 qdj, st.joint_vel_last, st.joint_vel_last2], axis=0
            )  # (6, 12, E)
            tau = actuator_net_torque_lanes(net, x)
            st = st._replace(
                joint_pos_err_last2=st.joint_pos_err_last,
                joint_pos_err_last=q_err,
                joint_vel_last2=st.joint_vel_last,
                joint_vel_last=qdj,
            )
        elif control_type == "P":
            tau = p_gain * kp_f * (target - qj + motor_offset) - d_gain * kd_f * qdj
        else:
            raise NameError(f"Unknown controller type: {control_type}")

        tau = tau * motor_strength
        tau = jnp.clip(tau, -tl, tl)
        st = st._replace(lag_buffer=lag, joint_pos_target=target)
        return tau, (st, motor_strength, motor_offset, kp_f, kd_f, actions_scaled)

    return torque_fn


def make_torque_fn(
    control_type: str,
    net: ActuatorNetParams,
    default_dof_pos: jnp.ndarray,   # (12,)
    p_gain: float,
    d_gain: float,
    torque_limits: jnp.ndarray,     # (12,)
    randomize_lag: bool,
):
    """Build the per-substep torque function used by engine.control_step.

    The returned fn's carry is (ActuatorState, motor_strength, motor_offset,
    kp_factor, kd_factor, actions_scaled).
    """

    def torque_fn(qj, qdj, carry):
        st, motor_strength, motor_offset, kp_f, kd_f, actions_scaled = carry
        if randomize_lag:
            lag = jnp.concatenate([st.lag_buffer[1:], actions_scaled[None]], axis=0)
            target = lag[0] + default_dof_pos
        else:
            lag = st.lag_buffer
            target = actions_scaled + default_dof_pos

        if control_type == "actuator_net":
            q_err = qj - target + motor_offset
            x = jnp.stack(
                [q_err, st.joint_pos_err_last, st.joint_pos_err_last2,
                 qdj, st.joint_vel_last, st.joint_vel_last2], axis=-1
            )  # (12, 6)
            tau = actuator_net_torque(net, x)
            st = st._replace(
                joint_pos_err_last2=st.joint_pos_err_last,
                joint_pos_err_last=q_err,
                joint_vel_last2=st.joint_vel_last,
                joint_vel_last=qdj,
            )
        elif control_type == "P":
            tau = p_gain * kp_f * (target - qj + motor_offset) - d_gain * kd_f * qdj
        else:
            raise NameError(f"Unknown controller type: {control_type}")

        tau = tau * motor_strength
        tau = jnp.clip(tau, -torque_limits, torque_limits)
        st = st._replace(lag_buffer=lag, joint_pos_target=target)
        return tau, (st, motor_strength, motor_offset, kp_f, kd_f, actions_scaled)

    return torque_fn
