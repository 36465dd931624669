"""Batched quaternion / rotation math for TPU (JAX).

Quaternion convention: ``[x, y, z, w]`` (scalar last), matching the reference
stack's Isaac Gym convention (see reference ``isaacgym.torch_utils`` usage in
``go1_gym/utils/math_utils.py:1-61``) so that policies / state layouts are
directly comparable.  Everything here is shape-polymorphic: functions accept
``(..., 4)`` quaternions and ``(..., 3)`` vectors and broadcast.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-9


def normalize(q: jax.Array) -> jax.Array:
    """Normalize the last axis to unit length."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_identity(shape=()) -> jax.Array:
    q = jnp.zeros(shape + (4,))
    return q.at[..., 3].set(1.0)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a*b, both ``[x,y,z,w]``."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_conjugate(q: jax.Array) -> jax.Array:
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_apply(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v by quaternion(s) q (body -> world for a body quat)."""
    xyz = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(xyz, v)
    return v + w * t + jnp.cross(xyz, t)


def quat_rotate_inverse(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate v by the inverse of q (world -> body for a body quat)."""
    xyz = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(xyz, v)
    return v - w * t + jnp.cross(xyz, t)


def quat_from_angle_axis(angle: jax.Array, axis: jax.Array) -> jax.Array:
    """angle (...,), axis (...,3) unit -> quaternion (...,4)."""
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate(
        [axis * s[..., None], jnp.cos(half)[..., None]], axis=-1
    )


def quat_from_euler_xyz(roll: jax.Array, pitch: jax.Array, yaw: jax.Array) -> jax.Array:
    """Intrinsic XYZ euler angles -> quaternion [x,y,z,w]."""
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    qx = sr * cp * cy - cr * sp * sy
    qy = cr * sp * cy + sr * cp * sy
    qz = cr * cp * sy - sr * sp * cy
    qw = cr * cp * cy + sr * sp * sy
    return jnp.stack([qx, qy, qz, qw], axis=-1)


def get_euler_xyz(q: jax.Array):
    """Quaternion -> (roll, pitch, yaw), wrapped to [-pi, pi]."""
    qx, qy, qz, qw = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    sinr_cosp = 2.0 * (qw * qx + qy * qz)
    cosr_cosp = qw * qw - qx * qx - qy * qy + qz * qz
    roll = jnp.arctan2(sinr_cosp, cosr_cosp)

    sinp = 2.0 * (qw * qy - qz * qx)
    pitch = jnp.where(
        jnp.abs(sinp) >= 1.0, jnp.sign(sinp) * (jnp.pi / 2.0), jnp.arcsin(jnp.clip(sinp, -1.0, 1.0))
    )

    siny_cosp = 2.0 * (qw * qz + qx * qy)
    cosy_cosp = qw * qw + qx * qx - qy * qy - qz * qz
    yaw = jnp.arctan2(siny_cosp, cosy_cosp)
    return roll, pitch, yaw


def quaternion_to_roll_pitch_yaw(q: jax.Array) -> jax.Array:
    """(...,4) -> (...,3) rpy in [-pi, pi] (reference math_utils.py:40-46)."""
    roll, pitch, yaw = get_euler_xyz(q)
    return wrap_to_pi(jnp.stack([roll, pitch, yaw], axis=-1))


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Quaternion -> (...,3,3) rotation matrix (body->world)."""
    qx, qy, qz, qw = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = qx * qx, qy * qy, qz * qz
    xy, xz, yz = qx * qy, qx * qz, qy * qz
    wx, wy, wz = qw * qx, qw * qy, qw * qz
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def quat_yaw_only(q: jax.Array) -> jax.Array:
    """Zero out the x/y components and renormalize (reference quat_apply_yaw)."""
    qy = jnp.concatenate([jnp.zeros_like(q[..., :2]), q[..., 2:]], axis=-1)
    return normalize(qy)


def quat_apply_yaw(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate v by only the yaw component of q (math_utils.py:12-16)."""
    return quat_apply(quat_yaw_only(q), v)


def quat_apply_yaw_inverse(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate v by the inverse of the yaw component of q (math_utils.py:57-61)."""
    return quat_rotate_inverse(quat_yaw_only(q), v)


def quat_without_yaw(q: jax.Array) -> jax.Array:
    """Strip yaw from a quaternion via rpy (math_utils.py:48-55)."""
    rpy = quaternion_to_roll_pitch_yaw(q)
    return quat_from_euler_xyz(rpy[..., 0], rpy[..., 1], jnp.zeros_like(rpy[..., 2]))


def wrap_to_pi(angles: jax.Array) -> jax.Array:
    """Wrap angles to [-pi, pi] (reference math_utils.py:20-23)."""
    a = jnp.mod(angles, 2.0 * jnp.pi)
    return a - 2.0 * jnp.pi * (a > jnp.pi)


def quat_integrate(q: jax.Array, omega_world: jax.Array, dt) -> jax.Array:
    """Integrate quaternion by world-frame angular velocity over dt.

    Uses the exponential map for exactness at large steps.
    """
    angle = jnp.linalg.norm(omega_world, axis=-1, keepdims=True)
    axis = omega_world / jnp.maximum(angle, _EPS)
    dq = quat_from_angle_axis((angle * dt)[..., 0], axis)
    return normalize(quat_mul(dq, q))
