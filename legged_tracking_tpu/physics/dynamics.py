"""Batched articulated forward dynamics for the Go1.

Composite mass matrix + velocity-product bias via world-frame COM Jacobians:

    M(q)   = sum_i  J_i^T  diag(I_i^w, m_i 1)  J_i
    bias   = sum_i  J_i^T  [ I_i^w a^vp_w,i + w_i x I_i^w w_i ;  m_i a^vp_u,i ]
    M qdd  = tau_gen + Q_ext + Q_gravity - bias

The velocity-product accelerations (J̇ v) are obtained exactly with one
``jax.jvp`` through the body-velocity map — no hand-derived Coriolis terms.
This replaces PhysX's articulation solver (reference sim params at
legged_robot_trajectory_tracking_config.py:354-373) with a dense generalized
formulation: at 18 dofs the batched 18x18 Cholesky is tiny, and everything
maps to batched (N, ...) matmuls XLA fuses well on TPU.

Generalized coordinates (single env; engine vmaps over N):
    q  = (base_pos (3,), base_quat (4,) xyzw, qj (12,))
    v  = [base lin vel (world), base ang vel (world), joint rates]  (18,)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import quat
from . import kinematics
from .model import Go1Model

NV = 18  # 6 base + 12 joints


def _mat3_mul(A, B):
    """(..., 3, 3) @ (..., 3, 3) as component arithmetic — batched tiny
    dot_generals pad to MXU tiles and dominate traces otherwise."""
    rows = []
    for i in range(3):
        cols = [sum(A[..., i, k] * B[..., k, j] for k in range(3)) for j in range(3)]
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


def _mat3_vec(A, v):
    """(..., 3, 3) @ (..., 3) as component arithmetic."""
    return jnp.stack(
        [sum(A[..., i, k] * v[..., k] for k in range(3)) for i in range(3)],
        axis=-1)


def _world_inertia(R, I_body):
    """R I R^T for per-body constant inertias."""
    return _mat3_mul(_mat3_mul(R, I_body), jnp.swapaxes(R, -1, -2))


class BodyState(NamedTuple):
    fk: kinematics.FK
    J: jnp.ndarray       # (nb, 6, NV)
    omega: jnp.ndarray   # (nb, 3) world angular velocities
    u: jnp.ndarray       # (nb, 3) world COM linear velocities


def quat_derivative(base_quat: jnp.ndarray, omega_world: jnp.ndarray) -> jnp.ndarray:
    """q̇ = 0.5 * [w, 0] ⊗ q for world-frame angular velocity (xyzw)."""
    wq = jnp.concatenate([omega_world, jnp.zeros_like(omega_world[..., :1])], axis=-1)
    return 0.5 * quat.quat_mul(wq, base_quat)


def body_state(model: Go1Model, base_pos, base_quat, qj, v,
               com_offset=None) -> BodyState:
    f = kinematics.fk(model, base_pos, base_quat, qj, com_offset)
    J = kinematics.jacobians(model, f, base_pos)
    vel6 = jnp.einsum("bik,k->bi", J, v)
    return BodyState(fk=f, J=J, omega=vel6[:, :3], u=vel6[:, 3:])


def _body_vel6(model: Go1Model, base_pos, base_quat, qj, v, com_offset=None):
    f = kinematics.fk(model, base_pos, base_quat, qj, com_offset)
    J = kinematics.jacobians(model, f, base_pos)
    return jnp.einsum("bik,k->bi", J, v)


def spd_inverse(M: jnp.ndarray) -> jnp.ndarray:
    """Explicit inverse of a small SPD matrix via unrolled Gauss-Jordan.

    TPU-critical: XLA's cholesky/triangular_solve serialize tiny systems onto
    padded (8,128) lanes and are catastrophically slow for batched 18x18
    problems (measured ~40s/iteration at 1024 envs).  An unrolled n-step
    elimination is pure VPU elementwise work and vmaps over the env batch for
    free; no pivoting is needed for the regularized SPD mass matrix.
    """
    n = M.shape[-1]
    A = jnp.concatenate([M, jnp.broadcast_to(jnp.eye(n), M.shape)], axis=-1)
    for i in range(n):
        row = A[..., i, :] / A[..., i, i:i + 1]
        A = A - A[..., :, i:i + 1] * row[..., None, :]
        A = A.at[..., i, :].set(row)
    return A[..., :, n:]


class MassMatrix(NamedTuple):
    M: jnp.ndarray        # (NV, NV)
    Minv: jnp.ndarray     # (NV, NV) explicit inverse (see spd_inverse)
    J: jnp.ndarray        # (nb, 6, NV) Jacobians with base-COM shift applied
    mass: jnp.ndarray     # (nb,) with payload applied
    Iw: jnp.ndarray       # (nb, 3, 3) world-frame inertias


def mass_matrix(model: Go1Model, bs: BodyState, payload, com_offset, base_pos) -> MassMatrix:
    """Composite mass matrix + explicit inverse.

    payload: scalar added base mass (the DR knob of _process_rigid_body_props,
    reference legged_robot_trajectory_tracking.py:766-772).  The base COM
    shift is folded into FK (kinematics.fk base_com_offset), so bs.J already
    carries the shifted torque arm.
    """
    f, J = bs.fk, bs.J
    mass = model.mass.at[0].add(payload)                       # (nb,)

    # world-frame rotational inertias about COM
    Iw = _world_inertia(f.R, model.inertia)                    # (nb,3,3)

    Jw = J[:, :3, :]
    Jv = J[:, 3:6, :]
    Mw = jnp.einsum("bri,bij,bjs->rs", Jw.transpose(0, 2, 1), Iw, Jw)
    Mv = jnp.einsum("b,bir,bis->rs", mass, Jv, Jv)
    M = Mw + Mv + jnp.eye(NV) * 1e-6
    return MassMatrix(M=M, Minv=spd_inverse(M), J=J, mass=mass, Iw=Iw)


def refresh_mass_matrix(model: Go1Model, mm0: MassMatrix, bs: BodyState,
                        com_offset, base_pos) -> MassMatrix:
    """Per-substep refresh of the configuration-dependent pieces (J, Iw) while
    reusing the slowly-varying M / M^-1 from the control step's first substep
    (see engine._control_step_body).  Force projections and the bias term stay
    exact; only the generalized-inertia solve uses the ~20 ms-stale inverse."""
    f = bs.fk
    Iw = _world_inertia(f.R, model.inertia)
    return MassMatrix(M=mm0.M, Minv=mm0.Minv, J=bs.J, mass=mm0.mass, Iw=Iw)


def forward_dynamics(
    model: Go1Model,
    base_pos: jnp.ndarray,
    base_quat: jnp.ndarray,
    qj: jnp.ndarray,
    v: jnp.ndarray,
    tau_j: jnp.ndarray,
    f_ext: jnp.ndarray,
    gravity: jnp.ndarray,
    bs: BodyState,
    mm: MassMatrix,
    com_offset=None,
) -> jnp.ndarray:
    """Generalized accelerations (NV,).

    f_ext: (nb, 6) world wrench [torque; force] applied at each body COM.
    """
    J, mass, Iw = mm.J, mm.mass, mm.Iw

    # velocity-product accelerations via jvp through the body-velocity map
    qdot_pos = v[:3]
    qdot_quat = quat_derivative(base_quat, v[3:6])
    qdot_j = v[6:]
    _, a_vp = jax.jvp(
        lambda bp, bq, qq: _body_vel6(model, bp, bq, qq, v, com_offset),
        (base_pos, base_quat, qj),
        (qdot_pos, qdot_quat, qdot_j),
    )                                                           # (nb, 6)
    alpha_vp, acc_vp = a_vp[:, :3], a_vp[:, 3:]

    omega = bs.omega
    n_bias = _mat3_vec(Iw, alpha_vp) + jnp.cross(omega, _mat3_vec(Iw, omega))
    f_bias = mass[:, None] * acc_vp
    bias = jnp.einsum("bik,bi->k", J[:, :3, :], n_bias) + jnp.einsum(
        "bik,bi->k", J[:, 3:6, :], f_bias
    )

    # gravity + external wrenches
    Q_grav = jnp.einsum("bik,bi->k", J[:, 3:6, :], mass[:, None] * gravity[None, :])
    Q_ext = jnp.einsum("bik,bi->k", J[:, :3, :], f_ext[:, :3]) + jnp.einsum(
        "bik,bi->k", J[:, 3:6, :], f_ext[:, 3:]
    )

    tau_gen = jnp.concatenate([jnp.zeros(6), tau_j])
    rhs = tau_gen + Q_grav + Q_ext - bias
    return mm.Minv @ rhs


def integrate(
    base_pos, base_quat, qj, v, qdd, dt,
):
    """Semi-implicit Euler: velocities first, then positions."""
    v_new = v + qdd * dt
    base_pos_new = base_pos + v_new[:3] * dt
    base_quat_new = quat.quat_integrate(base_quat, v_new[3:6], dt)
    qj_new = qj + v_new[6:] * dt
    return base_pos_new, base_quat_new, qj_new, v_new
