"""Block-sparse articulated dynamics exploiting the quadruped's branch
structure (the round-2 throughput rewrite of ``dynamics.py``).

The Go1 tree is a 6-dof floating base with four independent 3-dof chains, so
the 18x18 mass matrix has arrow structure

    M = [[ A   B_0  B_1  B_2  B_3 ]       A   : 6x6   base block
         [ B_0^T  D_0             ]       B_l : 6x3   base<->leg coupling
         [ B_1^T       D_1        ]       D_l : 3x3   per-leg block
         [ ...                    ]]      (cross-leg joint coupling is ZERO)

and is solved by a Schur complement on the base: four closed-form symmetric
3x3 inverses + one 6-step unrolled 6x6 inverse, instead of the dense 18-step
Gauss-Jordan.  Nothing materializes the (nb, 6, 18) Jacobian: velocities,
wrench projections, the velocity-product bias (via one ``jax.jvp`` through
the sparse velocity map) and the per-sphere apparent masses all use the
closed-form leg recursions.  Per-env state shrinks from O(nb*6*18) to
O(4*(6*3+3*3)) — the HBM-bandwidth win that dense einsums can't give
(CLAUDE.md perf log: padded tiny dot_generals dominate TPU traces).

Semantics match ``dynamics.forward_dynamics`` / ``contact.apparent_masses``
bit-for-bit up to float reassociation (equivalence-tested in
tests/test_sparse_dynamics.py).  Replaces the same PhysX articulation solve
as the dense path (reference sim params,
legged_robot_trajectory_tracking_config.py:354-373).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import quat
from . import kinematics
from .dynamics import (NV, BodyState, _mat3_mul, _mat3_vec, _world_inertia,
                       quat_derivative, spd_inverse)
from .model import Go1Model

# lower-triangular (body-level >= joint-level) mask within a leg chain
_TRIL = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 1.0, 0.0], [1.0, 1.0, 1.0]])


def _mm(A, B):
    """(..., n, k) @ (..., k, m) fully unrolled — batched elementwise on VPU
    (tiny dot_generals pad to MXU tiles and serialize)."""
    n, k = A.shape[-2], A.shape[-1]
    m = B.shape[-1]
    rows = []
    for i in range(n):
        cols = [sum(A[..., i, t] * B[..., t, j] for t in range(k))
                for j in range(m)]
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


def _mv(A, v):
    """(..., n, k) @ (..., k) unrolled."""
    n, k = A.shape[-2], A.shape[-1]
    return jnp.stack(
        [sum(A[..., i, t] * v[..., t] for t in range(k)) for i in range(n)],
        axis=-1)


def _sym3_inv(D):
    """Closed-form inverse of symmetric (..., 3, 3) blocks (adjugate/det)."""
    a, b, c = D[..., 0, 0], D[..., 0, 1], D[..., 0, 2]
    d, e, f = D[..., 1, 1], D[..., 1, 2], D[..., 2, 2]
    A = d * f - e * e
    B = c * e - b * f
    C = b * e - c * d
    det = a * A + b * B + c * C
    inv_det = 1.0 / det
    Dn = d * a - b * b  # placeholder names for remaining cofactors
    E = b * c - a * e
    F = a * d - b * b
    Dm = a * f - c * c
    row0 = jnp.stack([A, B, C], axis=-1)
    row1 = jnp.stack([B, Dm, E], axis=-1)
    row2 = jnp.stack([C, E, F], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2) * inv_det[..., None, None]


def _skew(v):
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


class LegGeom(NamedTuple):
    """Per-leg chain geometry derived from FK (all world frame)."""
    axes: jnp.ndarray     # (4, 3, 3)  [leg, joint-level, xyz]
    k: jnp.ndarray        # (4, 3, 3, 3) [leg, body, joint] a_j x (c_i - anchor_j), tril-masked
    x_legs: jnp.ndarray   # (4, 3, 3)  c_i - p_base per leg body
    x_base: jnp.ndarray   # (3,)       c_0 - p_base


def leg_geometry(f: kinematics.FK) -> LegGeom:
    axes = f.axis_w.reshape(4, 3, 3)
    anchors = f.anchor_w.reshape(4, 3, 3)
    coms = f.com_w[1:].reshape(4, 3, 3)
    d = coms[:, :, None, :] - anchors[:, None, :, :]       # (4, body, joint, 3)
    k = jnp.cross(axes[:, None, :, :], d) * _TRIL[None, :, :, None]
    return LegGeom(axes=axes, k=k, x_legs=coms - f.p[0],
                   x_base=f.com_w[0] - f.p[0])


def body_velocities(model: Go1Model, f: kinematics.FK, v) -> BodyState:
    """Body angular/COM-linear world velocities via the chain recursion —
    replaces ``J @ v`` without building J.  Returns a BodyState with J=None
    (contact consumes only fk/omega/u)."""
    g = leg_geometry(f)
    u_b, w_b, qd = v[:3], v[3:6], v[6:]
    qd_l = qd.reshape(4, 3)
    aq = g.axes * qd_l[..., None]                          # (4, joint, 3)
    w_legs = w_b + jnp.cumsum(aq, axis=1)                  # (4, body, 3)
    lin_j = jnp.sum(g.k * qd_l[:, None, :, None], axis=2)  # (4, body, 3)
    u_legs = u_b + jnp.cross(w_b, g.x_legs) + lin_j
    omega = jnp.concatenate([w_b[None], w_legs.reshape(12, 3)], axis=0)
    u0 = u_b + jnp.cross(w_b, g.x_base)
    u = jnp.concatenate([u0[None], u_legs.reshape(12, 3)], axis=0)
    return BodyState(fk=f, J=None, omega=omega, u=u)


class Factorization(NamedTuple):
    """Arrow-structure mass matrix blocks + Schur factorization."""
    A: jnp.ndarray        # (6, 6)
    B: jnp.ndarray        # (4, 6, 3)
    D: jnp.ndarray        # (4, 3, 3)
    Dinv: jnp.ndarray     # (4, 3, 3)
    BD: jnp.ndarray       # (4, 6, 3)  B @ Dinv
    Sinv: jnp.ndarray     # (6, 6)     (A - sum B Dinv B^T)^-1
    P_bl: jnp.ndarray     # (4, 6, 3)  -Sinv @ BD         (block of M^-1)
    P_ll: jnp.ndarray     # (4, 3, 3)  Dinv + BD^T Sinv BD (diag block of M^-1)
    mass: jnp.ndarray     # (nb,) with payload
    Iw: jnp.ndarray       # (nb, 3, 3)


def factorize(model: Go1Model, f: kinematics.FK, payload) -> Factorization:
    """Build the arrow blocks of M and the Schur factorization.

    Same composite formula as ``dynamics.mass_matrix`` (J^T blkdiag(Iw, m) J)
    restricted to its nonzero support.
    """
    g = leg_geometry(f)
    mass = model.mass.at[0].add(payload)
    Iw = _world_inertia(f.R, model.inertia)                # (nb, 3, 3)
    m_l = mass[1:].reshape(4, 3)
    Iw_l = Iw[1:].reshape(4, 3, 3, 3)
    x_all = f.com_w - f.p[0]                               # (nb, 3)

    # ---- A (6x6): [u; w] base rows over ALL bodies ----
    m_tot = jnp.sum(mass)
    mx = jnp.sum(mass[:, None] * x_all, axis=0)            # sum m_i x_i
    I3 = jnp.eye(3)
    A_uu = m_tot * I3
    A_uw = -_skew(mx)
    xx = jnp.sum(mass[:, None, None] * x_all[:, :, None] * x_all[:, None, :],
                 axis=0)
    x2 = jnp.sum(mass * jnp.sum(x_all * x_all, axis=-1))
    A_ww = jnp.sum(Iw, axis=0) + x2 * I3 - xx
    A = jnp.concatenate([
        jnp.concatenate([A_uu, A_uw], axis=1),
        jnp.concatenate([-A_uw, A_ww], axis=1),            # A_wu = skew(mx)
    ], axis=0) + jnp.eye(6) * 1e-6

    # ---- B_l (4, 6, 3) ----
    km = g.k * m_l[:, :, None, None]                       # (4, body, joint, 3)
    B_u = jnp.swapaxes(jnp.sum(km, axis=1), 1, 2)          # (4, 3, joint)
    # Iw_i a_j: (4, body, joint, 3)
    Iwa_full = _mv(Iw_l[:, :, None, :, :], jnp.broadcast_to(
        g.axes[:, None, :, :], (4, 3, 3, 3)))
    Iwa = Iwa_full * _TRIL[None, :, :, None]               # i >= j only
    xk = jnp.cross(g.x_legs[:, :, None, :], km)            # m_i x_i x k_ij
    B_w = jnp.swapaxes(jnp.sum(Iwa + xk, axis=1), 1, 2)    # (4, 3, joint)
    B = jnp.concatenate([B_u, B_w], axis=1)                # (4, 6, 3)

    # ---- D_l (4, 3, 3) ----
    # D[j,t] = sum_{i >= max(j,t)} a_j . Iw_i a_t + m_i k_ij . k_it
    rows = []
    for j in range(3):
        cols = []
        for t in range(3):
            lo = max(j, t)
            ang = sum(jnp.sum(g.axes[:, j] * Iwa_full[:, i, t], axis=-1)
                      for i in range(lo, 3))
            lin = sum(m_l[:, i] * jnp.sum(g.k[:, i, j] * g.k[:, i, t], axis=-1)
                      for i in range(lo, 3))
            cols.append(ang + lin)
        rows.append(jnp.stack(cols, axis=-1))
    D = jnp.stack(rows, axis=-2) + jnp.eye(3) * 1e-6       # (4, 3, 3)

    Dinv = _sym3_inv(D)
    BD = _mm(B, Dinv)                                      # (4, 6, 3)
    S = A - jnp.sum(_mm(BD, jnp.swapaxes(B, 1, 2)), axis=0)
    Sinv = spd_inverse(S)
    P_bl = -_mm(jnp.broadcast_to(Sinv, (4, 6, 6)), BD)
    P_ll = Dinv + _mm(jnp.swapaxes(BD, 1, 2),
                      _mm(jnp.broadcast_to(Sinv, (4, 6, 6)), BD))
    return Factorization(A=A, B=B, D=D, Dinv=Dinv, BD=BD, Sinv=Sinv,
                         P_bl=P_bl, P_ll=P_ll, mass=mass, Iw=Iw)


def solve(fac: Factorization, rhs) -> jnp.ndarray:
    """M^-1 @ rhs via the Schur factorization.  rhs (18,) -> qdd (18,)."""
    r_b, r_q = rhs[:6], rhs[6:].reshape(4, 3)
    t = _mv(fac.Dinv, r_q)                                 # (4, 3)
    r_b2 = r_b - jnp.sum(_mv(fac.B, t), axis=0)
    acc_b = _mv(fac.Sinv, r_b2)
    qdd_l = t - _mv(jnp.swapaxes(fac.BD, 1, 2),
                    jnp.broadcast_to(acc_b, (4, 6)))
    return jnp.concatenate([acc_b, qdd_l.reshape(12)])


def project(g: LegGeom, n_i, f_i) -> jnp.ndarray:
    """Generalized force of per-body world wrenches [n_i; f_i] at body COMs:
    Q = sum_i J_i^T [n_i; f_i] without J (18,)."""
    x_all = jnp.concatenate([g.x_base[None], g.x_legs.reshape(12, 3)], axis=0)
    Q_u = jnp.sum(f_i, axis=0)
    Q_w = jnp.sum(n_i + jnp.cross(x_all, f_i), axis=0)
    n_l = n_i[1:].reshape(4, 3, 3)
    f_l = f_i[1:].reshape(4, 3, 3)
    # Q_j = sum_{i>=j} a_j . n_i + k_ij . f_i
    ang = jnp.sum(g.axes[:, None, :, :] * n_l[:, :, None, :], axis=-1)  # (4, body, joint)
    lin = jnp.sum(g.k * f_l[:, :, None, :], axis=-1)                    # (4, body, joint)
    Q_q = jnp.sum((ang * _TRIL[None]) + lin, axis=1)                    # (4, joint)
    return jnp.concatenate([Q_u, Q_w, Q_q.reshape(12)])


def velocity_jvp(model: Go1Model, base_pos, base_quat, qj, v,
                 com_offset=None):
    """ONE fused primal+tangent pass: FK, body velocities, and the
    velocity-product accelerations (J̇v) via ``jax.jvp`` through the sparse
    velocity map.  The primal outputs ARE the substep's FK/velocities, so the
    engine never runs FK twice per substep."""
    qdot_pos = v[:3]
    qdot_quat = quat_derivative(base_quat, v[3:6])
    qdot_j = v[6:]

    def vel_map(bp, bq, qq):
        f = kinematics.fk(model, bp, bq, qq, com_offset)
        st = body_velocities(model, f, v)
        return f, st.omega, st.u

    (f, omega, u), (_, alpha_vp, acc_vp) = jax.jvp(
        vel_map, (base_pos, base_quat, qj), (qdot_pos, qdot_quat, qdot_j))
    bs = BodyState(fk=f, J=None, omega=omega, u=u)
    return bs, alpha_vp, acc_vp


def forward_dynamics(
    model: Go1Model,
    base_pos, base_quat, qj, v,
    tau_j, f_ext, gravity,
    bs: BodyState,
    fac: Factorization,
    com_offset=None,
    vp=None,
) -> jnp.ndarray:
    """Generalized accelerations (NV,) — sparse equivalent of
    ``dynamics.forward_dynamics``.  ``vp``: optional precomputed
    (alpha_vp, acc_vp) from :func:`velocity_jvp`."""
    g = leg_geometry(bs.fk)

    if vp is None:
        _, alpha_vp, acc_vp = velocity_jvp(model, base_pos, base_quat, qj, v,
                                           com_offset)
    else:
        alpha_vp, acc_vp = vp

    omega = bs.omega
    n_bias = _mat3_vec(fac.Iw, alpha_vp) + jnp.cross(
        omega, _mat3_vec(fac.Iw, omega))
    f_bias = fac.mass[:, None] * acc_vp
    Q_bias = project(g, n_bias, f_bias)

    f_grav = fac.mass[:, None] * gravity[None, :]
    Q_grav = project(g, jnp.zeros_like(f_grav), f_grav)
    Q_ext = project(g, f_ext[:, :3], f_ext[:, 3:])

    tau_gen = jnp.concatenate([jnp.zeros(6), tau_j])
    rhs = tau_gen + Q_grav + Q_ext - Q_bias
    return solve(fac, rhs)


def apparent_masses(model: Go1Model, f: kinematics.FK,
                    fac: Factorization) -> jnp.ndarray:
    """Per-sphere W = J_p M^-1 J_p^T (ns, 3, 3) from the block inverse —
    G_p is (3 x 9) effective (6 base cols + the sphere's own leg), so the
    dense (3x18)(18x18)(18x3) chain shrinks ~4x."""
    sb = model.sphere_body
    ns = sb.shape[0]
    p_s = f.p[sb] + _mv(f.R[sb], model.sphere_offset)
    r0 = p_s - f.p[0][None, :]
    G_b = jnp.concatenate([
        jnp.broadcast_to(jnp.eye(3), (ns, 3, 3)), -_skew(r0)], axis=2)  # (ns,3,6)

    leg_s = jnp.clip((sb - 1) // 3, 0, 3)
    axes_s = f.axis_w.reshape(4, 3, 3)[leg_s]              # (ns, joint, 3)
    anchors_s = f.anchor_w.reshape(4, 3, 3)[leg_s]
    # per-leg columns of the sphere's ancestor joints (mask zeroes base
    # spheres and joints below the sphere's body)
    mask = model.sphere_ancestor_mask.reshape(ns, 4, 3)[
        jnp.arange(ns), leg_s]                             # (ns, 3)
    Gj = jnp.cross(axes_s, p_s[:, None, :] - anchors_s) * mask[:, :, None]
    G_l = jnp.swapaxes(Gj, 1, 2)                           # (ns, 3, joint)

    Sinv_b = jnp.broadcast_to(fac.Sinv, (ns, 6, 6))
    P_bl_s = fac.P_bl[leg_s]                               # (ns, 6, 3)
    P_ll_s = fac.P_ll[leg_s]                               # (ns, 3, 3)
    GbS = _mm(G_b, Sinv_b)                                 # (ns, 3, 6)
    W = _mm(GbS, jnp.swapaxes(G_b, 1, 2))
    cross_bl = _mm(_mm(G_b, P_bl_s), jnp.swapaxes(G_l, 1, 2))
    W = W + cross_bl + jnp.swapaxes(cross_bl, 1, 2)
    W = W + _mm(_mm(G_l, P_ll_s), jnp.swapaxes(G_l, 1, 2))
    return W
