"""Lane-major (env-minor) physics: the whole substep chain with the env
batch as the TRAILING axis.

Why this exists: the vmapped single-env formulation (engine.py) puts the env
batch LEADING, so XLA tiles every elementwise op with the tiny component
axis (3, 4, or 9 wide) in the 128-wide lane dimension — 2-37% vector-unit
utilization across the whole substep chain, measured as the 0.3-0.4 ms
"small fusions" that dominate rollout traces (CLAUDE.md perf log).  With the
env axis trailing, the same math runs at full lane occupancy: a cross
product over 4096 envs is 6 multiply-adds on (E,)-shaped vregs instead of
4096/8 sublane-padded passes over 3 useful lanes.

This module mirrors physics/{kinematics,sparse,contact,dynamics}.py function
by function (same formulas, same factorization, same contact model — see
those files for the reference-semantics citations).  Only the data layout
differs:

  - vectors:   (..., 3, E)   matrices: (..., 3, 3, E)   scalars: (..., E)
  - matrix axes sit at (-3, -2); the env axis is ALWAYS last
  - static model constants broadcast with a trailing [..., None]
  - body/sphere indexing is one-hot contraction (MXU) or trace-time python
    indexing — never a runtime gather

The terrain patch sampling stays in its env-major MXU formulation
(heightfield.sample_patch_bilinear): its contraction axes are per-env patch
cells, which the lane layout cannot improve on — the chain transposes the
48 sphere xy positions out and the heights/gradients back in (1.5 MB per
substep at 4096 envs, negligible).

Equivalence with the vmapped path is tested per-function and end-to-end in
tests/test_lane_engine.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .model import Go1Model

# ---------------------------------------------------------------------------
# generic lane-major helpers: matrix axes at (-3, -2), env axis last
# ---------------------------------------------------------------------------

_TRIL = np.asarray([[1.0, 0.0, 0.0], [1.0, 1.0, 0.0], [1.0, 1.0, 1.0]],
                   dtype=np.float32)


def _mm(A, B):
    """(..., n, k, E) @ (..., k, m, E) -> (..., n, m, E), fully unrolled."""
    n, k = A.shape[-3], A.shape[-2]
    m = B.shape[-2]
    rows = []
    for i in range(n):
        cols = [sum(A[..., i, t, :] * B[..., t, j, :] for t in range(k))
                for j in range(m)]
        rows.append(jnp.stack(cols, axis=-2))
    return jnp.stack(rows, axis=-3)


def _mv(A, v):
    """(..., n, k, E) @ (..., k, E) -> (..., n, E), fully unrolled."""
    n, k = A.shape[-3], A.shape[-2]
    return jnp.stack(
        [sum(A[..., i, t, :] * v[..., t, :] for t in range(k)) for i in range(n)],
        axis=-2)


def _mtv(A, v):
    """A^T @ v: (..., n, k, E), (..., n, E) -> (..., k, E)."""
    n, k = A.shape[-3], A.shape[-2]
    return jnp.stack(
        [sum(A[..., i, t, :] * v[..., i, :] for i in range(n)) for t in range(k)],
        axis=-2)


def _t(A):
    """Transpose the two matrix axes of (..., n, m, E)."""
    return jnp.swapaxes(A, -3, -2)


def _dot(a, b):
    """Component dot product over axis -2: (..., 3, E) x 2 -> (..., E)."""
    return jnp.sum(a * b, axis=-2)


def _cross(a, b):
    """Cross product with components at axis -2."""
    a0, a1, a2 = a[..., 0, :], a[..., 1, :], a[..., 2, :]
    b0, b1, b2 = b[..., 0, :], b[..., 1, :], b[..., 2, :]
    return jnp.stack([a1 * b2 - a2 * b1,
                      a2 * b0 - a0 * b2,
                      a0 * b1 - a1 * b0], axis=-2)


def _skew(v):
    """(..., 3, E) -> (..., 3, 3, E) cross-product matrices."""
    x, y, z = v[..., 0, :], v[..., 1, :], v[..., 2, :]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], axis=-2),
        jnp.stack([z, zero, -x], axis=-2),
        jnp.stack([-y, x, zero], axis=-2),
    ], axis=-3)


def _norm(v, eps=0.0):
    return jnp.sqrt(jnp.maximum(_dot(v, v), eps))


def _eye(n, like):
    return jnp.asarray(np.eye(n, dtype=np.float32))[..., None]


def _sym3_inv(D):
    """Closed-form inverse of symmetric (..., 3, 3, E) blocks (sparse.py:66)."""
    a, b, c = D[..., 0, 0, :], D[..., 0, 1, :], D[..., 0, 2, :]
    d, e, f = D[..., 1, 1, :], D[..., 1, 2, :], D[..., 2, 2, :]
    A = d * f - e * e
    B = c * e - b * f
    C = b * e - c * d
    det = a * A + b * B + c * C
    inv_det = 1.0 / det
    E_ = b * c - a * e
    F = a * d - b * b
    Dm = a * f - c * c
    row0 = jnp.stack([A, B, C], axis=-2)
    row1 = jnp.stack([B, Dm, E_], axis=-2)
    row2 = jnp.stack([C, E_, F], axis=-2)
    return jnp.stack([row0, row1, row2], axis=-3) * inv_det[..., None, None, :]


def _spd_inverse(M):
    """Unrolled Gauss-Jordan inverse of (n, n, E) SPD blocks — every row op
    is a full-lane (E,) vector op (dynamics.spd_inverse, lane-major)."""
    n = M.shape[0]
    E = M.shape[-1]
    one = jnp.ones(M.shape[2:], M.dtype)
    zero = jnp.zeros(M.shape[2:], M.dtype)
    # augmented rows as python lists of (E,) entries — fully unrolled
    A = [[M[i, j] for j in range(n)]
         + [one if i == j else zero for j in range(n)] for i in range(n)]
    for i in range(n):
        inv_piv = 1.0 / A[i][i]
        row = [A[i][j] * inv_piv for j in range(2 * n)]
        for r in range(n):
            if r == i:
                continue
            f = A[r][i]
            A[r] = [A[r][j] - f * row[j] for j in range(2 * n)]
        A[i] = row
    return jnp.stack([jnp.stack(A[i][n:], axis=0) for i in range(n)], axis=0)


def _take13(S, x):
    """One-hot row-select: S (ns, 13) static, x (13, C..., E) -> (ns, C..., E)
    as a single MXU matmul (runtime gathers serialize on TPU)."""
    shp = x.shape
    flat = x.reshape(shp[0], -1)
    out = jax.lax.dot_general(S, flat, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return out.reshape((S.shape[0],) + shp[1:])


# ---------------------------------------------------------------------------
# quaternions, lane-major: q (4, E) xyzw
# ---------------------------------------------------------------------------

def quat_to_matrix(q):
    qx, qy, qz, qw = q[0], q[1], q[2], q[3]
    xx, yy, zz = qx * qx, qy * qy, qz * qz
    xy, xz, yz = qx * qy, qx * qz, qy * qz
    wx, wy, wz = qw * qx, qw * qy, qw * qz
    return jnp.stack([
        jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=0),
        jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=0),
        jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=0),
    ], axis=0)


def quat_mul(a, b):
    ax, ay, az, aw = a[0], a[1], a[2], a[3]
    bx, by, bz, bw = b[0], b[1], b[2], b[3]
    return jnp.stack([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    ], axis=0)


def quat_normalize(q, eps=1e-9):
    return q / jnp.sqrt(jnp.maximum(jnp.sum(q * q, axis=0), eps))


def quat_derivative(q, omega_world):
    """q̇ = 0.5 [w, 0] ⊗ q (dynamics.quat_derivative, lane-major)."""
    wq = jnp.concatenate([omega_world, jnp.zeros_like(omega_world[:1])], axis=0)
    return 0.5 * quat_mul(wq, q)


def quat_integrate(q, omega_world, dt, eps=1e-9):
    """Exponential-map integration (utils/quat.quat_integrate, lane-major)."""
    angle = jnp.sqrt(jnp.maximum(jnp.sum(omega_world * omega_world, axis=0), eps * eps))
    axis = omega_world / jnp.maximum(angle, eps)
    half = 0.5 * angle * dt
    s = jnp.sin(half)
    dq = jnp.concatenate([axis * s, jnp.cos(half)[None]], axis=0)
    return quat_normalize(quat_mul(dq, q))


# ---------------------------------------------------------------------------
# forward kinematics (kinematics.fk, lane-major)
# ---------------------------------------------------------------------------

LEVEL_BODIES = ((1, 4, 7, 10), (2, 5, 8, 11), (3, 6, 9, 12))
_STACK_TO_BODY = (0, 1, 5, 9, 2, 6, 10, 3, 7, 11, 4, 8, 12)


class FKL(NamedTuple):
    R: jnp.ndarray        # (13, 3, 3, E)
    p: jnp.ndarray        # (13, 3, E)
    com_w: jnp.ndarray    # (13, 3, E)
    axis_w: jnp.ndarray   # (12, 3, E)
    anchor_w: jnp.ndarray  # (12, 3, E)


def fk(model: Go1Model, base_pos, base_quat, qj, base_com_offset=None) -> FKL:
    """base_pos (3,E), base_quat (4,E), qj (12,E) -> FKL.

    Same closed-form axis-aligned joint rotations as kinematics.fk:44-88
    (hips about local X, thighs/calves about local Y)."""
    Rb = quat_to_matrix(base_quat)                           # (3,3,E)
    E = base_pos.shape[-1]
    Rs = [Rb[None]]
    ps = [base_pos[None]]
    R_prev = jnp.broadcast_to(Rb[None], (4, 3, 3, E))
    p_prev = jnp.broadcast_to(base_pos[None], (4, 3, E))
    jpos = np.asarray(model.joint_pos)
    for level in range(3):
        bodies = LEVEL_BODIES[level]
        angles = jnp.stack([qj[b - 1] for b in bodies], axis=0)    # (4,E)
        jp = jnp.asarray(jpos[list(bodies)])[..., None]            # (4,3,1)
        p_new = p_prev + _mv(R_prev, jp)
        s = jnp.sin(angles)[:, None, :]
        c = jnp.cos(angles)[:, None, :]
        col0 = R_prev[..., :, 0, :]
        col1 = R_prev[..., :, 1, :]
        col2 = R_prev[..., :, 2, :]
        if level == 0:   # hip: rotation about local X
            R_new = jnp.stack([col0, c * col1 + s * col2,
                               -s * col1 + c * col2], axis=-2)
        else:            # thigh/calf: rotation about local Y
            R_new = jnp.stack([c * col0 - s * col2, col1,
                               s * col0 + c * col2], axis=-2)
        Rs.append(R_new)
        ps.append(p_new)
        R_prev, p_prev = R_new, p_new
    R_stack = jnp.concatenate(Rs, axis=0)                    # (13,3,3,E) stack order
    p_stack = jnp.concatenate(ps, axis=0)
    # stack->body permutation at trace time (no runtime gather)
    R = jnp.stack([R_stack[i] for i in _STACK_TO_BODY], axis=0)
    p = jnp.stack([p_stack[i] for i in _STACK_TO_BODY], axis=0)
    com_b = jnp.asarray(np.asarray(model.com))[..., None]    # (13,3,1)
    com_b = jnp.broadcast_to(com_b, (13, 3, E))
    if base_com_offset is not None:
        mask = np.zeros((13, 1, 1), dtype=np.float32)
        mask[0] = 1.0
        com_b = com_b + jnp.asarray(mask) * base_com_offset[None]
    com_w = p + _mv(R, com_b)
    jaxis = jnp.asarray(np.asarray(model.joint_axis)[1:])[..., None]  # (12,3,1)
    axis_w = _mv(R[1:], jnp.broadcast_to(jaxis, (12, 3, E)))
    return FKL(R=R, p=p, com_w=com_w, axis_w=axis_w, anchor_w=p[1:])


# ---------------------------------------------------------------------------
# leg-chain geometry + velocities (sparse.leg_geometry / body_velocities)
# ---------------------------------------------------------------------------

class LegGeomL(NamedTuple):
    axes: jnp.ndarray     # (4, 3, 3, E)  [leg, joint-level, xyz, E]
    k: jnp.ndarray        # (4, 3, 3, 3, E) [leg, body, joint, xyz, E]
    x_legs: jnp.ndarray   # (4, 3, 3, E)  c_i - p_base
    x_base: jnp.ndarray   # (3, E)        c_0 - p_base


def leg_geometry(f: FKL) -> LegGeomL:
    axes = f.axis_w.reshape(4, 3, 3, -1)
    anchors = f.anchor_w.reshape(4, 3, 3, -1)
    coms = f.com_w[1:].reshape(4, 3, 3, -1)
    d = coms[:, :, None] - anchors[:, None, :]               # (4,body,joint,3,E)
    k = _cross(jnp.broadcast_to(axes[:, None], d.shape), d) \
        * jnp.asarray(_TRIL)[None, :, :, None, None]
    return LegGeomL(axes=axes, k=k, x_legs=coms - f.p[0][None, None],
                    x_base=f.com_w[0] - f.p[0])


class BodyStateL(NamedTuple):
    fk: FKL
    omega: jnp.ndarray   # (13, 3, E)
    u: jnp.ndarray       # (13, 3, E)


def body_velocities(f: FKL, v) -> BodyStateL:
    """Chain recursion for body world velocities (sparse.body_velocities)."""
    g = leg_geometry(f)
    u_b, w_b, qd = v[:3], v[3:6], v[6:]
    qd_l = qd.reshape(4, 3, -1)
    aq = g.axes * qd_l[:, :, None, :]                        # (4,joint,3,E)
    w_legs = w_b[None, None] + jnp.cumsum(aq, axis=1)        # (4,body,3,E)
    lin_j = jnp.sum(g.k * qd_l[:, None, :, None, :], axis=2)  # (4,body,3,E)
    wb4 = jnp.broadcast_to(w_b[None, None], g.x_legs.shape)
    u_legs = u_b[None, None] + _cross(wb4, g.x_legs) + lin_j
    E = v.shape[-1]
    omega = jnp.concatenate([w_b[None], w_legs.reshape(12, 3, E)], axis=0)
    u0 = u_b + _cross(w_b, g.x_base)
    u = jnp.concatenate([u0[None], u_legs.reshape(12, 3, E)], axis=0)
    return BodyStateL(fk=f, omega=omega, u=u)


def velocity_jvp(model: Go1Model, base_pos, base_quat, qj, v, com_offset=None):
    """ONE fused primal+tangent pass (sparse.velocity_jvp, lane-major)."""
    qdot_pos = v[:3]
    qdot_quat = quat_derivative(base_quat, v[3:6])
    qdot_j = v[6:]

    def vel_map(bp, bq, qq):
        f = fk(model, bp, bq, qq, com_offset)
        st = body_velocities(f, v)
        return f, st.omega, st.u

    (f, omega, u), (_, alpha_vp, acc_vp) = jax.jvp(
        vel_map, (base_pos, base_quat, qj), (qdot_pos, qdot_quat, qdot_j))
    return BodyStateL(fk=f, omega=omega, u=u), alpha_vp, acc_vp


# ---------------------------------------------------------------------------
# world inertia + arrow factorization (sparse.factorize, lane-major)
# ---------------------------------------------------------------------------

def world_inertia(R, I_body):
    """R I R^T with constant body inertias: R (13,3,3,E), I (13,3,3)."""
    Ib = jnp.asarray(np.asarray(I_body))[..., None]
    Ib = jnp.broadcast_to(Ib, R.shape)
    return _mm(_mm(R, Ib), _t(R))


class FactorizationL(NamedTuple):
    A: jnp.ndarray        # (6, 6, E)
    B: jnp.ndarray        # (4, 6, 3, E)
    D: jnp.ndarray        # (4, 3, 3, E)
    Dinv: jnp.ndarray     # (4, 3, 3, E)
    BD: jnp.ndarray       # (4, 6, 3, E)
    Sinv: jnp.ndarray     # (6, 6, E)
    P_bl: jnp.ndarray     # (4, 6, 3, E)
    P_ll: jnp.ndarray     # (4, 3, 3, E)
    mass: jnp.ndarray     # (13, E)
    Iw: jnp.ndarray       # (13, 3, 3, E)


def factorize(model: Go1Model, f: FKL, payload) -> FactorizationL:
    """Arrow blocks + Schur factorization (sparse.factorize:141-203)."""
    g = leg_geometry(f)
    E = payload.shape[-1]
    mass_b = jnp.asarray(np.asarray(model.mass))[:, None]    # (13,1)
    pmask = np.zeros((13, 1), dtype=np.float32)
    pmask[0] = 1.0
    mass = mass_b + jnp.asarray(pmask) * payload[None]       # (13,E)
    Iw = world_inertia(f.R, model.inertia)                   # (13,3,3,E)
    m_l = mass[1:].reshape(4, 3, E)
    Iw_l = Iw[1:].reshape(4, 3, 3, 3, E)
    x_all = f.com_w - f.p[0][None]                           # (13,3,E)

    # ---- A (6,6,E) ----
    m_tot = jnp.sum(mass, axis=0)                            # (E,)
    mx = jnp.sum(mass[:, None, :] * x_all, axis=0)           # (3,E)
    A_uu = _eye(3, m_tot) * m_tot
    A_uw = -_skew(mx)
    xx = jnp.sum(mass[:, None, None, :] * x_all[:, :, None, :]
                 * x_all[:, None, :, :], axis=0)             # (3,3,E)
    x2 = jnp.sum(mass * jnp.sum(x_all * x_all, axis=1), axis=0)  # (E,)
    A_ww = jnp.sum(Iw, axis=0) + _eye(3, x2) * x2 - xx
    A = jnp.concatenate([
        jnp.concatenate([A_uu, A_uw], axis=1),
        jnp.concatenate([-A_uw, A_ww], axis=1),
    ], axis=0) + _eye(6, m_tot) * 1e-6                       # (6,6,E)

    # ---- B_l (4,6,3,E) ----
    km = g.k * m_l[:, :, None, None, :]                      # (4,body,joint,3,E)
    B_u = jnp.swapaxes(jnp.sum(km, axis=1), 1, 2)            # (4,3,joint,E)->swap
    axes_b = jnp.broadcast_to(g.axes[:, None], (4, 3, 3, 3, E))
    Iwa_full = _mv(Iw_l[:, :, None], axes_b)                 # (4,body,joint,3,E)
    Iwa = Iwa_full * jnp.asarray(_TRIL)[None, :, :, None, None]
    xk = _cross(jnp.broadcast_to(g.x_legs[:, :, None], km.shape), km)
    B_w = jnp.swapaxes(jnp.sum(Iwa + xk, axis=1), 1, 2)      # (4,3joint->xyz swap)
    B = jnp.concatenate([B_u, B_w], axis=1)                  # (4,6,3,E)

    # ---- D_l (4,3,3,E) ----
    rows = []
    for j in range(3):
        cols = []
        for t in range(3):
            lo = max(j, t)
            ang = sum(_dot(g.axes[:, j], Iwa_full[:, i, t])
                      for i in range(lo, 3))
            lin = sum(m_l[:, i] * _dot(g.k[:, i, j], g.k[:, i, t])
                      for i in range(lo, 3))
            cols.append(ang + lin)
        rows.append(jnp.stack(cols, axis=1))
    D = jnp.stack(rows, axis=1) + _eye(3, m_tot) * 1e-6      # (4,3,3,E)

    Dinv = _sym3_inv(D)
    BD = _mm(B, Dinv)                                        # (4,6,3,E)
    S = A - jnp.sum(_mm(BD, _t(B)), axis=0)
    Sinv = _spd_inverse(S)
    Sinv4 = jnp.broadcast_to(Sinv[None], (4, 6, 6, E))
    P_bl = -_mm(Sinv4, BD)
    P_ll = Dinv + _mm(_t(BD), _mm(Sinv4, BD))
    return FactorizationL(A=A, B=B, D=D, Dinv=Dinv, BD=BD, Sinv=Sinv,
                          P_bl=P_bl, P_ll=P_ll, mass=mass, Iw=Iw)


def solve(fac: FactorizationL, rhs):
    """M^-1 @ rhs via the Schur factorization (sparse.solve). rhs (18,E)."""
    E = rhs.shape[-1]
    r_b, r_q = rhs[:6], rhs[6:].reshape(4, 3, E)
    t = _mv(fac.Dinv, r_q)                                   # (4,3,E)
    r_b2 = r_b - jnp.sum(_mv(fac.B, t), axis=0)
    acc_b = _mv(fac.Sinv, r_b2)                              # (6,E)
    qdd_l = t - _mtv(fac.BD, jnp.broadcast_to(acc_b[None], (4, 6, E)))
    return jnp.concatenate([acc_b, qdd_l.reshape(12, E)])


def project(g: LegGeomL, n_i, f_i):
    """Q = sum_i J_i^T [n_i; f_i] without J (sparse.project). (13,3,E)x2 -> (18,E)."""
    E = n_i.shape[-1]
    x_all = jnp.concatenate([g.x_base[None], g.x_legs.reshape(12, 3, E)], axis=0)
    Q_u = jnp.sum(f_i, axis=0)                               # (3,E)
    Q_w = jnp.sum(n_i + _cross(x_all, f_i), axis=0)
    n_l = n_i[1:].reshape(4, 3, 3, E)
    f_l = f_i[1:].reshape(4, 3, 3, E)
    ang = jnp.sum(g.axes[:, None] * n_l[:, :, None], axis=-2)  # (4,body,joint,E)
    lin = jnp.sum(g.k * f_l[:, :, None], axis=-2)
    Q_q = jnp.sum(ang * jnp.asarray(_TRIL)[None, :, :, None] + lin, axis=1)
    return jnp.concatenate([Q_u, Q_w, Q_q.reshape(12, E)])


def forward_dynamics(model, v, tau_j, f_ext, gravity, bs: BodyStateL,
                     fac: FactorizationL, vp):
    """Generalized accelerations (18, E) (sparse.forward_dynamics)."""
    g = leg_geometry(bs.fk)
    alpha_vp, acc_vp = vp
    omega = bs.omega
    n_bias = _mv(fac.Iw, alpha_vp) + _cross(omega, _mv(fac.Iw, omega))
    f_bias = fac.mass[:, None, :] * acc_vp
    Q_bias = project(g, n_bias, f_bias)
    f_grav = fac.mass[:, None, :] * gravity[None]            # (13,3,E)
    Q_grav = project(g, jnp.zeros_like(f_grav), f_grav)
    Q_ext = project(g, f_ext[:, :3], f_ext[:, 3:])
    E = v.shape[-1]
    tau_gen = jnp.concatenate([jnp.zeros((6, E), v.dtype), tau_j])
    rhs = tau_gen + Q_grav + Q_ext - Q_bias
    return solve(fac, rhs)


# ---------------------------------------------------------------------------
# apparent masses (sparse.apparent_masses, lane-major)
# ---------------------------------------------------------------------------

def apparent_masses(model: Go1Model, f: FKL, fac: FactorizationL):
    """Per-sphere W = J_p M^-1 J_p^T (ns, 3, 3, E) from the block inverse."""
    sbn = np.asarray(model.sphere_body)
    ns = sbn.shape[0]
    E = f.p.shape[-1]
    S_sb = jnp.asarray((np.arange(13)[None, :] == sbn[:, None]).astype(np.float32))
    p_b = _take13(S_sb, f.p)                                 # (ns,3,E)
    R_b = _take13(S_sb, f.R)                                 # (ns,3,3,E)
    off = jnp.asarray(np.asarray(model.sphere_offset))[..., None]
    p_s = p_b + _mv(R_b, jnp.broadcast_to(off, (ns, 3, E)))
    r0 = p_s - f.p[0][None]
    I3 = jnp.broadcast_to(jnp.asarray(np.eye(3, dtype=np.float32))[None, :, :, None],
                          (ns, 3, 3, E))
    G_b = jnp.concatenate([I3, -_skew(r0)], axis=2)          # (ns,3,6,E)

    leg_s = np.clip((sbn - 1) // 3, 0, 3)
    axes4 = f.axis_w.reshape(4, 3, 3, E)
    anchors4 = f.anchor_w.reshape(4, 3, 3, E)
    axes_s = jnp.stack([axes4[l] for l in leg_s], axis=0)     # (ns,joint,3,E)
    anchors_s = jnp.stack([anchors4[l] for l in leg_s], axis=0)
    manc = np.asarray(model.sphere_ancestor_mask).reshape(ns, 4, 3)
    mask = jnp.asarray(manc[np.arange(ns), leg_s])            # (ns,3) static
    Gj = _cross(axes_s, p_s[:, None] - anchors_s) * mask[:, :, None, None]
    G_l = jnp.swapaxes(Gj, 1, 2)                              # (ns,3,joint,E)

    Sinv_b = jnp.broadcast_to(fac.Sinv[None], (ns, 6, 6, E))
    P_bl_s = jnp.stack([fac.P_bl[l] for l in leg_s], axis=0)  # (ns,6,3,E)
    P_ll_s = jnp.stack([fac.P_ll[l] for l in leg_s], axis=0)  # (ns,3,3,E)
    GbS = _mm(G_b, Sinv_b)                                    # (ns,3,6,E)
    W = _mm(GbS, _t(G_b))
    cross_bl = _mm(_mm(G_b, P_bl_s), _t(G_l))
    W = W + cross_bl + _t(cross_bl)
    W = W + _mm(_mm(G_l, P_ll_s), _t(G_l))
    return W


# ---------------------------------------------------------------------------
# contact (contact.contact_forces, lane-major; sampling stays env-major MXU)
# ---------------------------------------------------------------------------

BOUNCE_THRESHOLD_VELOCITY = 0.5


class ContactOutL(NamedTuple):
    f_ext: jnp.ndarray       # (13, 6, E)
    report: jnp.ndarray      # (17, 3, E)
    sphere_pos: jnp.ndarray  # (ns, 3, E)
    sphere_vel: jnp.ndarray  # (ns, 3, E)


def _quadform(W, v):
    """v^T W v with components at (-3,-2): (ns,3,3,E),(ns,3,E)->(ns,E)."""
    Wv = _mv(W, v)
    return _dot(Wv, v)


def contact_forces(model: Go1Model, terrain, patches_em, xs_em, ys_em,
                   env_origin_em, bs: BodyStateL, W,
                   friction, restitution, stiffness, damping, dt,
                   max_depenetration_velocity: float = 1.0,
                   fused_sampling: bool = False) -> ContactOutL:
    """Lane-major mirror of contact.contact_forces:75-185.

    ``patches_em``/``xs_em``/``ys_em``/``env_origin_em`` are the env-major
    per-env terrain windows; the bilinear sampling runs in its proven
    env-major MXU formulation with transposes at the boundary.
    ``friction``/``restitution`` are (E,).  With ``fused_sampling``,
    ``patches_em`` must be the (N, px, 2*py) transpose_patch layout and the
    sampling island runs sample_patch_bilinear_fused (1 MXU matmul + 2
    batched dots per substep instead of 5 contractions).
    """
    from ..terrain.heightfield import (sample_patch_bilinear,
                                       sample_patch_bilinear_fused)

    f = bs.fk
    sbn = np.asarray(model.sphere_body)
    ns = sbn.shape[0]
    E = f.p.shape[-1]
    S_sb = jnp.asarray((np.arange(13)[None, :] == sbn[:, None]).astype(np.float32))
    p_b = _take13(S_sb, f.p)
    R_b = _take13(S_sb, f.R)
    com_b = _take13(S_sb, f.com_w)
    u_b = _take13(S_sb, bs.u)
    w_b = _take13(S_sb, bs.omega)
    off = jnp.asarray(np.asarray(model.sphere_offset))[..., None]
    p_s = p_b + _mv(R_b, jnp.broadcast_to(off, (ns, 3, E)))   # (ns,3,E)
    r = jnp.asarray(np.asarray(model.sphere_radius))[:, None]  # (ns,1)
    rel = p_s - com_b
    v_s = u_b + _cross(w_b, rel)                              # (ns,3,E)

    # --- env-major MXU sampling island ---
    pts = jnp.transpose(p_s[:, :2], (2, 0, 1))                # (E, ns, 2)
    sampler = sample_patch_bilinear_fused if fused_sampling else sample_patch_bilinear
    heights, grads = jax.vmap(
        sampler, in_axes=(0, 0, 0, None, None, None, 0, 0)
    )(patches_em, xs_em, ys_em, terrain.horizontal_scale,
      terrain.tiles.shape[2], terrain.tiles.shape[3], env_origin_em, pts)
    h_ceil = heights[..., 0].T                                # (ns,E)
    h_floor = heights[..., 1].T
    gr = jnp.transpose(grads, (1, 2, 3, 0))                   # (ns,2,2,E)

    fr = friction[None]                                       # (1,E)
    rest = restitution[None]

    def surface_force(pen, normal):
        n = normal / _norm(normal, 1e-12)[:, None]
        vn = _dot(n, v_s)
        active = pen < 0.0
        w_n = _quadform(W, n)
        m_eff_n = 1.0 / jnp.maximum(w_n, 1e-6)
        bouncing = vn > BOUNCE_THRESHOLD_VELOCITY
        damp = jnp.minimum(
            damping * jnp.where(bouncing, 1.0 - rest, 1.0),
            m_eff_n / dt,
        )
        f_spring = jnp.minimum(-stiffness * pen,
                               m_eff_n * max_depenetration_velocity / dt)
        fn = jnp.maximum(f_spring - damp * vn, 0.0) * active
        vt = v_s - n * vn[:, None]
        vt_norm = jnp.maximum(_norm(vt), 1e-8)
        t_dir = vt / vt_norm[:, None]
        w_t = _quadform(W, t_dir)
        m_eff_t = 1.0 / jnp.maximum(w_t, 1e-6)
        ft_mag = jnp.minimum(fr * fn, m_eff_t * vt_norm / dt)
        ft = -t_dir * ft_mag[:, None]
        return n * fn[:, None] + ft

    pen_floor = p_s[:, 2] - r - h_floor
    n_floor = jnp.stack([-gr[:, 1, 0], -gr[:, 1, 1],
                         jnp.ones_like(pen_floor)], axis=1)
    force = surface_force(pen_floor, n_floor)

    if not terrain.is_plane:
        pen_bot = h_ceil - (p_s[:, 2] + r)
        pen_top = (p_s[:, 2] - r) - terrain.ceiling_top
        from_below = (-pen_bot) <= (-pen_top)
        inactive = jnp.asarray(0.1, pen_bot.dtype)
        pen_bot = jnp.where((pen_top < 0.0) & from_below, pen_bot, inactive)
        pen_top = jnp.where((h_ceil - p_s[:, 2] - r < 0.0) & ~from_below,
                            pen_top, inactive)
        n_ceil = jnp.stack([gr[:, 0, 0], gr[:, 0, 1],
                            -jnp.ones_like(pen_bot)], axis=1)
        force = force + surface_force(pen_bot, n_ceil)
        n_top = jnp.stack([jnp.zeros_like(pen_top), jnp.zeros_like(pen_top),
                           jnp.ones_like(pen_top)], axis=1)
        force = force + surface_force(pen_top, n_top)

    # one-hot wrench/report accumulation (contact.py:173-185), lane-major:
    # (13,48) @ (48, 3E) and (17,48) @ (48, 3E) MXU matmuls
    torque = _cross(p_s - com_b, force)
    S_body = jnp.asarray((np.arange(13)[:, None] == sbn[None, :]).astype(np.float32))
    t_acc = _take13(S_body, torque)
    f_acc = _take13(S_body, force)
    f_ext = jnp.concatenate([t_acc, f_acc], axis=1)           # (13,6,E)
    srep = np.asarray(model.sphere_report)
    S_rep = jnp.asarray(
        (np.arange(model.num_report_bodies)[:, None] == srep[None, :]
         ).astype(np.float32))
    report = _take13(S_rep, force)                            # (17,3,E)
    return ContactOutL(f_ext=f_ext, report=report, sphere_pos=p_s,
                       sphere_vel=v_s)


def joint_limit_torque(model: Go1Model, qj, qdj, stiffness, damping):
    """contact.joint_limit_torque, lane-major: qj/qdj (12,E)."""
    lower = jnp.asarray(np.asarray(model.dof_lower))[:, None]
    upper = jnp.asarray(np.asarray(model.dof_upper))[:, None]
    below = jnp.minimum(qj - lower, 0.0)
    above = jnp.maximum(qj - upper, 0.0)
    out = below + above
    tau = -stiffness * out
    tau = tau - damping * qdj * ((below < 0) & (qdj < 0))
    tau = tau - damping * qdj * ((above > 0) & (qdj > 0))
    return tau


# ---------------------------------------------------------------------------
# integration (dynamics.integrate, lane-major)
# ---------------------------------------------------------------------------

def integrate(base_pos, base_quat, qj, v, qdd, dt):
    """Semi-implicit Euler, lane-major."""
    v_new = v + qdd * dt
    base_pos_new = base_pos + v_new[:3] * dt
    base_quat_new = quat_integrate(base_quat, v_new[3:6], dt)
    qj_new = qj + v_new[6:] * dt
    return base_pos_new, base_quat_new, qj_new, v_new
