"""Forward kinematics and world-frame Jacobians for the Go1 tree.

Single-env functions; the engine vmaps them over the env batch so every op
becomes a (N, ...) batched elementwise/matmul op on the TPU VPU/MXU.

The tree has exactly 3 joint levels below the floating base (hips, thighs,
calves, 4 legs each), so FK unrolls into 3 batched level updates — the
XLA-friendly replacement for Isaac Gym's internal articulation update
(reference gym.simulate, legged_robot_trajectory_tracking.py:85).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..utils import quat
from .model import Go1Model

# static level structure: body indices per level (FR, FL, RR, RL order)
LEVEL_BODIES = (
    (1, 4, 7, 10),   # hips
    (2, 5, 8, 11),   # thighs
    (3, 6, 9, 12),   # calves
)
LEVEL_PARENTS = (
    (0, 0, 0, 0),
    (1, 4, 7, 10),
    (2, 5, 8, 11),
)
# permutation from [base, hips, thighs, calves] stacking order -> body order
_STACK_TO_BODY = (0, 1, 5, 9, 2, 6, 10, 3, 7, 11, 4, 8, 12)


class FK(NamedTuple):
    R: jnp.ndarray        # (nb, 3, 3) body->world rotations
    p: jnp.ndarray        # (nb, 3) body-frame origins (== joint anchors) in world
    com_w: jnp.ndarray    # (nb, 3) body COMs in world
    axis_w: jnp.ndarray   # (nd, 3) joint axes in world
    anchor_w: jnp.ndarray  # (nd, 3) joint anchor positions in world


def fk(model: Go1Model, base_pos: jnp.ndarray, base_quat: jnp.ndarray, qj: jnp.ndarray,
       base_com_offset: jnp.ndarray | None = None) -> FK:
    """base_pos (3,), base_quat (4,) xyzw, qj (12,) -> FK.

    base_com_offset (3,): DR displacement of the base COM (folded in HERE so
    no downstream consumer needs a large scatter into J — an at[].set on the
    (nb, 6, nv) Jacobian copies ~23 MB per substep at 4096 envs).
    """
    Rb = quat.quat_to_matrix(base_quat)
    Rs = [Rb[None]]
    ps = [base_pos[None]]
    R_prev, p_prev = Rb[None].repeat(4, axis=0), base_pos[None].repeat(4, axis=0)
    for level in range(3):
        bodies = jnp.asarray(LEVEL_BODIES[level])
        angles = qj[bodies - 1]                              # (4,)
        jp = model.joint_pos[bodies]                         # (4, 3)
        p_new = p_prev + jnp.einsum("lij,lj->li", R_prev, jp)
        # Go1 joints are axis-aligned (hips about X, thighs/calves about Y),
        # so R_prev @ R_axis(θ) is two column updates — no quaternion
        # construction (the 9-way stack of quat_to_matrix lowered to a slow
        # serial update chain on TPU)
        c = jnp.cos(angles)[:, None]
        s = jnp.sin(angles)[:, None]
        col0, col1, col2 = R_prev[..., 0], R_prev[..., 1], R_prev[..., 2]
        if level == 0:   # hip: rotation about local X
            R_new = jnp.stack([col0, c * col1 + s * col2, -s * col1 + c * col2],
                              axis=-1)
        else:            # thigh/calf: rotation about local Y
            R_new = jnp.stack([c * col0 - s * col2, col1, s * col0 + c * col2],
                              axis=-1)
        Rs.append(R_new)
        ps.append(p_new)
        R_prev, p_prev = R_new, p_new
    R_stack = jnp.concatenate(Rs, axis=0)                    # (13,3,3) in stack order
    p_stack = jnp.concatenate(ps, axis=0)
    perm = jnp.asarray(_STACK_TO_BODY)
    R = R_stack[perm]
    p = p_stack[perm]
    com = model.com
    if base_com_offset is not None:
        com = com.at[0].add(base_com_offset)
    com_w = p + jnp.einsum("bij,bj->bi", R, com)
    axis_w = jnp.einsum("bij,bj->bi", R[1:], model.joint_axis[1:])  # (12,3)
    anchor_w = p[1:]
    return FK(R=R, p=p, com_w=com_w, axis_w=axis_w, anchor_w=anchor_w)


def jacobians(model: Go1Model, f: FK, base_pos: jnp.ndarray):
    """World-frame 6D Jacobians at each body's COM.

    Returns J (nb, 6, 6+nd): rows 0:3 angular, 3:6 linear; columns 0:3 base
    linear vel (world), 3:6 base angular vel (world), 6: joint rates.
    Body spatial velocity [w_i; u_i] = J_i @ v with v = [v_base, w_base, qd].
    """
    nb, nd = model.num_bodies, model.num_dof
    I3 = jnp.eye(3)
    mask = model.ancestor_mask                                 # (nb, nd)

    # angular rows
    Jw_base = jnp.broadcast_to(I3, (nb, 3, 3))                 # d w_i / d w_base
    Jw_joint = f.axis_w.T[None, :, :] * mask[:, None, :]       # (nb, 3, nd)

    # linear rows
    r_base = f.com_w - base_pos[None, :]                       # (nb, 3)
    Jv_wbase = -_skew(r_base)                                  # d u_i / d w_base = -skew(c_i - p_base)
    r_joint = f.com_w[:, None, :] - f.anchor_w[None, :, :]     # (nb, nd, 3)
    Jv_joint = jnp.cross(f.axis_w[None, :, :], r_joint)        # (nb, nd, 3)
    Jv_joint = Jv_joint * mask[:, :, None]
    Jv_joint = jnp.swapaxes(Jv_joint, 1, 2)                    # (nb, 3, nd)
    Jv_base = jnp.broadcast_to(I3, (nb, 3, 3))

    zeros33 = jnp.zeros((nb, 3, 3))
    J_ang = jnp.concatenate([zeros33, Jw_base, Jw_joint], axis=2)
    J_lin = jnp.concatenate([Jv_base, Jv_wbase, Jv_joint], axis=2)
    return jnp.concatenate([J_ang, J_lin], axis=1)             # (nb, 6, 6+nd)


def _skew(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) cross-product matrices."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))
