"""Go1 rigid-body model as a static JAX pytree.

The kinematic tree is fixed at trace time (13 bodies / 12 revolute DOFs /
floating base), so all tree-structure arrays are compile-time constants and
the engine unrolls over tree *levels* (base -> hips -> thighs -> calves),
keeping every op batched over (envs, legs) — no per-body Python loops in the
hot path.

Replaces the reference's Isaac Gym asset loading (base_task.py:71-72,
legged_robot_trajectory_tracking.py:1483-1664) with a generated static model
(see tools/gen_go1_model.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from . import go1_model_data as D


class Go1Model(NamedTuple):
    """Static model constants (all jnp arrays, closed over by jitted fns)."""

    # tree
    parent: np.ndarray          # (nb,) static numpy — trace-time only
    ancestor_mask: jnp.ndarray  # (nb, nd) 1.0 where dof j is an ancestor of body i
    joint_body: np.ndarray      # (nd,) body index driven by dof j (static)

    # geometry
    joint_pos: jnp.ndarray      # (nb, 3) joint origin in parent frame
    joint_axis: jnp.ndarray     # (nb, 3) joint axis in child frame
    dof_lower: jnp.ndarray      # (nd,)
    dof_upper: jnp.ndarray      # (nd,)
    dof_effort: jnp.ndarray     # (nd,) torque limits
    dof_vel_limit: jnp.ndarray  # (nd,)

    # inertial
    mass: jnp.ndarray           # (nb,)
    com: jnp.ndarray            # (nb, 3) in body frame
    inertia: jnp.ndarray        # (nb, 3, 3) about COM, body frame

    # collision spheres
    sphere_body: jnp.ndarray    # (ns,) int
    sphere_ancestor_mask: jnp.ndarray  # (ns, nd) dof-ancestry of each sphere's body
    sphere_offset: jnp.ndarray  # (ns, 3)
    sphere_radius: jnp.ndarray  # (ns,)
    sphere_report: jnp.ndarray  # (ns,) report-slot index
    foot_sphere_idx: jnp.ndarray  # (4,) FR, FL, RR, RL

    num_bodies: int = D.NUM_BODIES
    num_dof: int = D.NUM_DOF
    num_report_bodies: int = D.NUM_REPORT_BODIES


def _ancestor_mask() -> np.ndarray:
    """mask[i, j] = 1 iff dof j is on the path from body i to the base."""
    nb, nd = D.NUM_BODIES, D.NUM_DOF
    mask = np.zeros((nb, nd), dtype=np.float32)
    for i in range(1, nb):
        b = i
        while b > 0:
            mask[i, b - 1] = 1.0  # dof j drives body j+1
            b = D.PARENT[b]
    return mask


def make_go1_model(dtype=jnp.float32) -> Go1Model:
    f = lambda a: jnp.asarray(a, dtype=dtype)
    return Go1Model(
        parent=np.asarray(D.PARENT),
        ancestor_mask=f(_ancestor_mask()),
        joint_body=np.arange(1, D.NUM_BODIES),
        joint_pos=f(D.JOINT_POS),
        joint_axis=f(D.JOINT_AXIS),
        dof_lower=f(D.DOF_LOWER),
        dof_upper=f(D.DOF_UPPER),
        dof_effort=f(D.DOF_EFFORT),
        dof_vel_limit=f(D.DOF_VEL_LIMIT),
        mass=f(D.MASS),
        com=f(D.COM),
        inertia=f(D.INERTIA),
        sphere_body=jnp.asarray(D.SPHERE_BODY),
        sphere_ancestor_mask=f(_ancestor_mask()[np.asarray(D.SPHERE_BODY)]),
        sphere_offset=f(D.SPHERE_OFFSET),
        sphere_radius=f(D.SPHERE_RADIUS),
        sphere_report=jnp.asarray(D.SPHERE_REPORT),
        foot_sphere_idx=jnp.asarray(D.FOOT_SPHERE_IDX),
    )


# convenient static index sets (URDF traversal order: FR, FL, RR, RL)
BODY_NAMES = D.BODY_NAMES
DOF_NAMES = D.DOF_NAMES
FOOT_REPORT_SLOTS = D.FOOT_REPORT_SLOTS
HIP_DOFS = [0, 3, 6, 9]
THIGH_BODIES = [i for i, n in enumerate(D.BODY_NAMES) if "thigh" in n]
CALF_BODIES = [i for i, n in enumerate(D.BODY_NAMES) if "calf" in n]
BASE_BODY = 0


def report_slots_for(names) -> list:
    """Report-slot indices for bodies whose name contains any of `names`
    (mirrors Isaac Gym's find_actor_rigid_body_handle indexing of
    penalised/termination contacts, legged_robot_trajectory_tracking.py:1647-1664)."""
    slots = []
    for i, n in enumerate(D.BODY_NAMES):
        nn = "base" if n == "base" else n
        if any(s in nn for s in names):
            slots.append(i)
    if any("foot" in s for s in names):
        slots.extend(D.FOOT_REPORT_SLOTS)
    return slots
