"""The fused physics control step.

One call = ``decimation`` soft-contact dynamics substeps at ``sim.dt`` with
per-substep torque recomputation — the TPU equivalent of the reference hot
loop (legged_robot_trajectory_tracking.py:82-88: _compute_torques ->
set_dof_actuation_force_tensor -> gym.simulate x4).  Single-env; the env layer
vmaps it, and everything lives inside one jit with no host sync.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..terrain.heightfield import TerrainArrays
from . import contact as _contact
from . import dynamics, kinematics, lanes, sparse
from .model import Go1Model


class PhysState(NamedTuple):
    base_pos: jnp.ndarray   # (3,)
    base_quat: jnp.ndarray  # (4,) xyzw
    qj: jnp.ndarray         # (12,)
    v: jnp.ndarray          # (18,) [lin world, ang world, joint rates]


class PhysParams(NamedTuple):
    """Per-env randomized physical parameters."""
    friction: jnp.ndarray      # ()
    restitution: jnp.ndarray   # ()
    gravity: jnp.ndarray       # (3,) full gravity vector (incl. DR offset)
    payload: jnp.ndarray       # () added base mass
    com_offset: jnp.ndarray    # (3,) base COM displacement


class StepAux(NamedTuple):
    contact_report: jnp.ndarray  # (num_report, 3) mean net contact force over substeps
    torques: jnp.ndarray         # (12,) last-substep applied torques
    sphere_pos: jnp.ndarray      # (ns, 3) world (last substep)
    sphere_vel: jnp.ndarray      # (ns, 3) world (last substep)


def control_step(
    model: Go1Model,
    terrain: TerrainArrays,
    patch,                      # (patch (2,P,P), xs, ys) robot-local window
    env_terrain_origin,
    state: PhysState,
    torque_fn: Callable,        # (qj, qdj, carry) -> (tau (12,), carry)
    torque_carry,
    params: PhysParams,
    sim_dt: float,
    decimation: int,
    contact_stiffness: float,
    contact_damping: float,
    joint_limit_stiffness: float,
    joint_limit_damping: float,
) -> tuple:
    report_acc = jnp.zeros((model.num_report_bodies, 3))
    c = None
    tau = jnp.zeros(model.num_dof)
    # Physics needs true f32 matmuls: TPU's default bf16 MXU passes are far
    # too coarse for dynamics (policy nets elsewhere still run bf16-fast).
    with jax.default_matmul_precision("float32"):
        return _control_step_body(
            model, terrain, patch, env_terrain_origin, state, torque_fn,
            torque_carry, params, sim_dt, decimation, contact_stiffness,
            contact_damping, joint_limit_stiffness, joint_limit_damping,
            report_acc, c, tau,
        )


def _control_step_body(
    model, terrain, patch0, env_terrain_origin, state, torque_fn,
    torque_carry, params, sim_dt, decimation, contact_stiffness,
    contact_damping, joint_limit_stiffness, joint_limit_damping,
    report_acc, c, tau,
):
    # The arrow-structure factorization + contact apparent masses are computed
    # ONCE per control step and reused across the decimated substeps: they
    # vary by <1% over 20 ms and are the most expensive pieces of a substep
    # (see physics/sparse.py — Schur complement on the base replaces the
    # dense 18x18 inversion; apparent masses use the block inverse).  The
    # per-substep quantities (FK, velocities, world inertias, contact forces,
    # torques, bias) stay exact.
    fac0 = None
    W0 = None

    for k in range(decimation):  # static unroll — fuses into one XLA computation
        # ONE fused primal+tangent pass per substep: FK + body velocities +
        # velocity-product accelerations share their primal computation
        bs, alpha_vp, acc_vp = sparse.velocity_jvp(
            model, state.base_pos, state.base_quat, state.qj, state.v,
            params.com_offset)
        if k == 0:
            fac0 = sparse.factorize(model, bs.fk, params.payload)
            W0 = sparse.apparent_masses(model, bs.fk, fac0)
            fac = fac0
        else:
            # refresh the configuration-dependent world inertias (bias term)
            # while the ~20 ms-stale factorization solves (dense parity:
            # dynamics.refresh_mass_matrix kept M/Minv stale the same way)
            fac = fac0._replace(
                Iw=dynamics._world_inertia(bs.fk.R, model.inertia))
        tau, torque_carry = torque_fn(state.qj, state.v[6:], torque_carry)
        c = _contact.contact_forces(
            model, terrain, patch0, env_terrain_origin, bs, W0,
            params.friction, params.restitution,
            contact_stiffness, contact_damping, sim_dt,
        )
        tau_total = tau + _contact.joint_limit_torque(
            model, state.qj, state.v[6:], joint_limit_stiffness, joint_limit_damping
        )
        qdd = sparse.forward_dynamics(
            model, state.base_pos, state.base_quat, state.qj, state.v,
            tau_total, c.f_ext, params.gravity, bs, fac, params.com_offset,
            vp=(alpha_vp, acc_vp),
        )
        bp, bq, qj, v = dynamics.integrate(
            state.base_pos, state.base_quat, state.qj, state.v, qdd, sim_dt
        )
        # PhysX-style hard limits: joint position & velocity clamps, plus a
        # base-velocity safety ceiling (Isaac's max_linear/angular_velocity)
        qj = jnp.clip(qj, model.dof_lower, model.dof_upper)
        vj = jnp.clip(v[6:], -model.dof_vel_limit, model.dof_vel_limit)
        # Spin safety damper: our explicit integrator pumps energy through
        # the gyroscopic bias once the base spins faster than ~20 rad/s
        # (PhysX's TGS solves gyroscopics implicitly, so the reference never
        # sees this; observed as airborne robots gaining m/s-per-step with
        # ZERO contact force after tumbling).  Locomotion never exceeds
        # ~6 rad/s / ~5 m/s, so nominal dynamics are untouched: the damper
        # halves the excess above the threshold each substep.
        w, u = v[3:6], v[:3]
        wmag = jnp.linalg.norm(w)
        w = w * jnp.where(wmag > 10.0,
                          (10.0 + 0.5 * (wmag - 10.0)) / jnp.maximum(wmag, 1e-6),
                          1.0)
        umag = jnp.linalg.norm(u)
        u = u * jnp.where(umag > 15.0,
                          (15.0 + 0.5 * (umag - 15.0)) / jnp.maximum(umag, 1e-6),
                          1.0)
        v = jnp.concatenate([
            jnp.clip(u, -100.0, 100.0),
            jnp.clip(w, -50.0, 50.0),
            vj,
        ])
        state = PhysState(base_pos=bp, base_quat=bq, qj=qj, v=v)
        report_acc = report_acc + c.report
    aux = StepAux(
        contact_report=report_acc / decimation,
        torques=tau,
        sphere_pos=c.sphere_pos,
        sphere_vel=c.sphere_vel,
    )
    return state, torque_carry, aux


def control_step_lanes(
    model: Go1Model,
    terrain: TerrainArrays,
    patches,                    # (N, 2, P, P) env-major per-env windows
    xs, ys,                     # (N,) window offsets
    env_terrain_origin,         # (N, 2)
    state: PhysState,           # env-major (N-leading) fields
    torque_fn,                  # LANE-major fn from make_torque_fn_lanes
    torque_carry,               # env-major pytree (N-leading arrays)
    params: PhysParams,         # env-major
    sim_dt: float,
    decimation: int,
    contact_stiffness: float,
    contact_damping: float,
    joint_limit_stiffness: float,
    joint_limit_damping: float,
    fused_sampling: bool = False,
) -> tuple:
    """Whole-batch control step in the lane-major layout (physics/lanes.py):
    env-major state in/out, everything between transposed so the env batch
    rides the 128-wide lane axis.  Same decimation/staleness semantics as
    :func:`control_step` (factorization + apparent masses computed once per
    control step, world inertias refreshed per substep).

    ``fused_sampling`` relayouts the terrain patch ONCE here (layer axis
    into the columns, terrain.transpose_patch) so every substep's contact
    sampling runs as a single MXU matmul (sample_patch_bilinear_fused)."""
    to_lanes = lambda t: jax.tree.map(lambda a: jnp.moveaxis(a, 0, -1), t)
    to_envs = lambda t: jax.tree.map(lambda a: jnp.moveaxis(a, -1, 0), t)

    if fused_sampling and patches.ndim == 4:
        # legacy (N, 2, px, py) layout: relayout once per control step.
        # The interleaved GranuleSampler already emits (N, px, 2*py).
        from ..terrain.heightfield import transpose_patch
        patches = transpose_patch(patches)                  # (N, px, 2*py)

    bp, bq, qj, v = (state.base_pos.T, state.base_quat.T,
                     state.qj.T, state.v.T)
    carry = to_lanes(torque_carry)
    gravity = params.gravity.T
    com_off = params.com_offset.T
    E = bp.shape[-1]
    report_acc = jnp.zeros((model.num_report_bodies, 3, E))
    tau = jnp.zeros((model.num_dof, E))
    c = None
    fac0 = None
    W0 = None

    with jax.default_matmul_precision("float32"):
        for k in range(decimation):
            bs, alpha_vp, acc_vp = lanes.velocity_jvp(model, bp, bq, qj, v,
                                                      com_off)
            if k == 0:
                fac0 = lanes.factorize(model, bs.fk, params.payload)
                W0 = lanes.apparent_masses(model, bs.fk, fac0)
                fac = fac0
            else:
                fac = fac0._replace(Iw=lanes.world_inertia(bs.fk.R,
                                                           model.inertia))
            tau, carry = torque_fn(qj, v[6:], carry)
            c = lanes.contact_forces(
                model, terrain, patches, xs, ys, env_terrain_origin, bs, W0,
                params.friction, params.restitution,
                contact_stiffness, contact_damping, sim_dt,
                fused_sampling=fused_sampling)
            tau_total = tau + lanes.joint_limit_torque(
                model, qj, v[6:], joint_limit_stiffness, joint_limit_damping)
            qdd = lanes.forward_dynamics(model, v, tau_total, c.f_ext,
                                         gravity, bs, fac,
                                         vp=(alpha_vp, acc_vp))
            bp, bq, qj, v = lanes.integrate(bp, bq, qj, v, qdd, sim_dt)
            lower = jnp.asarray(model.dof_lower)[:, None]
            upper = jnp.asarray(model.dof_upper)[:, None]
            vlim = jnp.asarray(model.dof_vel_limit)[:, None]
            qj = jnp.clip(qj, lower, upper)
            vj = jnp.clip(v[6:], -vlim, vlim)
            # spin/velocity safety (see _control_step_body), lane-major
            w, u = v[3:6], v[:3]
            wmag = jnp.sqrt(jnp.sum(w * w, axis=0))
            w = w * jnp.where(wmag > 10.0,
                              (10.0 + 0.5 * (wmag - 10.0))
                              / jnp.maximum(wmag, 1e-6), 1.0)[None]
            umag = jnp.sqrt(jnp.sum(u * u, axis=0))
            u = u * jnp.where(umag > 15.0,
                              (15.0 + 0.5 * (umag - 15.0))
                              / jnp.maximum(umag, 1e-6), 1.0)[None]
            v = jnp.concatenate([
                jnp.clip(u, -100.0, 100.0),
                jnp.clip(w, -50.0, 50.0),
                vj,
            ])
            report_acc = report_acc + c.report

    out_state = PhysState(base_pos=bp.T, base_quat=bq.T, qj=qj.T, v=v.T)
    aux = StepAux(
        contact_report=jnp.moveaxis(report_acc, -1, 0) / decimation,
        torques=tau.T,
        sphere_pos=jnp.moveaxis(c.sphere_pos, -1, 0),
        sphere_vel=jnp.moveaxis(c.sphere_vel, -1, 0),
    )
    return out_state, to_envs(carry), aux
