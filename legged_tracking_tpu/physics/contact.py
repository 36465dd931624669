"""Soft (penalty) contact of collision spheres vs the two-layer heightfield.

Replaces PhysX's TGS contact solver (reference sim cfg
legged_robot_trajectory_tracking_config.py:362-373) with a compliant
spring-damper normal force + regularized Coulomb friction, evaluated for all
48 spheres of all envs in one batched gather + elementwise pass — the natural
TPU formulation (no broadphase, no variable-size contact lists).

Forces are accumulated per *report slot* (17 = 13 bodies + 4 feet) to mirror
Isaac Gym's net ``contact_forces`` tensor used by terminations and reward
terms (legged_robot_trajectory_tracking.py:198-216, reward_crawling.py:32-35).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..terrain.heightfield import (TerrainArrays, sample_height_bilinear,
                                   sample_patch_bilinear)
from .dynamics import BodyState
from .model import Go1Model

# PhysX bounce_threshold_velocity (reference sim cfg :369): separations
# slower than this are treated as inelastic regardless of restitution
BOUNCE_THRESHOLD_VELOCITY = 0.5


class ContactOut(NamedTuple):
    f_ext: jnp.ndarray           # (nb, 6) world wrench [torque; force] at body COM
    report: jnp.ndarray          # (num_report, 3) net world contact force per slot
    sphere_pos: jnp.ndarray      # (ns, 3) world sphere centers
    sphere_vel: jnp.ndarray      # (ns, 3) world sphere velocities


def apparent_masses(model: Go1Model, bs: BodyState, mm) -> jnp.ndarray:
    """Per-sphere apparent inverse-mass blocks W = J_p M^-1 J_p^T (ns, 3, 3).

    Used only to cap contact impulses for stability; W drifts by <1% within a
    20 ms control step, so the engine computes it once per control step and
    reuses it across substeps (sim.per_step_mass_matrix).
    """
    f = bs.fk
    sb = model.sphere_body
    ns = sb.shape[0]
    p_s = f.p[sb] + jnp.einsum("sij,sj->si", f.R[sb], model.sphere_offset)
    # point Jacobian built DIRECTLY per sphere (indexing the (nb,6,nv) body
    # Jacobian materializes a padded (ns,3,nv) gather — ~6 ms/step):
    #   joint cols: mask * axis_k x (p_s - anchor_k);  base: [I | -skew(p_s-p0)]
    r_anchor = p_s[:, None, :] - f.anchor_w[None, :, :]           # (ns, nd, 3)
    Jj = jnp.cross(f.axis_w[None, :, :], r_anchor)                # (ns, nd, 3)
    Jj = Jj * model.sphere_ancestor_mask[:, :, None]
    r0 = p_s - f.p[0][None, :]
    from .kinematics import _skew
    Jp = jnp.concatenate([
        jnp.broadcast_to(jnp.eye(3), (ns, 3, 3)),
        -_skew(r0),
        jnp.swapaxes(Jj, 1, 2),
    ], axis=2)                                                    # (ns, 3, nv)
    JpMinv = jnp.einsum("sik,kl->sil", Jp, mm.Minv)
    return jnp.einsum("sil,sjl->sij", JpMinv, Jp)


def _quadform(W, v):
    """v^T W v per sphere as component arithmetic — einsum('si,sij,sj->s')
    lowers to padded dot_generals (~7 ms/step across its 8 instances)."""
    Wv0 = W[..., 0, 0] * v[..., 0] + W[..., 0, 1] * v[..., 1] + W[..., 0, 2] * v[..., 2]
    Wv1 = W[..., 1, 0] * v[..., 0] + W[..., 1, 1] * v[..., 1] + W[..., 1, 2] * v[..., 2]
    Wv2 = W[..., 2, 0] * v[..., 0] + W[..., 2, 1] * v[..., 1] + W[..., 2, 2] * v[..., 2]
    return Wv0 * v[..., 0] + Wv1 * v[..., 1] + Wv2 * v[..., 2]


def contact_forces(
    model: Go1Model,
    terrain: TerrainArrays,
    patch,                       # (patch (2,P,P), xs, ys) robot-local window
    env_terrain_origin,
    bs: BodyState,
    W: jnp.ndarray,              # (ns, 3, 3) apparent inverse-mass blocks
    friction,                    # scalar (per env after vmap)
    restitution,
    stiffness: float,
    damping: float,
    dt: float,
    max_depenetration_velocity: float = 1.0,
) -> ContactOut:
    """Spring-damper normal + stiction-capable friction.

    Stability at dt=5 ms comes from *impulse capping* with per-contact
    apparent masses m_eff = 1 / diag(J_p M^-1 J_p^T): the damping force and
    the friction force are clamped to at most cancel the relevant relative
    velocity within one substep (diagonal-mass implicit update).  This keeps
    feet in true stiction under the friction cone, with zero iteration — the
    batched TPU substitute for PhysX's TGS solver iterations.
    """
    f = bs.fk
    sb = model.sphere_body
    p_s = f.p[sb] + jnp.einsum("sij,sj->si", f.R[sb], model.sphere_offset)   # (ns,3)
    r = model.sphere_radius
    rel = p_s - f.com_w[sb]
    v_s = bs.u[sb] + jnp.cross(bs.omega[sb], rel)                            # (ns,3)

    pt, xs, ys = patch
    heights, grads = sample_patch_bilinear(
        pt, xs, ys, terrain.horizontal_scale,
        terrain.tiles.shape[2], terrain.tiles.shape[3],
        env_terrain_origin, p_s[:, :2],
    )                                                                        # (ns,2), (ns,2,2)
    h_ceil, h_floor = heights[:, 0], heights[:, 1]

    def surface_force(pen, normal):
        # pen < 0 means penetrating; normal points away from the surface
        n = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)
        vn = jnp.sum(n * v_s, axis=-1)
        active = pen < 0.0
        w_n = _quadform(W, n)
        m_eff_n = 1.0 / jnp.maximum(w_n, 1e-6)
        # spring + damping, damping impulse-capped (implicit in vn); the
        # spring is capped to a max depenetration velocity of 1 m/s per
        # substep, mirroring PhysX max_depenetration_velocity (reference
        # config :370) — bounds energy injection under deep penetration.
        # Restitution only applies above PhysX's bounce_threshold_velocity
        # (0.5 m/s, reference config :369): slow separations stay fully
        # damped, otherwise a body squeezed between the pit floor and the
        # ceiling slab at restitution~1 PUMPS the spring-cap energy every
        # micro-bounce and ejects at the velocity clamp (observed on
        # random_pyramid: z -> 24 m, |v| -> 100 m/s).
        bouncing = vn > BOUNCE_THRESHOLD_VELOCITY
        damp = jnp.minimum(
            damping * jnp.where(bouncing, 1.0 - restitution, 1.0),
            m_eff_n / dt,
        )
        f_spring = jnp.minimum(-stiffness * pen, m_eff_n * max_depenetration_velocity / dt)
        fn = jnp.maximum(f_spring - damp * vn, 0.0) * active

        vt = v_s - n * vn[..., None]
        vt_norm = jnp.maximum(jnp.linalg.norm(vt, axis=-1), 1e-8)
        t_dir = vt / vt_norm[..., None]
        w_t = _quadform(W, t_dir)
        m_eff_t = 1.0 / jnp.maximum(w_t, 1e-6)
        # friction: at most cancels slip velocity in one substep (stiction),
        # clamped to the Coulomb cone
        ft_mag = jnp.minimum(friction * fn, m_eff_t * vt_norm / dt)
        ft = -t_dir * ft_mag[..., None]
        return n * fn[..., None] + ft

    # floor: surface z = h_floor, outward normal ~ (-dh/dx, -dh/dy, 1)
    pen_floor = p_s[:, 2] - r - h_floor
    n_floor = jnp.stack([-grads[:, 1, 0], -grads[:, 1, 1], jnp.ones_like(pen_floor)], axis=-1)
    force = surface_force(pen_floor, n_floor)

    if not terrain.is_plane:
        # ceiling SLAB: obstacle occupies z in [h_ceil, ceiling_top].  A
        # sphere inside the slab is pushed out of its NEAREST face: the lower
        # surface (downward normal, from inside the tunnel) or the flat top
        # (upward — the reference's raised plateau border is walkable on top
        # of its trimesh the same way).
        pen_bot = h_ceil - (p_s[:, 2] + r)          # <0: crossed lower face
        pen_top = (p_s[:, 2] - r) - terrain.ceiling_top  # <0: below slab top
        from_below = (-pen_bot) <= (-pen_top)
        inactive = jnp.asarray(0.1, pen_bot.dtype)
        pen_bot = jnp.where((pen_top < 0.0) & from_below, pen_bot, inactive)
        pen_top = jnp.where((h_ceil - p_s[:, 2] - r < 0.0) & ~from_below,
                            pen_top, inactive)
        n_ceil = jnp.stack([grads[:, 0, 0], grads[:, 0, 1], -jnp.ones_like(pen_bot)], axis=-1)
        force = force + surface_force(pen_bot, n_ceil)
        n_top = jnp.stack([jnp.zeros_like(pen_top), jnp.zeros_like(pen_top),
                           jnp.ones_like(pen_top)], axis=-1)
        force = force + surface_force(pen_top, n_top)

    # accumulate per-body wrench at COM.  The sphere->body / sphere->report
    # maps are STATIC, so the accumulation is a one-hot contraction (a tiny
    # batched matmul): the equivalent batched scatter-add lowers to a while
    # loop serialized over all 48 spheres — measured 2 x 0.24 ms per substep
    # = ~1.9 ms of the 10.4 ms env-step at 4096 envs (HLO while.60-67).
    torque = jnp.cross(p_s - f.com_w[sb], force)
    S_body = (jnp.arange(model.num_bodies)[:, None]
              == sb[None, :]).astype(force.dtype)                 # (nb, ns)
    f_ext = jnp.concatenate([S_body @ torque, S_body @ force], axis=-1)
    S_rep = (jnp.arange(model.num_report_bodies)[:, None]
             == model.sphere_report[None, :]).astype(force.dtype)  # (nr, ns)
    report = S_rep @ force
    return ContactOut(f_ext=f_ext, report=report, sphere_pos=p_s, sphere_vel=v_s)


def joint_limit_torque(model: Go1Model, qj, qdj, stiffness: float, damping: float):
    """Penalty torques keeping joints inside their URDF limits (PhysX enforces
    these as hard constraints; soft here, plus a position clamp at integrate)."""
    below = jnp.minimum(qj - model.dof_lower, 0.0)
    above = jnp.maximum(qj - model.dof_upper, 0.0)
    out = below + above
    tau = -stiffness * out
    tau = tau - damping * qdj * ((below < 0) & (qdj < 0))
    tau = tau - damping * qdj * ((above > 0) & (qdj > 0))
    return tau
