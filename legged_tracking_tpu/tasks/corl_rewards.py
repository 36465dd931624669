"""Walk-these-ways (MoB) reward terms.

Pure batched port of ``CoRLRewards``
(go1_gym/envs/rewards/corl_rewards.py:7-202): velocity tracking, gait-shaped
contact force/velocity terms, action smoothness, foot slip/clearance/impact,
orientation control, and the Raibert-heuristic footstep prior.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..rewards.containers import (_action_rate, _ang_vel_xy, _collision,
                                  _dof_acc, _dof_pos, _dof_pos_limits,
                                  _dof_vel, _lin_vel_z, _orientation, _torques)
from ..utils import quat as qt


def _tracking_lin_vel(ctx, cfg):
    err = jnp.sum(jnp.square(ctx.commands[:, :2] - ctx.base_lin_vel[:, :2]), axis=1)
    return jnp.exp(-err / cfg.rewards.tracking_sigma)


def _tracking_ang_vel(ctx, cfg):
    err = jnp.square(ctx.commands[:, 2] - ctx.base_ang_vel[:, 2])
    return jnp.exp(-err / cfg.rewards.tracking_sigma_yaw)


def _jump(ctx, cfg):
    body_height = ctx.base_pos[:, 2]
    target = ctx.commands[:, 3] + cfg.rewards.base_height_target
    return -jnp.square(body_height - target)


def _feet_forces(ctx):
    return jnp.linalg.norm(ctx.contact_forces[:, list(ctx.feet_slots), :], axis=-1)


def _tracking_contacts_shaped_force(ctx, cfg):
    forces = _feet_forces(ctx)
    desired = ctx.desired_contact_states
    r = -(1 - desired) * (1 - jnp.exp(-forces ** 2 / cfg.rewards.gait_force_sigma))
    return jnp.sum(r, axis=1) / 4


def _tracking_contacts_shaped_vel(ctx, cfg):
    vels = jnp.linalg.norm(ctx.foot_velocities, axis=2)
    desired = ctx.desired_contact_states
    r = -(desired * (1 - jnp.exp(-vels ** 2 / cfg.rewards.gait_vel_sigma)))
    return jnp.sum(r, axis=1) / 4


def _action_smoothness_1(ctx, cfg):
    diff = jnp.square(ctx.joint_pos_target - ctx.last_joint_pos_target)
    diff = diff * (ctx.last_actions != 0)           # ignore first step
    return jnp.sum(diff, axis=1)


def _action_smoothness_2(ctx, cfg):
    diff = jnp.square(ctx.joint_pos_target - 2 * ctx.last_joint_pos_target
                      + ctx.last_last_joint_pos_target)
    diff = diff * (ctx.last_actions != 0)
    diff = diff * (ctx.last_last_actions != 0)
    return jnp.sum(diff, axis=1)


def _feet_slip(ctx, cfg):
    # contact | pre-step last_contacts (corl_rewards.py:108-110); the env
    # provides the filtered mask since it owns the last_contacts state.
    vxy2 = jnp.square(jnp.linalg.norm(ctx.foot_velocities[:, :, :2], axis=2))
    return jnp.sum(ctx.feet_contact_filt * vxy2, axis=1)


def _feet_contact_vel(ctx, cfg):
    near_ground = ctx.foot_positions[:, :, 2] < 0.03
    v2 = jnp.square(jnp.linalg.norm(ctx.foot_velocities, axis=2))
    return jnp.sum(near_ground * v2, axis=1)


def _feet_contact_forces(ctx, cfg):
    return jnp.sum(jnp.clip(_feet_forces(ctx) - cfg.rewards.max_contact_force,
                            0.0, None), axis=1)


def _feet_clearance_cmd_linear(ctx, cfg):
    phases = 1 - jnp.abs(1.0 - jnp.clip(ctx.foot_phase * 2.0 - 1.0, 0.0, 1.0) * 2.0)
    foot_height = ctx.foot_positions[:, :, 2]
    target = ctx.commands[:, 9:10] * phases + 0.02   # +2cm foot radius
    r = jnp.square(target - foot_height) * (1 - ctx.desired_contact_states)
    return jnp.sum(r, axis=1)


def _feet_impact_vel(ctx, cfg):
    prev_vz = ctx.prev_foot_velocities[:, :, 2]
    contact = jnp.linalg.norm(ctx.contact_forces[:, list(ctx.feet_slots), :],
                              axis=-1) > 1.0
    return jnp.sum(contact * jnp.square(jnp.clip(prev_vz, -100.0, 0.0)), axis=1)


def _orientation_control(ctx, cfg):
    rp = ctx.commands[:, 10:12]
    quat_roll = qt.quat_from_angle_axis(-rp[:, 1], jnp.array([1.0, 0.0, 0.0]))
    quat_pitch = qt.quat_from_angle_axis(-rp[:, 0], jnp.array([0.0, 1.0, 0.0]))
    desired_quat = qt.quat_mul(quat_roll, quat_pitch)
    desired_pg = qt.quat_rotate_inverse(desired_quat,
                                        jnp.broadcast_to(ctx.gravity_unit,
                                                         rp.shape[:1] + (3,)))
    return jnp.sum(jnp.square(ctx.projected_gravity[:, :2] - desired_pg[:, :2]), axis=1)


def _raibert_heuristic(ctx, cfg):
    rel = ctx.foot_positions - ctx.base_pos[:, None, :]
    feet_body = qt.quat_apply_yaw_inverse(ctx.base_quat[:, None, :], rel)

    # DOCUMENTED DIVERGENCE (reference corl_rewards.py:169-174): the
    # reference pairs desired y = [+sw/2, -sw/2, +sw/2, -sw/2] with feet
    # [FR, FL, RR, RL] (the go1 URDF body order its feet_indices follow) —
    # but FR/RR stand at NEGATIVE body-frame y, so nominal stance carries a
    # constant ~(2·0.2)²·4 ≈ 0.64 m² penalty that dwarfs every other term
    # and annihilates ji22-clipped reward at sigma 0.02.  We pair signs with
    # the feet's actual sides.
    if cfg.commands.num_commands >= 13:
        sw = ctx.commands[:, 12:13]
        ys_nom = jnp.concatenate([-sw / 2, sw / 2, -sw / 2, sw / 2], axis=1)
    else:
        sw = 0.3
        ys_nom = jnp.asarray([[-sw / 2, sw / 2, -sw / 2, sw / 2]])
    if cfg.commands.num_commands >= 14:
        sl = ctx.commands[:, 13:14]
        xs_nom = jnp.concatenate([sl / 2, sl / 2, -sl / 2, -sl / 2], axis=1)
        stance_length = sl
    else:
        stance_length = 0.45
        xs_nom = jnp.asarray([[0.225, 0.225, -0.225, -0.225]])

    phases = jnp.abs(1.0 - ctx.foot_phase * 2.0) - 0.5
    frequencies = ctx.commands[:, 4]
    x_vel_des = ctx.commands[:, 0:1]
    yaw_vel_des = ctx.commands[:, 2:3]
    y_vel_des = yaw_vel_des * stance_length / 2
    ys_off = phases * y_vel_des * (0.5 / frequencies[:, None])
    ys_off = ys_off.at[:, 2:4].multiply(-1)
    xs_off = phases * x_vel_des * (0.5 / frequencies[:, None])

    desired = jnp.stack([xs_nom + xs_off, ys_nom + ys_off], axis=2)
    err = jnp.abs(desired - feet_body[:, :, :2])
    return jnp.sum(jnp.square(err), axis=(1, 2))


CORL_REWARDS = {
    "tracking_lin_vel": _tracking_lin_vel,
    "tracking_ang_vel": _tracking_ang_vel,
    "lin_vel_z": _lin_vel_z,
    "ang_vel_xy": _ang_vel_xy,
    "orientation": _orientation,
    "torques": _torques,
    "dof_acc": _dof_acc,
    "action_rate": _action_rate,
    "collision": _collision,
    "dof_pos_limits": _dof_pos_limits,
    "jump": _jump,
    "tracking_contacts_shaped_force": _tracking_contacts_shaped_force,
    "tracking_contacts_shaped_vel": _tracking_contacts_shaped_vel,
    "dof_pos": _dof_pos,
    "dof_vel": _dof_vel,
    "action_smoothness_1": _action_smoothness_1,
    "action_smoothness_2": _action_smoothness_2,
    "feet_slip": _feet_slip,
    "feet_contact_vel": _feet_contact_vel,
    "feet_contact_forces": _feet_contact_forces,
    "feet_clearance_cmd_linear": _feet_clearance_cmd_linear,
    "feet_impact_vel": _feet_impact_vel,
    "orientation_control": _orientation_control,
    "raibert_heuristic": _raibert_heuristic,
}
