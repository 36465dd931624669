"""Reward term libraries as pure batched functions.

TPU equivalents of the reference reward containers:

- ``CRAWLING_REWARDS``  <-  RewardsCrawling
  (go1_gym/envs/rewards/reward_crawling.py:9-123)
- ``TRAJECTORY_TRACKING_REWARDS``  <-  TrajectoryTrackingRewards
  (go1_gym/envs/rewards/trajectory_tracking_reward.py:9-171)

Each term is ``fn(ctx: RewardCtx, cfg) -> (N,)`` over the batched step
context; the env selects the non-zero-scaled subset at build time (the
reflection-free analogue of ``_prepare_reward_function``, reference
legged_robot_trajectory_tracking.py:1368-1397) so zero-scale terms compile to
nothing.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

EPS = 1e-6


class RewardCtx(NamedTuple):
    """Everything reward terms may read (the pure-fn analogue of ``self.env``)."""

    dt: float
    max_episode_length: float
    base_pos: jnp.ndarray            # (N, 3)
    base_lin_vel: jnp.ndarray        # (N, 3) body frame
    base_ang_vel: jnp.ndarray        # (N, 3) body frame
    projected_gravity: jnp.ndarray   # (N, 3)
    dof_pos: jnp.ndarray             # (N, 12)
    dof_vel: jnp.ndarray             # (N, 12)
    last_dof_vel: jnp.ndarray        # (N, 12)
    default_dof_pos: jnp.ndarray     # (12,)
    dof_pos_soft_limits: jnp.ndarray  # (12, 2)
    torques: jnp.ndarray             # (N, 12)
    actions: jnp.ndarray             # (N, 12)
    last_actions: jnp.ndarray        # (N, 12)
    contact_forces: jnp.ndarray      # (N, R, 3) net per report slot
    penalised_slots: tuple           # static report-slot indices
    feet_slots: tuple                # static report-slot indices (4)
    relative_linear: jnp.ndarray     # (N, 3) goal pos in yaw-aligned body frame
    relative_rotation: jnp.ndarray   # (N, 3) goal rpy - base rpy, wrapped
    local_relative_linear: jnp.ndarray  # (N, 3) local (planned) target
    reached_buf: jnp.ndarray         # (N,) bool
    plan_buf: jnp.ndarray            # (N,) bool
    replan: jnp.ndarray              # (N,) bool
    episode_length_buf: jnp.ndarray  # (N,) int
    reset_buf: jnp.ndarray           # (N,) bool (pre-reward termination)
    feet_air_time: jnp.ndarray       # (N, 4) updated air time (post-contact)
    feet_first_contact: jnp.ndarray  # (N, 4) bool

    # --- velocity-task (walk-these-ways) extras; None for the tunnel task ---
    commands: jnp.ndarray = None             # (N, num_commands)
    desired_contact_states: jnp.ndarray = None  # (N, 4)
    foot_positions: jnp.ndarray = None       # (N, 4, 3) world
    foot_velocities: jnp.ndarray = None      # (N, 4, 3) world
    prev_foot_velocities: jnp.ndarray = None  # (N, 4, 3) world (pre-step)
    foot_phase: jnp.ndarray = None           # (N, 4) warped gait phase in [0,1)
    joint_pos_target: jnp.ndarray = None     # (N, 12)
    last_joint_pos_target: jnp.ndarray = None
    last_last_joint_pos_target: jnp.ndarray = None
    last_last_actions: jnp.ndarray = None
    gravity_unit: jnp.ndarray = None         # (3,) normalized world gravity
    feet_contact_filt: jnp.ndarray = None    # (N, 4) contact | last_contacts
    base_quat: jnp.ndarray = None            # (N, 4) xyzw


# ---------------------------------------------------------------- penalties

def _torques(ctx, cfg):
    return jnp.sum(jnp.square(ctx.torques), axis=1)


def _dof_vel(ctx, cfg):
    return jnp.sum(jnp.square(ctx.dof_vel), axis=1)


def _dof_acc(ctx, cfg):
    return jnp.sum(jnp.square((ctx.last_dof_vel - ctx.dof_vel) / ctx.dt), axis=1)


def _dof_pos(ctx, cfg):
    return jnp.sum(jnp.square(ctx.dof_pos - ctx.default_dof_pos), axis=1)


def _dof_pos_limits(ctx, cfg):
    lo = ctx.dof_pos_soft_limits[:, 0]
    hi = ctx.dof_pos_soft_limits[:, 1]
    out = -jnp.clip(ctx.dof_pos - lo, None, 0.0) + jnp.clip(ctx.dof_pos - hi, 0.0, None)
    return jnp.sum(out, axis=1)


def _collision(ctx, cfg):
    f = ctx.contact_forces[:, list(ctx.penalised_slots), :]
    return jnp.sum((jnp.linalg.norm(f, axis=-1) > 0.1).astype(jnp.float32), axis=1)


def _action_rate(ctx, cfg):
    return jnp.sum(jnp.square(ctx.last_actions - ctx.actions), axis=1)


def _base_height(ctx, cfg):
    return jnp.square(ctx.base_pos[:, 2] - cfg.rewards.base_height_target)


def _ang_vel_xy(ctx, cfg):
    return jnp.sum(jnp.square(ctx.base_ang_vel[:, :2]), axis=1)


def _lin_vel_z(ctx, cfg):
    return jnp.square(ctx.base_lin_vel[:, 2])


def _orientation(ctx, cfg):
    return jnp.sum(jnp.square(ctx.projected_gravity[:, :2]), axis=1)


def _large_vel(ctx, cfg):
    mag = jnp.linalg.norm(ctx.base_lin_vel[:, :2], axis=1) > 0.5
    return jnp.sum(jnp.square(ctx.base_lin_vel[:, :2]), axis=1) * mag


# ---------------------------------------------------------------- task terms

def _target_lin_vel(ctx, cfg):
    """Unit-vector-to-goal * target speed, zeroed when within reach criterion
    (shared by exploration_lin / reaching_linear_vel / task)."""
    tv = ctx.relative_linear[:, :2]
    mag = jnp.linalg.norm(tv, axis=1, keepdims=True)
    tv = tv / (mag + EPS) * cfg.rewards.target_lin_vel
    return tv * (mag > cfg.rewards.lin_reaching_criterion), mag


def _e2e(ctx, cfg):
    mag = jnp.linalg.norm(ctx.relative_linear[:, :2], axis=1)
    if cfg.env.terminate_end_of_trajectory:
        return (mag < cfg.commands.switch_dist) * float(cfg.env.max_episode_length)
    reached = mag < cfg.commands.switch_dist
    after = ctx.episode_length_buf > cfg.rewards.T_reach
    err = jnp.sum(jnp.square(ctx.base_lin_vel[:, :2]), axis=-1)
    return jnp.exp(-err / cfg.rewards.tracking_sigma_lin) * reached * after


def _vel_form(tv, base_vel, cfg):
    if cfg.rewards.lin_vel_form == "exp":
        err = jnp.sum(jnp.square(tv - base_vel), axis=-1)
        return jnp.exp(-err / cfg.rewards.tracking_sigma_lin)
    if cfg.rewards.lin_vel_form == "l1":
        return jnp.sum(jnp.abs(tv - base_vel), axis=-1)
    if cfg.rewards.lin_vel_form == "l2":
        return jnp.sum(jnp.square(tv - base_vel), axis=-1)
    raise ValueError(cfg.rewards.lin_vel_form)


def _exploration_lin(ctx, cfg):
    tv, mag = _target_lin_vel(ctx, cfg)
    base = ctx.base_lin_vel[:, :2]
    if cfg.rewards.lin_vel_form == "prod":
        bmag = jnp.linalg.norm(base, axis=1, keepdims=True)
        rew = jnp.sum(tv / cfg.rewards.target_lin_vel * base / (bmag + EPS), axis=-1)
        rew = rew * (bmag[:, 0] > cfg.rewards.small_vel_threshold)
        rew = rew + jnp.exp(-bmag[:, 0] ** 2 / cfg.rewards.tracking_sigma_lin) * (
            mag[:, 0] < cfg.rewards.lin_reaching_criterion)
        return rew
    return _vel_form(tv, base, cfg)


def _exploration_yaw(ctx, cfg):
    tw = ctx.relative_rotation[:, 2]
    mag = jnp.abs(tw)
    tw = tw / (mag + EPS) * cfg.rewards.target_ang_vel
    tw = tw * (mag > cfg.rewards.ang_reaching_criterion)
    err = jnp.square(tw - ctx.base_ang_vel[:, 2])
    return jnp.exp(-err / cfg.rewards.tracking_sigma_ang)


def _reaching_z(ctx, cfg):
    return jnp.square(ctx.relative_linear[:, 2])


def _reaching_roll(ctx, cfg):
    return jnp.square(ctx.relative_rotation[:, 0])


def _reaching_pitch(ctx, cfg):
    return jnp.square(ctx.relative_rotation[:, 1])


def _reaching_yaw_abs(ctx, cfg):
    return jnp.square(ctx.relative_rotation[:, 2])


def _reach_goal(ctx, cfg):
    return ctx.reached_buf.astype(jnp.float32)


def _reach_goal_t(ctx, cfg):
    return ctx.reached_buf * ctx.episode_length_buf.astype(jnp.float32)


def _reach_goal_T(ctx, cfg):
    return ctx.reached_buf * (ctx.episode_length_buf > cfg.rewards.T_reach).astype(jnp.float32)


def _task(ctx, cfg):
    tv, _ = _target_lin_vel(ctx, cfg)
    err = jnp.sum(jnp.square(tv - ctx.base_lin_vel[:, :2]), axis=-1)
    in_dist = jnp.linalg.norm(ctx.relative_linear[:, :2], axis=1) < cfg.rewards.large_dist_threshold
    return jnp.exp(-err / cfg.rewards.tracking_sigma_lin) * in_dist


def _exploration(ctx, cfg):
    base = ctx.base_lin_vel[:, :2]
    local = ctx.local_relative_linear[:, :2]
    r = jnp.sum(base * local, axis=1)
    r = r / (jnp.linalg.norm(local, axis=1) + EPS)
    r = r / (jnp.linalg.norm(base, axis=1) + EPS)
    return r * (jnp.linalg.norm(base, axis=1) > cfg.rewards.small_vel_threshold)


def _reaching_local_goal(ctx, cfg):
    return jnp.logical_and(ctx.plan_buf, ctx.replan).astype(jnp.float32)


def _stalling(ctx, cfg):
    small = jnp.linalg.norm(ctx.base_lin_vel[:, :2], axis=1) < cfg.rewards.small_vel_threshold
    far = jnp.linalg.norm(ctx.relative_linear[:, :2], axis=1) > cfg.rewards.large_dist_threshold
    return -(small & far).astype(jnp.float32)


def _linear_vel(ctx, cfg):
    return (jnp.linalg.norm(ctx.base_lin_vel[:, :3], axis=1) > 0.7).astype(jnp.float32)


def _survive(ctx, cfg):
    return jnp.ones_like(ctx.reset_buf, dtype=jnp.float32)


def _feet_air_time(ctx, cfg):
    """Reward long swing phases on first contact
    (trajectory_tracking_reward.py:115-126; air-time state is maintained by
    the env step so this stays a pure read)."""
    return jnp.sum((ctx.feet_air_time - 0.5) * ctx.feet_first_contact, axis=1)


def _reaching_linear_vel(ctx, cfg):
    tv, _ = _target_lin_vel(ctx, cfg)
    return _vel_form(tv, ctx.base_lin_vel[:, :2], cfg)


CRAWLING_REWARDS = {
    "dof_acc": _dof_acc,
    "torques": _torques,
    "dof_pos_limits": _dof_pos_limits,
    "collision": _collision,
    "action_rate": _action_rate,
    "base_height": _base_height,
    "ang_vel_xy": _ang_vel_xy,
    "orientation": _orientation,
    "large_vel": _large_vel,
    "e2e": _e2e,
    "exploration_lin": _exploration_lin,
    "exploration_yaw": _exploration_yaw,
    "reaching_z": _reaching_z,
    "reaching_roll": _reaching_roll,
    "reaching_pitch": _reaching_pitch,
}

TRAJECTORY_TRACKING_REWARDS = {
    "torques": _torques,
    "dof_vel": _dof_vel,
    "dof_acc": _dof_acc,
    "dof_pos": _dof_pos,
    "collision": _collision,
    "action_rate": _action_rate,
    "dof_pos_limits": _dof_pos_limits,
    "orientation": _orientation,
    "reach_goal": _reach_goal,
    "reach_goal_t": _reach_goal_t,
    "reach_goal_T": _reach_goal_T,
    "task": _task,
    "exploration": _exploration,
    "reaching_local_goal": _reaching_local_goal,
    "stalling": _stalling,
    "linear_vel": _linear_vel,
    "lin_vel_z": _lin_vel_z,
    "ang_vel_xy": _ang_vel_xy,
    "feet_air_time": _feet_air_time,
    "survive": _survive,
    "reaching_linear_vel": _reaching_linear_vel,
    "reaching_z": _reaching_z,
    "reaching_roll": _reaching_roll,
    "reaching_pitch": _reaching_pitch,
    "reaching_yaw_abs": _reaching_yaw_abs,
    "exploration_yaw": _exploration_yaw,
    "reaching_yaw": _exploration_yaw,
}


def get_container(name: str) -> dict:
    containers = {
        "RewardsCrawling": CRAWLING_REWARDS,
        "TrajectoryTrackingRewards": TRAJECTORY_TRACKING_REWARDS,
    }
    if name == "CoRLRewards":
        from ..tasks.corl_rewards import CORL_REWARDS
        return CORL_REWARDS
    return containers[name]
