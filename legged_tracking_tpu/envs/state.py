"""The batched environment state pytree.

Everything the reference keeps as mutable GPU buffers on the env object
(``_init_buffers`` / ``_init_custom_buffers__``, reference
legged_robot_trajectory_tracking.py:1169-1366) lives here as one immutable
NamedTuple of ``(N, ...)`` arrays, threaded through the jitted step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..actuation.actuators import ActuatorState
from ..physics.engine import PhysState


class EnvState(NamedTuple):
    phys: PhysState                 # batched physics state
    act: ActuatorState              # batched actuator memory (lag buffer, net history)

    # --- per-env domain randomization (reference :1329-1357) ---
    friction: jnp.ndarray           # (N,)
    restitution: jnp.ndarray        # (N,)
    payload: jnp.ndarray            # (N,)
    com_displacement: jnp.ndarray   # (N, 3)
    motor_strength: jnp.ndarray     # (N, 12)
    motor_offset: jnp.ndarray       # (N, 12)
    kp_factor: jnp.ndarray          # (N, 12)
    kd_factor: jnp.ndarray          # (N, 12)
    gravity_vec: jnp.ndarray        # (3,) full world gravity incl. DR impulse (global)

    # --- episode bookkeeping ---
    episode_length: jnp.ndarray     # (N,) int32
    common_step: jnp.ndarray        # () int32

    # --- trajectory / commands ---
    trajectories: jnp.ndarray       # (N, L, 6)
    curr_pose_index: jnp.ndarray    # (N,) int32
    reached: jnp.ndarray            # (N,) bool
    plan_buf: jnp.ndarray           # (N,) bool
    replan: jnp.ndarray             # (N,) bool
    plan_length: jnp.ndarray        # (N,) int32
    local_target_poses: jnp.ndarray  # (N, 6)
    collision_count: jnp.ndarray    # (N,) int32
    commands: jnp.ndarray           # (N, C)
    relative_linear: jnp.ndarray    # (N, 3)
    relative_rotation: jnp.ndarray  # (N, 3)
    local_relative_linear: jnp.ndarray   # (N, 3)
    local_relative_rotation: jnp.ndarray  # (N, 3)

    # --- action / velocity memory ---
    actions: jnp.ndarray            # (N, 12)
    last_actions: jnp.ndarray       # (N, 12)
    last_last_actions: jnp.ndarray  # (N, 12)
    last_dof_vel: jnp.ndarray       # (N, 12)
    last_joint_pos_target: jnp.ndarray       # (N, 12)
    last_last_joint_pos_target: jnp.ndarray  # (N, 12)

    # --- feet contact bookkeeping ---
    feet_air_time: jnp.ndarray      # (N, 4)
    last_contacts: jnp.ndarray      # (N, 4) bool
    contact_forces: jnp.ndarray     # (N, R, 3) last step's report (for obs/extras)
    torques: jnp.ndarray            # (N, 12) last applied torques

    # --- observation history (HistoryWrapper folded in, history_wrapper.py:7-43) ---
    obs_history: jnp.ndarray        # (N, H * num_obs)

    # --- dynamic (curriculum) scalars ---
    exploration_lin_scale: jnp.ndarray  # () current decayed scale (incl. dt)
    exploration_yaw_scale: jnp.ndarray  # ()
    target_dist: jnp.ndarray            # () cl_fix_target current x_mean

    # --- episodic metric accumulators ---
    episode_sums: jnp.ndarray       # (N, K) per active reward term + totals

    # --- rng ---
    rng: jnp.ndarray                # (N,) per-env PRNG keys
    global_rng: jnp.ndarray         # () global-event PRNG key

    # --- velocity-task (walk-these-ways) extensions; None for tunnel task ---
    gait_indices: jnp.ndarray = None          # (N,)
    clock_inputs: jnp.ndarray = None          # (N, 4)
    desired_contact_states: jnp.ndarray = None  # (N, 4)
    foot_phase: jnp.ndarray = None            # (N, 4) unwarped gait phase
    foot_positions: jnp.ndarray = None        # (N, 4, 3) world
    foot_velocities: jnp.ndarray = None       # (N, 4, 3) world
    env_command_bins: jnp.ndarray = None      # (N,) int32 curriculum bin
    env_command_categories: jnp.ndarray = None  # (N,) int32 gait category
    curriculum_weights: jnp.ndarray = None    # (num_categories, n_bins)
    command_sums: jnp.ndarray = None          # (N, 4) tracking-term sums

    # --- sampling-based-planner extension; None otherwise ---
    # (N, 2, nx, ny) height scan at this state's (post-reset) base pose.
    # The local planner reads the PREVIOUS step's stored scan instead of
    # re-scanning pre-reset (the base advances <0.06 m per control step —
    # same envelope argument as SimCfg.patch_y — and a freshly reset env's
    # stored scan is computed at its spawn pose, so it is exact there).
    # Kills the double _get_heights per step the reference pays
    # (legged_robot_trajectory_tracking.py:789 AND :357-423 each step).
    measured_heights: jnp.ndarray = None
