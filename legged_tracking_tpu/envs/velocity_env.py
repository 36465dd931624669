"""Walk-these-ways velocity-tracking environment (MoB, 15-dim commands).

TPU re-expression of the reference velocity env
(``go1_gym/envs/base/legged_robot_velocity_tracking.py``): gait clocks + von
Mises desired contact states (:844-920), 15-dim command space resampled from a
RewardThresholdCurriculum every ``resampling_time`` (:728-845), CoRL reward
container, legged_gym terrain tiles, and command-conditioned observations
(70 dims in the shipped config: gravity 3 + commands 15 + q/qd/actions 36 +
two prev actions 12 + clock 4).

The command curriculum runs fully on device (see tasks/curriculum.py) — the
reference's host-loop numpy curriculum is re-expressed as batched categorical
sampling + masked scatter updates so the whole step stays inside one jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..actuation import actuators
from ..config import Cfg
from ..physics.engine import PhysParams, PhysState
from ..physics.engine import control_step, control_step_lanes
from ..rewards import RewardCtx
from ..tasks.curriculum import DeviceCurriculum
from ..tasks.gaits import step_contact_targets
from ..terrain.heightfield import (TerrainArrays, extract_patches_batched,
                                   plane_terrain, sample_height_nearest)
from ..terrain.legged_gym_terrains import build_velocity_terrain
from ..utils import quat as qt
from . import observations as obs_lib
from .legged_env import LeggedEnv, StepOut
from .state import EnvState

# curriculum-tracked reward terms, fixed order (reference :746-748)
TRACK_KEYS = ["tracking_lin_vel", "tracking_ang_vel",
              "tracking_contacts_shaped_force", "tracking_contacts_shaped_vel"]
# per-dim neighbourhood for curriculum expansion (reference :753-755)
LOCAL_RANGE = np.array([0.55, 0.55, 0.55, 0.55, 0.35, 0.25, 0.25, 0.25, 0.25,
                        1.0, 1.0, 1.0, 1.0, 1.0, 1.0])


class VelocityTrackingEnv(LeggedEnv):
    def __init__(self, cfg: Cfg, terrain: TerrainArrays | None = None,
                 seed: int | None = None):
        cfg.env.command_type = "velocity"
        cfg.rewards.reward_container_name = getattr(
            cfg.rewards, "reward_container_name", "CoRLRewards") or "CoRLRewards"
        seed_ = cfg.seed if seed is None else seed
        if terrain is None:
            if cfg.terrain.mesh_type == "plane":
                terrain = plane_terrain(cfg.env.num_envs)
            else:
                terrain = build_velocity_terrain(cfg.terrain, cfg.env.num_envs, seed_)
        super().__init__(cfg, terrain=terrain, seed=seed_)

        c = cfg.commands
        self.category_names = (["pronk", "trot", "pace", "bound"]
                               if c.gaitwise_curricula else ["nominal"])
        key_ranges = [
            (c.limit_vel_x[0], c.limit_vel_x[1], c.num_bins_vel_x),
            (c.limit_vel_y[0], c.limit_vel_y[1], c.num_bins_vel_y),
            (c.limit_vel_yaw[0], c.limit_vel_yaw[1], c.num_bins_vel_yaw),
            (c.limit_body_height[0], c.limit_body_height[1], c.num_bins_body_height),
            (c.limit_gait_frequency[0], c.limit_gait_frequency[1], c.num_bins_gait_frequency),
            (c.limit_gait_phase[0], c.limit_gait_phase[1], c.num_bins_gait_phase),
            (c.limit_gait_offset[0], c.limit_gait_offset[1], c.num_bins_gait_offset),
            (c.limit_gait_bound[0], c.limit_gait_bound[1], c.num_bins_gait_bound),
            (c.limit_gait_duration[0], c.limit_gait_duration[1], c.num_bins_gait_duration),
            (c.limit_footswing_height[0], c.limit_footswing_height[1], c.num_bins_footswing_height),
            (c.limit_body_pitch[0], c.limit_body_pitch[1], c.num_bins_body_pitch),
            (c.limit_body_roll[0], c.limit_body_roll[1], c.num_bins_body_roll),
            (c.limit_stance_width[0], c.limit_stance_width[1], c.num_bins_stance_width),
            (c.limit_stance_length[0], c.limit_stance_length[1], c.num_bins_stance_length),
            (c.limit_aux_reward_coef[0], c.limit_aux_reward_coef[1], c.num_bins_aux_reward_coef),
        ][: c.num_commands]
        init_low = np.array([
            c.lin_vel_x[0], c.lin_vel_y[0], c.ang_vel_yaw[0], c.body_height_cmd[0],
            c.gait_frequency_cmd_range[0], c.gait_phase_cmd_range[0],
            c.gait_offset_cmd_range[0], c.gait_bound_cmd_range[0],
            c.gait_duration_cmd_range[0], c.footswing_height_range[0],
            c.body_pitch_range[0], c.body_roll_range[0], c.stance_width_range[0],
            c.stance_length_range[0], c.aux_reward_coef_range[0]])[: c.num_commands]
        init_high = np.array([
            c.lin_vel_x[1], c.lin_vel_y[1], c.ang_vel_yaw[1], c.body_height_cmd[1],
            c.gait_frequency_cmd_range[1], c.gait_phase_cmd_range[1],
            c.gait_offset_cmd_range[1], c.gait_bound_cmd_range[1],
            c.gait_duration_cmd_range[1], c.footswing_height_range[1],
            c.body_pitch_range[1], c.body_roll_range[1], c.stance_width_range[1],
            c.stance_length_range[1], c.aux_reward_coef_range[1]])[: c.num_commands]
        self.curriculum = DeviceCurriculum(
            key_ranges, init_low, init_high, LOCAL_RANGE[: c.num_commands],
            len(self.category_names))

        os_ = cfg.obs_scales
        self.commands_scale = jnp.asarray([
            os_.lin_vel, os_.lin_vel, os_.ang_vel, os_.body_height_cmd,
            os_.gait_freq_cmd, os_.gait_phase_cmd, os_.gait_phase_cmd,
            os_.gait_phase_cmd, os_.gait_phase_cmd, os_.footswing_height_cmd,
            os_.body_pitch_cmd, os_.body_roll_cmd, os_.stance_width_cmd,
            os_.stance_length_cmd, os_.aux_reward_cmd][: c.num_commands])

        # curriculum success thresholds: threshold * scale (x dt)
        th = cfg.curriculum_thresholds
        scale = dict(zip(self.reward_names, self.reward_scales))
        self._track_idx = [self.reward_names.index(k) if k in self.reward_names else -1
                           for k in TRACK_KEYS]
        self._track_thresh = np.array([
            getattr(th, k) * scale.get(k, 0.0) for k in TRACK_KEYS], dtype=np.float32)
        self._resample_interval = max(int(c.resampling_time / self.dt), 1)

    # ----------------------------------------------------- command sampling
    def _gaitwise_transform(self, commands, categories):
        """Category-conditioned phase/offset/bound shaping (reference :783-844)."""
        c = self.cfg.commands
        if c.num_commands <= 5:
            return commands
        ph, of, bo = commands[:, 5], commands[:, 6], commands[:, 7]
        if c.gaitwise_curricula:
            # pronk / trot / pace / bound
            ph_c = jnp.stack([(ph / 2 - 0.25) % 1, ph / 2 + 0.25,
                              jnp.zeros_like(ph), jnp.zeros_like(ph)], axis=1)
            of_c = jnp.stack([(of / 2 - 0.25) % 1, jnp.zeros_like(of),
                              of / 2 + 0.25, jnp.zeros_like(of)], axis=1)
            bo_c = jnp.stack([(bo / 2 - 0.25) % 1, jnp.zeros_like(bo),
                              jnp.zeros_like(bo), bo / 2 + 0.25], axis=1)
            idx = categories[:, None]
            ph = jnp.take_along_axis(ph_c, idx, axis=1)[:, 0]
            of = jnp.take_along_axis(of_c, idx, axis=1)[:, 0]
            bo = jnp.take_along_axis(bo_c, idx, axis=1)[:, 0]
        if c.binary_phases:
            ph = jnp.round(2 * ph) / 2.0 % 1
            of = jnp.round(2 * of) / 2.0 % 1
            bo = jnp.round(2 * bo) / 2.0 % 1
        commands = commands.at[:, 5].set(ph).at[:, 6].set(of).at[:, 7].set(bo)
        return commands

    def _resample_commands(self, keys, state_weights, command_sums, ep_len,
                           old_cats, old_bins, old_commands, mask):
        """Batched _resample_commands (reference :728-845): curriculum update
        from the resampled envs' tracking sums, then fresh draws."""
        c = self.cfg.commands
        N = mask.shape[0]
        # 1. curriculum update from envs being resampled
        ep_used = min(int(self.cfg.env.max_episode_length), self._resample_interval)
        ok = jnp.ones(N, dtype=bool)
        for i, idx in enumerate(self._track_idx):
            if idx >= 0:
                ok = ok & (command_sums[:, i] / ep_used > self._track_thresh[i])
        if all(i < 0 for i in self._track_idx):
            ok = jnp.zeros(N, dtype=bool)
        weights = self.curriculum.update(state_weights, old_cats, old_bins, ok & mask)

        # 2. new categories + draws
        cat = jax.vmap(lambda k: jax.random.randint(
            k, (), 0, len(self.category_names)))(self._fold(keys, 40)).astype(jnp.int32)
        new_cmds, new_bins = self.curriculum.sample(self._fold(keys, 41), weights, cat)
        new_cmds = self._gaitwise_transform(new_cmds, cat)
        # zero small xy commands (reference :841-842)
        keep = jnp.linalg.norm(new_cmds[:, :2], axis=1) > 0.2
        new_cmds = new_cmds.at[:, :2].multiply(keep[:, None])

        m1 = mask[:, None]
        commands = jnp.where(m1, new_cmds, old_commands)
        bins = jnp.where(mask, new_bins.astype(jnp.int32), old_bins)
        cats = jnp.where(mask, cat, old_cats)
        command_sums = jnp.where(m1, 0.0, command_sums)
        return weights, commands, bins, cats, command_sums

    # -------------------------------------------------------------- observe
    def observe(self, state: EnvState):
        cfg = self.cfg
        N = self.num_envs
        phys = state.phys
        g_unit = state.gravity_vec / jnp.linalg.norm(state.gravity_vec)
        proj_grav = qt.quat_rotate_inverse(phys.base_quat,
                                           jnp.broadcast_to(g_unit, (N, 3)))
        blv = qt.quat_rotate_inverse(phys.base_quat, phys.v[:, :3])
        bav = qt.quat_rotate_inverse(phys.base_quat, phys.v[:, 3:6])
        foot_z = state.contact_forces[:, list(self.feet_slots), 2]
        scalars = obs_lib.scalar_obs(
            cfg, projected_gravity=proj_grav,
            commands=state.commands * self.commands_scale,
            dof_pos=phys.qj, default_dof_pos=self.default_dof_pos,
            dof_vel=phys.v[:, 6:], actions=state.actions,
            last_actions=state.last_actions, episode_length=state.episode_length,
            base_lin_vel=blv, base_ang_vel=bav, base_quat=phys.base_quat,
            foot_contact_z=foot_z)
        obs = obs_lib.assemble_obs(
            cfg, scalars, None, base_lin_vel=blv, base_ang_vel=bav,
            base_quat=phys.base_quat, last_actions=state.last_actions,
            foot_contact_z=foot_z, gait_indices=state.gait_indices,
            clock_inputs=state.clock_inputs)
        obs = jnp.clip(obs, -cfg.normalization.clip_observations,
                       cfg.normalization.clip_observations)
        priv = obs_lib.privileged_obs(
            cfg, friction=state.friction, restitution=state.restitution,
            payload=state.payload, com_displacement=state.com_displacement,
            motor_strength=state.motor_strength, motor_offset=state.motor_offset,
            kp_factor=state.kp_factor, kd_factor=state.kd_factor,
            base_z=phys.base_pos[:, 2], base_lin_vel=blv,
            gravity_vec=state.gravity_vec)
        obs_history = jnp.concatenate(
            [state.obs_history[:, self.num_obs:],
             obs.astype(state.obs_history.dtype)], axis=-1)
        return {"obs": obs, "privileged_obs": priv, "obs_history": obs_history}

    # ---------------------------------------------------------------- reset
    def reset_fn(self, key, randomize_ep_len: bool = False) -> EnvState:
        state = super().reset_fn(key, randomize_ep_len)
        N = self.num_envs
        keys = self._fold(state.rng, 50)
        weights = self.curriculum.init_weights
        cats0 = jnp.zeros(N, jnp.int32)
        bins0 = jnp.zeros(N, jnp.int32)
        sums0 = jnp.zeros((N, len(TRACK_KEYS)))
        weights, commands, bins, cats, sums = self._resample_commands(
            keys, weights, sums0, state.episode_length, cats0, bins0,
            jnp.zeros((N, self.cfg.commands.num_commands)), jnp.ones(N, bool))
        return state._replace(
            commands=commands,
            gait_indices=jnp.zeros(N),
            clock_inputs=jnp.zeros((N, 4)),
            desired_contact_states=jnp.zeros((N, 4)),
            foot_phase=jnp.zeros((N, 4)),
            foot_positions=jnp.zeros((N, 4, 3)),
            foot_velocities=jnp.zeros((N, 4, 3)),
            env_command_bins=bins, env_command_categories=cats,
            curriculum_weights=weights, command_sums=sums,
        )

    # ----------------------------------------------------------------- step
    def step_fn(self, state: EnvState, actions: jnp.ndarray):
        cfg = self.cfg
        dr = cfg.domain_rand
        N = self.num_envs
        model, terrain = self.model, self.terrain

        keys2 = jax.vmap(lambda k: jax.random.split(k, 2))(state.rng)
        rng_next, kstep = keys2[:, 0], keys2[:, 1]
        g2 = jax.random.split(state.global_rng, 2)
        g_next, gk = g2[0], g2[1]

        actions = jnp.clip(actions, -cfg.normalization.clip_actions,
                           cfg.normalization.clip_actions)
        actions_scaled = actuators.scale_actions(
            actions, cfg.control.action_scale, cfg.control.hip_scale_reduction)
        prev_foot_velocities = state.foot_velocities

        params = PhysParams(
            friction=state.friction, restitution=state.restitution,
            gravity=jnp.broadcast_to(state.gravity_vec, (N, 3)),
            payload=state.payload, com_offset=state.com_displacement)
        carry0 = (state.act, state.motor_strength, state.motor_offset,
                  state.kp_factor, state.kd_factor, actions_scaled)

        # gather mode selected at init (LeggedEnv.__init__: interleaved
        # GranuleSampler or the granule/layer/row legacy paths)
        patches = self._extract_patches(
            terrain, terrain.env_tile, terrain.env_terrain_origin,
            state.phys.base_pos[:, :2], px=cfg.sim.patch_x,
            py=cfg.sim.patch_y)

        if cfg.sim.lane_engine:
            phys, carry, aux = control_step_lanes(
                model, terrain, patches[0], patches[1], patches[2],
                terrain.env_terrain_origin, state.phys,
                self._torque_fn_lanes, carry0, params,
                cfg.sim.dt, cfg.control.decimation,
                cfg.sim.contact_stiffness, cfg.sim.contact_damping,
                cfg.sim.joint_limit_stiffness, cfg.sim.joint_limit_damping,
                fused_sampling=cfg.sim.fused_sampling)
        else:
            def one_env(phys, carry, p, patch, torigin):
                return control_step(
                    model, terrain, patch, torigin, phys, self._torque_fn,
                    carry, p, cfg.sim.dt, cfg.control.decimation,
                    cfg.sim.contact_stiffness, cfg.sim.contact_damping,
                    cfg.sim.joint_limit_stiffness,
                    cfg.sim.joint_limit_damping)

            phys, carry, aux = jax.vmap(one_env)(
                state.phys, carry0, params, patches, terrain.env_terrain_origin)
        act_state = carry[0]
        torques = aux.torques
        contact_forces = aux.contact_report
        raw_contact_forces = contact_forces
        if cfg.sim.contact_report_ema > 0.0:
            # smooth the reported force texture only (SimCfg.contact_report_ema)
            b = cfg.sim.contact_report_ema
            contact_forces = (1.0 - b) * contact_forces + b * state.contact_forces
        foot_positions = aux.sphere_pos[:, self.model.foot_sphere_idx, :]
        foot_velocities = aux.sphere_vel[:, self.model.foot_sphere_idx, :]

        ep_len = state.episode_length + 1
        common = state.common_step + 1
        base_pos, base_quat = phys.base_pos, phys.base_quat
        base_lin_vel = qt.quat_rotate_inverse(base_quat, phys.v[:, :3])
        base_ang_vel = qt.quat_rotate_inverse(base_quat, phys.v[:, 3:6])
        g_unit = state.gravity_vec / jnp.linalg.norm(state.gravity_vec)
        projected_gravity = qt.quat_rotate_inverse(base_quat,
                                                   jnp.broadcast_to(g_unit, (N, 3)))

        # ---- callback: command resampling + gait clocks (:686-727,844) ----
        resample_mask = (ep_len % self._resample_interval) == 0
        weights, commands, bins, cats, command_sums = self._resample_commands(
            self._fold(kstep, 42), state.curriculum_weights, state.command_sums,
            ep_len, state.env_command_categories, state.env_command_bins,
            state.commands, resample_mask)
        if cfg.commands.heading_command:
            fwd = qt.quat_apply(base_quat, jnp.array([1.0, 0.0, 0.0]))
            heading = jnp.arctan2(fwd[:, 1], fwd[:, 0])
            commands = commands.at[:, 2].set(
                jnp.clip(0.5 * qt.wrap_to_pi(commands[:, 3] - heading), -1.0, 1.0))
        if cfg.env.observe_gait_commands:
            gait = step_contact_targets(
                state.gait_indices, commands, self.dt,
                cfg.rewards.kappa_gait_probs, cfg.commands.pacing_offset)
        else:
            from ..tasks.gaits import GaitState
            gait = GaitState(state.gait_indices, state.foot_phase,
                             state.clock_inputs, state.clock_inputs,
                             state.clock_inputs, state.desired_contact_states)

        # push + interval DR + gravity events (same as the tunnel env)
        if dr.push_robots:
            push_mask = (ep_len % int(dr.push_interval)) == 0
            v_push = jax.vmap(lambda k: jax.random.uniform(
                k, (2,), minval=-dr.max_push_vel_xy, maxval=dr.max_push_vel_xy))(
                self._fold(kstep, 20))
            phys = phys._replace(v=phys.v.at[:, :2].set(
                jnp.where(push_mask[:, None], v_push, phys.v[:, :2])))
        ms, mo, kp, kd = state.motor_strength, state.motor_offset, state.kp_factor, state.kd_factor
        fric, rest, payload, com = state.friction, state.restitution, state.payload, state.com_displacement
        dr_mask = (ep_len % int(dr.rand_interval)) == 0
        nms, nmo, nkp, nkd = self._sample_dof_props(self._fold(kstep, 21), (ms, mo, kp, kd))
        ms = jnp.where(dr_mask[:, None], nms, ms)
        mo = jnp.where(dr_mask[:, None], nmo, mo)
        kp = jnp.where(dr_mask[:, None], nkp, kp)
        kd = jnp.where(dr_mask[:, None], nkd, kd)
        if dr.randomize_rigids_after_start:
            nfr, nre, npl, nco = self._sample_rigid_props(
                self._fold(kstep, 22), (fric, rest, payload, com))
            fric = jnp.where(dr_mask, nfr, fric)
            rest = jnp.where(dr_mask, nre, rest)
            payload = jnp.where(dr_mask, npl, payload)
            com = jnp.where(dr_mask[:, None], nco, com)
        gravity_vec = state.gravity_vec
        if dr.randomize_gravity:
            lo, hi = dr.gravity_range
            newg = jax.random.uniform(gk, (3,), minval=lo, maxval=hi) + jnp.array([0.0, 0.0, -9.8])
            gravity_vec = jnp.where((common % int(dr.gravity_rand_interval)) == 0,
                                    newg, gravity_vec)
            zero_evt = ((common - int(dr.gravity_rand_duration))
                        % int(dr.gravity_rand_interval)) == 0
            gravity_vec = jnp.where(zero_evt, jnp.array([0.0, 0.0, -9.8]), gravity_vec)

        # teleport at tile edges (reference _teleport_robots, :1046-1072) —
        # re-expressed as a within-tile wrap
        if cfg.terrain.teleport_robots and not terrain.is_plane:
            th = cfg.terrain.teleport_thresh
            span = jnp.array([cfg.terrain.terrain_length, cfg.terrain.terrain_width])
            local = base_pos[:, :2] - terrain.env_terrain_origin[:, :2]
            shift = (jnp.where(local < th, span[None, :] - 2 * th, 0.0)
                     + jnp.where(local > span[None, :] - th, -(span[None, :] - 2 * th), 0.0))
            phys = phys._replace(base_pos=phys.base_pos.at[:, :2].add(shift))
            base_pos = phys.base_pos

        # feet bookkeeping
        contact = contact_forces[:, list(self.feet_slots), 2] > 1.0
        contact_filt = contact | state.last_contacts
        first_contact = (state.feet_air_time > 0.0) & contact_filt
        feet_air_time = state.feet_air_time + self.dt
        feet_air_time_post = feet_air_time * ~contact_filt

        # ---- termination (velocity check_termination, :262-272) ----
        term_contact = jnp.any(jnp.linalg.norm(
            contact_forces[:, list(self.termination_slots), :], axis=-1) > 1.0, axis=-1) \
            if self.termination_slots else jnp.zeros(N, bool)
        time_out = ep_len > int(cfg.env.max_episode_length)
        done = term_contact | time_out
        if cfg.rewards.use_terminal_body_height:
            if cfg.terrain.measure_heights and not terrain.is_plane:
                pts = self.height_points[None, :, :] + base_pos[:, None, :2]
                floor_h = sample_height_nearest(
                    terrain, terrain.env_tile, terrain.env_terrain_origin, pts)[..., 1]
                rel_h = base_pos[:, 2] - jnp.mean(floor_h, axis=-1)
            else:
                rel_h = base_pos[:, 2]
            done = done | (rel_h < cfg.rewards.terminal_body_height)
        if getattr(cfg.rewards, "use_terminal_roll_pitch", False):
            rpy = qt.quaternion_to_roll_pitch_yaw(base_quat)
            done = done | (jnp.max(jnp.abs(rpy[:, :2]), axis=-1)
                           > cfg.rewards.terminal_body_ori)

        # ---- rewards ----
        ctx = RewardCtx(
            dt=self.dt, max_episode_length=float(cfg.env.max_episode_length),
            base_pos=base_pos, base_lin_vel=base_lin_vel, base_ang_vel=base_ang_vel,
            projected_gravity=projected_gravity, dof_pos=phys.qj, dof_vel=phys.v[:, 6:],
            last_dof_vel=state.last_dof_vel, default_dof_pos=self.default_dof_pos,
            dof_pos_soft_limits=self.dof_pos_soft_limits, torques=torques,
            actions=actions, last_actions=state.last_actions,
            contact_forces=contact_forces, penalised_slots=self.penalised_slots,
            feet_slots=self.feet_slots,
            relative_linear=jnp.zeros((N, 3)), relative_rotation=jnp.zeros((N, 3)),
            local_relative_linear=jnp.zeros((N, 3)),
            reached_buf=jnp.zeros(N, bool), plan_buf=jnp.zeros(N, bool),
            replan=jnp.zeros(N, bool), episode_length_buf=ep_len, reset_buf=done,
            feet_air_time=feet_air_time, feet_first_contact=first_contact,
            commands=commands, desired_contact_states=gait.desired_contact_states,
            foot_positions=foot_positions, foot_velocities=foot_velocities,
            prev_foot_velocities=prev_foot_velocities, foot_phase=gait.foot_indices,
            joint_pos_target=act_state.joint_pos_target,
            last_joint_pos_target=state.last_joint_pos_target,
            last_last_joint_pos_target=state.last_last_joint_pos_target,
            last_last_actions=state.last_last_actions, gravity_unit=g_unit,
            feet_contact_filt=contact_filt, base_quat=base_quat)
        terms = jnp.stack([fn(ctx, cfg) for fn in self.reward_fns], axis=-1)
        scale_vec = jnp.asarray(self.reward_scales)
        rews = terms * scale_vec
        term_sign = jnp.sum(rews, axis=0) >= 0.0
        rew_pos = jnp.sum(rews * term_sign, axis=-1)
        rew_neg = jnp.sum(rews * (~term_sign), axis=-1)
        rew = jnp.sum(rews, axis=-1)
        if cfg.rewards.only_positive_rewards:
            rew = jnp.clip(rew, 0.0, None)
        elif cfg.rewards.only_positive_rewards_ji22_style:
            rew = rew_pos * jnp.exp(rew_neg / cfg.rewards.sigma_rew_neg)
        # termination reward after clipping; "total" excludes it
        # (compute_reward, legged_robot_trajectory_tracking.py:348-353)
        term_cols = []
        if self.termination_scale:
            term_rew = self.termination_scale * (done & ~time_out).astype(jnp.float32)
            term_cols = [term_rew[:, None]]
        episode_sums = state.episode_sums + jnp.concatenate(
            [rews] + term_cols + [rew[:, None], rew_pos[:, None], rew_neg[:, None]],
            axis=-1)
        if self.termination_scale:
            rew = rew + term_rew

        # command_sums for the curriculum (reference compute_reward :297-301:
        # contact-shaped terms accumulate scale + rew)
        cs = []
        for i, idx in enumerate(self._track_idx):
            if idx < 0:
                cs.append(jnp.zeros(N))
            elif TRACK_KEYS[i].startswith("tracking_contacts"):
                cs.append(self.reward_scales[idx] + rews[:, idx])
            else:
                cs.append(rews[:, idx])
        command_sums = command_sums + jnp.stack(cs, axis=-1)

        info = {
            "time_outs": time_out & done,
            "done": done,
            "episode_sums": episode_sums,
            "episode_length": ep_len,
            "reached": jnp.zeros(N, bool),
            "goal_distance": jnp.zeros(N),
        }

        # ---- auto-reset ----
        rphys, ract, _ = self._reset_values(self._fold(kstep, 23), state.target_dist)
        rms, rmo, rkp, rkd = self._sample_dof_props(self._fold(kstep, 24), (ms, mo, kp, kd))
        d1 = done[:, None]

        def sel(new, old, mask):
            return jnp.where(mask.reshape(mask.shape + (1,) * (new.ndim - 1)), new, old)

        phys = jax.tree.map(lambda a, b: sel(a, b, done), rphys, phys)
        act_state = jax.tree.map(lambda a, b: sel(a, b, done), ract, act_state)
        ms = jnp.where(d1, rms, ms)
        mo = jnp.where(d1, rmo, mo)
        kp = jnp.where(d1, rkp, kp)
        kd = jnp.where(d1, rkd, kd)
        if dr.randomize_rigids_after_start:
            rfr, rre, rpl, rco = self._sample_rigid_props(
                self._fold(kstep, 25), (fric, rest, payload, com))
            fric = jnp.where(done, rfr, fric)
            rest = jnp.where(done, rre, rest)
            payload = jnp.where(done, rpl, payload)
            com = jnp.where(d1, rco, com)

        # commands resample for reset envs (reset_idx -> _resample_commands)
        weights, commands, bins, cats, command_sums = self._resample_commands(
            self._fold(kstep, 43), weights, command_sums, ep_len, cats, bins,
            commands, done)
        gait_indices = jnp.where(done, 0.0, gait.gait_indices)

        ep_len_post = jnp.where(done, 0, ep_len)
        episode_sums = jnp.where(d1, 0.0, episode_sums)
        feet_air_time_post = jnp.where(d1, 0.0, feet_air_time_post)
        last_contacts = jnp.where(d1, False, contact)

        # ---- observations from post-reset state ----
        g_unit_o = gravity_vec / jnp.linalg.norm(gravity_vec)
        proj_grav_o = qt.quat_rotate_inverse(phys.base_quat,
                                             jnp.broadcast_to(g_unit_o, (N, 3)))
        blv_o = qt.quat_rotate_inverse(phys.base_quat, phys.v[:, :3])
        bav_o = qt.quat_rotate_inverse(phys.base_quat, phys.v[:, 3:6])
        foot_z = contact_forces[:, list(self.feet_slots), 2]
        scalars = obs_lib.scalar_obs(
            cfg, projected_gravity=proj_grav_o,
            commands=commands * self.commands_scale,
            dof_pos=phys.qj, default_dof_pos=self.default_dof_pos,
            dof_vel=phys.v[:, 6:], actions=actions, last_actions=state.last_actions,
            episode_length=ep_len_post, base_lin_vel=blv_o, base_ang_vel=bav_o,
            base_quat=phys.base_quat, foot_contact_z=foot_z)
        obs = obs_lib.assemble_obs(
            cfg, scalars, None, base_lin_vel=blv_o, base_ang_vel=bav_o,
            base_quat=phys.base_quat, last_actions=state.last_actions,
            foot_contact_z=foot_z, gait_indices=gait_indices,
            clock_inputs=gait.clock_inputs)
        if cfg.noise.add_noise:
            noise = jax.vmap(lambda k: jax.random.uniform(
                k, (self.num_obs,), minval=-1.0, maxval=1.0))(self._fold(kstep, 26))
            obs = obs + noise * self.noise_vec
        obs = jnp.clip(obs, -cfg.normalization.clip_observations,
                       cfg.normalization.clip_observations)
        priv = obs_lib.privileged_obs(
            cfg, friction=fric, restitution=rest, payload=payload,
            com_displacement=com, motor_strength=ms, motor_offset=mo,
            kp_factor=kp, kd_factor=kd, base_z=phys.base_pos[:, 2],
            base_lin_vel=blv_o, gravity_vec=gravity_vec)
        priv = jnp.clip(priv, -cfg.normalization.clip_observations,
                        cfg.normalization.clip_observations)
        obs_history = jnp.concatenate(
            [state.obs_history[:, self.num_obs:],
             obs.astype(state.obs_history.dtype)], axis=-1)

        new_state = state._replace(
            phys=phys, act=act_state,
            friction=fric, restitution=rest, payload=payload, com_displacement=com,
            motor_strength=ms, motor_offset=mo, kp_factor=kp, kd_factor=kd,
            gravity_vec=gravity_vec,
            episode_length=ep_len_post, common_step=common,
            commands=commands,
            actions=actions, last_actions=jnp.where(d1, 0.0, actions),
            last_last_actions=jnp.where(d1, 0.0, state.last_actions),
            last_dof_vel=phys.v[:, 6:],
            last_joint_pos_target=act_state.joint_pos_target,
            last_last_joint_pos_target=jnp.where(d1, 0.0, state.last_joint_pos_target),
            feet_air_time=feet_air_time_post, last_contacts=last_contacts,
            # EMA restarts from the raw report across episode boundaries
            # (ADVICE r4; no-op at the default contact_report_ema=0)
            contact_forces=(jnp.where(d1[:, :, None], raw_contact_forces,
                                      contact_forces)
                            if cfg.sim.contact_report_ema > 0.0
                            else contact_forces),
            torques=torques,
            obs_history=obs_history,
            episode_sums=episode_sums,
            rng=rng_next, global_rng=g_next,
            gait_indices=gait_indices, clock_inputs=gait.clock_inputs,
            desired_contact_states=gait.desired_contact_states,
            foot_phase=gait.foot_indices,
            foot_positions=foot_positions, foot_velocities=foot_velocities,
            env_command_bins=bins, env_command_categories=cats,
            curriculum_weights=weights, command_sums=command_sums,
        )
        return new_state, StepOut(obs=obs, privileged_obs=priv,
                                  obs_history=obs_history, rew=rew, done=done,
                                  info=info)


VelocityTrackingEasyEnv = VelocityTrackingEnv
