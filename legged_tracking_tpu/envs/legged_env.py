"""The Go1 trajectory-tracking environment: one fused, batched, jitted step.

TPU-native re-expression of the reference flagship env
(``go1_gym/envs/base/legged_robot_trajectory_tracking.py``): the decimated
torque/physics loop, post-physics state derivation, two-layer height scan,
waypoint machinery, domain randomization, termination, reward dispatch,
auto-reset and observation assembly all live inside a single
``step(state, actions)`` pure function — no host synchronisation anywhere in
the rollout (the reference crosses the Python/PhysX boundary four times per
step, :82-88).

Order of operations mirrors ``post_physics_step`` (:114-169):
physics -> derive base quantities -> callback (heights, target pose, commands,
push, DR, waypoint switching) -> termination -> rewards -> auto-reset ->
observations.  Auto-reset is branchless (``jnp.where`` over the state pytree).

Divergences from the reference (deliberate, documented):
- Observations for just-reset envs are computed from the *fresh* post-reset
  state (the reference leaves stale pre-reset values in the obs for one frame).
- ``xy_norm`` commands normalize per-env (the reference normalizes by the
  batch-global norm, :804-807 — a bug).
- Actuator-net history and lag buffers are zeroed on reset.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..actuation import actuators
from ..config import Cfg
from ..physics import model as go1_model
from ..physics.engine import (PhysParams, PhysState, control_step,
                              control_step_lanes)
from ..rewards import RewardCtx, get_container
from ..terrain.heightfield import (TerrainArrays, extract_patch,
                                   extract_patches_batched,
                                   sample_height_nearest, sample_patch_nearest)
from ..terrain.tunnel import build_terrain
from ..utils import quat as qt
from . import observations as obs_lib
from .state import EnvState
from .trajectories import TRAJ_FUNCTIONS

_BIG = 1e6


class StepOut(NamedTuple):
    obs: jnp.ndarray
    privileged_obs: jnp.ndarray
    obs_history: jnp.ndarray
    rew: jnp.ndarray
    done: jnp.ndarray
    info: dict


class LeggedEnv:
    """Static env build: closes over config/model/terrain, exposes pure
    ``reset_fn`` / ``step_fn`` plus a stateful convenience API."""

    def __init__(self, cfg: Cfg, terrain: TerrainArrays | None = None, seed: int | None = None):
        cfg.parse()
        self.cfg = cfg
        self.model = go1_model.make_go1_model()
        seed = cfg.seed if seed is None else seed
        self.terrain = terrain if terrain is not None else build_terrain(cfg, cfg.env.num_envs, seed)
        self.num_envs = cfg.env.num_envs
        self.num_actions = cfg.env.num_actions
        self.dt = cfg.dt

        # ---- derived static constants ----
        dof_names = go1_model.DOF_NAMES
        self.default_dof_pos = jnp.asarray(
            [cfg.init_state.default_joint_angles[n] for n in dof_names], dtype=jnp.float32)
        # soft dof limits (reference _process_dof_props, :692-706)
        lo, hi = np.asarray(self.model.dof_lower), np.asarray(self.model.dof_upper)
        m, r = (lo + hi) / 2, hi - lo
        soft = cfg.rewards.soft_dof_pos_limit
        self.dof_pos_soft_limits = jnp.asarray(
            np.stack([m - 0.5 * r * soft, m + 0.5 * r * soft], axis=1), dtype=jnp.float32)

        # contact report slots (reference _create_envs index lookups, :1647-1664)
        self.penalised_slots = tuple(go1_model.report_slots_for(cfg.asset.penalize_contacts_on))
        self.termination_slots = tuple(go1_model.report_slots_for(cfg.asset.terminate_after_contacts_on))
        self.feet_slots = tuple(go1_model.FOOT_REPORT_SLOTS)

        # observation sizes
        self.num_obs = obs_lib.num_obs(cfg)
        self.num_scalar_obs = obs_lib.num_scalar_obs(cfg)
        self.num_privileged_obs = obs_lib.num_privileged_obs(cfg)
        self.num_obs_history = cfg.env.num_observation_history * self.num_obs
        cfg.env.num_observations = self.num_obs
        cfg.env.num_scalar_observations = self.num_scalar_obs
        cfg.env.num_privileged_obs = self.num_privileged_obs
        self.noise_vec = jnp.asarray(obs_lib.noise_scale_vec(cfg))
        assert self.noise_vec.shape[0] == self.num_obs, (self.noise_vec.shape, self.num_obs)

        # height scan points (reference _init_height_points, :1902-1916)
        gx, gy = np.meshgrid(np.asarray(cfg.terrain.measured_points_x),
                             np.asarray(cfg.terrain.measured_points_y), indexing="ij")
        self.height_grid_shape = gx.shape
        self.height_points = jnp.asarray(
            np.stack([gx.ravel(), gy.ravel()], axis=-1), dtype=jnp.float32)  # (P, 2)

        # reward wiring (reference _prepare_reward_function, :1368-1397)
        container = get_container(cfg.rewards.reward_container_name)
        scales = {k: v for k, v in cfg.reward_scales.items() if v != 0.0}
        self.reward_names = [k for k in scales if k in container]
        missing = [k for k in scales if k not in container and k != "termination"]
        if missing:
            print(f"Warning: rewards {missing} have nonzero scale but no term in "
                  f"{cfg.rewards.reward_container_name}")
        self.reward_fns = [container[k] for k in self.reward_names]
        self.reward_scales = np.asarray(
            [scales[k] * self.dt for k in self.reward_names], dtype=np.float32)
        self._exp_lin_idx = self.reward_names.index("exploration_lin") if "exploration_lin" in self.reward_names else -1
        self._exp_yaw_idx = self.reward_names.index("exploration_yaw") if "exploration_yaw" in self.reward_names else -1
        # termination reward: applied AFTER the ji22/positive clipping, and
        # excluded from the "total" sum (reference compute_reward, :348-353;
        # _reward_termination = reset & ~timeout per legged_gym semantics)
        self.termination_scale = float(scales.get("termination", 0.0)) * self.dt
        # episode_sums columns: terms [+ termination] + total/total_pos/total_neg
        self.metric_names = (self.reward_names
                             + (["termination"] if self.termination_scale else [])
                             + ["total", "total_pos", "total_neg"])

        # actuator model
        self.actuator_net = actuators.load_actuator_net()
        self._torque_fn = actuators.make_torque_fn(
            cfg.control.control_type, self.actuator_net, self.default_dof_pos,
            cfg.control.stiffness, cfg.control.damping,
            self.model.dof_effort, cfg.domain_rand.randomize_lag_timesteps)
        self._torque_fn_lanes = actuators.make_torque_fn_lanes(
            cfg.control.control_type, self.actuator_net, self.default_dof_pos,
            cfg.control.stiffness, cfg.control.damping,
            self.model.dof_effort, cfg.domain_rand.randomize_lag_timesteps)

        self._traj_fn = TRAJ_FUNCTIONS[cfg.commands.traj_function]
        self._candidate_poses = jnp.asarray(cfg.commands.candidate_target_poses, dtype=jnp.float32)
        # single source for the robot half-extents (reference :1212): feeds
        # BOTH the direct planner scoring and the quadform precompute below
        # (tests assert the two paths agree — editing one constant must not
        # desync them)
        from ..utils.planner import ROBOT_SIZE
        self._robot_size = jnp.asarray(ROBOT_SIZE, dtype=jnp.float32)
        n_cand = self._candidate_poses.shape[0]
        self._plan_chunk = next(c for c in (45, 25, 15, 5, 1) if n_cand % c == 0)
        # quadform weights for candidate collision scoring
        # (CommandsCfg.planner_quadform): quad(p) = f(p)·w_c with
        # f = [x², y², z², xy, x, y, z, 1]. The effective yaw is the QUAT
        # yaw (quat_yaw_only of the full-euler quat — ±15° roll/pitch
        # shift it ~2° from the euler yaw), matching the direct path.
        cp = np.asarray(cfg.commands.candidate_target_poses, dtype=np.float64)
        qc = np.asarray(qt.quat_from_euler_xyz(
            jnp.asarray(cp[:, 3]), jnp.asarray(cp[:, 4]), jnp.asarray(cp[:, 5])))
        ye = 2.0 * np.arctan2(qc[:, 2], qc[:, 3])        # quat is (x,y,z,w)
        ca, sa = np.cos(ye), np.sin(ye)
        sx, sy, sz = (float(v) for v in np.asarray(self._robot_size))
        a = ca ** 2 / sx ** 2 + sa ** 2 / sy ** 2
        c_ = sa ** 2 / sx ** 2 + ca ** 2 / sy ** 2
        b = ca * sa * (1.0 / sx ** 2 - 1.0 / sy ** 2)
        cx, cy, cz = cp[:, 0], cp[:, 1], cp[:, 2]
        w = np.stack([
            a, c_, np.full_like(a, 1.0 / sz ** 2), 2.0 * b,
            -2.0 * (a * cx + b * cy), -2.0 * (b * cx + c_ * cy),
            -2.0 * cz / sz ** 2,
            a * cx ** 2 + c_ * cy ** 2 + 2.0 * b * cx * cy + cz ** 2 / sz ** 2,
        ])                                               # (8, C)
        self._cand_quad_w = jnp.asarray(w, dtype=jnp.float32)
        # scan patch must cover the measured grid span + camera offset
        span_x = float(np.max(np.abs(cfg.terrain.measured_points_x))) + 0.15
        span_y = float(np.max(np.abs(cfg.terrain.measured_points_y))) + 0.15
        hs_ = cfg.terrain.horizontal_scale
        self._scan_patch_x = int(2 ** np.ceil(np.log2(2 * span_x / hs_ + 2)))
        self._scan_patch_y = int(2 ** np.ceil(np.log2(2 * span_y / hs_ + 2)))
        # gather-mode A/B knobs (SimCfg.granule_gather / layer_gather /
        # interleaved_gather — see SimCfg docstrings for the measured ladder)
        from functools import partial

        from ..terrain.heightfield import (GranuleSampler,
                                           extract_patches_batched_granule,
                                           extract_patches_batched_layer,
                                           precompute_granule_table)
        self._interleaved = (cfg.sim.interleaved_gather and cfg.sim.lane_engine
                             and cfg.sim.fused_sampling
                             and not cfg.sim.pallas_scan)
        if self._interleaved:
            sampler = GranuleSampler(self.terrain)
            hs0 = self.terrain.horizontal_scale
            self._extract_patches = (
                lambda terrain, env_tile, origin, base_xy, px=32, py=32:
                    sampler.extract(env_tile, origin, base_xy, px, py, hs0))
        elif cfg.sim.granule_gather and not cfg.sim.layer_gather:
            # default path: granule gather from a HOST-precomputed table
            # (byte-identical; skips the per-step pad/concat)
            tab, _ = precompute_granule_table(self.terrain)
            self._extract_patches = partial(extract_patches_batched_granule,
                                            table=tab)
        else:
            self._extract_patches = (
                (extract_patches_batched_layer if cfg.sim.layer_gather
                 else extract_patches_batched_granule)
                if cfg.sim.granule_gather else extract_patches_batched)

        # jitted entry points (host convenience API)
        self._step_jit = jax.jit(self.step_fn, donate_argnums=(0,))
        self._reset_jit = jax.jit(self.reset_fn, static_argnums=(1,))
        self._observe_jit = jax.jit(self.observe)
        self.state: EnvState | None = None

    @staticmethod
    def _select_waypoint(trajectories, idx):
        """trajectories (N, L, 6) indexed per env — as a one-hot contraction:
        per-element gathers of tiny rows are pathologically slow on TPU
        (~10 ms/step in device traces), the (N, L) one-hot einsum is free."""
        L = trajectories.shape[1]
        onehot = jax.nn.one_hot(idx, L, dtype=trajectories.dtype)
        return jnp.einsum("nl,nlk->nk", onehot, trajectories)

    # ------------------------------------------------------------------ rng
    @staticmethod
    def _fold(keys, tag: int):
        return jax.vmap(jax.random.fold_in, in_axes=(0, None))(keys, tag)

    # ------------------------------------------------------------ reset core
    def _sample_dof_props(self, keys, state_vals):
        """(Re-)roll motor DR (reference _randomize_dof_props, :744-764)."""
        dr = self.cfg.domain_rand
        ms, mo, kp, kd = state_vals
        N = ms.shape[0]

        def u_scalar(tag, lo, hi):
            s = jax.vmap(lambda k: jax.random.uniform(k, (), minval=lo, maxval=hi))(
                self._fold(keys, tag))
            return jnp.broadcast_to(s[:, None], (N, 12))

        if dr.randomize_motor_strength:
            ms = u_scalar(1, *dr.motor_strength_range)
        if dr.randomize_motor_offset:
            lo, hi = dr.motor_offset_range
            mo = jax.vmap(lambda k: jax.random.uniform(k, (12,), minval=lo, maxval=hi))(
                self._fold(keys, 2))
        if dr.randomize_Kp_factor:
            kp = u_scalar(3, *dr.Kp_factor_range)
        if dr.randomize_Kd_factor:
            kd = u_scalar(4, *dr.Kd_factor_range)
        return ms, mo, kp, kd

    def _sample_rigid_props(self, keys, state_vals):
        """(Re-)roll rigid-body DR (reference _randomize_rigid_body_props, :710-732)."""
        dr = self.cfg.domain_rand
        fric, rest, payload, com = state_vals
        N = fric.shape[0]

        def u(tag, shape, lo, hi):
            return jax.vmap(lambda k: jax.random.uniform(k, shape, minval=lo, maxval=hi))(
                self._fold(keys, tag))

        if dr.randomize_friction:
            fric = u(5, (), *dr.friction_range)
        if dr.randomize_restitution:
            rest = u(6, (), *dr.restitution_range)
        if dr.randomize_base_mass:
            payload = u(7, (), *dr.added_mass_range)
        if dr.randomize_com_displacement:
            com = u(8, (3,), *dr.com_displacement_range)
        return fric, rest, payload, com

    def _reset_values(self, keys, target_dist):
        """Fresh per-env states (reference _reset_dofs/_reset_root_states/
        _resample_trajectory, :998-1072,949-955)."""
        cfg = self.cfg
        N = keys.shape[0]
        # per-env independent draws (vmapped) for cross-sharding determinism
        qj = jax.vmap(lambda k: self.default_dof_pos * jax.random.uniform(
            k, (12,), minval=0.5, maxval=1.5))(self._fold(keys, 10))

        init_pos = jnp.asarray(cfg.init_state.pos)
        t = cfg.terrain
        off = jax.vmap(lambda k: jnp.array([
            jax.random.uniform(k, (), minval=-t.x_init_range, maxval=t.x_init_range) + t.x_init_offset,
            jax.random.uniform(jax.random.fold_in(k, 1), (), minval=-t.y_init_range, maxval=t.y_init_range) + t.y_init_offset,
            0.0]))(self._fold(keys, 11))
        base_pos = self.terrain.env_origin + init_pos + off
        if not self.terrain.is_plane:
            # spawn on TOP of the local floor (e.g. the 0.5 m plateau border
            # of the pyramid tunnels).  The reference spawns at absolute
            # z=0.34 intersecting the raised-floor trimesh and lets PhysX's
            # capped depenetration (max_depenetration_velocity=1.0,
            # config :368) pop the robot onto the surface; our penalty
            # contacts would instead launch it, so we add the floor height
            # analytically — same steady state, no impulse.
            tiles = self.terrain.tiles          # (n_tiles, 2, h, w)
            th, tw = tiles.shape[2], tiles.shape[3]
            rel = (base_pos[:, :2] - self.terrain.env_terrain_origin[:, :2]) \
                / self.terrain.horizontal_scale
            xp = jnp.clip(rel[:, 0].astype(jnp.int32), 0, th - 1)
            yp = jnp.clip(rel[:, 1].astype(jnp.int32), 0, tw - 1)
            flat_floor = tiles[:, 1].reshape(-1)
            floor_h = flat_floor[self.terrain.env_tile * (th * tw) + xp * tw + yp]
            base_pos = base_pos.at[:, 2].add(floor_h)

        yaw = jax.vmap(lambda k: jax.random.uniform(
            k, (), minval=-t.yaw_init_range, maxval=t.yaw_init_range))(self._fold(keys, 12))
        base_quat = qt.quat_from_angle_axis(yaw, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (N, 3)))

        v6 = jax.vmap(lambda k: jax.random.uniform(k, (6,), minval=-0.5, maxval=0.5))(
            self._fold(keys, 13))
        v = jnp.concatenate([v6, jnp.zeros((N, 12))], axis=-1)
        phys = PhysState(base_pos=base_pos, base_quat=base_quat, qj=qj, v=v)

        # rehearsal mixing (cl_dist_mix, config.py): a LEADING slice of train
        # envs samples its goal distance uniformly in [cl_start, target_dist]
        # — the curriculum gate reads the complementary frontier slice only
        ct = cfg.curriculum_thresholds
        dist_i = jnp.broadcast_to(jnp.asarray(target_dist, jnp.float32), (N,))
        if ct.cl_fix_target and ct.cl_dist_mix > 0.0:
            n_train = N - int(getattr(cfg.env, "num_eval_envs", 0))
            n_mix = int(round(ct.cl_dist_mix * n_train))
            u = jax.vmap(lambda k: jax.random.uniform(k, ()))(self._fold(keys, 15))
            mixed = ct.cl_start_target_dist + u * jnp.maximum(
                dist_i - ct.cl_start_target_dist, 0.0)
            dist_i = jnp.where(jnp.arange(N) < n_mix, mixed, dist_i)
        traj = jax.vmap(
            lambda k, bp, tile, to, d: self._traj_fn(k, bp, cfg, self.terrain, tile, to, d)
        )(self._fold(keys, 14), base_pos, self.terrain.env_tile,
          self.terrain.env_terrain_origin, dist_i)

        act = jax.vmap(lambda _: actuators.init_actuator_state(cfg.domain_rand.lag_timesteps))(
            jnp.zeros(N))
        return phys, act, traj

    def reset_fn(self, key, randomize_ep_len: bool = False) -> EnvState:
        """Full reset of all envs (host-level; auto-resets happen inside step)."""
        cfg = self.cfg
        N = self.num_envs
        gkey, ekey, lkey = jax.random.split(key, 3)
        keys = jax.random.split(ekey, N)

        fric = jnp.full((N,), cfg.terrain.static_friction)
        rest = jnp.full((N,), cfg.domain_rand.restitution)
        payload = jnp.zeros(N)
        com = jnp.zeros((N, 3))
        fric, rest, payload, com = self._sample_rigid_props(keys, (fric, rest, payload, com))
        ms, mo, kp, kd = self._sample_dof_props(
            keys, (jnp.ones((N, 12)), jnp.zeros((N, 12)), jnp.ones((N, 12)), jnp.ones((N, 12))))

        target_dist = jnp.asarray(
            cfg.curriculum_thresholds.cl_start_target_dist
            if cfg.curriculum_thresholds.cl_fix_target else cfg.commands.x_mean,
            dtype=jnp.float32)
        phys, act, traj = self._reset_values(keys, target_dist)

        ep_len = (jax.random.randint(lkey, (N,), 0, int(cfg.env.max_episode_length))
                  if randomize_ep_len else jnp.zeros(N, dtype=jnp.int32)).astype(jnp.int32)

        K = len(self.metric_names)
        C = 2 if cfg.env.command_type in ("xy", "xy_norm") else 6

        def z3():
            # fresh buffer per field — a shared zeros array would alias leaves
            # and break XLA buffer donation of the state
            return jnp.zeros((N, 3))
        state = EnvState(
            phys=phys, act=act,
            friction=fric, restitution=rest, payload=payload, com_displacement=com,
            motor_strength=ms, motor_offset=mo, kp_factor=kp, kd_factor=kd,
            gravity_vec=jnp.asarray(cfg.sim.gravity),
            episode_length=ep_len, common_step=jnp.zeros((), jnp.int32),
            trajectories=traj, curr_pose_index=jnp.zeros(N, jnp.int32),
            reached=jnp.zeros(N, bool), plan_buf=jnp.ones(N, bool),
            replan=jnp.zeros(N, bool), plan_length=jnp.zeros(N, jnp.int32),
            local_target_poses=traj[:, 0, :], collision_count=jnp.zeros(N, jnp.int32),
            commands=jnp.zeros((N, C)),
            relative_linear=z3(), relative_rotation=z3(),
            local_relative_linear=z3(), local_relative_rotation=z3(),
            actions=jnp.zeros((N, 12)), last_actions=jnp.zeros((N, 12)),
            last_last_actions=jnp.zeros((N, 12)), last_dof_vel=jnp.zeros((N, 12)),
            last_joint_pos_target=jnp.zeros((N, 12)),
            last_last_joint_pos_target=jnp.zeros((N, 12)),
            feet_air_time=jnp.zeros((N, 4)), last_contacts=jnp.zeros((N, 4), bool),
            contact_forces=jnp.zeros((N, self.model.num_report_bodies, 3)),
            torques=jnp.zeros((N, 12)),
            # bf16: every consumer is a bf16 MXU matmul (XLA already stores
            # the rollout buffer in bf16 for the same reason); f32 state
            # maintenance of the (N, H*obs) concat/copies cost ~8 ms/iter
            # at 4096 envs in device traces
            obs_history=jnp.zeros((N, self.num_obs_history), jnp.bfloat16),
            exploration_lin_scale=jnp.asarray(
                self.reward_scales[self._exp_lin_idx] if self._exp_lin_idx >= 0 else 0.0),
            exploration_yaw_scale=jnp.asarray(
                self.reward_scales[self._exp_yaw_idx] if self._exp_yaw_idx >= 0 else 0.0),
            target_dist=target_dist,
            episode_sums=jnp.zeros((N, K)),
            rng=self._fold(keys, 999), global_rng=gkey,
        )
        if cfg.commands.sampling_based_planning:
            rpy = qt.quaternion_to_roll_pitch_yaw(phys.base_quat)
            state = state._replace(
                measured_heights=self._get_heights(phys.base_pos, rpy))
        return state

    # ------------------------------------------------------------ step core
    def _get_heights(self, base_pos, base_rpy):
        """Two-layer height scan (reference _get_heights, :1918-1965): the
        scan grid is axis-aligned around the base (the yaw rotation at :1938
        is discarded at :1940), shifted by the camera offset under camera_zero."""
        cfg = self.cfg
        N = base_pos.shape[0]
        nx, ny = self.height_grid_shape
        if self.terrain.is_plane:
            top = jnp.ones((N, nx, ny))
            bottom = jnp.zeros((N, nx, ny))
            return jnp.stack([top, bottom], axis=1)
        pts = self.height_points[None, :, :] + base_pos[:, None, :2]
        if cfg.env.camera_zero:
            cam_xy = jnp.stack([0.12 * jnp.cos(base_rpy[:, 1]), jnp.zeros(N)], axis=-1)
            pts = pts + cam_xy[:, None, :]
        # robot-local patch + one-hot contraction (see terrain/heightfield.py;
        # scalar gathers here cost ~17 ms/step at 4096 envs)
        th, tw = self.terrain.tiles.shape[2], self.terrain.tiles.shape[3]
        hs = self.terrain.horizontal_scale

        if cfg.sim.pallas_scan:
            # fused Pallas path: no patch — per-env tile DMA + in-kernel
            # one-hot sampling (terrain/pallas_scan.py). frames carries
            # base/cam/origin separately so the kernel reproduces this
            # function's exact f32 op order (bitwise-equal cells).
            from ..terrain.pallas_scan import scan_heights_pallas
            cam = (cam_xy if cfg.env.camera_zero
                   else jnp.zeros((N, 2), jnp.float32))
            frames = jnp.stack(
                [base_pos[:, :2], cam,
                 self.terrain.env_terrain_origin[:, :2]], axis=1)
            h = scan_heights_pallas(self.terrain.tiles, self.terrain.env_tile,
                                    frames, self.height_points, hs,
                                    interpret=jax.default_backend() == "cpu")
            return h.reshape(N, 2, nx, ny)

        patch, xs, ys = self._extract_patches(
            self.terrain, self.terrain.env_tile, self.terrain.env_terrain_origin,
            base_pos[:, :2], self._scan_patch_x, self._scan_patch_y)
        if cfg.sim.fused_sampling:
            from ..terrain.heightfield import (sample_patch_nearest_fused,
                                               transpose_patch)
            # interleaved extraction already emits the fused (N, PX, 2*py)
            # layout; the legacy paths need the one-time relayout
            pz = patch if patch.ndim == 3 else transpose_patch(patch)
            h = jax.vmap(sample_patch_nearest_fused,
                         in_axes=(0, 0, 0, None, None, None, 0, 0))(
                pz, xs, ys, hs, th, tw,
                self.terrain.env_terrain_origin, pts)
        else:
            h = jax.vmap(sample_patch_nearest,
                         in_axes=(0, 0, 0, None, None, None, 0, 0))(
                patch, xs, ys, hs, th, tw, self.terrain.env_terrain_origin, pts)
        h = jnp.moveaxis(h, -1, 1).reshape(N, 2, nx, ny)
        return h

    def _relative_pose(self, target, base_pos, base_quat, base_rpy):
        """(reference _compute_relative_target_pose, :922-932)."""
        rel_lin = qt.quat_apply_yaw_inverse(base_quat, target[:, :3] - base_pos)
        rel_rot = qt.wrap_to_pi(target[:, 3:] - base_rpy)
        return rel_lin, rel_rot

    def _commands(self, target, rel_lin, rel_rot):
        cfg = self.cfg
        if cfg.env.command_type == "xy":
            return rel_lin[:, :2]
        if cfg.env.command_type == "xy_norm":
            n = jnp.linalg.norm(rel_lin[:, :2], axis=-1, keepdims=True)
            return jnp.where(n > 1.0, rel_lin[:, :2] / n, rel_lin[:, :2])
        if cfg.env.command_type == "6dof":
            return jnp.concatenate([rel_lin[:, :2], target[:, 2:5], rel_rot[:, 2:]], axis=-1)
        raise ValueError(cfg.env.command_type)

    def _plan_local_targets(self, state, target, rel_lin, base_pos, base_quat,
                            base_rpy, measured_heights, ep_len):
        """Batched sampling-based local planner (reference _plan_target_pose,
        :850-920 — a per-env python loop there; a masked argmin here)."""
        cfg = self.cfg
        plan_length = state.plan_length + 1
        close = jnp.linalg.norm(rel_lin[:, :2], axis=1) < 1.0
        ep_start = ep_len == 1
        if cfg.commands.plan_interval > 0:
            replan = (plan_length % cfg.commands.plan_interval) == 0
            do_plan = ep_start | (replan & state.plan_buf)
        else:
            replan = jnp.ones_like(ep_start)
            do_plan = ep_start | state.plan_buf
        plan_length = jnp.where(do_plan, 0, plan_length)

        cands = self._candidate_poses                       # (C, 6)
        C = cands.shape[0]
        goal_xy = target[:, :2] - base_pos[:, :2]           # (N, 2)
        sort_metric = (jnp.linalg.norm(cands[None, :, :2] - goal_xy[:, None, :], axis=-1)
                       + jnp.linalg.norm(cands[None, :, 3:], axis=-1) * 0.1)  # (N, C)

        # collision: all scan points outside the candidate's robot ellipsoid
        pts = jnp.concatenate([
            jnp.broadcast_to(self.height_points[None, :, :],
                             (base_pos.shape[0],) + self.height_points.shape),
            measured_heights[:, 0].reshape(base_pos.shape[0], -1, 1)], axis=-1)
        pts2 = pts.at[..., 2].set(measured_heights[:, 1].reshape(base_pos.shape[0], -1))
        pts = jnp.concatenate([pts, pts2], axis=1)          # (N, 2P, 3)

        if cfg.commands.planner_quadform:
            # |Rz(-yaw_c)(p - c)/s|^2 = f(p)·w_c with host-precomputed w_c
            # (CommandsCfg.planner_quadform) — one f32 matmul per chunk
            x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
            F = jnp.stack([x * x, y * y, z * z, x * y,
                           x, y, z, jnp.ones_like(x)], axis=-1)  # (N, 2P, 8)
            W = self._cand_quad_w                                # (8, C)

            def chunk_valid(carry, idx):
                wc = jax.lax.dynamic_slice_in_dim(W, idx, self._plan_chunk, 1)
                with jax.default_matmul_precision("float32"):
                    q = jnp.einsum("npf,fc->npc", F, wc)         # (N, 2P, c)
                return carry, jnp.all(q > 1.0, axis=1)           # (N, c)
        else:
            cand_quat = qt.quat_from_euler_xyz(
                cands[:, 3], cands[:, 4], cands[:, 5])           # (C, 4)

            def chunk_valid(carry, idx):
                cq = jax.lax.dynamic_slice_in_dim(cand_quat, idx,
                                                  self._plan_chunk, 0)
                cl = jax.lax.dynamic_slice_in_dim(cands, idx,
                                                  self._plan_chunk, 0)
                d = pts[:, None, :, :] - cl[None, :, None, :3]   # (N, c, 2P, 3)
                d = qt.quat_apply_yaw_inverse(cq[None, :, None, :], d)
                out = jnp.linalg.norm(d / self._robot_size, axis=-1) > 1.0
                return carry, jnp.all(out, axis=-1)              # (N, c)

        starts = jnp.arange(0, C, self._plan_chunk)
        _, valid = jax.lax.scan(chunk_valid, None, starts)
        valid = jnp.moveaxis(valid, 0, 1).reshape(base_pos.shape[0], C)

        best = jnp.argmin(sort_metric + _BIG * (~valid), axis=-1)    # (N,)
        any_valid = jnp.any(valid, axis=-1)
        chosen = cands[best]                                         # (N, 6)
        # to world frame (:904-906)
        world_xy = qt.quat_apply_yaw(base_quat, chosen[:, :3])[:, :2] + base_pos[:, :2]
        world_rot = qt.wrap_to_pi(chosen[:, 3:] + base_rpy)
        planned = jnp.concatenate([world_xy, chosen[:, 2:3], world_rot], axis=-1)
        planned = jnp.where((any_valid & ~close)[:, None], planned, target)
        local = jnp.where(do_plan[:, None], planned, state.local_target_poses)
        return local, plan_length, replan

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

        # ---- physics: decimated control step (reference step, :64-98) ----
        params = PhysParams(
            friction=state.friction, restitution=state.restitution,
            gravity=jnp.broadcast_to(state.gravity_vec, (N, 3)),
            payload=state.payload, com_offset=state.com_displacement)
        carry0 = (state.act, state.motor_strength, state.motor_offset,
                  state.kp_factor, state.kd_factor, actions_scaled)

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
        contact_forces = aux.contact_report                       # (N, 17, 3)
        raw_contact_forces = contact_forces
        if cfg.sim.contact_report_ema > 0.0:
            # smooth the reported force texture only (SimCfg.contact_report_ema)
            b = cfg.sim.contact_report_ema
            contact_forces = (1.0 - b) * contact_forces + b * state.contact_forces

        # ---- post-physics derivations (:126-136) ----
        ep_len = state.episode_length + 1
        common = state.common_step + 1
        base_pos, base_quat = phys.base_pos, phys.base_quat
        base_lin_vel = qt.quat_rotate_inverse(base_quat, phys.v[:, :3])
        base_ang_vel = qt.quat_rotate_inverse(base_quat, phys.v[:, 3:6])
        g_unit = state.gravity_vec / jnp.linalg.norm(state.gravity_vec)
        projected_gravity = qt.quat_rotate_inverse(base_quat, jnp.broadcast_to(g_unit, (N, 3)))
        base_rpy = qt.quaternion_to_roll_pitch_yaw(base_quat)

        # ---- callback (:774-848) ----
        # the planner reads the height scan stored by the previous step (at
        # this step's PRE-physics base pose: <0.06 m stale, exact for fresh
        # resets — see EnvState.measured_heights) so each step pays ONE scan
        # (mh_o below) where the reference pays two (:789 and :357);
        # planner_rescan restores the double scan for the A/B only
        if cfg.commands.sampling_based_planning:
            measured_heights = (self._get_heights(base_pos, base_rpy)
                                if cfg.commands.planner_rescan
                                else state.measured_heights)
        idx = state.curr_pose_index
        target = self._select_waypoint(state.trajectories, idx)
        rel_lin, rel_rot = self._relative_pose(target, base_pos, base_quat, base_rpy)

        if cfg.commands.sampling_based_planning:
            local_target, plan_length, replan = self._plan_local_targets(
                state, target, rel_lin, base_pos, base_quat, base_rpy,
                measured_heights, ep_len)
            local_rel_lin, local_rel_rot = self._relative_pose(
                local_target, base_pos, base_quat, base_rpy)
        else:
            local_target, plan_length, replan = target, state.plan_length, state.replan
            local_rel_lin, local_rel_rot = rel_lin, rel_rot
        commands = self._commands(local_target, local_rel_lin, local_rel_rot)

        # push robots (:1074-1084) — affects the next physics step only
        if dr.push_robots:
            push_mask = (ep_len % int(dr.push_interval)) == 0
            v_push = jax.vmap(lambda k: jax.random.uniform(
                k, (2,), minval=-dr.max_push_vel_xy, maxval=dr.max_push_vel_xy))(
                self._fold(kstep, 20))
            v_new = phys.v.at[:, :2].set(jnp.where(push_mask[:, None], v_push, phys.v[:, :2]))
            phys = phys._replace(v=v_new)

        # interval DR re-rolls (:821-833)
        ms, mo, kp, kd = state.motor_strength, state.motor_offset, state.kp_factor, state.kd_factor
        fric, rest, payload, com = state.friction, state.restitution, state.payload, state.com_displacement
        dr_mask = (ep_len % int(dr.rand_interval)) == 0
        nms, nmo, nkp, nkd = self._sample_dof_props(self._fold(kstep, 21), (ms, mo, kp, kd))
        ms = jnp.where(dr_mask[:, None], nms, ms)
        mo = jnp.where(dr_mask[:, None], nmo, mo)
        kp = jnp.where(dr_mask[:, None], nkp, kp)
        kd = jnp.where(dr_mask[:, None], nkd, kd)
        if dr.randomize_rigids_after_start:
            nfr, nre, npl, nco = self._sample_rigid_props(self._fold(kstep, 22),
                                                          (fric, rest, payload, com))
            fric = jnp.where(dr_mask, nfr, fric)
            rest = jnp.where(dr_mask, nre, rest)
            payload = jnp.where(dr_mask, npl, payload)
            com = jnp.where(dr_mask[:, None], nco, com)

        # gravity impulse DR (:826-830, _randomize_gravity :645-660)
        gravity_vec = state.gravity_vec
        if dr.randomize_gravity:
            lo, hi = dr.gravity_range
            newg = jax.random.uniform(gk, (3,), minval=lo, maxval=hi) + jnp.array([0.0, 0.0, -9.8])
            reroll = (common % int(dr.gravity_rand_interval)) == 0
            gravity_vec = jnp.where(reroll, newg, gravity_vec)
            zero_evt = ((common - int(dr.gravity_rand_duration))
                        % int(dr.gravity_rand_interval)) == 0
            gravity_vec = jnp.where(zero_evt, jnp.array([0.0, 0.0, -9.8]), gravity_vec)

        # waypoint switching (:836-848)
        if cfg.commands.switch_upon_reach:
            switched = jnp.linalg.norm(rel_lin[:, :2], axis=1) < cfg.commands.switch_dist
        else:
            switched = (ep_len % max(int(cfg.commands.switch_interval), 1)) == 0
        idx2 = jnp.clip(idx + switched.astype(jnp.int32), 0, cfg.commands.traj_length - 1)
        reached = switched & (idx2 == cfg.commands.traj_length - 1)
        plan_buf = ((jnp.linalg.norm(local_rel_lin[:, :2], axis=1) < cfg.commands.switch_dist)
                    & (jnp.abs(local_rel_rot[:, 2]) < cfg.commands.switch_yaw))
        pen_f = contact_forces[:, list(self.penalised_slots), :]
        collision_count = state.collision_count + jnp.sum(
            jnp.linalg.norm(pen_f, axis=-1) > 0.1, axis=-1).astype(jnp.int32)

        # feet air time bookkeeping (trajectory_tracking_reward.py:115-126)
        contact = contact_forces[:, list(self.feet_slots), 2] > 1.0
        contact_filt = contact | state.last_contacts
        first_contact = (state.feet_air_time > 0.0) & contact_filt
        feet_air_time = state.feet_air_time + self.dt
        feet_air_time_post = feet_air_time * ~contact_filt

        # ---- termination (:198-216) ----
        term_contact = jnp.any(jnp.linalg.norm(
            contact_forces[:, list(self.termination_slots), :], axis=-1) > 1.0, axis=-1) \
            if self.termination_slots else jnp.zeros(N, bool)
        time_out = ep_len > int(cfg.env.max_episode_length)
        done = term_contact | time_out
        if cfg.rewards.use_terminal_body_height:
            done = done | (base_pos[:, 2] < cfg.rewards.terminal_body_height)
        if cfg.env.terminate_end_of_trajectory:
            done = done | (reached & (ep_len > cfg.rewards.T_reach))
        if cfg.env.use_terminal_body_rotation:
            done = done | (projected_gravity[:, 2] > 0.0)

        # ---- rewards (:320-355) ----
        ctx = RewardCtx(
            dt=self.dt, max_episode_length=float(cfg.env.max_episode_length),
            base_pos=base_pos, base_lin_vel=base_lin_vel, base_ang_vel=base_ang_vel,
            projected_gravity=projected_gravity, dof_pos=phys.qj, dof_vel=phys.v[:, 6:],
            last_dof_vel=state.last_dof_vel, default_dof_pos=self.default_dof_pos,
            dof_pos_soft_limits=self.dof_pos_soft_limits, torques=torques,
            actions=actions, last_actions=state.last_actions,
            contact_forces=contact_forces, penalised_slots=self.penalised_slots,
            feet_slots=self.feet_slots, relative_linear=rel_lin,
            relative_rotation=rel_rot, local_relative_linear=local_rel_lin,
            reached_buf=reached, plan_buf=plan_buf, replan=replan,
            episode_length_buf=ep_len, reset_buf=done,
            feet_air_time=feet_air_time, feet_first_contact=first_contact)
        terms = jnp.stack([fn(ctx, cfg) for fn in self.reward_fns], axis=-1)  # (N, K)
        scale_vec = jnp.asarray(self.reward_scales)
        if self._exp_lin_idx >= 0:
            scale_vec = scale_vec.at[self._exp_lin_idx].set(state.exploration_lin_scale)
        if self._exp_yaw_idx >= 0:
            scale_vec = scale_vec.at[self._exp_yaw_idx].set(state.exploration_yaw_scale)
        rews = terms * scale_vec
        # batch-sign split (reference compute_reward, :328-335)
        term_sign = jnp.sum(rews, axis=0) >= 0.0
        rew_pos = jnp.sum(rews * term_sign, axis=-1)
        rew_neg = jnp.sum(rews * (~term_sign), axis=-1)
        rew = jnp.sum(rews, axis=-1)
        if cfg.rewards.only_positive_rewards:
            rew = jnp.clip(rew, 0.0, None)
        elif cfg.rewards.only_positive_rewards_ji22_style:
            rew = rew_pos * jnp.exp(rew_neg / cfg.rewards.sigma_rew_neg)
        # termination reward after clipping; "total" excludes it (:348-353)
        term_cols = []
        if self.termination_scale:
            term_rew = self.termination_scale * (done & ~time_out).astype(jnp.float32)
            term_cols = [term_rew[:, None]]
        episode_sums = state.episode_sums + jnp.concatenate(
            [rews] + term_cols + [rew[:, None], rew_pos[:, None], rew_neg[:, None]],
            axis=-1)
        if self.termination_scale:
            rew = rew + term_rew

        # exploration-scale decay (update_curriculum, :171-183)
        exp_lin, exp_yaw = state.exploration_lin_scale, state.exploration_yaw_scale
        if np.isfinite(cfg.rewards.exploration_steps):
            # reference decrement: raw_scale * dt / exploration_steps per step
            # (update_curriculum :174); self.reward_scales is already raw*dt,
            # so the live scale decays to zero over exploration_steps steps
            decay_on = common > cfg.rewards.exploration_steps
            if self._exp_lin_idx >= 0:
                d = self.reward_scales[self._exp_lin_idx] / cfg.rewards.exploration_steps
                exp_lin = jnp.clip(exp_lin - d * decay_on, 0.0, None)
            if self._exp_yaw_idx >= 0:
                d = self.reward_scales[self._exp_yaw_idx] / cfg.rewards.exploration_steps
                exp_yaw = jnp.clip(exp_yaw - d * decay_on, 0.0, None)

        # ---- episodic metrics snapshot before reset zeroing ----
        info = {
            "time_outs": time_out & done,
            "done": done,
            "episode_sums": episode_sums,
            "episode_length": ep_len,
            "reached": reached,
            "goal_distance": jnp.linalg.norm(rel_lin, axis=1),
        }

        # ---- auto-reset (reset_idx, :218-296) ----
        rphys, ract, rtraj = self._reset_values(self._fold(kstep, 23), state.target_dist)
        rms, rmo, rkp, rkd = self._sample_dof_props(self._fold(kstep, 24), (ms, mo, kp, kd))
        d1, d2 = done[:, None], done[:, None, None]

        def sel(new, old, mask):
            return jnp.where(mask.reshape(mask.shape + (1,) * (new.ndim - 1)), new, old)

        phys = jax.tree.map(lambda a, b: sel(a, b, done), rphys, phys)
        act_state = jax.tree.map(lambda a, b: sel(a, b, done), ract, act_state)
        trajectories = jnp.where(d2, rtraj, state.trajectories)
        ms = jnp.where(d1, rms, ms)
        mo = jnp.where(d1, rmo, mo)
        kp = jnp.where(d1, rkp, kp)
        kd = jnp.where(d1, rkd, kd)
        if dr.randomize_rigids_after_start:
            rfr, rre, rpl, rco = self._sample_rigid_props(self._fold(kstep, 25),
                                                          (fric, rest, payload, com))
            fric = jnp.where(done, rfr, fric)
            rest = jnp.where(done, rre, rest)
            payload = jnp.where(done, rpl, payload)
            com = jnp.where(d1, rco, com)

        idx2 = jnp.where(done, 0, idx2)
        ep_len_post = jnp.where(done, 0, ep_len)
        episode_sums = jnp.where(d1, 0.0, episode_sums)
        feet_air_time_post = jnp.where(d1, 0.0, feet_air_time_post)
        last_contacts = jnp.where(d1, False, contact)
        collision_count = jnp.where(done, 0, collision_count)
        plan_buf = jnp.where(done, True, plan_buf)
        local_rel_lin = jnp.where(d1, 0.0, local_rel_lin)
        local_rel_rot = jnp.where(d1, 0.0, local_rel_rot)

        # ---- observations from the post-reset state (:357-469) ----
        base_pos_o, base_quat_o = phys.base_pos, phys.base_quat
        base_rpy_o = qt.quaternion_to_roll_pitch_yaw(base_quat_o)
        base_lin_vel_o = qt.quat_rotate_inverse(base_quat_o, phys.v[:, :3])
        base_ang_vel_o = qt.quat_rotate_inverse(base_quat_o, phys.v[:, 3:6])
        proj_grav_o = qt.quat_rotate_inverse(
            base_quat_o, jnp.broadcast_to(gravity_vec / jnp.linalg.norm(gravity_vec), (N, 3)))
        target_o = self._select_waypoint(trajectories, idx2)
        rel_lin_o, rel_rot_o = self._relative_pose(target_o, base_pos_o, base_quat_o, base_rpy_o)
        commands_o = jnp.where(d1, self._commands(target_o, rel_lin_o, rel_rot_o), commands)
        local_target = jnp.where(d1, target_o, local_target)
        mh_o = self._get_heights(base_pos_o, base_rpy_o)

        heights = obs_lib.height_obs(cfg, mh_o, base_pos_o[:, 2], base_rpy_o[:, 1])
        scalars = obs_lib.scalar_obs(
            cfg, projected_gravity=proj_grav_o, commands=commands_o,
            dof_pos=phys.qj, default_dof_pos=self.default_dof_pos,
            dof_vel=phys.v[:, 6:], actions=actions, last_actions=state.last_actions,
            episode_length=ep_len_post, base_lin_vel=base_lin_vel_o,
            base_ang_vel=base_ang_vel_o, base_quat=base_quat_o,
            foot_contact_z=contact_forces[:, list(self.feet_slots), 2])
        obs = obs_lib.assemble_obs(
            cfg, scalars, heights, base_lin_vel=base_lin_vel_o,
            base_ang_vel=base_ang_vel_o, base_quat=base_quat_o,
            last_actions=state.last_actions,
            foot_contact_z=contact_forces[:, list(self.feet_slots), 2])
        if cfg.noise.add_noise:
            noise = jax.vmap(lambda k: jax.random.uniform(
                k, (self.num_obs,), minval=-1.0, maxval=1.0))(self._fold(kstep, 26))
            obs = obs + noise * self.noise_vec
        obs = jnp.clip(obs, -cfg.normalization.clip_observations,
                       cfg.normalization.clip_observations)

        priv = obs_lib.privileged_obs(
            cfg, friction=fric, restitution=rest, payload=payload,
            com_displacement=com, motor_strength=ms, motor_offset=mo,
            kp_factor=kp, kd_factor=kd, base_z=base_pos_o[:, 2],
            base_lin_vel=base_lin_vel_o, gravity_vec=gravity_vec)
        priv = jnp.clip(priv, -cfg.normalization.clip_observations,
                        cfg.normalization.clip_observations)

        obs_history = jnp.concatenate(
            [state.obs_history[:, self.num_obs:],
             obs.astype(state.obs_history.dtype)], axis=-1)

        # ---- action memory updates (:148-153; reset zeroing :246-248) ----
        new_state = EnvState(
            phys=phys, act=act_state,
            friction=fric, restitution=rest, payload=payload, com_displacement=com,
            motor_strength=ms, motor_offset=mo, kp_factor=kp, kd_factor=kd,
            gravity_vec=gravity_vec,
            episode_length=ep_len_post, common_step=common,
            trajectories=trajectories, curr_pose_index=idx2,
            reached=reached, plan_buf=plan_buf, replan=replan, plan_length=plan_length,
            local_target_poses=local_target, collision_count=collision_count,
            commands=commands_o,
            relative_linear=rel_lin_o, relative_rotation=rel_rot_o,
            local_relative_linear=local_rel_lin, local_relative_rotation=local_rel_rot,
            actions=actions,
            last_actions=jnp.where(d1, 0.0, actions),
            last_last_actions=jnp.where(d1, 0.0, state.last_actions),
            last_dof_vel=phys.v[:, 6:],
            last_joint_pos_target=act_state.joint_pos_target,
            last_last_joint_pos_target=jnp.where(d1, 0.0, state.last_joint_pos_target),
            feet_air_time=feet_air_time_post, last_contacts=last_contacts,
            # the stored EMA restarts from the raw report across episode
            # boundaries so a terminal-step force never bleeds into the
            # fresh episode's smoothed report (ADVICE r4; no-op at the
            # default contact_report_ema=0)
            contact_forces=(jnp.where(d2, raw_contact_forces, contact_forces)
                            if cfg.sim.contact_report_ema > 0.0
                            else contact_forces),
            torques=torques,
            obs_history=obs_history,
            exploration_lin_scale=exp_lin, exploration_yaw_scale=exp_yaw,
            target_dist=state.target_dist,
            episode_sums=episode_sums,
            rng=rng_next, global_rng=g_next,
            measured_heights=(mh_o if cfg.commands.sampling_based_planning
                              else None),
        )
        return new_state, StepOut(obs=obs, privileged_obs=priv, obs_history=obs_history,
                                  rew=rew, done=done, info=info)

    # --------------------------------------------------------- host wrappers
    def reset(self, seed: int | None = None, randomize_ep_len: bool = True):
        key = jax.random.key(self.cfg.seed if seed is None else seed)
        self.state = self._reset_jit(key, randomize_ep_len)
        return self._observe_jit(self.state)

    def observe(self, state: EnvState):
        """Assemble {obs, privileged_obs, obs_history} from a state without
        stepping (reference get_observations / HistoryWrapper.reset)."""
        cfg = self.cfg
        N = self.num_envs
        phys = state.phys
        base_rpy = qt.quaternion_to_roll_pitch_yaw(phys.base_quat)
        g_unit = state.gravity_vec / jnp.linalg.norm(state.gravity_vec)
        proj_grav = qt.quat_rotate_inverse(phys.base_quat, jnp.broadcast_to(g_unit, (N, 3)))
        blv = qt.quat_rotate_inverse(phys.base_quat, phys.v[:, :3])
        bav = qt.quat_rotate_inverse(phys.base_quat, phys.v[:, 3:6])
        target = self._select_waypoint(state.trajectories, state.curr_pose_index)
        rel_lin, rel_rot = self._relative_pose(target, phys.base_pos, phys.base_quat, base_rpy)
        commands = self._commands(target, rel_lin, rel_rot)
        mh = self._get_heights(phys.base_pos, base_rpy)
        heights = obs_lib.height_obs(cfg, mh, phys.base_pos[:, 2], base_rpy[:, 1])
        foot_z = state.contact_forces[:, list(self.feet_slots), 2]
        scalars = obs_lib.scalar_obs(
            cfg, projected_gravity=proj_grav, commands=commands, dof_pos=phys.qj,
            default_dof_pos=self.default_dof_pos, dof_vel=phys.v[:, 6:],
            actions=state.actions, last_actions=state.last_actions,
            episode_length=state.episode_length, base_lin_vel=blv, base_ang_vel=bav,
            base_quat=phys.base_quat, foot_contact_z=foot_z)
        obs = obs_lib.assemble_obs(cfg, scalars, heights, base_lin_vel=blv,
                                   base_ang_vel=bav, base_quat=phys.base_quat,
                                   last_actions=state.last_actions, foot_contact_z=foot_z)
        obs = jnp.clip(obs, -cfg.normalization.clip_observations,
                       cfg.normalization.clip_observations)
        priv = obs_lib.privileged_obs(
            cfg, friction=state.friction, restitution=state.restitution,
            payload=state.payload, com_displacement=state.com_displacement,
            motor_strength=state.motor_strength, motor_offset=state.motor_offset,
            kp_factor=state.kp_factor, kd_factor=state.kd_factor,
            base_z=phys.base_pos[:, 2], base_lin_vel=blv, gravity_vec=state.gravity_vec)
        obs_history = jnp.concatenate(
            [state.obs_history[:, self.num_obs:],
             obs.astype(state.obs_history.dtype)], axis=-1)
        return {"obs": obs, "privileged_obs": priv, "obs_history": obs_history}

    def step(self, actions):
        """Stateful gym-style step (reference TrajectoryTrackingEnv.step,
        go1_gym/envs/go1/trajectory_tracking/__init__.py:22-44)."""
        self.state, out = self._step_jit(self.state, actions)
        obs_dict = {"obs": out.obs, "privileged_obs": out.privileged_obs,
                    "obs_history": out.obs_history}
        return obs_dict, out.rew, out.done, out.info


TrajectoryTrackingEnv = LeggedEnv
