"""Equivalence of the lane-major (env-minor) physics path (physics/lanes.py,
engine.control_step_lanes) with the vmapped single-env path on random states.

The lane path reorders float reductions, so tolerances are float32
reassociation-level, not bitwise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legged_tracking_tpu.actuation import actuators
from legged_tracking_tpu.physics import contact, engine, kinematics, lanes, sparse
from legged_tracking_tpu.physics.model import make_go1_model
from legged_tracking_tpu.terrain.heightfield import (TerrainArrays,
                                                     extract_patches_batched,
                                                     plane_terrain)
from legged_tracking_tpu.utils import quat as qt

MODEL = make_go1_model()
DEFAULT_Q = jnp.array([-0.1, 0.8, -1.5, 0.1, 0.8, -1.5,
                       -0.1, 1.0, -1.5, 0.1, 1.0, -1.5])
E = 5


def random_batch(key, scale_v=1.0):
    """Env-major random states (E, ...)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bp = jax.random.uniform(k1, (E, 3), minval=-1.0, maxval=1.0) \
        + jnp.array([0.0, 0.0, 0.4])
    ang = jax.random.uniform(k2, (E, 3), minval=-0.6, maxval=0.6)
    bq = jax.vmap(qt.quat_from_euler_xyz)(ang[:, 0], ang[:, 1], ang[:, 2])
    qj = jax.random.uniform(k3, (E, 12), minval=-1.2, maxval=1.2)
    v = jax.random.uniform(k4, (E, 18), minval=-scale_v, maxval=scale_v)
    return bp, bq, qj, v


def test_fk_matches_vmap():
    bp, bq, qj, _ = random_batch(jax.random.key(0))
    off = 0.01 * jnp.arange(E * 3, dtype=jnp.float32).reshape(E, 3)
    f_em = jax.vmap(kinematics.fk, in_axes=(None, 0, 0, 0, 0))(
        MODEL, bp, bq, qj, off)
    f_lm = lanes.fk(MODEL, bp.T, bq.T, qj.T, off.T)
    np.testing.assert_allclose(np.moveaxis(np.asarray(f_lm.R), -1, 0),
                               np.asarray(f_em.R), atol=1e-6)
    np.testing.assert_allclose(np.moveaxis(np.asarray(f_lm.p), -1, 0),
                               np.asarray(f_em.p), atol=1e-6)
    np.testing.assert_allclose(np.moveaxis(np.asarray(f_lm.com_w), -1, 0),
                               np.asarray(f_em.com_w), atol=1e-6)
    np.testing.assert_allclose(np.moveaxis(np.asarray(f_lm.axis_w), -1, 0),
                               np.asarray(f_em.axis_w), atol=1e-6)
    np.testing.assert_allclose(np.moveaxis(np.asarray(f_lm.anchor_w), -1, 0),
                               np.asarray(f_em.anchor_w), atol=1e-6)


def test_velocity_jvp_matches_vmap():
    bp, bq, qj, v = random_batch(jax.random.key(1))
    bs_em, al_em, ac_em = jax.vmap(sparse.velocity_jvp,
                                   in_axes=(None, 0, 0, 0, 0))(
        MODEL, bp, bq, qj, v)
    bs_lm, al_lm, ac_lm = lanes.velocity_jvp(MODEL, bp.T, bq.T, qj.T, v.T)
    np.testing.assert_allclose(np.moveaxis(np.asarray(bs_lm.omega), -1, 0),
                               np.asarray(bs_em.omega), atol=1e-5)
    np.testing.assert_allclose(np.moveaxis(np.asarray(bs_lm.u), -1, 0),
                               np.asarray(bs_em.u), atol=1e-5)
    np.testing.assert_allclose(np.moveaxis(np.asarray(al_lm), -1, 0),
                               np.asarray(al_em), atol=1e-4)
    np.testing.assert_allclose(np.moveaxis(np.asarray(ac_lm), -1, 0),
                               np.asarray(ac_em), atol=1e-4)


def test_factorize_matches_vmap():
    bp, bq, qj, _ = random_batch(jax.random.key(2))
    payload = jnp.linspace(0.0, 1.0, E)
    f_em = jax.vmap(kinematics.fk, in_axes=(None, 0, 0, 0))(MODEL, bp, bq, qj)
    fac_em = jax.vmap(sparse.factorize, in_axes=(None, 0, 0))(
        MODEL, f_em, payload)
    f_lm = lanes.fk(MODEL, bp.T, bq.T, qj.T)
    fac_lm = lanes.factorize(MODEL, f_lm, payload)
    for name, atol in [("A", 1e-4), ("B", 1e-5), ("D", 1e-5),
                       ("Sinv", 2e-4), ("P_bl", 2e-4), ("P_ll", 2e-3),
                       ("mass", 1e-6), ("Iw", 1e-6)]:
        a = np.moveaxis(np.asarray(getattr(fac_lm, name)), -1, 0)
        b = np.asarray(getattr(fac_em, name))
        np.testing.assert_allclose(a, b, atol=atol, err_msg=name)


def test_solve_and_forward_dynamics_match_vmap():
    bp, bq, qj, v = random_batch(jax.random.key(3))
    payload = jnp.linspace(0.0, 0.5, E)
    tau = jax.random.normal(jax.random.key(30), (E, 12))
    f_ext = jax.random.normal(jax.random.key(31), (E, 13, 6))
    grav = jnp.tile(jnp.array([0.0, 0.0, -9.81]), (E, 1))

    def one(bp1, bq1, qj1, v1, pl, tau1, fx1, g1):
        bs, al, ac = sparse.velocity_jvp(MODEL, bp1, bq1, qj1, v1)
        fac = sparse.factorize(MODEL, bs.fk, pl)
        return sparse.forward_dynamics(MODEL, bp1, bq1, qj1, v1, tau1, fx1,
                                       g1, bs, fac, vp=(al, ac))

    qdd_em = jax.vmap(one)(bp, bq, qj, v, payload, tau, f_ext, grav)

    bs_lm, al, ac = lanes.velocity_jvp(MODEL, bp.T, bq.T, qj.T, v.T)
    fac_lm = lanes.factorize(MODEL, bs_lm.fk, payload)
    qdd_lm = lanes.forward_dynamics(MODEL, v.T, tau.T,
                                    jnp.moveaxis(f_ext, 0, -1), grav.T,
                                    bs_lm, fac_lm, vp=(al, ac))
    np.testing.assert_allclose(np.asarray(qdd_lm).T, np.asarray(qdd_em),
                               atol=5e-3)


def test_apparent_masses_match_vmap():
    bp, bq, qj, _ = random_batch(jax.random.key(4))
    payload = jnp.zeros(E)
    f_em = jax.vmap(kinematics.fk, in_axes=(None, 0, 0, 0))(MODEL, bp, bq, qj)

    def one(f1, pl):
        fac = sparse.factorize(MODEL, f1, pl)
        return sparse.apparent_masses(MODEL, f1, fac)

    W_em = jax.vmap(one)(f_em, payload)
    f_lm = lanes.fk(MODEL, bp.T, bq.T, qj.T)
    fac_lm = lanes.factorize(MODEL, f_lm, payload)
    W_lm = lanes.apparent_masses(MODEL, f_lm, fac_lm)
    np.testing.assert_allclose(np.moveaxis(np.asarray(W_lm), -1, 0),
                               np.asarray(W_em), atol=2e-4)


def _tunnel_like_terrain(num_envs):
    """Small random two-layer terrain (non-plane) for ceiling-branch coverage."""
    rng = np.random.RandomState(7)
    h, w = 40, 40
    floor = 0.05 * rng.randint(0, 4, size=(1, h, w)).astype(np.float32)
    ceil = 0.35 + 0.05 * rng.randint(0, 3, size=(1, h, w)).astype(np.float32)
    tiles = np.stack([ceil, floor], axis=1)                    # (1,2,h,w)
    origins = np.zeros((num_envs, 3), dtype=np.float32)
    origins[:, 0] = 1.0
    origins[:, 1] = 1.0
    return TerrainArrays(
        tiles=jnp.asarray(tiles),
        env_tile=jnp.zeros(num_envs, dtype=jnp.int32),
        env_origin=jnp.asarray(origins),
        env_terrain_origin=jnp.zeros((num_envs, 3)),
        horizontal_scale=0.05,
        is_plane=False,
        ceiling_top=2.0,
    )


def test_contact_forces_match_vmap():
    terr = _tunnel_like_terrain(E)
    bp, bq, qj, v = random_batch(jax.random.key(5))
    # place bases low enough that several spheres contact the floor
    bp = bp.at[:, 2].set(jnp.linspace(0.05, 0.3, E))
    friction = jnp.linspace(0.3, 1.2, E)
    restitution = jnp.linspace(0.0, 0.5, E)
    patches, xs, ys = extract_patches_batched(
        terr, terr.env_tile, terr.env_terrain_origin, bp[:, :2])

    def one(bp1, bq1, qj1, v1, patch1, xs1, ys1, to1, fr1, re1):
        bs, _, _ = sparse.velocity_jvp(MODEL, bp1, bq1, qj1, v1)
        fac = sparse.factorize(MODEL, bs.fk, jnp.asarray(0.0))
        W = sparse.apparent_masses(MODEL, bs.fk, fac)
        return contact.contact_forces(
            MODEL, terr, (patch1, xs1, ys1), to1, bs, W, fr1, re1,
            5000.0, 50.0, 0.005)

    c_em = jax.vmap(one)(bp, bq, qj, v, patches, xs, ys,
                         terr.env_terrain_origin, friction, restitution)

    bs_lm, _, _ = lanes.velocity_jvp(MODEL, bp.T, bq.T, qj.T, v.T)
    fac_lm = lanes.factorize(MODEL, bs_lm.fk, jnp.zeros(E))
    W_lm = lanes.apparent_masses(MODEL, bs_lm.fk, fac_lm)
    c_lm = lanes.contact_forces(
        MODEL, terr, patches, xs, ys, terr.env_terrain_origin, bs_lm, W_lm,
        friction, restitution, 5000.0, 50.0, 0.005)

    np.testing.assert_allclose(np.moveaxis(np.asarray(c_lm.sphere_pos), -1, 0),
                               np.asarray(c_em.sphere_pos), atol=1e-5)
    np.testing.assert_allclose(np.moveaxis(np.asarray(c_lm.sphere_vel), -1, 0),
                               np.asarray(c_em.sphere_vel), atol=1e-5)
    # forces scale with stiffness 5e3: atol 0.05 N on O(100 N) forces
    np.testing.assert_allclose(np.moveaxis(np.asarray(c_lm.f_ext), -1, 0),
                               np.asarray(c_em.f_ext), atol=5e-2)
    np.testing.assert_allclose(np.moveaxis(np.asarray(c_lm.report), -1, 0),
                               np.asarray(c_em.report), atol=5e-2)


@pytest.mark.parametrize("control_type", ["P", "actuator_net"])
def test_control_step_matches_vmap(control_type):
    N = 4
    terr = plane_terrain(N)
    net = actuators.load_actuator_net()
    tf_em = actuators.make_torque_fn(
        control_type, net, DEFAULT_Q, 20.0, 0.5, MODEL.dof_effort,
        randomize_lag=True)
    tf_lm = actuators.make_torque_fn_lanes(
        control_type, net, DEFAULT_Q, 20.0, 0.5, MODEL.dof_effort,
        randomize_lag=True)
    params = engine.PhysParams(
        friction=jnp.linspace(0.5, 1.0, N), restitution=jnp.zeros(N),
        gravity=jnp.tile(jnp.array([0.0, 0.0, -9.81]), (N, 1)),
        payload=jnp.linspace(0.0, 0.5, N),
        com_offset=jnp.zeros((N, 3)).at[:, 0].set(0.01),
    )
    ast = actuators.init_actuator_state(6)
    carry = (
        jax.tree.map(lambda x: jnp.tile(x, (N,) + (1,) * x.ndim), ast),
        jnp.ones((N, 12)), jnp.zeros((N, 12)),
        jnp.ones((N, 12)), jnp.ones((N, 12)),
        0.1 * jnp.ones((N, 12)),
    )
    state = engine.PhysState(
        base_pos=jnp.tile(jnp.array([0.0, 0.0, 0.32]), (N, 1)),
        base_quat=jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (N, 1)),
        qj=jnp.tile(DEFAULT_Q, (N, 1)),
        v=jnp.zeros((N, 18)),
    )

    def one(st, cr, p, tile, torig, patch, xs1, ys1):
        return engine.control_step(
            MODEL, terr, (patch, xs1, ys1), torig, st, tf_em, cr, p,
            0.005, 4, 5000.0, 50.0, 80.0, 2.0)

    @jax.jit
    def roll_em(state, carry):
        def body(c, _):
            st, cr = c
            patches, xs, ys = extract_patches_batched(
                terr, terr.env_tile, terr.env_terrain_origin,
                st.base_pos[:, :2])
            st, cr, aux = jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0, 0, 0))(
                st, cr, params, terr.env_tile, terr.env_terrain_origin,
                patches, xs, ys)
            return (st, cr), aux
        return jax.lax.scan(body, (state, carry), None, length=10)

    @jax.jit
    def roll_lm(state, carry):
        def body(c, _):
            st, cr = c
            patches, xs, ys = extract_patches_batched(
                terr, terr.env_tile, terr.env_terrain_origin,
                st.base_pos[:, :2])
            st, cr, aux = engine.control_step_lanes(
                MODEL, terr, patches, xs, ys, terr.env_terrain_origin,
                st, tf_lm, cr, params, 0.005, 4, 5000.0, 50.0, 80.0, 2.0)
            return (st, cr), aux
        return jax.lax.scan(body, (state, carry), None, length=10)

    (s_em, c_em), aux_em = roll_em(state, carry)
    (s_lm, c_lm), aux_lm = roll_lm(state, carry)

    np.testing.assert_allclose(np.asarray(s_lm.base_pos),
                               np.asarray(s_em.base_pos), atol=2e-4)
    np.testing.assert_allclose(np.asarray(s_lm.base_quat),
                               np.asarray(s_em.base_quat), atol=2e-4)
    np.testing.assert_allclose(np.asarray(s_lm.qj), np.asarray(s_em.qj),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(s_lm.v), np.asarray(s_em.v),
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(aux_lm.torques),
                               np.asarray(aux_em.torques), atol=1e-3)
    np.testing.assert_allclose(np.asarray(aux_lm.contact_report),
                               np.asarray(aux_em.contact_report), atol=0.2)
    # actuator-state carries stay in sync (lag buffer, error history)
    np.testing.assert_allclose(np.asarray(c_lm[0].lag_buffer),
                               np.asarray(c_em[0].lag_buffer), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_lm[0].joint_pos_err_last),
                               np.asarray(c_em[0].joint_pos_err_last),
                               atol=5e-4)


def test_env_rollout_matches_vmap_path():
    """Full LeggedEnv steps agree between the vmapped and lane engines
    (same rng → same DR draws/pushes; only the physics layout differs)."""
    from legged_tracking_tpu.config import Cfg, config_go1
    from legged_tracking_tpu.envs import LeggedEnv

    def make(lane):
        cfg = config_go1(Cfg())
        cfg.env.num_envs = 4
        cfg.env.command_type = "xy"
        cfg.terrain.mesh_type = "trimesh"
        cfg.terrain.terrain_type = "single_path"
        cfg.terrain.num_rows = 2
        cfg.terrain.num_cols = 2
        cfg.terrain.terrain_length = 4.0
        cfg.terrain.terrain_width = 2.0
        cfg.terrain.terrain_ratio_x = 0.9
        cfg.terrain.terrain_ratio_y = 0.5
        cfg.terrain.ceiling_height = 0.8
        cfg.terrain.start_loc = 0.32
        cfg.control.control_type = "actuator_net"
        cfg.env.episode_length_s = 2.0
        cfg.sim.lane_engine = lane
        return LeggedEnv(cfg)

    def roll(env):
        state = env._reset_jit(jax.random.key(0), True)
        obs = env._observe_jit(state)
        outs = []
        for i in range(5):
            act = 0.3 * jnp.sin(0.1 * i + jnp.arange(4 * 12, dtype=jnp.float32)
                                ).reshape(4, 12)
            state, out = env._step_jit(state, act)
            # _step_jit donates its state arg: snapshot to numpy before the
            # next call invalidates these buffers
            outs.append((np.asarray(state.phys.base_pos),
                         np.asarray(state.phys.v), np.asarray(out.obs),
                         np.asarray(out.rew)))
        return outs

    outs_em = roll(make(False))
    outs_lm = roll(make(True))
    for i, ((p0, v0, o0, r0), (p1, v1, o1, r1)) in enumerate(
            zip(outs_em, outs_lm)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p0), atol=1e-3,
                                   err_msg=f"step {i} base_pos")
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), atol=5e-2,
                                   err_msg=f"step {i} v")
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r0), atol=5e-2,
                                   err_msg=f"step {i} rew")


def test_control_step_fused_sampling_matches():
    """control_step_lanes(fused_sampling=True) — one-matmul contact sampling
    on the transpose_patch layout — tracks the separable-sampling lane path
    over a 10-control-step rollout on a TUNNEL terrain (ceiling branch
    exercised).  The only arithmetic difference is bf16-level op packing."""
    from legged_tracking_tpu.config import Cfg, config_go1
    from legged_tracking_tpu.terrain.tunnel import build_terrain

    N = 4
    cfg = config_go1(Cfg())
    cfg.terrain.mesh_type = "trimesh"
    cfg.terrain.terrain_type = "single_path"
    cfg.terrain.num_rows = 2
    cfg.terrain.num_cols = 2
    cfg.terrain.terrain_length = 4.0
    cfg.terrain.terrain_width = 2.0
    cfg.terrain.terrain_ratio_x = 0.9
    cfg.terrain.terrain_ratio_y = 0.5
    cfg.terrain.ceiling_height = 0.8
    cfg.terrain.start_loc = 0.32
    terr = build_terrain(cfg, N, seed=5)

    net = actuators.load_actuator_net()
    tf_lm = actuators.make_torque_fn_lanes(
        "actuator_net", net, DEFAULT_Q, 20.0, 0.5, MODEL.dof_effort,
        randomize_lag=True)
    params = engine.PhysParams(
        friction=jnp.linspace(0.5, 1.0, N), restitution=jnp.zeros(N),
        gravity=jnp.tile(jnp.array([0.0, 0.0, -9.81]), (N, 1)),
        payload=jnp.linspace(0.0, 0.5, N),
        com_offset=jnp.zeros((N, 3)).at[:, 0].set(0.01),
    )
    ast = actuators.init_actuator_state(6)
    carry = (
        jax.tree.map(lambda x: jnp.tile(x, (N,) + (1,) * x.ndim), ast),
        jnp.ones((N, 12)), jnp.zeros((N, 12)),
        jnp.ones((N, 12)), jnp.ones((N, 12)),
        0.1 * jnp.ones((N, 12)),
    )
    state = engine.PhysState(
        base_pos=terr.env_origin + jnp.array([0.0, 0.0, 0.32]),
        base_quat=jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (N, 1)),
        qj=jnp.tile(DEFAULT_Q, (N, 1)),
        v=jnp.zeros((N, 18)),
    )

    def roll(fused):
        @jax.jit
        def go(state, carry):
            def body(c, _):
                st, cr = c
                patches, xs, ys = extract_patches_batched(
                    terr, terr.env_tile, terr.env_terrain_origin,
                    st.base_pos[:, :2])
                st, cr, aux = engine.control_step_lanes(
                    MODEL, terr, patches, xs, ys, terr.env_terrain_origin,
                    st, tf_lm, cr, params, 0.005, 4, 5000.0, 50.0, 80.0, 2.0,
                    fused_sampling=fused)
                return (st, cr), aux
            return jax.lax.scan(body, (state, carry), None, length=10)
        return go(state, carry)

    (s_a, _), aux_a = roll(False)
    (s_b, _), aux_b = roll(True)
    np.testing.assert_allclose(np.asarray(s_b.base_pos),
                               np.asarray(s_a.base_pos), atol=2e-4)
    np.testing.assert_allclose(np.asarray(s_b.base_quat),
                               np.asarray(s_a.base_quat), atol=2e-4)
    np.testing.assert_allclose(np.asarray(s_b.qj), np.asarray(s_a.qj),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(s_b.v), np.asarray(s_a.v),
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(aux_b.contact_report),
                               np.asarray(aux_a.contact_report), atol=0.2)


def test_env_rollout_fused_sampling_matches():
    """Full LeggedEnv steps agree between fused and separable sampling
    (cfg.sim.fused_sampling flag wiring: contact island + obs height scan)."""
    from legged_tracking_tpu.config import Cfg, config_go1
    from legged_tracking_tpu.envs import LeggedEnv

    def make(fused):
        cfg = config_go1(Cfg())
        cfg.env.num_envs = 4
        cfg.env.command_type = "xy"
        cfg.env.observe_heights = True
        cfg.terrain.mesh_type = "trimesh"
        cfg.terrain.terrain_type = "single_path"
        cfg.terrain.num_rows = 2
        cfg.terrain.num_cols = 2
        cfg.terrain.terrain_length = 4.0
        cfg.terrain.terrain_width = 2.0
        cfg.terrain.terrain_ratio_x = 0.9
        cfg.terrain.terrain_ratio_y = 0.5
        cfg.terrain.ceiling_height = 0.8
        cfg.terrain.start_loc = 0.32
        cfg.control.control_type = "actuator_net"
        cfg.env.episode_length_s = 2.0
        cfg.sim.fused_sampling = fused
        return LeggedEnv(cfg)

    def roll(env):
        state = env._reset_jit(jax.random.key(0), True)
        outs = []
        for i in range(5):
            act = 0.3 * jnp.sin(0.1 * i + jnp.arange(4 * 12, dtype=jnp.float32)
                                ).reshape(4, 12)
            state, out = env._step_jit(state, act)
            outs.append((np.asarray(state.phys.base_pos),
                         np.asarray(state.phys.v), np.asarray(out.obs),
                         np.asarray(out.rew)))
        return outs

    for i, ((p0, v0, o0, r0), (p1, v1, o1, r1)) in enumerate(
            zip(roll(make(False)), roll(make(True)))):
        np.testing.assert_allclose(p1, p0, atol=1e-3, err_msg=f"step {i} pos")
        np.testing.assert_allclose(v1, v0, atol=5e-2, err_msg=f"step {i} v")
        np.testing.assert_allclose(o1, o0, atol=1e-2, err_msg=f"step {i} obs")
        np.testing.assert_allclose(r1, r0, atol=5e-2, err_msg=f"step {i} rew")
