"""Engine validation: FK geometry, analytic dynamics checks, contact behavior.

These are the unit tests the reference never had (SURVEY.md §4): the physics
backend there was the closed-source Isaac Gym binary.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legged_tracking_tpu.actuation import actuators
from legged_tracking_tpu.physics import dynamics, engine, kinematics
from legged_tracking_tpu.physics.model import make_go1_model
from legged_tracking_tpu.terrain.heightfield import plane_terrain

MODEL = make_go1_model()
DEFAULT_Q = jnp.array([-0.1, 0.8, -1.5, 0.1, 0.8, -1.5, -0.1, 1.0, -1.5, 0.1, 1.0, -1.5])
IDQ = jnp.array([0.0, 0.0, 0.0, 1.0])
G = jnp.array([0.0, 0.0, -9.81])


def test_fk_zero_pose_geometry():
    f = kinematics.fk(MODEL, jnp.array([0.0, 0.0, 0.5]), IDQ, jnp.zeros(12))
    # hips at trunk corners
    np.testing.assert_allclose(np.asarray(f.p[1]), [0.1881, -0.04675, 0.5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(f.p[10]), [-0.1881, 0.04675, 0.5], atol=1e-6)
    # thigh body sits 0.08 further out along +y for left legs
    np.testing.assert_allclose(np.asarray(f.p[11]), [-0.1881, 0.04675 + 0.08, 0.5], atol=1e-6)
    # straight legs: calf tip at z = 0.5 - 2*0.213
    foot = f.p[3] + f.R[3] @ jnp.array([0.0, 0.0, -0.213])
    np.testing.assert_allclose(float(foot[2]), 0.5 - 0.426, atol=1e-6)


def test_fk_thigh_rotation():
    qj = jnp.zeros(12).at[1].set(jnp.pi / 2)  # FR thigh 90deg about +y
    f = kinematics.fk(MODEL, jnp.zeros(3), IDQ, qj)
    # calf joint origin moves from (0,0,-0.213) to (-0.213,0,0) rel. hip-thigh joint
    rel = np.asarray(f.p[3] - f.p[2])
    np.testing.assert_allclose(rel, [-0.213, 0.0, 0.0], atol=1e-6)


def test_free_fall():
    bs = dynamics.body_state(MODEL, jnp.zeros(3), IDQ, DEFAULT_Q, jnp.zeros(18))
    mm = dynamics.mass_matrix(MODEL, bs, jnp.array(0.0), jnp.zeros(3), jnp.zeros(3))
    qdd = dynamics.forward_dynamics(
        MODEL, jnp.zeros(3), IDQ, DEFAULT_Q, jnp.zeros(18),
        jnp.zeros(12), jnp.zeros((13, 6)), G, bs, mm,
    )
    np.testing.assert_allclose(np.asarray(qdd[:3]), [0, 0, -9.81], atol=1e-4)
    np.testing.assert_allclose(np.asarray(qdd[3:6]), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(qdd[6:]), 0.0, atol=2e-3)


def test_mass_matrix_spd_and_total_mass():
    bs = dynamics.body_state(MODEL, jnp.zeros(3), IDQ, DEFAULT_Q, jnp.zeros(18))
    mm = dynamics.mass_matrix(MODEL, bs, jnp.array(0.0), jnp.zeros(3), jnp.zeros(3))
    M = np.asarray(mm.M)
    np.testing.assert_allclose(M, M.T, atol=1e-5)
    assert np.all(np.linalg.eigvalsh(M) > 0)
    # top-left 3x3 block == total mass * I
    np.testing.assert_allclose(M[:3, :3], np.eye(3) * 11.309932, atol=1e-4)


def test_energy_conservation_passive():
    """No contact, no torque, gravity on: E = T + V conserved by the
    integrator to within drift tolerance."""
    state = engine.PhysState(jnp.array([0.0, 0.0, 10.0]), IDQ, DEFAULT_Q,
                             jnp.zeros(18).at[7].set(2.0).at[4].set(1.0))

    def energy(s):
        bs = dynamics.body_state(MODEL, s.base_pos, s.base_quat, s.qj, s.v)
        mm = dynamics.mass_matrix(MODEL, bs, jnp.array(0.0), jnp.zeros(3), s.base_pos)
        T = 0.5 * s.v @ mm.M @ s.v
        V = jnp.sum(mm.mass * 9.81 * bs.fk.com_w[:, 2])
        return float(T + V)

    e0 = energy(state)

    def substep(s, _):
        bs = dynamics.body_state(MODEL, s.base_pos, s.base_quat, s.qj, s.v)
        mm = dynamics.mass_matrix(MODEL, bs, jnp.array(0.0), jnp.zeros(3), s.base_pos)
        qdd = dynamics.forward_dynamics(
            MODEL, s.base_pos, s.base_quat, s.qj, s.v,
            jnp.zeros(12), jnp.zeros((13, 6)), G, bs, mm,
        )
        bp, bq, qj, v = dynamics.integrate(s.base_pos, s.base_quat, s.qj, s.v, qdd, 0.005)
        return engine.PhysState(bp, bq, qj, v), None

    state, _ = jax.lax.scan(substep, state, None, length=100)  # 0.5 s
    e1 = energy(state)
    assert abs(e1 - e0) / abs(e0) < 0.01, (e0, e1)


def _make_step(num_envs, control_type="P"):
    terr = plane_terrain(num_envs)
    net = actuators.load_actuator_net()
    torque_fn = actuators.make_torque_fn(
        control_type, net, DEFAULT_Q, 20.0, 0.5, MODEL.dof_effort, randomize_lag=False
    )
    params = engine.PhysParams(
        friction=jnp.ones(num_envs), restitution=jnp.zeros(num_envs),
        gravity=jnp.tile(G, (num_envs, 1)),
        payload=jnp.zeros(num_envs), com_offset=jnp.zeros((num_envs, 3)),
    )

    def one(state, carry, p, tile, torig):
        from legged_tracking_tpu.terrain.heightfield import extract_patch
        patch = extract_patch(terr, tile, torig, state.base_pos[:2])
        return engine.control_step(
            MODEL, terr, patch, torig, state, torque_fn, carry, p,
            0.005, 4, 5000.0, 50.0, 80.0, 2.0,
        )

    step = jax.vmap(one, in_axes=(0, 0, 0, 0, 0))
    ast = actuators.init_actuator_state(6)
    carry = (
        jax.tree.map(lambda x: jnp.tile(x, (num_envs,) + (1,) * x.ndim), ast),
        jnp.ones((num_envs, 12)), jnp.zeros((num_envs, 12)),
        jnp.ones((num_envs, 12)), jnp.ones((num_envs, 12)),
        jnp.zeros((num_envs, 12)),
    )
    state = engine.PhysState(
        base_pos=jnp.tile(jnp.array([0.0, 0.0, 0.4]), (num_envs, 1)),
        base_quat=jnp.tile(IDQ, (num_envs, 1)),
        qj=jnp.tile(DEFAULT_Q, (num_envs, 1)),
        v=jnp.zeros((num_envs, 18)),
    )
    return terr, params, step, state, carry


@pytest.mark.parametrize("control_type", ["P", "actuator_net"])
def test_drop_and_stand(control_type):
    N = 4
    terr, params, step, state, carry = _make_step(N, control_type)

    @jax.jit
    def rollout(state, carry):
        def body(c, _):
            s, cr = c
            s, cr, aux = step(s, cr, params, terr.env_tile, terr.env_terrain_origin)
            return (s, cr), aux.contact_report
        (s, cr), reports = jax.lax.scan(body, (state, carry), None, length=150)
        return s, reports

    s, reports = rollout(state, carry)
    h = np.asarray(s.base_pos[:, 2])
    assert np.all(h > 0.18) and np.all(h < 0.34), h
    # PD settles to rest; the actuator net (stiffer learned controller) keeps
    # a small calf limit cycle on the soft contact — bounded, not divergent
    vmax_tol = 0.05 if control_type == "P" else 1.2
    assert np.abs(np.asarray(s.v)).max() < vmax_tol
    assert not np.isnan(np.asarray(s.base_pos)).any()
    # standing: net vertical contact force equals weight
    fz = np.asarray(reports[-1][:, :, 2].sum(axis=1))
    np.testing.assert_allclose(fz, 11.309932 * 9.81, rtol=0.02)


def test_friction_anisotropy():
    """Low friction -> robot slides on a slope... proxy: push test.
    With high friction a lateral push is resisted (stiction); with ~zero
    friction the robot glides."""
    N = 2
    terr, params, step, state, carry = _make_step(N)
    params = params._replace(friction=jnp.array([1.5, 0.0]))

    # settle first
    from functools import partial

    @partial(jax.jit, static_argnums=(3,))
    def run(state, carry, params, steps):
        def body(c, _):
            s, cr = c
            s, cr, aux = step(s, cr, params, terr.env_tile, terr.env_terrain_origin)
            return (s, cr), None
        (s, cr), _ = jax.lax.scan(body, (state, carry), None, length=steps)
        return s, cr

    s, cr = run(state, carry, params, 100)
    # push both robots sideways at 0.5 m/s
    v = s.v.at[:, 1].set(0.5)
    s = s._replace(v=v)
    y0 = np.asarray(s.base_pos[:, 1])
    s2, _ = run(s, cr, params, 50)  # 1 s
    dy = np.asarray(s2.base_pos[:, 1]) - y0
    assert dy[0] < 0.15, dy          # high friction: stops quickly
    assert dy[1] > 2.0 * dy[0], dy   # frictionless: keeps sliding
