"""Equivalence of the block-sparse dynamics (physics/sparse.py) with the
dense composite formulation (physics/dynamics.py) on random states."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legged_tracking_tpu.physics import dynamics, sparse
from legged_tracking_tpu.physics.model import make_go1_model
from legged_tracking_tpu.utils import quat as qt


@pytest.fixture(scope="module")
def model():
    return make_go1_model()


def random_state(key, scale_v=1.0):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    base_pos = jax.random.uniform(k1, (3,), minval=-1.0, maxval=1.0) \
        + jnp.array([0.0, 0.0, 0.4])
    ang = jax.random.uniform(k2, (3,), minval=-0.6, maxval=0.6)
    base_quat = qt.quat_from_euler_xyz(ang[0], ang[1], ang[2])
    qj = jax.random.uniform(k3, (12,), minval=-1.2, maxval=1.2)
    v = jax.random.uniform(k4, (18,), minval=-scale_v, maxval=scale_v)
    return base_pos, base_quat, qj, v


def test_body_velocities_match_dense(model):
    for seed in range(3):
        bp, bq, qj, v = random_state(jax.random.key(seed))
        bs_dense = dynamics.body_state(model, bp, bq, qj, v)
        bs_sparse = sparse.body_velocities(model, bs_dense.fk, v)
        np.testing.assert_allclose(np.asarray(bs_sparse.omega),
                                   np.asarray(bs_dense.omega), atol=1e-5)
        np.testing.assert_allclose(np.asarray(bs_sparse.u),
                                   np.asarray(bs_dense.u), atol=1e-5)


def test_mass_blocks_match_dense(model):
    for seed in range(3):
        bp, bq, qj, v = random_state(jax.random.key(10 + seed))
        bs = dynamics.body_state(model, bp, bq, qj, v)
        payload = jnp.asarray(0.7)
        mm = dynamics.mass_matrix(model, bs, payload, None, bp)
        fac = sparse.factorize(model, bs.fk, payload)
        M_dense = np.asarray(mm.M)
        # assemble dense M from blocks
        M_blk = np.zeros((18, 18))
        M_blk[:6, :6] = np.asarray(fac.A)
        for l in range(4):
            s = 6 + 3 * l
            M_blk[:6, s:s + 3] = np.asarray(fac.B[l])
            M_blk[s:s + 3, :6] = np.asarray(fac.B[l]).T
            M_blk[s:s + 3, s:s + 3] = np.asarray(fac.D[l])
        np.testing.assert_allclose(M_blk, M_dense, atol=2e-4)
        # solve equivalence: M^-1 rhs
        rhs = np.asarray(jax.random.normal(jax.random.key(99 + seed), (18,)))
        qdd_sparse = np.asarray(sparse.solve(fac, jnp.asarray(rhs)))
        qdd_dense = np.linalg.solve(M_dense, rhs)
        np.testing.assert_allclose(qdd_sparse, qdd_dense, rtol=2e-3, atol=2e-3)


def test_forward_dynamics_match_dense(model):
    for seed in range(3):
        bp, bq, qj, v = random_state(jax.random.key(20 + seed))
        bs = dynamics.body_state(model, bp, bq, qj, v)
        payload = jnp.asarray(-0.4)
        mm = dynamics.mass_matrix(model, bs, payload, None, bp)
        fac = sparse.factorize(model, bs.fk, payload)
        tau = jax.random.normal(jax.random.key(seed), (12,)) * 5.0
        f_ext = jax.random.normal(jax.random.key(seed + 1), (13, 6)) * 10.0
        grav = jnp.array([0.0, 0.0, -9.81])
        qdd_dense = dynamics.forward_dynamics(
            model, bp, bq, qj, v, tau, f_ext, grav, bs, mm)
        bs_sp = sparse.body_velocities(model, bs.fk, v)
        qdd_sparse = sparse.forward_dynamics(
            model, bp, bq, qj, v, tau, f_ext, grav, bs_sp, fac)
        np.testing.assert_allclose(np.asarray(qdd_sparse),
                                   np.asarray(qdd_dense),
                                   rtol=2e-3, atol=2e-2)


def test_apparent_masses_match_dense(model):
    from legged_tracking_tpu.physics import contact
    for seed in range(3):
        bp, bq, qj, v = random_state(jax.random.key(30 + seed))
        bs = dynamics.body_state(model, bp, bq, qj, v)
        payload = jnp.asarray(0.0)
        mm = dynamics.mass_matrix(model, bs, payload, None, bp)
        fac = sparse.factorize(model, bs.fk, payload)
        W_dense = np.asarray(contact.apparent_masses(model, bs, mm))
        W_sparse = np.asarray(sparse.apparent_masses(model, bs.fk, fac))
        np.testing.assert_allclose(W_sparse, W_dense, rtol=5e-3, atol=5e-4)


def test_com_offset_path(model):
    """The DR base-COM offset flows through fk for both paths."""
    bp, bq, qj, v = random_state(jax.random.key(42))
    off = jnp.array([0.05, -0.03, 0.02])
    from legged_tracking_tpu.physics import kinematics
    f = kinematics.fk(model, bp, bq, qj, off)
    bs = dynamics.BodyState(fk=f, J=kinematics.jacobians(model, f, bp),
                            omega=None, u=None)
    vel6 = jnp.einsum("bik,k->bi", bs.J, v)
    bs = bs._replace(omega=vel6[:, :3], u=vel6[:, 3:])
    mm = dynamics.mass_matrix(model, bs, jnp.asarray(0.2), off, bp)
    fac = sparse.factorize(model, f, jnp.asarray(0.2))
    tau = jnp.ones(12)
    f_ext = jnp.zeros((13, 6))
    grav = jnp.array([0.0, 0.0, -9.81])
    qdd_dense = dynamics.forward_dynamics(model, bp, bq, qj, v, tau, f_ext,
                                          grav, bs, mm, off)
    bs_sp = sparse.body_velocities(model, f, v)
    qdd_sparse = sparse.forward_dynamics(model, bp, bq, qj, v, tau, f_ext,
                                         grav, bs_sp, fac, off)
    np.testing.assert_allclose(np.asarray(qdd_sparse), np.asarray(qdd_dense),
                               rtol=2e-3, atol=2e-2)
