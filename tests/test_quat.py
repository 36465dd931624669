import jax.numpy as jnp
import numpy as np

from legged_tracking_tpu.utils import quat


def test_quat_apply_roundtrip():
    rng = np.random.RandomState(0)
    q = quat.normalize(jnp.asarray(rng.randn(32, 4)))
    v = jnp.asarray(rng.randn(32, 3))
    w = quat.quat_apply(q, v)
    v2 = quat.quat_rotate_inverse(q, w)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-5)


def test_quat_matches_matrix():
    rng = np.random.RandomState(1)
    q = quat.normalize(jnp.asarray(rng.randn(16, 4)))
    v = jnp.asarray(rng.randn(16, 3))
    R = quat.quat_to_matrix(q)
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("bij,bj->bi", R, v)),
        np.asarray(quat.quat_apply(q, v)),
        atol=1e-5,
    )


def test_euler_roundtrip():
    rng = np.random.RandomState(2)
    rpy = rng.uniform(-1.2, 1.2, (64, 3))  # avoid gimbal lock
    q = quat.quat_from_euler_xyz(jnp.asarray(rpy[:, 0]), jnp.asarray(rpy[:, 1]), jnp.asarray(rpy[:, 2]))
    out = quat.quaternion_to_roll_pitch_yaw(q)
    np.testing.assert_allclose(np.asarray(out), rpy, atol=1e-5)


def test_yaw_decomposition():
    q = quat.quat_from_euler_xyz(jnp.array(0.3), jnp.array(-0.2), jnp.array(1.1))
    v = jnp.array([1.0, 2.0, 3.0])
    # quat_apply_yaw rotates about z by the yaw of the xy-zeroed quaternion
    # (exact reference semantics, math_utils.py:12-16 — NOT the euler yaw)
    out = quat.quat_apply_yaw(q[None], v[None])[0]
    yaw = 2.0 * np.arctan2(float(q[2]), float(q[3]))
    expect_x = np.cos(yaw) * 1.0 - np.sin(yaw) * 2.0
    expect_y = np.sin(yaw) * 1.0 + np.cos(yaw) * 2.0
    np.testing.assert_allclose(np.asarray(out), [expect_x, expect_y, 3.0], atol=1e-5)
    # pure-yaw quat: matches euler yaw exactly
    qz = quat.quat_from_euler_xyz(jnp.array(0.0), jnp.array(0.0), jnp.array(1.1))
    out2 = quat.quat_apply_yaw(qz[None], v[None])[0]
    expect_x2 = np.cos(1.1) * 1.0 - np.sin(1.1) * 2.0
    expect_y2 = np.sin(1.1) * 1.0 + np.cos(1.1) * 2.0
    np.testing.assert_allclose(np.asarray(out2), [expect_x2, expect_y2, 3.0], atol=1e-5)
    # and yaw-inverse inverts it
    back = quat.quat_apply_yaw_inverse(q[None], out[None])[0]
    np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=1e-5)


def test_wrap_to_pi():
    a = jnp.array([0.0, np.pi + 0.1, -np.pi - 0.1, 2 * np.pi, 5.0])
    out = np.asarray(quat.wrap_to_pi(a))
    assert np.all(out <= np.pi + 1e-6) and np.all(out >= -np.pi - 1e-6)
    np.testing.assert_allclose(out[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[3], 0.0, atol=1e-5)


def test_quat_integrate_zero_omega():
    q = quat.quat_from_euler_xyz(jnp.array(0.2), jnp.array(0.1), jnp.array(-0.4))
    q2 = quat.quat_integrate(q, jnp.zeros(3), 0.01)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-6)


def test_quat_integrate_yaw_rate():
    q = quat.quat_identity()
    # integrate yaw rate of 1 rad/s for 1s in 100 steps
    for _ in range(100):
        q = quat.quat_integrate(q, jnp.array([0.0, 0.0, 1.0]), 0.01)
    rpy = np.asarray(quat.quaternion_to_roll_pitch_yaw(q))
    np.testing.assert_allclose(rpy, [0.0, 0.0, 1.0], atol=1e-4)
