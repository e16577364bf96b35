import jax
import jax.numpy as jnp
import numpy as np

from bshot_slam_tpu.geometry import se3


def random_pose(rng, scale_t=1000.0):
    w = rng.normal(size=3)
    w = w / np.linalg.norm(w) * rng.uniform(0.1, 2.5)
    T = np.array(se3.se3_exp(jnp.asarray(np.concatenate([rng.normal(size=3) * scale_t, w]), jnp.float32)))
    return T


def test_exp_log_roundtrip(rng):
    xi = jnp.asarray(rng.normal(size=(16, 6)) * np.array([500, 500, 500, 0.5, 0.5, 0.5]), jnp.float32)
    T = se3.se3_exp(xi)
    xi2 = se3.se3_log(T)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), rtol=2e-3, atol=2e-2)


def test_inverse_compose(rng):
    T = jnp.asarray(random_pose(rng), jnp.float32)
    I = se3.compose(T, se3.inverse(T))
    np.testing.assert_allclose(np.asarray(I), np.eye(4), atol=1e-3)


def test_apply_matches_matmul(rng):
    T = jnp.asarray(random_pose(rng), jnp.float32)
    pts = jnp.asarray(rng.normal(size=(50, 3)) * 1000, jnp.float32)
    out = se3.apply(T, pts)
    hom = np.concatenate([np.asarray(pts), np.ones((50, 1))], axis=1)
    expect = (np.asarray(T) @ hom.T).T[:, :3]
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-2)


def test_kabsch_recovers_rigid_transform(rng):
    T_true = random_pose(rng)
    src = rng.normal(size=(40, 3)) * 2000
    dst = (T_true[:3, :3] @ src.T).T + T_true[:3, 3]
    T_est = se3.kabsch(jnp.asarray(src, jnp.float32), jnp.asarray(dst, jnp.float32))
    np.testing.assert_allclose(np.asarray(T_est), T_true, rtol=1e-3, atol=1.0)


def test_kabsch_weighted_ignores_outliers(rng):
    T_true = random_pose(rng)
    src = rng.normal(size=(40, 3)) * 2000
    dst = (T_true[:3, :3] @ src.T).T + T_true[:3, 3]
    dst[30:] += rng.normal(size=(10, 3)) * 50000  # outliers
    w = np.ones(40, np.float32)
    w[30:] = 0.0
    T_est = se3.kabsch(jnp.asarray(src, jnp.float32), jnp.asarray(dst, jnp.float32), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(T_est), T_true, rtol=1e-3, atol=1.0)


def test_heading_angle():
    yaw = 0.3
    c, s = np.cos(yaw), np.sin(yaw)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    h = se3.heading_angle(jnp.asarray(T))
    np.testing.assert_allclose(float(h), yaw, atol=1e-5)


def test_kabsch_degenerate_no_nan():
    src = jnp.zeros((10, 3), jnp.float32)
    dst = jnp.zeros((10, 3), jnp.float32)
    w = jnp.zeros((10,), jnp.float32)
    T = se3.kabsch(src, dst, w)
    assert np.isfinite(np.asarray(T)).all()
