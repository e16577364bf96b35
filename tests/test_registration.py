import jax
import jax.numpy as jnp
import numpy as np

from bshot_slam_tpu.geometry import se3
from bshot_slam_tpu.ops.icp import icp_point_to_point
from bshot_slam_tpu.ops.ransac import ransac_rigid, sample_distinct_triples


def _rigid(rng, max_angle=0.4, max_t=1500.0):
    w = rng.normal(size=3)
    w = w / np.linalg.norm(w) * rng.uniform(0.05, max_angle)
    t = rng.uniform(-max_t, max_t, 3)
    return np.asarray(se3.se3_exp(jnp.asarray(np.concatenate([t, w]), jnp.float32)))


def test_ransac_with_outliers(rng):
    T_true = _rigid(rng)
    K = 128
    src = np.zeros((K, 3), np.float32)
    dst = np.zeros((K, 3), np.float32)
    cmask = np.zeros(K, bool)
    n = 90
    pts = rng.uniform(-20000, 20000, (n, 3)).astype(np.float32)
    src[:n] = pts
    dst[:n] = (T_true[:3, :3] @ pts.T).T + T_true[:3, 3]
    dst[:n] += rng.normal(0, 30, (n, 3))  # inlier noise well under threshold
    # 40% outliers: wrong matches
    n_out = 36
    out_idx = rng.choice(n, n_out, replace=False)
    dst[out_idx] = rng.uniform(-20000, 20000, (n_out, 3))
    cmask[:n] = True

    res = ransac_rigid(
        jax.random.PRNGKey(0), jnp.asarray(src), jnp.asarray(dst), jnp.asarray(cmask),
        inlier_threshold=1500.0, iterations=512,
    )
    assert int(res.n_inliers) >= n - n_out - 5
    # recovered transform close to truth
    err_t = np.linalg.norm(np.asarray(res.transform)[:3, 3] - T_true[:3, 3])
    assert err_t < 100.0, err_t
    dR = np.asarray(res.transform)[:3, :3].T @ T_true[:3, :3]
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 1.0, ang
    # padded correspondences must never be inliers
    assert not np.asarray(res.inliers)[n:].any()


def test_ransac_sampling_distinct_and_uniform():
    # No duplicate indices within any triple, full range coverage
    # (PCL parity: sampling without replacement, lidar_odometry.cpp:255-261).
    for n in (3, 4, 7, 100):
        draw = np.asarray(
            sample_distinct_triples(jax.random.PRNGKey(n), jnp.int32(n), 4096)
        )
        assert draw.min() >= 0 and draw.max() < n
        assert (draw[:, 0] != draw[:, 1]).all()
        assert (draw[:, 0] != draw[:, 2]).all()
        assert (draw[:, 1] != draw[:, 2]).all()
        # Every index appears (uniformity smoke test).
        assert len(np.unique(draw)) == n


def test_ransac_distinct_sampling_not_worse(rng):
    # Equal iteration budget: distinct-triple sampling must find at least as
    # many inliers as the ground-truth inlier count would allow, even in a
    # tiny candidate set where with-replacement draws waste many hypotheses.
    T_true = _rigid(rng)
    K = 32
    src = np.zeros((K, 3), np.float32)
    dst = np.zeros((K, 3), np.float32)
    cmask = np.zeros(K, bool)
    n = 8  # small valid set: with replacement ~33% of triples are degenerate
    pts = rng.uniform(-20000, 20000, (n, 3)).astype(np.float32)
    src[:n] = pts
    dst[:n] = (T_true[:3, :3] @ pts.T).T + T_true[:3, 3]
    cmask[:n] = True
    res = ransac_rigid(
        jax.random.PRNGKey(3), jnp.asarray(src), jnp.asarray(dst),
        jnp.asarray(cmask), inlier_threshold=1500.0, iterations=64,
    )
    assert int(res.n_inliers) == n


def test_ransac_too_few_correspondences():
    src = jnp.zeros((16, 3))
    dst = jnp.zeros((16, 3))
    cmask = jnp.zeros(16, bool).at[0].set(True).at[1].set(True)
    res = ransac_rigid(jax.random.PRNGKey(1), src, dst, cmask, 1500.0, iterations=32)
    np.testing.assert_allclose(np.asarray(res.transform), np.eye(4))
    assert int(res.n_inliers) == 0


def test_icp_converges_from_offset(rng):
    # Small perturbation from truth must be recovered by ICP.
    T_true = _rigid(rng, max_angle=0.06, max_t=300.0)
    n, M = 200, 256
    pts = rng.uniform(-15000, 15000, (n, 3)).astype(np.float32)
    dst = np.zeros((M, 3), np.float32)
    dst[:n] = (T_true[:3, :3] @ pts.T).T + T_true[:3, 3]
    dst_mask = np.zeros(M, bool)
    dst_mask[:n] = True
    src_mask = np.ones(n, bool)

    res = icp_point_to_point(
        jnp.asarray(pts), jnp.asarray(src_mask), jnp.asarray(dst), jnp.asarray(dst_mask),
        iterations=15,
    )
    T = np.asarray(res.transform)
    np.testing.assert_allclose(T, T_true, atol=25.0, rtol=5e-3)
    assert float(res.rmse) < 50.0


def test_icp_identity_when_aligned(rng):
    pts = rng.uniform(-10000, 10000, (100, 3)).astype(np.float32)
    m = np.ones(100, bool)
    res = icp_point_to_point(jnp.asarray(pts), jnp.asarray(m), jnp.asarray(pts), jnp.asarray(m), iterations=5)
    np.testing.assert_allclose(np.asarray(res.transform), np.eye(4), atol=0.5)
    assert float(res.rmse) < 5.0  # f32 cancellation in the matmul d2 expansion
