"""Pallas neighborhood kernels cross-checked against the lax.scan path.

The kernels only run natively on TPU; here they run in Pallas interpret
mode on CPU so the tile-skip logic and accumulation math are covered by
the regular suite.
"""

import jax.numpy as jnp
import numpy as np
import pytest


from bshot_slam_tpu.config import KeypointConfig
from bshot_slam_tpu.kernels.neighborhood import (
    neighborhood_accumulate,
    segratio_accumulate,
)
from bshot_slam_tpu.ops import keypoints as kp


@pytest.fixture
def rng():
    return np.random.default_rng(55)


@pytest.fixture
def cloud(rng):
    n = 700
    pts = rng.normal(0, 4000, (n, 3)).astype(np.float32)
    mask = np.zeros(n, bool)
    mask[:517] = True  # front-compacted, not tile-aligned
    pts[~mask] = 0.0
    return jnp.asarray(pts), jnp.asarray(mask)


def _moments_feat(pts):
    prods = jnp.stack(
        [
            pts[:, 0] * pts[:, 0], pts[:, 0] * pts[:, 1],
            pts[:, 0] * pts[:, 2], pts[:, 1] * pts[:, 1],
            pts[:, 1] * pts[:, 2], pts[:, 2] * pts[:, 2],
        ],
        axis=-1,
    )
    feat = jnp.zeros((pts.shape[0], 128), jnp.float32)
    return feat.at[:, 0].set(1.0).at[:, 1:4].set(pts).at[:, 4:10].set(prods)


def test_accumulate_matches_scan(cloud):
    pts, mask = cloud
    radius = 3000.0
    acc = neighborhood_accumulate(
        pts, mask, _moments_feat(pts), radius, interpret=True
    )
    cnt_ref, psum_ref, outer_ref = kp.neighborhood_moments(
        pts, mask, radius, tile=256
    )
    np.testing.assert_allclose(np.asarray(acc[:, 0]), np.asarray(cnt_ref),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(acc[:, 1:4]), np.asarray(psum_ref),
                               rtol=1e-5, atol=1e-2)
    o6 = np.asarray(acc[:, 4:10])
    ref = np.asarray(outer_ref)
    np.testing.assert_allclose(o6[:, 0], ref[:, 0, 0], rtol=1e-4, atol=100.0)
    np.testing.assert_allclose(o6[:, 4], ref[:, 1, 2], rtol=1e-4, atol=100.0)


def test_accumulate_all_masked(cloud):
    pts, _ = cloud
    mask = jnp.zeros(pts.shape[0], bool)
    acc = neighborhood_accumulate(
        pts, mask, _moments_feat(pts), 3000.0, interpret=True
    )
    assert not np.asarray(acc).any()


@pytest.mark.parametrize("sr_type", ["CV", "CVS", "CVSN"])
def test_segratio_matches_scan(cloud, sr_type):
    pts, mask = cloud
    cfg = KeypointConfig(sr_type=sr_type)
    cnt, psum, _ = kp.neighborhood_moments(pts, mask, cfg.radius_mm, tile=256)
    ctvec = pts - psum / jnp.maximum(cnt, 1.0)[:, None]
    acc = segratio_accumulate(
        pts, mask, ctvec, cfg.radius_mm,
        normalized=(sr_type == "CVSN"), interpret=True,
    )
    scores_pallas = kp._finalize_scores(
        pts, mask, cfg, cnt, acc[:, 0], acc[:, 1], acc[:, 2]
    )
    scores_scan = kp.seg_ratio_scores(pts, mask, cfg, tile=256,
                                      moments=(cnt, psum))
    a, b = np.asarray(scores_pallas), np.asarray(scores_scan)
    finite = np.isfinite(a) | np.isfinite(b)
    np.testing.assert_array_equal(np.isfinite(a), np.isfinite(b))
    np.testing.assert_allclose(a[np.isfinite(a)], b[np.isfinite(b)],
                               rtol=1e-4, atol=1e-4)
    assert finite.sum() > 100


def test_aabb_pruning_two_far_clusters():
    """Tile-AABB pruning must not change results when valid points form
    widely separated clusters (the prune-heavy case)."""
    import jax.numpy as jnp

    from bshot_slam_tpu.kernels.neighborhood import neighborhood_accumulate

    rng = np.random.default_rng(11)
    n = 1536
    pts = np.zeros((n, 3), np.float32)
    pts[: n // 2] = rng.uniform(0, 2000, (n // 2, 3))
    pts[n // 2:] = rng.uniform(50000, 52000, (n // 2, 3))
    mask = np.ones(n, bool)
    mask[rng.integers(0, n, 100)] = False
    feat = np.zeros((n, 128), np.float32)
    feat[:, 0] = 1.0
    feat[:, 1:4] = pts
    out = neighborhood_accumulate(
        jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(feat), 800.0,
        interpret=True,
    )
    # Oracle in float64; rows with any pair within f32 rounding slop of the
    # radius boundary are excluded (at 50 m coordinates the kernel's
    # |q|^2+|p|^2-2qp expansion rounds the boundary by ~1 mm).  What this
    # test isolates is the AABB prune: a wrongly pruned tile would zero
    # entire 1024-row spans, not nudge boundary counts.
    p64 = pts.astype(np.float64)
    d2 = ((p64[:, None, :] - p64[None, :, :]) ** 2).sum(-1)
    within = (d2 <= 800.0**2) & mask[None, :] & mask[:, None]
    cnt = within.sum(1)
    got = np.asarray(out)[:, 0]
    # A wrongly pruned tile would wipe ~all of a row's ~170 neighbors;
    # boundary rounding only perturbs counts by a few.
    assert np.abs(got - cnt).max() <= 5
    psum = within.astype(np.float64) @ p64
    rel = np.linalg.norm(np.asarray(out)[:, 1:4] - psum, axis=1) / np.maximum(
        np.linalg.norm(psum, axis=1), 1.0
    )
    assert rel.max() < 0.05
