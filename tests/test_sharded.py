"""Multi-device sharding: the sharded odometry step must agree with the
single-device step (up to f32 reduction order) on an 8-virtual-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bshot_slam_tpu.config import tiny_config
from bshot_slam_tpu.odometry import pipeline
from bshot_slam_tpu.parallel import sharded


def _inputs(cfg, seed=0):
    rng = np.random.default_rng(seed)
    P = cfg.preprocess.max_points
    n = P // 2
    pts = np.zeros((P, 3), np.float32)
    pts[:n] = rng.uniform(-20000, 20000, (n, 3))
    pmask = np.zeros(P, bool)
    pmask[:n] = True
    return jnp.asarray(pts), jnp.asarray(pmask), jax.random.PRNGKey(1)


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_step_matches_single(n_dev):
    cfg = tiny_config()
    pts, pmask, key = _inputs(cfg)

    state1 = pipeline.init_state(cfg)
    s1, d1 = pipeline.odometry_step(state1, pts, pmask, key, cfg, 256)

    mesh = sharded.make_mesh(jax.devices()[:n_dev])
    step, shard_state = sharded.sharded_odometry_step(mesh, cfg, tile=256)
    stateN = shard_state(pipeline.init_state(cfg))
    sN, dN = step(stateN, pts, pmask, key)

    np.testing.assert_allclose(
        np.asarray(dN.pose), np.asarray(d1.pose), atol=1e-3
    )
    assert int(dN.map_size) == int(d1.map_size)
    np.testing.assert_array_equal(
        np.sort(np.asarray(sN.map.seg_ratios[sN.map.valid])),
        np.sort(np.asarray(s1.map.seg_ratios[s1.map.valid])),
    )


def test_sharded_two_frames_progress():
    cfg = tiny_config()
    mesh = sharded.make_mesh(jax.devices()[:4])
    step, shard_state = sharded.sharded_odometry_step(mesh, cfg, tile=256)
    state = shard_state(pipeline.init_state(cfg))
    pts, pmask, key = _inputs(cfg, seed=3)
    state, d0 = step(state, pts, pmask, key)
    pts2, pmask2, key2 = _inputs(cfg, seed=3)
    state, d1 = step(state, pts2, pmask2, key2)
    # same cloud again: pose should stay near identity and matching engage
    assert int(d1.n_mutual) > 5
    t = np.linalg.norm(np.asarray(d1.pose)[:3, 3])
    assert t < 2000.0
    assert int(d1.map_size) >= int(d0.map_size)


def test_sharded_ba_matches_dense():
    """Obs-sharded BA (segment_sum -> psum under GSPMD) must match the
    single-device solve."""
    import numpy as np

    from bshot_slam_tpu.backend import ba
    from bshot_slam_tpu.parallel import sharded
    from tests.test_backend import _ba_problem

    rng = np.random.default_rng(9)
    prob, _, _ = _ba_problem(rng, M=5, L=30)
    dense = ba.ba_solve(prob, gn_iterations=3, cg_iterations=15)
    mesh = sharded.make_mesh(jax.devices()[:8])
    dist = sharded.sharded_ba_solve(mesh, prob, gn_iterations=3,
                                    cg_iterations=15)
    assert float(dist.final_cost) < float(dist.initial_cost)
    np.testing.assert_allclose(np.asarray(dist.poses),
                               np.asarray(dense.poses), rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(dist.landmarks),
                               np.asarray(dense.landmarks), rtol=1e-3,
                               atol=1.0)
