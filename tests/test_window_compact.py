"""Window-compacted candidate sets: compact-vs-dense equivalence.

The step's matching / ICP / insert-dedup may gather the map rows whose
voxel block intersects the query AABB into a bounded compact buffer
(RuntimeConfig.window_cap) instead of scanning the whole capacity — the
TPU analog of the reference iterating only window blocks
(reference: mymap.cpp:28-74).  These tests pin the invariants:

  * compact results are IDENTICAL to the dense full-capacity scan,
  * window overflow falls back to the dense scan (lossless),
  * corr_index stays in the full-map index space (BA semantics).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from bshot_slam_tpu.config import RuntimeConfig, tiny_config
from bshot_slam_tpu.odometry import mapstore, pipeline


def _cfg(window_cap=256, window_compact=True):
    cfg = tiny_config()
    return dataclasses.replace(
        cfg,
        runtime=dataclasses.replace(
            cfg.runtime, window_cap=window_cap, window_compact=window_compact
        ),
    )


def _prefill(state, rng, n_near, n_far, cfg):
    """Append n_near landmarks near the origin (in the 100 m query window)
    and n_far landmarks far outside it, descriptors random."""
    near = rng.uniform(-20000, 20000, (n_near, 3))
    far = rng.uniform(1.9e6, 2.1e6, (n_far, 3))
    pos = np.concatenate([near, far]).astype(np.float32)
    rng.shuffle(pos)
    n = n_near + n_far
    pos = np.trunc(pos / cfg.map.snap_mm) * cfg.map.snap_mm
    cur = int(state.map.cursor)
    m = state.map
    m = m._replace(
        positions=m.positions.at[cur:cur + n].set(jnp.asarray(pos)),
        descriptors=m.descriptors.at[cur:cur + n].set(
            jnp.asarray(rng.integers(0, 2**32, (n, 11), dtype=np.uint32))
        ),
        seg_ratios=m.seg_ratios.at[cur:cur + n].set(
            jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
        ),
        blocks=m.blocks.at[cur:cur + n].set(
            jnp.asarray(
                np.round(pos / cfg.map.block_size_mm).astype(np.int32)
            )
        ),
        valid=m.valid.at[cur:cur + n].set(True),
        frame_born=m.frame_born.at[cur:cur + n].set(0),
        cursor=jnp.asarray(cur + n, jnp.int32),
    )
    return state._replace(map=m)


def _prepped_state_and_cloud(cfg, n_near, n_far, seed=0):
    """State after one real frame (so ref features are live), prefilled
    with extra landmarks, plus a second-frame cloud."""
    rng = np.random.default_rng(seed)
    P = cfg.preprocess.max_points
    n = P // 2
    pts = np.zeros((P, 3), np.float32)
    pts[:n] = rng.uniform(-15000, 15000, (n, 3))
    pmask = np.zeros(P, bool)
    pmask[:n] = True
    state = pipeline.init_state(cfg)
    key = jax.random.PRNGKey(seed)
    key, sub = jax.random.split(key)
    state, _ = pipeline.odometry_step(state, pts, pmask, sub, cfg, 256)
    state = _prefill(state, rng, n_near, n_far, cfg)
    # Second frame: the first cloud slightly shifted (real correspondences).
    pts2 = pts.copy()
    pts2[:n] += rng.normal(0, 5, (n, 3)).astype(np.float32) + np.array(
        [300.0, 0, 0], np.float32
    )
    _, sub2 = jax.random.split(key)
    return state, pts2, pmask, sub2


def _run_pair(n_near, n_far, window_cap):
    cden = _cfg(window_cap=window_cap, window_compact=False)
    ccmp = _cfg(window_cap=window_cap, window_compact=True)
    state, pts, pmask, sub = _prepped_state_and_cloud(cden, n_near, n_far)
    state2 = jax.tree.map(jnp.copy, state)
    sd, dd = pipeline.odometry_step(state, pts, pmask, sub, cden, 256)
    sc, dc = pipeline.odometry_step(state2, pts, pmask, sub, ccmp, 256)
    return (sd, dd), (sc, dc)


def _assert_equal(dense, compact):
    (sd, dd), (sc, dc) = dense, compact
    np.testing.assert_allclose(
        np.asarray(dd.pose), np.asarray(dc.pose), atol=1e-5
    )
    assert int(dd.n_mutual) == int(dc.n_mutual)
    assert int(dd.n_inliers) == int(dc.n_inliers)
    assert int(dd.map_size) == int(dc.map_size)
    np.testing.assert_array_equal(
        np.asarray(dd.corr_index), np.asarray(dc.corr_index)
    )
    np.testing.assert_array_equal(
        np.asarray(dd.corr_inlier), np.asarray(dc.corr_inlier)
    )
    assert int(sd.map.cursor) == int(sc.map.cursor)
    np.testing.assert_allclose(
        np.asarray(sd.map.positions), np.asarray(sc.map.positions), atol=0
    )
    np.testing.assert_allclose(
        np.asarray(dd.corr_stats), np.asarray(dc.corr_stats), atol=1e-4
    )


def test_compact_matches_dense():
    """Window fits the cap: compact path must equal the dense scan exactly
    (same NN minima, same lowest-index tie-breaks, same inserts)."""
    _assert_equal(*_run_pair(n_near=150, n_far=600, window_cap=256))


def test_compact_overflow_falls_back_to_dense():
    """More in-window rows than window_cap: the lax.cond must take the
    dense branch — results again identical, nothing dropped."""
    _assert_equal(*_run_pair(n_near=400, n_far=200, window_cap=256))


def test_compact_disabled_when_capacity_small():
    """capacity <= window_cap statically disables compaction (the dense
    path is the only one compiled) — sanity: results equal dense config."""
    _assert_equal(*_run_pair(n_near=100, n_far=100, window_cap=8192))


def test_insert_dedup_compact_matches_dense():
    """insert_keypoints with window_cap compacts dedup candidates to the
    new batch's block AABB; accept/reject decisions must be unchanged."""
    cfg = tiny_config()
    rng = np.random.default_rng(4)
    state = pipeline.init_state(cfg)
    state = _prefill(state, rng, n_near=300, n_far=500, cfg=cfg)
    m = state.map
    K = 64
    # Half the batch lands exactly on existing near landmarks (dedup
    # rejects when the incumbent's seg_ratio wins), half is fresh.
    exist = np.asarray(m.positions[:K // 2])
    fresh = rng.uniform(-20000, 20000, (K - K // 2, 3)).astype(np.float32)
    pos = np.concatenate([exist + rng.normal(0, 300, exist.shape), fresh])
    seg = rng.uniform(0, 1, K).astype(np.float32)
    desc = rng.integers(0, 2**32, (K, 11), dtype=np.uint32)
    kmask = np.ones(K, bool)
    kmask[-3:] = False

    dense = mapstore.insert_keypoints(
        jax.tree.map(jnp.copy, m), jnp.asarray(pos.astype(np.float32)),
        jnp.asarray(desc), jnp.asarray(seg), jnp.asarray(kmask), cfg.map,
        frame_idx=7,
    )
    compact = mapstore.insert_keypoints(
        jax.tree.map(jnp.copy, m), jnp.asarray(pos.astype(np.float32)),
        jnp.asarray(desc), jnp.asarray(seg), jnp.asarray(kmask), cfg.map,
        frame_idx=7, window_cap=256,
    )
    assert int(dense.cursor) == int(compact.cursor)
    np.testing.assert_array_equal(
        np.asarray(dense.valid), np.asarray(compact.valid)
    )
    np.testing.assert_allclose(
        np.asarray(dense.positions), np.asarray(compact.positions), atol=0
    )
    np.testing.assert_array_equal(
        np.asarray(dense.frame_born), np.asarray(compact.frame_born)
    )


def test_insert_dedup_compact_overflow_falls_back():
    """A batch whose block AABB covers more map rows than window_cap must
    fall back to the dense dedup (identical decisions)."""
    cfg = tiny_config()
    rng = np.random.default_rng(5)
    state = pipeline.init_state(cfg)
    state = _prefill(state, rng, n_near=500, n_far=100, cfg=cfg)
    m = state.map
    K = 32
    pos = rng.uniform(-20000, 20000, (K, 3)).astype(np.float32)
    seg = rng.uniform(0, 1, K).astype(np.float32)
    desc = rng.integers(0, 2**32, (K, 11), dtype=np.uint32)
    kmask = np.ones(K, bool)
    dense = mapstore.insert_keypoints(
        jax.tree.map(jnp.copy, m), jnp.asarray(pos), jnp.asarray(desc),
        jnp.asarray(seg), jnp.asarray(kmask), cfg.map,
    )
    compact = mapstore.insert_keypoints(
        jax.tree.map(jnp.copy, m), jnp.asarray(pos), jnp.asarray(desc),
        jnp.asarray(seg), jnp.asarray(kmask), cfg.map, window_cap=64,
    )
    assert int(dense.cursor) == int(compact.cursor)
    np.testing.assert_array_equal(
        np.asarray(dense.valid), np.asarray(compact.valid)
    )
