"""Backend corrections: twist interpolation, map re-anchoring by
frame_born, appearance-based loop-closure retrieval under drift, and the
engine-level apply_backend_corrections wiring."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bshot_slam_tpu.backend import corrections, loop_closure
from bshot_slam_tpu.backend.keyframes import add_keyframe, init_keyframes
from bshot_slam_tpu.config import tiny_config
from bshot_slam_tpu.geometry import se3
from bshot_slam_tpu.odometry import mapstore
from bshot_slam_tpu.odometry.pipeline import FrameFeatures


def _pose(yaw=0.0, t=(0.0, 0.0, 0.0)):
    c, s = np.cos(yaw), np.sin(yaw)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    T[:3, 3] = t
    return T


class TestInterpolateCorrections:
    def test_exact_at_keyframes(self):
        corr_kf = np.stack([
            _pose(0.0, (0, 0, 0)),
            _pose(0.2, (1000, 0, 0)),
            _pose(0.5, (3000, -500, 200)),
        ])
        kf_frames = np.array([0, 4, 10], np.int32)
        out = np.asarray(corrections.interpolate_corrections(
            jnp.asarray(corr_kf), jnp.asarray(kf_frames),
            jnp.asarray(kf_frames),
        ))
        np.testing.assert_allclose(out, corr_kf, atol=1e-3)

    def test_midpoint_is_half_twist(self):
        A = _pose(0.0, (0, 0, 0))
        B = _pose(0.4, (2000, 0, 0))
        out = np.asarray(corrections.interpolate_corrections(
            jnp.asarray(np.stack([A, B])),
            jnp.asarray(np.array([0, 10], np.int32)),
            jnp.asarray(np.array([5], np.int32)),
        ))[0]
        xi = np.asarray(se3.se3_log(jnp.asarray(B @ np.linalg.inv(A))))
        expected = np.asarray(se3.se3_exp(jnp.asarray(0.5 * xi))) @ A
        np.testing.assert_allclose(out, expected, atol=1e-2)

    def test_clamped_outside_span(self):
        A = _pose(0.1, (500, 0, 0))
        B = _pose(0.3, (1500, 0, 0))
        out = np.asarray(corrections.interpolate_corrections(
            jnp.asarray(np.stack([A, B])),
            jnp.asarray(np.array([3, 6], np.int32)),
            jnp.asarray(np.array([0, 9], np.int32)),
        ))
        np.testing.assert_allclose(out[0], A, atol=1e-4)
        np.testing.assert_allclose(out[1], B, atol=1e-4)


class TestReanchorMap:
    def test_landmarks_move_by_birth_frame_correction(self):
        cfg = tiny_config().map
        st = mapstore.init_map(cfg, capacity=64)
        rng = np.random.default_rng(3)
        # Insert two batches born at frames 0 and 1, far apart (no dedup).
        p0 = rng.uniform(-5000, 5000, (4, 3)).astype(np.float32)
        p1 = p0 + 40000.0
        d = rng.integers(0, 2**32, (4, 11), dtype=np.uint32)
        seg = jnp.ones(4)
        m = jnp.ones(4, bool)
        st = mapstore.insert_keypoints(st, jnp.asarray(p0), jnp.asarray(d),
                                       seg, m, cfg, frame_idx=0)
        st = mapstore.insert_keypoints(st, jnp.asarray(p1), jnp.asarray(d),
                                       seg, m, cfg, frame_idx=1)
        corr = np.stack([np.eye(4, dtype=np.float32),
                         _pose(0.0, (1000, 0, 0))]).astype(np.float32)
        out = corrections.reanchor_map(
            st, jnp.asarray(corr), jnp.asarray(0, jnp.int32), cfg
        )
        pos = np.asarray(out.positions)
        born = np.asarray(out.frame_born)
        valid = np.asarray(out.valid)
        snapped0 = np.asarray(mapstore.snap_positions(jnp.asarray(p0),
                                                      cfg.snap_mm))
        snapped1 = np.asarray(mapstore.snap_positions(jnp.asarray(p1),
                                                      cfg.snap_mm))
        # frame-0 landmarks: identity correction
        np.testing.assert_allclose(pos[valid & (born == 0)], snapped0,
                                   atol=cfg.snap_mm)
        # frame-1 landmarks: +1000 mm in x
        exp = snapped1 + np.array([1000.0, 0, 0], np.float32)
        np.testing.assert_allclose(pos[valid & (born == 1)], exp,
                                   atol=cfg.snap_mm)
        # blocks recomputed for the moved rows
        np.testing.assert_array_equal(
            np.asarray(out.blocks)[valid],
            np.asarray(mapstore.block_coords(jnp.asarray(pos[valid]),
                                             cfg.block_size_mm)),
        )
        # empty rows untouched
        assert not np.asarray(out.valid)[np.asarray(out.frame_born) < 0].any()


def _store_with_revisit(cfg, n_kf=8, K=64, drift_mm=2.0e5, seed=0):
    """Keyframe store where kf 0 and kf n-1 see the SAME world points (a true
    loop) but their *estimated* poses have drifted far apart."""
    rng = np.random.default_rng(seed)
    store = init_keyframes(cfg)
    world = rng.uniform(-8000, 8000, (K, 3)).astype(np.float32)
    desc_loop = rng.integers(0, 2**32, (K, 11), dtype=np.uint32)
    T_true0 = _pose(0.0, (0, 0, 0))
    T_trueN = _pose(0.3, (900, -400, 0))  # physically near kf 0
    for i in range(n_kf):
        if i == 0:
            kp = (np.linalg.inv(T_true0)[:3, :3] @ world.T).T \
                + np.linalg.inv(T_true0)[:3, 3]
            desc = desc_loop
            est = T_true0
        elif i == n_kf - 1:
            kp = (np.linalg.inv(T_trueN)[:3, :3] @ world.T).T \
                + np.linalg.inv(T_trueN)[:3, 3]
            desc = desc_loop
            # drifted estimate: far beyond any proximity gate
            est = _pose(0.3, (drift_mm, drift_mm, 0))
        else:
            kp = rng.uniform(-8000, 8000, (K, 3)).astype(np.float32)
            desc = rng.integers(0, 2**32, (K, 11), dtype=np.uint32)
            est = _pose(0.0, (i * 3.0e4, 0, 0))
        store = add_keyframe(
            store, jnp.asarray(est),
            FrameFeatures(
                keypoints=jnp.asarray(kp.astype(np.float32)),
                scores=jnp.ones(K),
                descriptors=jnp.asarray(desc),
                mask=jnp.ones(K, bool),
            ),
            jnp.asarray(i), jnp.full((K,), -1, jnp.int32),
        )
    return store, T_true0, T_trueN


class TestAppearanceLoopClosure:
    def test_retrieval_survives_drift_beyond_proximity_gate(self):
        cfg = tiny_config()
        cfg = dataclasses.replace(
            cfg, backend=dataclasses.replace(
                cfg.backend, lc_min_gap=5, lc_max_dist_mm=15000.0,
                lc_min_inliers=20,
            )
        )
        store, T0, TN = _store_with_revisit(cfg)
        n = int(store.count)
        # Sanity: the proximity channel alone cannot fire (drift >> gate).
        pos = np.asarray(store.poses[:n, :3, 3])
        gap = np.abs(np.arange(n)[:, None] - np.arange(n)[None, :])
        d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
        assert not np.any(
            (d < cfg.backend.lc_max_dist_mm) & (gap >= cfg.backend.lc_min_gap)
        )
        edges = loop_closure.find_loop_closures(
            store, cfg, jax.random.PRNGKey(5), max_candidates=4
        )
        assert len(edges) >= 1, "appearance channel must still retrieve"
        e = edges[0]
        assert {e.kf_i, e.kf_j} == {0, n - 1}
        # Verified measurement must match the TRUE relative pose.
        z_true = np.linalg.inv(TN) @ T0 if e.kf_i == n - 1 else \
            np.linalg.inv(T0) @ TN
        err = np.linalg.inv(e.z) @ z_true
        assert np.linalg.norm(err[:3, 3]) < 200.0

    def test_bow_similarity_ranks_same_place_first(self):
        cfg = tiny_config()
        store, _, _ = _store_with_revisit(cfg)
        bow = np.asarray(loop_closure.keyframe_bow(store))
        n = int(store.count)
        sim = bow[:n] @ bow[:n].T
        assert sim[0, n - 1] > 0.99  # identical descriptor sets
        off = sim[0, 1:n - 1]
        assert sim[0, n - 1] > off.max() + 0.05


class TestEngineCorrections:
    @pytest.fixture(scope="class")
    def engine_run(self):
        from bshot_slam_tpu.io import synthetic
        from bshot_slam_tpu.odometry.engine import SlamEngine
        from tests.test_odometry_e2e import small_cfg

        cfg = small_cfg()
        sweeps, gt = synthetic.render_sequence(
            6, cfg.sensor, step_mm=300.0, noise_mm=10.0, seed=11,
            n_firings=cfg.sensor.n_azimuth,
        )
        eng = SlamEngine(cfg, seed=0, tile=1024, enable_backend=True)
        for sw in sweeps:
            eng.process_sweep(sw)
        return eng

    def test_constant_correction_moves_everything(self, engine_run):
        eng = engine_run
        n_kf = int(eng.keyframes.count)
        assert n_kf >= 2
        dT = _pose(0.05, (500.0, -200.0, 100.0))
        kf_raw = np.asarray(eng.keyframes.poses[:n_kf])
        old_traj = eng.trajectory.copy()
        old_pos = np.asarray(eng.state.map.positions).copy()
        old_ref = np.asarray(eng.state.ref_pose).copy()
        # Pretend the pose graph moved every keyframe by dT.
        eng.optimized_keyframe_poses = (dT[None] @ kf_raw).astype(np.float32)
        summary = eng.apply_backend_corrections()
        # Trajectory: every frame moved by exactly dT (constant twist).
        new_traj = eng.trajectory
        exp = (dT[:3, :3] @ old_traj.T).T + dT[:3, 3]
        np.testing.assert_allclose(new_traj, exp, atol=5.0)
        # Live reference pose corrected.
        np.testing.assert_allclose(
            np.asarray(eng.state.ref_pose), dT @ old_ref, atol=1e-2
        )
        # Landmarks moved by dT (within grid snap).
        valid = np.asarray(eng.state.map.valid)
        born = np.asarray(eng.state.map.frame_born)
        moved = valid & (born >= 0)
        assert summary["n_landmarks_moved"] == int(moved.sum()) > 0
        got = np.asarray(eng.state.map.positions)[moved]
        want = (dT[:3, :3] @ old_pos[moved].T).T + dT[:3, 3]
        assert np.abs(got - want).max() <= eng.cfg.map.snap_mm + 1e-3
        # Keyframe store now carries the optimized poses.
        np.testing.assert_allclose(
            np.asarray(eng.keyframes.poses[:n_kf]),
            dT[None] @ kf_raw, atol=1e-2,
        )
        # A second optimize does not double-correct: corrections ~ identity.
        eng.optimized_keyframe_poses = np.asarray(
            eng.keyframes.poses[:n_kf]
        ).copy()
        s2 = eng.apply_backend_corrections()
        assert s2["max_correction_mm"] < 1.0


@pytest.mark.slow
def test_appearance_channel_on_real_descriptors():
    """On a rendered loop trajectory, loop closures must still be found
    with the proximity channel DISABLED (lc_max_dist_mm=0): retrieval runs
    purely on B-SHOT bag-of-words similarity of real pipeline descriptors."""
    from bshot_slam_tpu.io import synthetic
    from bshot_slam_tpu.odometry.engine import SlamEngine
    from tests.test_odometry_e2e import small_cfg

    n = 12
    cfg = small_cfg()
    cfg = dataclasses.replace(
        cfg,
        backend=dataclasses.replace(
            cfg.backend,
            keyframe_every=1,
            lc_min_gap=8,
            lc_max_dist_mm=0.0,  # proximity channel off
            lc_min_inliers=20,
            lc_appearance_top=4,
        ),
    )
    sweeps, gt = synthetic.render_sequence(
        n, cfg.sensor, step_mm=300.0, noise_mm=10.0, seed=4,
        yaw_rate_rad=2 * np.pi / n, n_firings=cfg.sensor.n_azimuth,
    )
    eng = SlamEngine(cfg, seed=0, tile=1024, enable_backend=True)
    for sw in sweeps:
        eng.process_sweep(sw)
    assert int(eng.keyframes.count) >= n - 1
    _, edges = eng.optimize_backend(max_candidates=6)
    assert len(edges) >= 1, "appearance retrieval found no loop"
    # The verified closure must span the loop (temporally distant pair).
    gaps = [abs(e.kf_i - e.kf_j) for e in edges]
    assert max(gaps) >= 8, gaps
    # And its measurement must be metrically sane: consistent with the
    # ground-truth relative pose of the two keyframes.
    kf_idx = np.asarray(eng.keyframes.frame_idx[: int(eng.keyframes.count)])
    gt_rel = np.linalg.inv(gt[0])[None] @ gt
    e = max(edges, key=lambda e: abs(e.kf_i - e.kf_j))
    z_true = np.linalg.inv(gt_rel[kf_idx[e.kf_i]]) @ gt_rel[kf_idx[e.kf_j]]
    err = np.linalg.inv(e.z) @ z_true
    assert np.linalg.norm(err[:3, 3]) < 500.0
