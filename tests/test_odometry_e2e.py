"""End-to-end odometry on a synthetic sequence (CPU, tiny shapes).

The closest thing the reference has is its interactive trajectory overlay
(odometry_test.cpp:257-263); here we assert ATE against ray-cast ground
truth.
"""

import numpy as np
import pytest

from bshot_slam_tpu.config import (
    DescriptorConfig, KeypointConfig, MapConfig, MatchConfig, PreprocessConfig,
    SensorConfig, SlamConfig,
)
from bshot_slam_tpu.io import synthetic
from bshot_slam_tpu.odometry.engine import SlamEngine
from bshot_slam_tpu.utils.metrics import ate_rmse


def small_cfg():
    return SlamConfig(
        sensor=SensorConfig(n_azimuth=512),
        preprocess=PreprocessConfig(max_points=8192),
        keypoints=KeypointConfig(top_k=192),
        descriptor=DescriptorConfig(max_neighbors=96),
        match=MatchConfig(ransac_iterations=512),
        map=MapConfig(capacity=8192),
    )


@pytest.mark.slow
def test_short_sequence_ate():
    cfg = small_cfg()
    # 10 frames / 2.7 m: long enough that the ~130 mm registration noise
    # floor sits well under the 8%-of-path bound, so the assert measures
    # drift rather than the floor.
    n_frames = 10
    sweeps, gt = synthetic.render_sequence(
        n_frames, cfg.sensor, step_mm=300.0, noise_mm=10.0, seed=11,
        n_firings=cfg.sensor.n_azimuth,
    )
    eng = SlamEngine(cfg, seed=0, tile=1024)
    for sw in sweeps:
        rec = eng.process_sweep(sw)
    traj = eng.trajectory
    # SLAM's world frame is the first sensor pose: express GT relative to it.
    gt_rel = np.linalg.inv(gt[0])[None] @ gt
    gt_pos = gt_rel[:, :3, 3]
    err = ate_rmse(traj, gt_pos, align=False)
    total_len = np.linalg.norm(np.diff(gt_pos, axis=0), axis=1).sum()
    # Measured performance is ~4-6% of path length; 8% leaves headroom for
    # numeric drift while still failing on a real quality regression
    # (VERDICT r2 item 5: the old 25% bound let a 6x regression pass).
    assert err < 0.08 * total_len, (err, total_len)
    # Matching must actually engage: inliers above the gate on later frames.
    assert all(r.n_inliers >= 15 for r in eng.records[1:]), [
        r.n_inliers for r in eng.records
    ]
    assert eng.records[-1].map_size > eng.records[0].map_size  # map keeps growing


def test_first_frame_is_identity():
    cfg = small_cfg()
    sweeps, _ = synthetic.render_sequence(
        1, cfg.sensor, seed=3, n_firings=cfg.sensor.n_azimuth
    )
    eng = SlamEngine(cfg, tile=1024)
    rec = eng.process_sweep(sweeps[0])
    np.testing.assert_allclose(rec.pose, np.eye(4), atol=1e-6)
    assert rec.map_size > 0


@pytest.mark.slow
def test_corr_stats_sane():
    """Inlier correspondence stats (reference: lidar_odometry.cpp:304-330):
    nonnegative, median <= mean + SD, and below the RANSAC inlier bound."""
    cfg = small_cfg()
    sweeps, _ = synthetic.render_sequence(
        3, cfg.sensor, step_mm=300.0, noise_mm=10.0, seed=5,
        n_firings=cfg.sensor.n_azimuth,
    )
    eng = SlamEngine(cfg, seed=0, tile=1024)
    for sw in sweeps:
        rec = eng.process_sweep(sw)
    for r in eng.records[1:]:
        if r.n_inliers == 0:
            continue
        mean, sd, median = r.corr_stats
        assert 0 <= median <= mean + sd + 1e-3
        assert np.isfinite(r.corr_stats).all()
        # ICP can move points, but inliers were within the RANSAC threshold
        # pre-refinement; allow 2x slack post-refinement.
        assert median < 2 * cfg.match.ransac_inlier_th_mm


def test_bucketed_step_matches_full_capacity():
    """Slicing the front-compacted cloud to a smaller capacity bucket must
    not change the step result (engine.pick_bucket's correctness premise)."""
    import jax

    from bshot_slam_tpu.odometry import pipeline
    from bshot_slam_tpu.odometry.engine import pick_bucket

    cfg = small_cfg()
    rng = np.random.default_rng(3)
    n = 700
    P = cfg.preprocess.max_points
    pts = np.zeros((P, 3), np.float32)
    pts[:n] = rng.uniform(-15000, 15000, (n, 3)).astype(np.float32)
    pmask = np.zeros(P, bool)
    pmask[:n] = True

    key = jax.random.PRNGKey(0)
    state = pipeline.init_state(cfg)
    _, diag_full = pipeline.odometry_step(
        state, pts, pmask, key, cfg, tile=512
    )
    b = 2048
    assert n <= b < P
    state2 = pipeline.init_state(cfg)
    _, diag_cut = pipeline.odometry_step(
        state2, pts[:b], pmask[:b], key, cfg, tile=512
    )
    np.testing.assert_allclose(
        np.asarray(diag_full.pose), np.asarray(diag_cut.pose), atol=1e-4
    )
    assert int(diag_full.map_size) == int(diag_cut.map_size)


def test_pipelined_engine_matches_sync():
    """Pipelined mode (deferred diagnostics fetch, host/device overlap)
    must produce the identical records, just lagged until flush()."""
    cfg = small_cfg()
    sweeps, _ = synthetic.render_sequence(
        4, cfg.sensor, step_mm=300.0, noise_mm=10.0, seed=11,
        n_firings=cfg.sensor.n_azimuth,
    )
    sync = SlamEngine(cfg, seed=0, tile=1024)
    for sw in sweeps:
        sync.process_sweep(sw)
    pipe = SlamEngine(cfg, seed=0, tile=1024, pipelined=True)
    rets = [pipe.process_sweep(sw) for sw in sweeps]
    assert rets[0] is None  # first call has nothing finalized yet
    assert all(r is not None for r in rets[1:])
    last = pipe.flush()
    assert last is not None and pipe.flush() is None
    assert len(pipe.records) == len(sync.records) == len(sweeps)
    for a, b in zip(pipe.records, sync.records):
        np.testing.assert_allclose(a.pose, b.pose, atol=1e-5)
        assert (a.n_inliers, a.n_mutual, a.map_size, a.gated) == (
            b.n_inliers, b.n_mutual, b.map_size, b.gated
        )


def test_pipelined_batched_fetch_matches_sync():
    """fetch_every > 1 (one stacked diagnostics transfer per K frames) must
    still finalize every frame identically after flush()."""
    cfg = small_cfg()
    sweeps, _ = synthetic.render_sequence(
        5, cfg.sensor, step_mm=300.0, noise_mm=10.0, seed=11,
        n_firings=cfg.sensor.n_azimuth,
    )
    sync = SlamEngine(cfg, seed=0, tile=1024)
    for sw in sweeps:
        sync.process_sweep(sw)
    pipe = SlamEngine(cfg, seed=0, tile=1024, pipelined=True, fetch_every=3)
    for sw in sweeps:
        pipe.process_sweep(sw)
    pipe.flush()
    assert len(pipe.records) == len(sync.records) == len(sweeps)
    for a, b in zip(pipe.records, sync.records):
        np.testing.assert_allclose(a.pose, b.pose, atol=1e-5)
        assert (a.n_inliers, a.map_size) == (b.n_inliers, b.map_size)


def _overflow_sequence(cfg, base=900, spike=2700, n_frames=6, spike_at=3):
    """Range-image sequence whose KEPT-point count SPIKES at `spike_at`
    past the pipelined bucket predictor's 15% headroom, forcing the
    commit-or-abort overflow path.  Every frame has the SAME total return
    count (base frames pad with returns inside the self-car crop box,
    classified out before extraction), so the host-side nnz spike
    predictor cannot foresee it — the spike is classification-driven."""
    rng = np.random.default_rng(7)
    R, A = cfg.sensor.n_rings, cfg.sensor.n_azimuth
    az = np.broadcast_to(
        np.linspace(0, 2 * np.pi, A, endpoint=False, dtype=np.float32), (R, A)
    ).copy()
    # Upper rings only (vertical angle >= 0 after ascending sort — index 23
    # of the HDL-32E LUT) keep the walls off the ground classifier's path;
    # the steepest-down rings host the self-car filler (range 800 mm puts
    # every azimuth inside the crop box, preprocess.cpp:155-157).
    hi_rings = np.arange(23 * R // 32, R)
    lo_rings = np.arange(0, 8)
    frames = []
    for f in range(n_frames):
        n_wall = spike if f == spike_at else base
        r = np.zeros((R, A), np.float32)
        # Structured scene (walls at distinct cells) + per-frame jitter so
        # matching still finds correspondences frame to frame.
        cells = rng.choice(len(hi_rings) * A, n_wall, replace=False)
        ring, col = hi_rings[cells // A], cells % A
        rr = 20000.0 + 8000.0 * np.sin(col * 0.37) + rng.normal(0, 5, n_wall)
        r[ring, col] = rr.astype(np.float32)
        if f != spike_at:
            ccells = rng.choice(len(lo_rings) * A, spike - n_wall,
                                replace=False)
            r[lo_rings[ccells // A], ccells % A] = 800.0
        frames.append((r, az))
    return frames


def test_pipelined_overflow_is_lossless():
    """A count spike past the predicted bucket must NOT drop points: the
    fused step aborts, the engine re-dispatches at the exact bucket, and
    the trajectory/map match the synchronous run (VERDICT r3 item 2; the
    reference emits every kept return, preprocess.cpp:201-216)."""
    import dataclasses

    from bshot_slam_tpu.config import RuntimeConfig

    cfg = dataclasses.replace(
        small_cfg(),
        runtime=RuntimeConfig(cloud_buckets=(1024, 2048, 4096, 8192)),
    )
    frames = _overflow_sequence(cfg)
    vert1d = np.deg2rad(np.sort(np.array(cfg.sensor.vertical_angles_deg)))

    # host_preprocess=False: the overflow machinery only exists on the
    # device-preprocessed fused path (the host path counts exactly).
    sync = SlamEngine(cfg, seed=0, tile=1024, host_preprocess=False)
    for r, az in frames:
        sync.process_range_image(r, az, vert1d)

    pipe = SlamEngine(cfg, seed=0, tile=1024, pipelined=True, fetch_every=4,
                      host_preprocess=False)
    for r, az in frames:
        pipe.process_range_image(r, az, vert1d)
    pipe.flush()

    assert pipe.n_redispatched > 0, "sequence failed to trigger an overflow"
    assert len(pipe.records) == len(sync.records) == len(frames)
    for a, b in zip(pipe.records, sync.records):
        np.testing.assert_allclose(a.pose, b.pose, atol=1e-5)
        assert a.map_size == b.map_size
        assert a.n_inliers == b.n_inliers


def test_host_path_count_spike_is_exact_bucketed():
    """On the default (host-preprocessed) ingest path a count spike needs
    no overflow machinery at all: the kept count is known before dispatch,
    every frame runs at its exact bucket, and pipelined matches sync."""
    import dataclasses

    from bshot_slam_tpu.config import RuntimeConfig

    cfg = dataclasses.replace(
        small_cfg(),
        runtime=RuntimeConfig(cloud_buckets=(1024, 2048, 4096, 8192)),
    )
    frames = _overflow_sequence(cfg)
    vert1d = np.deg2rad(np.sort(np.array(cfg.sensor.vertical_angles_deg)))

    sync = SlamEngine(cfg, seed=0, tile=1024)  # host_preprocess default
    for r, az in frames:
        sync.process_range_image(r, az, vert1d)
    pipe = SlamEngine(cfg, seed=0, tile=1024, pipelined=True, fetch_every=4)
    for r, az in frames:
        pipe.process_range_image(r, az, vert1d)
    pipe.flush()
    assert pipe.n_redispatched == 0  # structurally unreachable here
    assert len(pipe.records) == len(sync.records) == len(frames)
    for a, b in zip(pipe.records, sync.records):
        np.testing.assert_allclose(a.pose, b.pose, atol=1e-5)
        assert a.map_size == b.map_size


def test_pick_bucket_ladder():
    from bshot_slam_tpu.config import default_config
    from bshot_slam_tpu.odometry.engine import pick_bucket

    cfg = default_config()
    assert pick_bucket(100, cfg) == 8192
    assert pick_bucket(8192, cfg) == 8192
    assert pick_bucket(8193, cfg) == 12288
    assert pick_bucket(12289, cfg) == 16384
    assert pick_bucket(10**6, cfg) == cfg.preprocess.max_points


@pytest.mark.slow
def test_vlp16_end_to_end():
    """The full pipeline runs on the 16-ring VLP-16 geometry (reference:
    VelodyneCapture.h:530-566) — sensor config is the only difference."""
    from bshot_slam_tpu.config import VLP16_SENSOR
    import dataclasses

    cfg = small_cfg()
    cfg = dataclasses.replace(
        cfg, sensor=dataclasses.replace(VLP16_SENSOR, n_azimuth=512)
    )
    sweeps, gt = synthetic.render_sequence(
        4, cfg.sensor, step_mm=300.0, noise_mm=10.0, seed=21,
        n_firings=cfg.sensor.n_azimuth,
    )
    eng = SlamEngine(cfg, seed=0, tile=1024)
    for sw in sweeps:
        rec = eng.process_sweep(sw)
    assert all(r.n_inliers >= cfg.match.gate_min_inliers
               for r in eng.records[1:])
    gt_rel = np.linalg.inv(gt[0])[None] @ gt
    err = ate_rmse(eng.trajectory, gt_rel[:, :3, 3], align=False)
    # 16 rings = half the returns of the HDL-32E; allow a looser bound.
    path = np.linalg.norm(np.diff(gt_rel[:, :3, 3], axis=0), axis=1).sum()
    assert err < 0.25 * path, (err, path)
