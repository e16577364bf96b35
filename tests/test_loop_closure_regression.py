"""Genuine loop-closure regression at DEFAULT gates (VERDICT r4 weak #6).

A deterministic yaw-rate circle long enough to revisit its start: the
backend must detect >=1 verified closure with the UNTOUCHED default
retrieval gates (lc_min_gap=20 keyframes, lc_max_dist_mm=15 m,
lc_min_inliers=25 — config.py BackendConfig), and applying the pose-graph
correction must IMPROVE the trajectory against ray-cast ground truth.
Previously the only genuine revisit->detect->correct validation was a
manual round-1 driver run; forced-gate unit tests kept passing while this
path could rot.
"""

import dataclasses

import numpy as np
import pytest

from bshot_slam_tpu.config import (
    DescriptorConfig, KeypointConfig, MapConfig, MatchConfig,
    PreprocessConfig, SensorConfig, SlamConfig,
)
from bshot_slam_tpu.io import synthetic
from bshot_slam_tpu.odometry.engine import SlamEngine
from bshot_slam_tpu.utils.metrics import ate_rmse


@pytest.mark.slow
def test_circle_revisit_closes_loop_and_improves_ate():
    n = 92  # one full circle + overlap: step 600 mm, yaw 2*pi/88
    cfg = SlamConfig(
        sensor=SensorConfig(n_azimuth=384),
        preprocess=PreprocessConfig(max_points=4096),
        keypoints=KeypointConfig(top_k=128),
        descriptor=DescriptorConfig(max_neighbors=96),
        match=MatchConfig(ransac_iterations=512),
        map=MapConfig(capacity=16384),
        # BackendConfig() stays DEFAULT: the whole point of this test.
    )
    assert cfg.backend.lc_min_gap == 20 and cfg.backend.lc_min_inliers == 25

    sweeps, gt = synthetic.render_sequence(
        n, cfg.sensor, step_mm=600.0, noise_mm=10.0, seed=42,
        n_firings=cfg.sensor.n_azimuth, yaw_rate_rad=2 * np.pi / 88,
    )
    eng = SlamEngine(cfg, seed=0, tile=1024, enable_backend=True)
    for sw in sweeps:
        eng.process_sweep(sw)

    gt_rel = np.linalg.inv(gt[0])[None] @ gt
    gt_pos = gt_rel[:, :3, 3]
    ate_pre = ate_rmse(eng.trajectory, gt_pos, align=False)

    # Enough keyframes accumulated that the default 20-keyframe gap is
    # satisfiable at all (cadence check, not a gate relaxation).
    n_kf = int(eng.keyframes.count)
    assert n_kf > cfg.backend.lc_min_gap, n_kf

    eng.optimize_backend()
    edges = eng.loop_edges
    assert len(edges) >= 1, "no verified loop closure at default gates"
    for e in edges:
        assert abs(e.kf_i - e.kf_j) >= cfg.backend.lc_min_gap
        assert e.n_inliers >= cfg.backend.lc_min_inliers

    eng.apply_backend_corrections()
    ate_post = ate_rmse(eng.trajectory, gt_pos, align=False)
    assert ate_post < ate_pre, (ate_post, ate_pre)
