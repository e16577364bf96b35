"""Golden-trajectory regression over a committed PCAP fixture.

The regression analog of the reference's Load_Traj overlay
(odometry_test.cpp:257-263), automated: replay tests/fixtures/golden.pcap
through the full decode -> preprocess -> odometry stack and assert the
trajectory against (a) the committed golden run and (b) ray-cast ground
truth.  A broken matcher, gate, RANSAC, or map path fails here.

Regenerate the fixtures with tools/make_golden_fixture.py only for an
intentional algorithm change, and commit them with that change.
"""

import os

import numpy as np
import pytest

from bshot_slam_tpu.io import pcap, velodyne
from bshot_slam_tpu.odometry.engine import SlamEngine
from bshot_slam_tpu.utils import trajectory as traj_io
from bshot_slam_tpu.utils.metrics import ate_rmse

from tests.test_odometry_e2e import small_cfg

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.mark.slow
def test_golden_pcap_trajectory():
    cfg = small_cfg()
    payloads, _ = pcap.read_udp_payloads(
        os.path.join(FIXTURES, "golden.pcap")
    )
    sweeps = velodyne.sweeps_from_payloads(payloads, cfg.sensor)
    assert len(sweeps) == 8
    eng = SlamEngine(cfg, seed=0, tile=1024)
    for sw in sweeps:
        eng.process_sweep(sw)

    gold = traj_io.load_xyz(os.path.join(FIXTURES, "golden_traj.txt"))
    gt = traj_io.load_xyz(os.path.join(FIXTURES, "golden_gt.txt"))
    traj = eng.trajectory
    assert traj.shape == gold.shape

    # (a) Reproduce the committed run: same seed + same code => tiny drift
    # budget for numeric/library variation only.
    err_gold = ate_rmse(traj, gold, align=False)
    assert err_gold < 60.0, f"trajectory drifted {err_gold:.1f} mm from gold"

    # (b) Absolute quality vs ground truth: <= 8% of path length
    # (VERDICT r2 item 5 tightened this from the old toothless 25%).
    path_len = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
    err_gt = ate_rmse(traj, gt, align=False)
    assert err_gt < 0.08 * path_len, (err_gt, path_len)

    # Matching engaged on every post-initial frame.
    assert all(r.n_inliers >= cfg.match.gate_min_inliers
               for r in eng.records[1:])
