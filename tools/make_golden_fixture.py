#!/usr/bin/env python
"""Regenerate the committed golden-trajectory regression fixture.

Renders a deterministic synthetic sequence, encodes it to a real PCAP
(through the same Velodyne wire format the reference consumes,
VelodyneCapture.h:89-110), runs the SLAM engine on CPU over the decoded
sweeps, and writes

    tests/fixtures/golden.pcap         the input capture
    tests/fixtures/golden_traj.txt     the trajectory (whitespace xyz text,
                                       the reference Save_Traj format,
                                       odometry_test.cpp:348-361)
    tests/fixtures/golden_gt.txt       ray-cast ground-truth positions

tests/test_golden_trajectory.py replays the PCAP and asserts ATE against
both files — the regression analog of the reference's Load_Traj overlay
(odometry_test.cpp:257-263).  Rerun this tool ONLY when an intentional
algorithm change shifts the trajectory; commit the new fixtures with the
change that caused them.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

FIXTURE_DIR = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    "tests", "fixtures",
)

N_FRAMES = 8
SEED = 11


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from bshot_slam_tpu.io import pcap, synthetic, velodyne
    from bshot_slam_tpu.odometry.engine import SlamEngine
    from bshot_slam_tpu.utils import trajectory as traj_io
    from tests.test_odometry_e2e import small_cfg

    cfg = small_cfg()
    # Render one extra frame: the decoder needs the next sweep's azimuth
    # wrap to close the previous one, so the trailing sweep never emerges.
    sweeps, gt = synthetic.render_sequence(
        N_FRAMES + 1, cfg.sensor, step_mm=300.0, noise_mm=10.0, seed=SEED,
        n_firings=cfg.sensor.n_azimuth,
    )
    _os.makedirs(FIXTURE_DIR, exist_ok=True)
    pcap_path = _os.path.join(FIXTURE_DIR, "golden.pcap")
    pcap.write_udp_payloads(pcap_path, velodyne.encode_packets(sweeps, cfg.sensor))

    # Replay through the decode path exactly as the test will.
    payloads, _ = pcap.read_udp_payloads(pcap_path)
    decoded = velodyne.sweeps_from_payloads(payloads, cfg.sensor)
    assert len(decoded) == N_FRAMES, len(decoded)
    gt = gt[:N_FRAMES]
    eng = SlamEngine(cfg, seed=0, tile=1024)
    for sw in decoded:
        eng.process_sweep(sw)

    traj_io.save_xyz(_os.path.join(FIXTURE_DIR, "golden_traj.txt"),
                     eng.trajectory)
    gt_rel = np.linalg.inv(gt[0])[None] @ gt
    traj_io.save_xyz(_os.path.join(FIXTURE_DIR, "golden_gt.txt"),
                     gt_rel[:, :3, 3])

    from bshot_slam_tpu.utils.metrics import ate_rmse

    err = ate_rmse(eng.trajectory, gt_rel[:, :3, 3], align=False)
    path_len = float(
        np.linalg.norm(np.diff(gt_rel[:, :3, 3], axis=0), axis=1).sum()
    )
    print(f"fixtures -> {FIXTURE_DIR}")
    print(f"gold ATE vs GT: {err:.1f} mm over {path_len:.0f} mm path "
          f"({100 * err / path_len:.1f}%)")
    return 0


if __name__ == "__main__":
    _sys.exit(main())
