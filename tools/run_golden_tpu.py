"""Quantify TPU-vs-CPU trajectory divergence on the golden PCAP fixture.

The TPU path uses `lax.approx_max_k` (recall 0.95) for keypoint top-k and
SHOT neighbor selection (odometry/pipeline.py compute_features,
ops/shot.py), while the CPU path — where the committed golden fixture and
the whole unit suite run — is exact.  This tool replays the committed
golden PCAP through the engine on whatever backend is live (run it
through the axon tunnel for the real chip), and records the ATE deltas
against the committed CPU gold and the ray-cast ground truth
(VERDICT r3 item 6).  Writes one JSON artifact.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python tools/run_golden_tpu.py --out GOLDEN_TPU_r04.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_sys_path_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _sys_path_root)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="GOLDEN_TPU_r04.json")
    ap.add_argument("--exact-topk", action="store_true",
                    help="force exact lax.top_k (RuntimeConfig.exact_topk) "
                         "instead of approx_max_k")
    args = ap.parse_args()

    from bshot_slam_tpu.utils.profiling import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    import jax
    import numpy as np

    from bshot_slam_tpu.io import pcap, velodyne
    from bshot_slam_tpu.odometry.engine import SlamEngine
    from bshot_slam_tpu.utils import trajectory as traj_io
    from bshot_slam_tpu.utils.metrics import ate_rmse
    from tests.test_odometry_e2e import small_cfg

    import dataclasses

    fixtures = os.path.join(_sys_path_root, "tests", "fixtures")
    cfg = small_cfg()
    if args.exact_topk:
        cfg = dataclasses.replace(
            cfg, runtime=dataclasses.replace(cfg.runtime, exact_topk=True)
        )
    payloads, _ = pcap.read_udp_payloads(os.path.join(fixtures, "golden.pcap"))
    sweeps = velodyne.sweeps_from_payloads(payloads, cfg.sensor)
    eng = SlamEngine(cfg, seed=0, tile=1024)
    for sw in sweeps:
        eng.process_sweep(sw)

    gold = traj_io.load_xyz(os.path.join(fixtures, "golden_traj.txt"))
    gt = traj_io.load_xyz(os.path.join(fixtures, "golden_gt.txt"))
    traj = eng.trajectory
    path_len = float(np.linalg.norm(np.diff(gt, axis=0), axis=1).sum())
    result = {
        "platform": jax.devices()[0].platform,
        "device": getattr(jax.devices()[0], "device_kind", "?"),
        "exact_topk": bool(args.exact_topk),
        "n_frames": len(sweeps),
        "path_len_mm": round(path_len, 1),
        # Divergence of this backend's run from the committed CPU gold —
        # on CPU this is ~0 by construction; on TPU it measures the
        # approx_max_k (recall 0.95) + compiler-math divergence.
        "ate_vs_cpu_gold_mm": round(float(ate_rmse(traj, gold, align=False)), 2),
        "ate_vs_ground_truth_mm": round(float(ate_rmse(traj, gt, align=False)), 2),
        "cpu_gold_ate_vs_ground_truth_mm": round(
            float(ate_rmse(gold, gt, align=False)), 2
        ),
        "min_inliers": int(min(r.n_inliers for r in eng.records[1:])),
    }
    print(json.dumps(result))
    with open(os.path.join(_sys_path_root, args.out), "w") as f:
        f.write(json.dumps(result) + "\n")


if __name__ == "__main__":
    main()
