#!/usr/bin/env python
"""Bundle-adjustment throughput benchmark: GN iterations/sec (north-star
metric in BASELINE.md — the reference has no BA at all; g2o is linked but
never called, reference CMakeLists.txt:86).

Builds a synthetic BA problem (keyframes on a circle observing shared
landmarks), then times `ba_solve` GN iterations end to end (each GN
iteration = Jacobians + Schur reduction + CG solve + back-substitution).

  run_ba_bench.py [--keyframes 64] [--landmarks 4096] [--obs-per-kf 512]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--keyframes", type=int, default=64)
    ap.add_argument("--landmarks", type=int, default=4096)
    ap.add_argument("--obs-per-kf", type=int, default=512)
    ap.add_argument("--gn-iters", type=int, default=10)
    ap.add_argument("--cg-iters", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bshot_slam_tpu.backend.ba import BAProblem, ba_solve
    from bshot_slam_tpu.utils.profiling import fence

    rng = np.random.default_rng(0)
    M, L, OPK = args.keyframes, args.landmarks, args.obs_per_kf

    poses = np.tile(np.eye(4, dtype=np.float32), (M, 1, 1))
    for i in range(M):
        th = 2 * np.pi * i / M
        c, s = np.cos(th), np.sin(th)
        poses[i, :3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        poses[i, :3, 3] = [30000 * (1 - c), 30000 * s, 0]
    lms = rng.uniform(-60000, 60000, (L, 3)).astype(np.float32)

    obs_kf = np.repeat(np.arange(M, dtype=np.int32), OPK)
    obs_lm = rng.integers(0, L, M * OPK).astype(np.int32)
    Tinv = np.linalg.inv(poses)
    p_s = (
        np.einsum("oij,oj->oi", Tinv[obs_kf, :3, :3], lms[obs_lm])
        + Tinv[obs_kf, :3, 3]
    )
    p_s += rng.normal(0, 10.0, p_s.shape)

    noisy_poses = poses.copy()
    noisy_poses[:, :3, 3] += rng.normal(0, 200.0, (M, 3))
    prob = BAProblem(
        poses=jnp.asarray(noisy_poses),
        landmarks=jnp.asarray(lms + rng.normal(0, 300.0, (L, 3)).astype(np.float32)),
        obs_kf=jnp.asarray(obs_kf),
        obs_lm=jnp.asarray(obs_lm),
        obs_p=jnp.asarray(p_s.astype(np.float32)),
        obs_mask=jnp.ones(M * OPK, bool),
    )

    solve = lambda: ba_solve(prob, gn_iterations=args.gn_iters,
                             cg_iterations=args.cg_iters)
    res = solve()
    fence(res)  # compile + settle
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        res = solve()
        fence(res)
    dt = (time.perf_counter() - t0) / reps
    iters_per_sec = args.gn_iters / dt
    print(json.dumps({
        "metric": "ba_gn_iters_per_sec",
        "value": round(iters_per_sec, 2),
        "unit": "GN iters/s",
        "keyframes": M, "landmarks": L, "observations": M * OPK,
        "cg_iters_per_gn": args.cg_iters,
        "cost_reduction": round(float(res.initial_cost / max(res.final_cost, 1e-9)), 1),
    }))
    print(f"# platform={jax.devices()[0].platform}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
