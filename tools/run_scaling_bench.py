#!/usr/bin/env python
"""Multi-chip scaling benchmark: strong-scaling efficiency of the sharded
SLAM step and the observation-sharded bundle adjustment over a device mesh
(north-star: >=0.7 efficiency at N>=2 — BASELINE.md; the reference is
single-process, SURVEY §2).

Runs the same fixed-size problem over meshes of 1..N devices and reports
  efficiency(N) = T(1) / (N * T(N))

On real multi-chip hardware this measures ICI-collective scaling honestly.
Without it, `--virtual N` forces N virtual CPU devices
(xla_force_host_platform_device_count): the collective/sharding structure
is identical to a TPU slice, but all "devices" share host cores, so treat
virtual efficiency as a correctness/overhead signal, not a speedup claim.

  run_scaling_bench.py --virtual 8 --mesh-sizes 1,2,4,8 --mode both
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import sys
import time


def bench_step(mesh_sizes, repeats: int) -> dict:
    import jax
    import numpy as np

    from bshot_slam_tpu.config import tiny_config
    from bshot_slam_tpu.odometry import pipeline
    from bshot_slam_tpu.parallel.sharded import make_mesh, sharded_odometry_step

    cfg = tiny_config()
    rng = np.random.default_rng(0)
    P = cfg.preprocess.max_points
    pts = np.zeros((P, 3), np.float32)
    pts[: P // 2] = rng.uniform(-20000, 20000, (P // 2, 3))
    pmask = np.zeros(P, bool)
    pmask[: P // 2] = True
    key = jax.random.PRNGKey(0)

    out = {}
    for n in mesh_sizes:
        mesh = make_mesh(jax.devices()[:n])
        step, shard_state = sharded_odometry_step(mesh, cfg, tile=256)
        state = shard_state(pipeline.init_state(cfg))
        state, diag = step(state, pts, pmask, key)  # compile + warm
        jax.block_until_ready(diag.packed)
        t0 = time.perf_counter()
        for _ in range(repeats):
            state, diag = step(state, pts, pmask, key)
        jax.block_until_ready(diag.packed)
        out[n] = (time.perf_counter() - t0) / repeats
    return out


def bench_ba(mesh_sizes, repeats: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bshot_slam_tpu.backend.ba import BAProblem
    from bshot_slam_tpu.parallel.sharded import make_mesh, sharded_ba_solve

    rng = np.random.default_rng(0)
    M, L, OPK = 32, 2048, 256
    poses = np.tile(np.eye(4, dtype=np.float32), (M, 1, 1))
    poses[:, :3, 3] = rng.uniform(-5000, 5000, (M, 3))
    lms = rng.uniform(-30000, 30000, (L, 3)).astype(np.float32)
    obs_kf = np.repeat(np.arange(M, dtype=np.int32), OPK)
    obs_lm = rng.integers(0, L, M * OPK).astype(np.int32)
    obs_p = (lms[obs_lm] - poses[obs_kf][:, :3, 3]
             + rng.normal(0, 20, (M * OPK, 3))).astype(np.float32)
    prob = BAProblem(
        poses=jnp.asarray(poses), landmarks=jnp.asarray(lms),
        obs_kf=jnp.asarray(obs_kf), obs_lm=jnp.asarray(obs_lm),
        obs_p=jnp.asarray(obs_p), obs_mask=jnp.ones(M * OPK, bool),
    )
    out = {}
    for n in mesh_sizes:
        mesh = make_mesh(jax.devices()[:n])
        res = sharded_ba_solve(mesh, prob, gn_iterations=3)  # compile + warm
        jax.block_until_ready(res.poses)
        t0 = time.perf_counter()
        for _ in range(repeats):
            res = sharded_ba_solve(mesh, prob, gn_iterations=3)
        jax.block_until_ready(res.poses)
        out[n] = (time.perf_counter() - t0) / repeats
    return out


def report(name: str, times: dict) -> None:
    t1 = times[min(times)]
    base_n = min(times)
    for n, t in sorted(times.items()):
        eff = (t1 * base_n) / (n * t)
        print(json.dumps({
            "bench": name, "devices": n, "sec_per_iter": round(t, 5),
            "efficiency_vs_smallest": round(eff, 3),
        }))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices (no TPU slice needed)")
    ap.add_argument("--mesh-sizes", default="1,2,4,8")
    ap.add_argument("--mode", choices=["step", "ba", "both"], default="both")
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    if args.virtual:
        _os.environ["XLA_FLAGS"] = (
            _os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    sizes = [int(s) for s in args.mesh_sizes.split(",")]
    sizes = [n for n in sizes if n <= len(jax.devices())]
    print(f"# devices available: {len(jax.devices())} "
          f"({jax.devices()[0].platform}); mesh sizes: {sizes}",
          file=sys.stderr)
    if args.mode in ("step", "both"):
        report("sharded_odometry_step", bench_step(sizes, args.repeats))
    if args.mode in ("ba", "both"):
        report("sharded_ba_solve", bench_ba(sizes, args.repeats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
