"""Per-stage device timing of the fused odometry step.

Times each stage of `odometry_step` (feature sweep, SHOT descriptors,
matching+RANSAC+ICP, map insert) as its own fenced jit over a realistic
cloud and a prefilled >=64k-landmark map, so kernel optimization targets
the measured hot spot instead of a guess.  Each stage is timed over
`--iters` repeats with a scalar-fetch fence (block_until_ready can return
early through the axon remote tunnel).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/run_stage_bench.py
"""

from __future__ import annotations

import argparse
import functools
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--bucket", type=int, default=16384)
    ap.add_argument("--prefill", type=int, default=65536)
    ap.add_argument("--tile", type=int, default=2048)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bshot_slam_tpu.utils.profiling import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    from bshot_slam_tpu.config import default_config
    from bshot_slam_tpu.io import synthetic
    from bshot_slam_tpu.odometry import pipeline
    from bshot_slam_tpu.ops import preprocess as pp
    from bshot_slam_tpu.ops.rangeimage import build_range_image

    cfg = default_config()
    sweeps, _ = synthetic.render_sequence(
        2, cfg.sensor, step_mm=400.0, noise_mm=20.0, seed=0,
        n_firings=cfg.sensor.n_azimuth,
    )
    ri = build_range_image(sweeps[0], cfg.sensor)
    res = pp.preprocess(
        jnp.asarray(ri.range_mm), jnp.asarray(ri.azimuth_rad),
        jnp.asarray(ri.vert_rad), cfg.preprocess,
    )
    pts, pmask = pp.extract_cloud(
        res, jnp.asarray(ri.selected), cfg.preprocess.max_points
    )
    pts, pmask = pts[: args.bucket], pmask[: args.bucket]
    n_valid = int(jnp.sum(pmask))

    # Prefilled map state (same construction as bench.py)
    import importlib.util as _ilu
    import pathlib

    spec = _ilu.spec_from_file_location(
        "bench", pathlib.Path(__file__).resolve().parents[1] / "bench.py"
    )
    bench = _ilu.module_from_spec(spec)
    spec.loader.exec_module(bench)
    state = pipeline.init_state(cfg)._replace(
        map=bench._prefilled_map(cfg, cfg.map.capacity)
    )
    key = jax.random.PRNGKey(0)

    feats_fn = jax.jit(
        functools.partial(pipeline.compute_features, cfg=cfg, tile=args.tile)
    )
    feats = feats_fn(pts, pmask)

    @jax.jit
    def match_fn(key, feats, state):
        out = pipeline._match_and_estimate(key, feats, state, cfg)
        return out[0], out[1].n_inliers

    @jax.jit
    def insert_fn(state, feats, T):
        from bshot_slam_tpu.geometry import se3
        from bshot_slam_tpu.odometry import mapstore

        wkp = se3.apply(T, feats.keypoints)
        m = mapstore.insert_keypoints(
            state.map, wkp, feats.descriptors, feats.scores, feats.mask,
            cfg.map, frame_idx=state.frame_idx,
        )
        return m.cursor

    @functools.partial(jax.jit, static_argnames=())
    def preprocess_fn(rng_mm, az, vert, sel):
        r = pp.preprocess(rng_mm, az, vert, cfg.preprocess)
        p, m = pp.extract_cloud(r, sel, cfg.preprocess.max_points)
        return jnp.sum(m.astype(jnp.int32))

    def fence(x):
        # Fetch one scalar element per leaf: block_until_ready alone can
        # return early through the axon remote tunnel.
        for leaf in jax.tree_util.tree_leaves(x):
            np.asarray(jnp.ravel(leaf)[0])

    def timeit(name, fn, *a):
        out = fn(*a)  # compile
        fence(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        fence(out)
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        return name, dt

    T0, _ = match_fn(key, feats, state)
    rows = [
        timeit(
            "preprocess+extract",
            preprocess_fn,
            jnp.asarray(ri.range_mm), jnp.asarray(ri.azimuth_rad),
            jnp.asarray(ri.vert_rad), jnp.asarray(ri.selected),
        ),
        timeit("features(SR+normals+SHOT+BSHOT)", feats_fn, pts, pmask),
        timeit("match+RANSAC+ICP", match_fn, key, feats, state),
        timeit("map insert", insert_fn, state, feats, T0),
    ]
    total = sum(r[1] for r in rows)
    for name, dt in rows:
        print(f"{name:34s} {dt:8.2f} ms  ({100 * dt / total:4.1f}%)")
    print(
        json.dumps(
            {
                "bucket": args.bucket,
                "n_valid": n_valid,
                "prefill": args.prefill,
                "stages_ms": {n: round(d, 3) for n, d in rows},
                "total_ms": round(total, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
