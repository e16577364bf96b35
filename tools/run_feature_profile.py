"""Attribute the features stage (SR + normals + SHOT + B-SHOT) to its
sub-stages on the real device — the instrument for closing the roofline
gap (VERDICT r4 weak #4: the stage bench showed features at ~0.4% MFU but
nothing said WHERE the non-roofline time goes).

Each sub-stage is timed as its own fenced jit over the same inputs the
fused stage sees; the fused total is timed too, so fusion savings /
dispatch overheads are visible as (sum of parts) - whole.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       python tools/run_feature_profile.py [--bucket 16384] [--iters 20]
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--bucket", type=int, default=16384)
    ap.add_argument("--tile", type=int, default=2048)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bshot_slam_tpu.utils.profiling import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    from bshot_slam_tpu.config import default_config
    from bshot_slam_tpu.io import synthetic
    from bshot_slam_tpu.odometry import pipeline
    from bshot_slam_tpu.ops import bshot as bshot_mod
    from bshot_slam_tpu.ops import shot as shot_mod
    from bshot_slam_tpu.ops.keypoints import (
        neighborhood_moments, seg_ratio_scores,
    )
    from bshot_slam_tpu.ops.normals import normals_from_moments
    from bshot_slam_tpu.ops.preprocess_host import (
        extract_cloud_host, preprocess_host,
    )
    from bshot_slam_tpu.ops.rangeimage import build_range_image

    cfg = default_config()
    sweeps, _ = synthetic.render_sequence(
        2, cfg.sensor, step_mm=400.0, noise_mm=20.0, seed=0,
        n_firings=cfg.sensor.n_azimuth,
    )
    ri = build_range_image(sweeps[0], cfg.sensor)
    classes, xyz, valid = preprocess_host(
        ri.range_mm, ri.azimuth_rad, ri.vert_rad, cfg.preprocess
    )
    pts_c, nv = extract_cloud_host(
        classes, xyz, valid, None, cfg.preprocess.max_points
    )
    b = args.bucket
    pts = np.zeros((b, 3), np.float32)
    pts[: min(nv, b)] = pts_c[:b]
    pmask = np.zeros(b, bool)
    pmask[: min(nv, b)] = True
    pts_j, pm_j = jnp.asarray(pts), jnp.asarray(pmask)

    radius = cfg.keypoints.radius_mm
    tile = args.tile
    K = cfg.keypoints.top_k
    chunks = cfg.runtime.topk_chunks

    moments_fn = jax.jit(
        lambda p, m: neighborhood_moments(p, m, radius, tile)
    )
    cnt, psum, outer = moments_fn(pts_j, pm_j)

    def _scores(p, m, c, s):
        return seg_ratio_scores(p, m, cfg.keypoints, tile, moments=(c, s))

    scores_fn = jax.jit(_scores)
    scores = scores_fn(pts_j, pm_j, cnt, psum)

    topk_fn = jax.jit(
        lambda s: shot_mod.chunked_top_k(s, K, chunks, cfg.runtime.exact_topk)
    )
    top_scores, top_idx = topk_fn(scores)

    normals_fn = jax.jit(
        lambda p, m, c, s, o: normals_from_moments(p, m, c, s, o)[0]
    )
    normals = normals_fn(pts_j, pm_j, cnt, psum, outer)

    kmask = jnp.isfinite(top_scores)
    kps = jnp.where(kmask[:, None], pts_j[top_idx], 0.0)

    gather_fn = jax.jit(
        functools.partial(
            shot_mod.gather_neighbors,
            radius=cfg.descriptor.shot_radius_mm,
            max_neighbors=cfg.descriptor.max_neighbors,
            exact=cfg.runtime.exact_topk, topk_chunks=chunks,
        )
    )
    g = gather_fn(kps, kmask, pts_j, pm_j, normals)

    def _hist(kps, kmask, g):
        # shot_descriptors minus the neighbor gather: LRF + quadrilinear
        # histogram + normalization (everything after gather_neighbors).
        frames, lrf_valid = shot_mod.local_reference_frames(
            g, cfg.descriptor.shot_radius_mm
        )
        return frames.sum(), lrf_valid.sum()

    lrf_fn = jax.jit(_hist)

    shot_fn = jax.jit(
        functools.partial(
            shot_mod.shot_descriptors.__wrapped__, cfg=cfg.descriptor,
            exact_topk=cfg.runtime.exact_topk, topk_chunks=chunks,
        )
    )
    desc, dvalid = shot_fn(kps, kmask, pts_j, pm_j, normals)

    bshot_fn = jax.jit(
        functools.partial(bshot_mod.bshot_from_shot, cfg=cfg.descriptor)
    )

    feats_fn = jax.jit(
        functools.partial(pipeline.compute_features, cfg=cfg, tile=tile)
    )

    from bshot_slam_tpu.utils.profiling import scalarized as scalarize

    def timeit(fn, *a):
        out = fn(*a)
        np.asarray(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        np.asarray(out)
        return (time.perf_counter() - t0) / args.iters * 1e3

    rows = {
        "moments(pallas sweep)": timeit(scalarize(moments_fn), pts_j, pm_j),
        "segratio(pallas sweep)": timeit(
            scalarize(scores_fn), pts_j, pm_j, cnt, psum
        ),
        "keypoint top-k": timeit(scalarize(topk_fn), scores),
        "normals(from moments)": timeit(
            scalarize(normals_fn), pts_j, pm_j, cnt, psum, outer
        ),
        "shot: neighbor gather+topk": timeit(
            scalarize(gather_fn), kps, kmask, pts_j, pm_j, normals
        ),
        "shot: LRF only": timeit(scalarize(lrf_fn), kps, kmask, g),
        "shot: full (gather+LRF+hist)": timeit(
            scalarize(shot_fn), kps, kmask, pts_j, pm_j, normals
        ),
        "bshot binarize+pack": timeit(scalarize(bshot_fn), desc),
        "features fused (whole stage)": timeit(
            scalarize(feats_fn), pts_j, pm_j
        ),
    }
    for name, ms in rows.items():
        print(f"{name:34s} {ms:8.2f} ms")
    out = {
        "device": jax.devices()[0].device_kind,
        "bucket": b, "n_valid": int(min(nv, b)), "iters": args.iters,
        "stages_ms": {k: round(v, 3) for k, v in rows.items()},
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
