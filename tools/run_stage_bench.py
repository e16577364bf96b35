"""Per-stage device timing + roofline (MFU / bandwidth) accounting for the
odometry step.

Times each stage of the per-frame pipeline (host preprocess, feature
sweep, SHOT descriptors, matching+RANSAC+ICP, map insert) as its own
fenced jit over a realistic cloud and a prefilled map, then relates each
stage's measured time to the chip's peak FLOP/s and HBM bandwidth via an
analytic cost model of the dominant terms (pair-matmul dimensions are
static, so the model is exact up to small elementwise terms; Pallas
custom calls are invisible to XLA's cost analysis, hence the explicit
model).  Also reports the AABB tile-prune hit rate of the neighborhood
sweeps (VERDICT r3 item 3) by replaying the kernel's prune test on the
host.

No reference counterpart (its only timer is wall-clock TicToc,
include/tic_toc.h:7-25); this is the rebuild's speed-of-light
instrument.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/run_stage_bench.py \
          [--bucket 16384] [--prefill 65536] [--iters 20] [--out STAGE.json]
"""

from __future__ import annotations

import argparse
import functools
import json
import time

# Chip peaks: (bf16 FLOP/s, HBM bytes/s).  Dense-matmul peaks from public
# TPU specs; f32 MXU work runs at <= the bf16 number (XLA's default f32
# matmul precision on TPU is bf16 inputs + f32 accumulate).
_PEAKS = {
    "v4": (275e12, 1.228e12),
    "v5e": (197e12, 0.819e12),
    "v5 lite": (197e12, 0.819e12),
    "v5p": (459e12, 2.765e12),
    "v6e": (918e12, 1.640e12),
    "v6 lite": (918e12, 1.640e12),
}


def _chip_peaks(device) -> tuple[float, float] | None:
    kind = getattr(device, "device_kind", "").lower()
    for key, peaks in _PEAKS.items():
        if key in kind:
            return peaks
    return None


def _sweep_pair_stats(points, mask, radius):
    """Replay the neighborhood kernel's tile pruning on the host: returns
    (executed_pairs, nv_pairs, total_pairs) for the (TQ, TR) grid —
    kernels/neighborhood.py:63-94 semantics."""
    import numpy as np

    from bshot_slam_tpu.kernels.neighborhood import TQ, TR

    pts = np.asarray(points)
    msk = np.asarray(mask)
    n = len(pts)

    def tiles(tile):
        nt = -(-n // tile)
        pad = nt * tile - n
        p = np.concatenate([pts, np.zeros((pad, 3), np.float32)])
        m = np.concatenate([msk, np.zeros(pad, bool)])
        p = p.reshape(nt, tile, 3)
        m = m.reshape(nt, tile, 1)
        lo = np.where(m, p, np.inf).min(axis=1)
        hi = np.where(m, p, -np.inf).max(axis=1)
        return lo, hi, nt

    qlo, qhi, nq = tiles(TQ)
    rlo, rhi, nr = tiles(TR)
    nv = int(msk.sum())  # front-compacted
    qlive = np.arange(nq) * TQ < nv
    rlive = np.arange(nr) * TR < nv
    sep = np.zeros((nq, nr), bool)
    for d in range(3):
        sep |= (qlo[:, None, d] - rhi[None, :, d] > radius) | (
            rlo[None, :, d] - qhi[:, None, d] > radius
        )
    live = qlive[:, None] & rlive[None, :]
    executed = int((live & ~sep).sum())
    return executed, int(live.sum()), nq * nr


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--bucket", type=int, default=16384)
    ap.add_argument("--prefill", type=int, default=65536)
    ap.add_argument("--tile", type=int, default=2048)
    ap.add_argument("--out", default="", help="also write the JSON here")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bshot_slam_tpu.utils.profiling import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    from bshot_slam_tpu.config import default_config
    from bshot_slam_tpu.io import synthetic
    from bshot_slam_tpu.kernels.neighborhood import TQ, TR
    from bshot_slam_tpu.odometry import pipeline
    from bshot_slam_tpu.ops import preprocess_host as ph
    from bshot_slam_tpu.ops.rangeimage import build_range_image

    cfg = default_config()
    sweeps, _ = synthetic.render_sequence(
        2, cfg.sensor, step_mm=400.0, noise_mm=20.0, seed=0,
        n_firings=cfg.sensor.n_azimuth,
    )
    ri = build_range_image(sweeps[0], cfg.sensor)

    # Host preprocessing (the engine's default ingest path) is timed on the
    # host — it overlaps device compute in pipelined mode.
    t0 = time.perf_counter()
    for _ in range(args.iters):
        classes, xyz, valid = ph.preprocess_host(
            ri.range_mm, ri.azimuth_rad, ri.vert_rad, cfg.preprocess
        )
        pts_c, nv = ph.extract_cloud_host(
            classes, xyz, valid, None, cfg.preprocess.max_points
        )
    t_host = (time.perf_counter() - t0) / args.iters * 1e3

    b = args.bucket
    pts = np.zeros((b, 3), np.float32)
    pts[: min(nv, b)] = pts_c[:b]
    pmask = np.zeros(b, bool)
    pmask[: min(nv, b)] = True
    n_valid = int(min(nv, b))
    pts_j, pm_j = jnp.asarray(pts), jnp.asarray(pmask)

    # Prefilled map state (same construction as bench.py)
    import importlib.util as _ilu
    import pathlib

    spec = _ilu.spec_from_file_location(
        "bench", pathlib.Path(__file__).resolve().parents[1] / "bench.py"
    )
    bench = _ilu.module_from_spec(spec)
    spec.loader.exec_module(bench)
    state = pipeline.init_state(cfg)._replace(
        map=bench._prefilled_map(cfg, cfg.map.capacity, n=args.prefill)
    )
    key = jax.random.PRNGKey(0)

    feats_fn = jax.jit(
        functools.partial(pipeline.compute_features, cfg=cfg, tile=args.tile)
    )
    feats = feats_fn(pts_j, pm_j)

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

    from bshot_slam_tpu.utils.profiling import scalarized as scalarize

    def timeit(fn, *a):
        fn = scalarize(fn)
        out = fn(*a)  # compile
        np.asarray(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        np.asarray(out)
        return (time.perf_counter() - t0) / args.iters * 1e3

    T0, _ = match_fn(key, feats, state)
    t_feat = timeit(feats_fn, pts_j, pm_j)
    t_match = timeit(match_fn, key, feats, state)
    t_insert = timeit(insert_fn, state, feats, T0)

    # ---- analytic roofline model (dominant terms) ----
    K = cfg.keypoints.top_k  # 600
    M = cfg.descriptor.max_neighbors  # 384
    BITS = cfg.descriptor.n_bits  # 352
    C = cfg.map.capacity  # candidate rows (kernels skip past cursor)
    cursor = args.prefill + K  # live candidate rows during steady state
    H = cfg.match.ransac_iterations
    I = cfg.match.icp_iterations
    F = 128  # moments feature width (ops/keypoints.py:120 pads to 128)

    exec_pairs, nv_pairs, tot_pairs = _sweep_pair_stats(
        pts, pmask, cfg.keypoints.radius_mm
    )
    tile_flops = 2 * TQ * TR * 3 + 6 * TQ * TR  # d2 expansion + mask
    sweep_m_fl = exec_pairs * (tile_flops + 2 * TQ * TR * F)
    sweep_s_fl = exec_pairs * (tile_flops + 2 * TQ * TR * 3 + 10 * TQ * TR)
    shot_fl = (
        2 * K * b * 3  # keypoint->cloud distance matmul
        + 2 * K * M * (9 + 9 + 3)  # cov + local-frame + cosine einsums
        + 2 * K * M * BITS  # one-hot histogram scatter matmul
    )
    feat_flops = sweep_m_fl + sweep_s_fl + shot_fl
    # Sweep HBM: r/feat tiles re-read per executed pair; accumulators per
    # stripe; SHOT reads the cloud per keypoint tile.
    feat_bytes = (
        exec_pairs * TR * (3 + F + 3) * 4  # r + feat (moments) + r (segratio)
        + 2 * (-(-b // TQ)) * TQ * F * 4  # accumulator writes
        + K * b * 4  # shot distance row stream (bf16-ish, coarse)
    )

    match_flops = (
        2 * K * (cursor + K) * BITS  # mutual-NN Hamming (MXU, bf16)
        + H * (K * 32 + 500)  # RANSAC hypothesis scoring + Kabsch
        + I * 2 * K * (cursor + K) * 3  # ICP NN distance matmuls
    )
    match_bytes = (
        (cursor + K) * (44 + 12)  # packed descriptors + window positions
        + I * (cursor + K) * 12  # ICP positions per iteration
        + H * K * 16
    )
    insert_flops = 2 * K * (cursor + K) * 3 + 2 * K * K * 3
    insert_bytes = (cursor + K) * (12 + 44 + 4 + 12 + 1 + 4) * 2

    dev = jax.devices()[0]
    peaks = _chip_peaks(dev)
    rows = [
        ("preprocess(host numpy)", t_host, None, None),
        ("features(SR+normals+SHOT+BSHOT)", t_feat, feat_flops, feat_bytes),
        ("match+RANSAC+ICP", t_match, match_flops, match_bytes),
        ("map insert", t_insert, insert_flops, insert_bytes),
    ]
    out_rows = {}
    total = sum(r[1] for r in rows)
    for name, ms, fl, by in rows:
        entry = {"ms": round(ms, 3), "pct": round(100 * ms / total, 1)}
        if fl is not None:
            entry["gflop"] = round(fl / 1e9, 2)
            entry["mbytes"] = round(by / 1e6, 2)
            if peaks:
                pf, pb = peaks
                entry["mfu"] = round(fl / (ms / 1e3) / pf, 4)
                entry["bw_util"] = round(by / (ms / 1e3) / pb, 4)
                # Roofline bound actually hit (1.0 = speed of light).
                entry["sol_frac"] = max(entry["mfu"], entry["bw_util"])
        out_rows[name] = entry
        line = f"{name:34s} {ms:8.2f} ms ({entry['pct']:4.1f}%)"
        if "mfu" in entry:
            line += f"  mfu={entry['mfu']:.3f} bw={entry['bw_util']:.3f}"
        print(line)

    result = {
        "device": getattr(dev, "device_kind", dev.platform),
        "bucket": b,
        "n_valid": n_valid,
        "prefill": args.prefill,
        "iters": args.iters,
        "peaks_bf16_flops_hbm": peaks,
        "stages": out_rows,
        "total_ms": round(total, 3),
        "sweep_tiles": {
            "executed_pairs": exec_pairs,
            "cursor_live_pairs": nv_pairs,
            "grid_pairs": tot_pairs,
            "aabb_prune_rate_of_live": round(1 - exec_pairs / max(nv_pairs, 1), 4),
            "cursor_prune_rate_of_grid": round(1 - nv_pairs / max(tot_pairs, 1), 4),
        },
        "model": "analytic dominant terms; pallas sweeps modeled from "
                 "executed tile pairs (XLA cost analysis cannot see custom "
                 "calls); f32 MXU work compared against bf16 peak",
    }
    js = json.dumps(result)
    print(js)
    if args.out:
        with open(args.out, "w") as f:
            f.write(js + "\n")


if __name__ == "__main__":
    main()
