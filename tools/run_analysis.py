#!/usr/bin/env python
"""Offline analysis — the reference's L8 MATLAB layer, computed live.

The reference transcribes driver stdout into MATLAB scripts and plots them
(reference: test/Correspondences_analysis.m — correspondence distance
stats per SR variant +/- ICP; test/StaticTest_analysis.m — SR-vs-ISS
repeatability, counts and timing; test/PCP_SP_initpos_analysis.m —
ground-removal accuracy vs the vert_init parameter).  This tool RUNS those
experiments on a PCAP or a synthetic scene and renders the same families of
line charts as SVG plus a machine-readable JSON of every series.

Usage:
  run_analysis.py correspondences [pcap|--synthetic N] --out DIR
  run_analysis.py repeatability   [pcap|--synthetic N] --out DIR
  run_analysis.py ground          [pcap|--synthetic N] --out DIR \
      [--select labels.txt] [--vert-inits -0.6,-0.9,-1.2,-1.57]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import sys
import time


def _load_sweeps(args, cfg):
    from bshot_slam_tpu.io import pcap as pcap_io
    from bshot_slam_tpu.io import synthetic, velodyne

    if args.synthetic:
        sweeps, _ = synthetic.render_sequence(
            args.synthetic, cfg.sensor, step_mm=args.step_mm, noise_mm=20.0,
            seed=0, n_firings=cfg.sensor.n_azimuth,
            adversarial=getattr(args, "adversarial", False),
        )
        return sweeps
    if not args.pcap:
        raise SystemExit("provide a PCAP path or --synthetic N")
    payloads, _ = pcap_io.read_udp_payloads(args.pcap)
    sweeps = velodyne.sweeps_from_payloads(payloads, cfg.sensor, skip=args.skip)
    return sweeps[: args.frames] if args.frames else sweeps


def _base_cfg(args):
    import dataclasses

    from bshot_slam_tpu.config import default_config

    cfg = default_config()
    if args.n_azimuth:
        cfg = dataclasses.replace(
            cfg, sensor=dataclasses.replace(cfg.sensor, n_azimuth=args.n_azimuth)
        )
    return cfg


def correspondences(args) -> dict:
    """Per-frame inlier correspondence distance stats for each SR saliency
    variant with and without ICP (reference: Correspondences_analysis.m;
    stats produced by lidar_odometry.cpp:304-330)."""
    import dataclasses

    from bshot_slam_tpu.odometry.engine import SlamEngine

    cfg0 = _base_cfg(args)
    sweeps = _load_sweeps(args, cfg0)
    frames = list(range(len(sweeps)))
    out = {"frame": frames}
    for sr in ("CV", "CVS", "CVSN"):
        for icp in (False, True):
            cfg = dataclasses.replace(
                cfg0,
                keypoints=dataclasses.replace(cfg0.keypoints, sr_type=sr),
                match=dataclasses.replace(cfg0.match, run_icp=icp),
            )
            eng = SlamEngine(cfg)
            recs = [eng.process_sweep(sw) for sw in sweeps]
            tag = sr + ("+ICP" if icp else "")
            out[tag] = {
                "mean": [float(r.corr_stats[0]) for r in recs],
                "std": [float(r.corr_stats[1]) for r in recs],
                "median": [float(r.corr_stats[2]) for r in recs],
                "num": [r.n_inliers for r in recs],
            }
            print(f"{tag:9s} median={out[tag]['median']}")

    from bshot_slam_tpu.viz.charts import save_line_chart_svg

    tags = [k for k in out if k != "frame"]
    for stat, unit in (("median", "mm"), ("mean", "mm"), ("std", "mm"),
                       ("num", "count")):
        save_line_chart_svg(
            os.path.join(args.out, f"correspondences_{stat}.svg"),
            frames, {t: out[t][stat] for t in tags},
            f"Inlier correspondence {stat} by SR variant",
            "Frame", f"{stat} ({unit})",
        )
    return out


def repeatability(args) -> dict:
    """SR vs ISS keypoint counts, consecutive-frame repeatability at the
    30 mm hit radius, and per-frame extraction wall time (reference:
    StaticTest_analysis.m; eval loop kp_test.cpp + lidar_odometry.cpp:
    392-445)."""
    import jax
    import jax.numpy as jnp

    from bshot_slam_tpu.ops import preprocess as pp
    from bshot_slam_tpu.ops.keypoints import (
        extract_keypoints, iss_keypoints, repeatability as repeat_fn,
    )
    from bshot_slam_tpu.ops.rangeimage import build_range_image

    cfg = _base_cfg(args)
    sweeps = _load_sweeps(args, cfg)
    res_by = {"SR": {"n": [], "t_ms": [], "repeat": []},
              "ISS": {"n": [], "t_ms": [], "repeat": []}}
    prev = {"SR": None, "ISS": None}
    for sw in sweeps:
        ri = build_range_image(sw, cfg.sensor)
        r = pp.preprocess(jnp.asarray(ri.range_mm), jnp.asarray(ri.azimuth_rad),
                          jnp.asarray(ri.vert_rad), cfg.preprocess)
        pts, pmask = pp.extract_cloud(r, jnp.ones_like(r.valid),
                                      cfg.preprocess.max_points)
        for name, fn in (("SR", extract_keypoints), ("ISS", iss_keypoints)):
            t0 = time.perf_counter()
            kp = fn(pts, pmask, cfg.keypoints)
            jax.block_until_ready(kp.positions)
            res_by[name]["t_ms"].append((time.perf_counter() - t0) * 1e3)
            res_by[name]["n"].append(int(kp.mask.sum()))
            rep = (
                1.0 if prev[name] is None else float(repeat_fn(
                    kp.positions, kp.mask, prev[name][0], prev[name][1],
                    cfg.keypoints.repeat_radius_mm))
            )
            res_by[name]["repeat"].append(rep)
            prev[name] = (kp.positions, kp.mask)
        print(f"frame {len(res_by['SR']['n'])-1}: "
              + "  ".join(f"{k} n={res_by[k]['n'][-1]} "
                          f"rep={res_by[k]['repeat'][-1]:.3f} "
                          f"t={res_by[k]['t_ms'][-1]:.1f}ms" for k in res_by))

    from bshot_slam_tpu.viz.charts import save_line_chart_svg

    frames = list(range(len(sweeps)))
    for stat, ylab in (("n", "keypoints"), ("repeat", "hit rate"),
                       ("t_ms", "ms / frame")):
        save_line_chart_svg(
            os.path.join(args.out, f"repeatability_{stat}.svg"),
            frames, {k: res_by[k][stat] for k in res_by},
            f"SR vs ISS: {ylab}", "Frame", ylab,
        )
    return {"frame": frames, **res_by}


def ground(args) -> dict:
    """Ground-removal accuracy (kept / (kept + removed-as-ground) over
    labeled points) as a function of the virtual initial vertical angle
    (reference: PCP_SP_initpos_analysis.m; accuracy print
    pointcloud_preprocessing.cpp:280-286)."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from bshot_slam_tpu.ops import preprocess as pp
    from bshot_slam_tpu.ops.rangeimage import build_range_image
    from bshot_slam_tpu.utils.metrics import ground_accuracy

    cfg0 = _base_cfg(args)
    sweeps = _load_sweeps(args, cfg0)
    vert_inits = [float(v) for v in args.vert_inits.split(",")]
    select = None
    if args.select:
        select = []
        with open(args.select) as f:
            for line in f:
                select.append(
                    np.asarray([int(tok) for tok in line.split()], np.int64)
                )
    series = {}
    frames = list(range(len(sweeps)))
    for vi in vert_inits:
        cfg = dataclasses.replace(
            cfg0, preprocess=dataclasses.replace(
                cfg0.preprocess, vert_init_rad=vi)
        )
        acc = []
        for fi, sw in enumerate(sweeps):
            sel = None
            if select is not None and fi < len(select):
                sel = select[fi]
            ri = build_range_image(sw, cfg.sensor, selected_indices=sel)
            r = pp.preprocess(
                jnp.asarray(ri.range_mm), jnp.asarray(ri.azimuth_rad),
                jnp.asarray(ri.vert_rad), cfg.preprocess)
            a = ground_accuracy(
                np.asarray(r.classes), np.asarray(r.valid),
                np.asarray(ri.selected))
            acc.append(float(a))
        series[f"vert_init {vi}"] = acc
        print(f"vert_init={vi}: acc={['%.3f' % a for a in acc]}")

    from bshot_slam_tpu.viz.charts import save_line_chart_svg

    save_line_chart_svg(
        os.path.join(args.out, "ground_accuracy.svg"), frames, series,
        "Ground-removal accuracy vs vert_init", "Frame", "accuracy",
    )
    return {"frame": frames, **series}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("experiment",
                    choices=["correspondences", "repeatability", "ground"])
    ap.add_argument("pcap", nargs="?")
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--adversarial", action="store_true",
                    help="synthetic: hardened scene (undulation, clutter, "
                         "self-car returns)")
    ap.add_argument("--frames", type=int, default=0)
    ap.add_argument("--skip", type=int, default=0)
    ap.add_argument("--n-azimuth", type=int, default=0)
    # Default motion: static scene for the repeatability experiment (the
    # reference's StaticTest), a moving platform for the others.
    ap.add_argument("--step-mm", type=float, default=None)
    ap.add_argument("--select", help="labeled select-list file (ground)")
    ap.add_argument("--vert-inits", default="-0.6,-0.9,-1.2,-1.57")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from bshot_slam_tpu.utils.profiling import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    os.makedirs(args.out, exist_ok=True)
    if args.step_mm is None:
        args.step_mm = 0.0 if args.experiment == "repeatability" else 400.0
    result = {"correspondences": correspondences, "repeatability": repeatability,
              "ground": ground}[args.experiment](args)
    jpath = os.path.join(args.out, f"{args.experiment}.json")
    with open(jpath, "w") as f:
        json.dump(result, f, indent=1)
    print(f"stats -> {jpath}; charts -> {args.out}/*.svg")
    return 0


if __name__ == "__main__":
    sys.exit(main())
