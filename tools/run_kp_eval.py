#!/usr/bin/env python
"""Keypoint repeatability evaluation — equivalent of the reference's
`kp_test` driver (reference: test/kp_test.cpp + lidar_odometry.cpp:392-445):
per consecutive-frame SR vs ISS repeatability at a 30 mm hit radius.

Usage: run_kp_eval.py [pcap | --synthetic N] [--frames N] [--sr-type CV]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import sys


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("pcap", nargs="?")
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--frames", type=int, default=0)
    ap.add_argument("--skip", type=int, default=0)
    ap.add_argument("--sr-type", choices=["CV", "CVS", "CVSN"], default="CV")
    ap.add_argument("--n-azimuth", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from bshot_slam_tpu.config import default_config
    from bshot_slam_tpu.io import pcap as pcap_io
    from bshot_slam_tpu.io import synthetic, velodyne
    from bshot_slam_tpu.ops import preprocess as pp
    from bshot_slam_tpu.ops.keypoints import (
        extract_keypoints, iss_keypoints, repeatability,
    )
    from bshot_slam_tpu.ops.rangeimage import build_range_image

    cfg = default_config()
    if args.n_azimuth:
        cfg = dataclasses.replace(
            cfg, sensor=dataclasses.replace(cfg.sensor, n_azimuth=args.n_azimuth)
        )
    cfg = dataclasses.replace(
        cfg, keypoints=dataclasses.replace(cfg.keypoints, sr_type=args.sr_type)
    )

    if args.synthetic:
        sweeps, _ = synthetic.render_sequence(
            args.synthetic, cfg.sensor, step_mm=0.0, noise_mm=20.0, seed=0,
            n_firings=cfg.sensor.n_azimuth,
        )  # static scene like the reference's StaticTest
    else:
        if not args.pcap:
            ap.error("provide a PCAP path or --synthetic N")
        payloads, _ = pcap_io.read_udp_payloads(args.pcap)
        sweeps = velodyne.sweeps_from_payloads(payloads, cfg.sensor, skip=args.skip)
    if args.frames:
        sweeps = sweeps[: args.frames]

    prev_sr = prev_iss = None
    for i, sw in enumerate(sweeps):
        ri = build_range_image(sw, cfg.sensor)
        res = pp.preprocess(
            jnp.asarray(ri.range_mm), jnp.asarray(ri.azimuth_rad),
            jnp.asarray(ri.vert_rad), cfg.preprocess,
        )
        pts, pmask = pp.extract_cloud(
            res, jnp.ones_like(res.valid), cfg.preprocess.max_points
        )
        sr = extract_keypoints(pts, pmask, cfg.keypoints)
        iss = iss_keypoints(pts, pmask, cfg.keypoints)
        line = (
            f"frame {i:3d}: SR n={int(sr.mask.sum()):4d}  "
            f"ISS n={int(iss.mask.sum()):4d}"
        )
        if prev_sr is not None:
            r_sr = float(repeatability(
                sr.positions, sr.mask, prev_sr[0], prev_sr[1],
                cfg.keypoints.repeat_radius_mm))
            r_iss = float(repeatability(
                iss.positions, iss.mask, prev_iss[0], prev_iss[1],
                cfg.keypoints.repeat_radius_mm))
            line += f"  repeat SR={r_sr:.3f}  ISS={r_iss:.3f}"
        print(line)
        prev_sr = (sr.positions, sr.mask)
        prev_iss = (iss.positions, iss.mask)
    return 0


if __name__ == "__main__":
    sys.exit(main())
