#!/usr/bin/env python
"""Preprocessing evaluation — equivalent of the reference's
`pointcloud_preprocessing` driver (reference: test/pointcloud_preprocessing
.cpp): per-frame class histograms, ground-removal accuracy against labeled
select lists, and class-colored PLY export instead of the OpenCV viewer.

Usage: run_preprocess_eval.py [pcap | --synthetic N] [--select labels.txt]
       [--vert-init -0.6] [--ply-out dir]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("pcap", nargs="?")
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--frames", type=int, default=0)
    ap.add_argument("--skip", type=int, default=0)
    ap.add_argument("--select", help="per-frame selected point index file "
                    "(reference SelectedPoints format: lines of indices)")
    ap.add_argument("--vert-init", type=float, default=-0.6)
    ap.add_argument("--lowpt-th", type=float, default=-2000.0)
    ap.add_argument("--n-azimuth", type=int, default=0)
    ap.add_argument("--ply-out", help="export class-colored PLY per frame")
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
    from bshot_slam_tpu.ops.rangeimage import build_range_image
    from bshot_slam_tpu.utils.metrics import ground_accuracy
    from bshot_slam_tpu.viz.export import save_classified_cloud

    cfg = default_config()
    if args.n_azimuth:
        cfg = dataclasses.replace(
            cfg, sensor=dataclasses.replace(cfg.sensor, n_azimuth=args.n_azimuth)
        )
    cfg = dataclasses.replace(
        cfg,
        preprocess=dataclasses.replace(
            cfg.preprocess, vert_init_rad=args.vert_init, lowpt_th_mm=args.lowpt_th
        ),
    )

    if args.synthetic:
        sweeps, _ = synthetic.render_sequence(
            args.synthetic, cfg.sensor, noise_mm=20.0, seed=0,
            n_firings=cfg.sensor.n_azimuth,
        )
    else:
        if not args.pcap:
            ap.error("provide a PCAP path or --synthetic N")
        payloads, _ = pcap_io.read_udp_payloads(args.pcap)
        sweeps = velodyne.sweeps_from_payloads(payloads, cfg.sensor, skip=args.skip)
    if args.frames:
        sweeps = sweeps[: args.frames]

    select_lists = []
    if args.select:
        with open(args.select) as f:
            for line in f:
                select_lists.append(
                    np.asarray([int(tok) for tok in line.split()], np.int64)
                )

    if args.ply_out:
        os.makedirs(args.ply_out, exist_ok=True)

    names = ["keep", "ground", "selfcar", "occl"]
    for i, sw in enumerate(sweeps):
        sel = select_lists[i] if i < len(select_lists) else None
        ri = build_range_image(sw, cfg.sensor, selected_indices=sel)
        res = pp.preprocess(
            jnp.asarray(ri.range_mm), jnp.asarray(ri.azimuth_rad),
            jnp.asarray(ri.vert_rad), cfg.preprocess,
        )
        cls = np.asarray(res.classes)
        valid = np.asarray(res.valid)
        counts = {n: int(((cls == k) & valid).sum()) for k, n in enumerate(names)}
        line = f"frame {i:3d}: " + "  ".join(f"{n}={c}" for n, c in counts.items())
        if sel is not None:
            acc = ground_accuracy(cls, valid, ri.selected)
            line += f"  accuracy={acc:.3f}"
        print(line)
        if args.ply_out:
            save_classified_cloud(
                os.path.join(args.ply_out, f"frame_{i:04d}.ply"),
                np.asarray(res.xyz), cls, valid,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
