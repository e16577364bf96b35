#!/usr/bin/env python
"""Point labeling tool — headless equivalent of the reference's interactive
`pointpicking` viewer (reference: test/pointpicking.cpp + include/
ViewerHandler.h): select per-frame point subsets by 3D crop boxes and write
select-list files that the preprocessing evaluator consumes
(`run_preprocess_eval.py --select`).

The reference builds its crop cube from two mouse-drawn rectangles (top
then side view — ViewerHandler.cpp:65-198); headless, the same cube is
specified directly:

  run_pointpicking.py cap.pcap --box xmin xmax ymin ymax zmin zmax \
      [--box ...] --frames 5 --out labels.txt [--merge old_labels.txt]

Each output line holds the sorted selected point indices (firing order) of
one frame, the reference's SelectedPoints format (reference:
odometry_test.cpp:147-162 loader).
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
    ap.add_argument("--skip", type=int, default=0)
    ap.add_argument("--frames", type=int, default=0)
    ap.add_argument("--n-azimuth", type=int, default=0)
    ap.add_argument("--box", nargs=6, type=float, action="append", required=True,
                    metavar=("XMIN", "XMAX", "YMIN", "YMAX", "ZMIN", "ZMAX"),
                    help="crop box in sensor-frame mm; repeatable (union)")
    ap.add_argument("--invert", action="store_true",
                    help="select points OUTSIDE the boxes (reference trim mode)")
    ap.add_argument("--merge", help="existing select-list to union with "
                    "(reference inputIDX.txt)")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import dataclasses

    import numpy as np

    from bshot_slam_tpu.config import default_config
    from bshot_slam_tpu.io import pcap as pcap_io
    from bshot_slam_tpu.io import synthetic, velodyne

    cfg = default_config()
    if args.n_azimuth:
        cfg = dataclasses.replace(
            cfg, sensor=dataclasses.replace(cfg.sensor, n_azimuth=args.n_azimuth)
        )
    if args.synthetic:
        sweeps, _ = synthetic.render_sequence(
            args.synthetic, cfg.sensor, seed=0, n_firings=cfg.sensor.n_azimuth
        )
    else:
        if not args.pcap:
            ap.error("provide a PCAP path or --synthetic N")
        payloads, _ = pcap_io.read_udp_payloads(args.pcap)
        sweeps = velodyne.sweeps_from_payloads(payloads, cfg.sensor, skip=args.skip)
    if args.frames:
        sweeps = sweeps[: args.frames]

    merged = []
    if args.merge:
        with open(args.merge) as f:
            for line in f:
                merged.append({int(t) for t in line.split()})

    with open(args.out, "w") as f:
        for i, sw in enumerate(sweeps):
            # Sensor-frame XYZ per laser, firing order
            # (reference coordinate convention, preprocess.cpp:50-52).
            d = sw.distance.astype(np.float64) * cfg.sensor.distance_scale_mm
            az = np.deg2rad(sw.azimuth_deg)
            vert_lut = np.deg2rad(np.asarray(cfg.sensor.vertical_angles_deg))
            v = vert_lut[sw.ring]
            x = d * np.cos(v) * np.sin(az)
            y = d * np.cos(v) * np.cos(az)
            z = d * np.sin(v)
            sel = np.zeros(len(sw), bool)
            for bx in args.box:
                sel |= (
                    (x >= bx[0]) & (x <= bx[1]) & (y >= bx[2]) & (y <= bx[3])
                    & (z >= bx[4]) & (z <= bx[5])
                )
            sel &= d > 0
            if args.invert:
                sel = ~sel & (d > 0)
            idx = set(np.nonzero(sel)[0].tolist())
            if i < len(merged):
                idx |= merged[i]
            f.write(" ".join(str(j) for j in sorted(idx)) + "\n")
            print(f"frame {i}: {len(idx)} selected", file=sys.stderr)
    print(f"select lists -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
