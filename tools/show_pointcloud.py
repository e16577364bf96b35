#!/usr/bin/env python
"""Raw-sweep viewer — equivalent of the reference's `ShowPointCloud`
(reference: test/ShowPointCloud.cpp): decode sweeps with NO preprocessing
and export them, replacing the OpenCV viz window with headless PLY files
colored by laser ring.

Usage: show_pointcloud.py capture.pcap --out dir [--frames N] [--skip N]
       show_pointcloud.py --synthetic 3 --out dir
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import os
import sys

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("pcap", nargs="?")
    ap.add_argument("--synthetic", type=int, default=0, metavar="N")
    ap.add_argument("--sensor", choices=["hdl32e", "vlp16"], default="hdl32e")
    ap.add_argument("--frames", type=int, default=0)
    ap.add_argument("--skip", type=int, default=0)
    ap.add_argument("--n-azimuth", type=int, default=0)
    ap.add_argument("--out", required=True, help="output directory for PLYs")
    args = ap.parse_args()

    import dataclasses

    from bshot_slam_tpu.config import VLP16_SENSOR, default_config
    from bshot_slam_tpu.io import pcap as pcap_io
    from bshot_slam_tpu.io import synthetic, velodyne
    from bshot_slam_tpu.viz.export import save_ply

    cfg = default_config()
    sensor = VLP16_SENSOR if args.sensor == "vlp16" else cfg.sensor
    if args.n_azimuth:
        sensor = dataclasses.replace(sensor, n_azimuth=args.n_azimuth)

    if args.synthetic:
        sweeps, _ = synthetic.render_sequence(
            args.synthetic, sensor, seed=0, n_firings=sensor.n_azimuth
        )
    else:
        if not args.pcap:
            ap.error("provide a PCAP path or --synthetic N")
        payloads, _ = pcap_io.read_udp_payloads(args.pcap)
        sweeps = velodyne.sweeps_from_payloads(payloads, sensor, skip=args.skip)
    if args.frames:
        sweeps = sweeps[: args.frames]

    vert_lut = np.deg2rad(np.asarray(sensor.vertical_angles_deg, np.float32))
    os.makedirs(args.out, exist_ok=True)
    for i, sw in enumerate(sweeps):
        # Polar -> XYZ in mm, exactly as captured (no ground/occlusion
        # removal — ShowPointCloud.cpp renders the raw rotation).  Distance
        # ticks are 2 mm each (reference: preprocess.cpp:46); axes follow
        # the preprocess convention (x east = sin az, y north = cos az).
        dist = np.asarray(sw.distance, np.float32) * 2.0
        az = np.deg2rad(np.asarray(sw.azimuth_deg, np.float32))
        ring = np.asarray(sw.ring, np.int64)
        vert = vert_lut[ring]
        good = dist > 0
        dist, az, vert, ring = dist[good], az[good], vert[good], ring[good]
        xy = dist * np.cos(vert)
        xyz = np.stack(
            [xy * np.sin(az), xy * np.cos(az), dist * np.sin(vert)], axis=-1
        )
        t = ring / max(len(vert_lut) - 1, 1)
        colors = np.stack(
            [255 * t, 64 + 0 * t, 255 * (1 - t)], axis=-1
        ).astype(np.uint8)
        path = os.path.join(args.out, f"sweep_{i:05d}.ply")
        save_ply(path, xyz, colors)
        print(f"{path}: {len(xyz)} returns")
    return 0


if __name__ == "__main__":
    sys.exit(main())
