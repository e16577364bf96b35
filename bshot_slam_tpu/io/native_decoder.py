"""ctypes bindings for the native PCAP/Velodyne decoder.

Loads native/libvelodyne_decoder.so when built (`make -C native`); callers
use `decode_pcap_native` via `is_available()` and fall back to the pure-
python path (io.pcap + io.velodyne) otherwise.  Both implement the same
contract and are cross-tested.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

from bshot_slam_tpu.config import SensorConfig
from bshot_slam_tpu.io.velodyne import LaserSweep

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libvelodyne_decoder.so",
)


class _DecodedCapture(ctypes.Structure):
    _fields_ = [
        ("azimuth_deg", ctypes.POINTER(ctypes.c_float)),
        ("ring", ctypes.POINTER(ctypes.c_int32)),
        ("distance", ctypes.POINTER(ctypes.c_uint16)),
        ("intensity", ctypes.POINTER(ctypes.c_uint8)),
        ("n_lasers", ctypes.c_int64),
        ("sweep_starts", ctypes.POINTER(ctypes.c_int64)),
        ("n_sweeps", ctypes.c_int64),
    ]


_lib = None


def _load():
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.vd_decode_pcap.restype = ctypes.POINTER(_DecodedCapture)
        lib.vd_decode_pcap.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.vd_free.argtypes = [ctypes.POINTER(_DecodedCapture)]
        _lib = lib
    return _lib


def is_available() -> bool:
    return _load() is not None


def decode_pcap_native(
    path: str, sensor: SensorConfig, skip: int = 0
) -> Optional[List[LaserSweep]]:
    """Native parse+decode of a PCAP capture into complete sweeps.

    Returns None when the library is unbuilt or the file is unreadable.
    """
    lib = _load()
    if lib is None:
        return None
    cap = lib.vd_decode_pcap(path.encode(), sensor.n_rings)
    if not cap:
        return None
    try:
        c = cap.contents
        n = int(c.n_lasers)
        az = np.ctypeslib.as_array(c.azimuth_deg, (n,)).astype(np.float64)
        ring = np.ctypeslib.as_array(c.ring, (n,)).copy()
        dist = np.ctypeslib.as_array(c.distance, (n,)).copy()
        inten = np.ctypeslib.as_array(c.intensity, (n,)).copy()
        n_sweeps = int(c.n_sweeps)
        starts = np.ctypeslib.as_array(c.sweep_starts, (n_sweeps + 1,)).copy()
    finally:
        lib.vd_free(cap)

    sweeps = []
    for k in range(skip, n_sweeps):
        s, e = int(starts[k]), int(starts[k + 1])
        sweeps.append(
            LaserSweep(
                azimuth_deg=az[s:e], ring=ring[s:e], distance=dist[s:e],
                intensity=inten[s:e],
            )
        )
    return sweeps
