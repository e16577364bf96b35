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


class _VdStreamOpaque(ctypes.Structure):
    pass


def _load_stream_api(lib):
    if getattr(lib, "_stream_api", False):
        return lib
    lib.vd_stream_open.restype = ctypes.POINTER(_VdStreamOpaque)
    lib.vd_stream_open.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_float, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.vd_stream_next.restype = ctypes.c_int
    lib.vd_stream_next.argtypes = [
        ctypes.POINTER(_VdStreamOpaque),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    lib.vd_stream_close.argtypes = [ctypes.POINTER(_VdStreamOpaque)]
    lib._stream_api = True
    return lib


class NativeSweepStream:
    """Producer/consumer PCAP ingest, fully native: a C++ background thread
    parses packets and bins each rotation into upload-ready dense
    (n_rings, n_azimuth) range/azimuth tensors behind a bounded queue — the
    reference's capture-thread architecture (VelodyneCapture.h:172,78-80)
    with the range-image build moved into the producer.

    Iterate to receive `ops.rangeimage.RangeImage` objects; close() (or the
    context manager / garbage collection) releases the thread.
    """

    def __init__(self, path: str, sensor: SensorConfig, skip: int = 0,
                 queue: int = 4):
        from bshot_slam_tpu.ops.rangeimage import sorted_vertical_angles_rad

        lib = _load()
        if lib is None:
            raise RuntimeError("native decoder not built (make -C native)")
        _load_stream_api(lib)
        self._lib = lib
        row_of_ring = np.argsort(
            np.argsort(np.asarray(sensor.vertical_angles_deg), kind="stable"),
            kind="stable",
        ).astype(np.int32)
        self._handle = lib.vd_stream_open(
            path.encode(), sensor.n_rings, sensor.n_azimuth,
            row_of_ring.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_float(sensor.distance_scale_mm), skip, queue,
        )
        if not self._handle:
            raise RuntimeError(f"cannot open {path!r} as a pcap capture")
        self._shape = (sensor.n_rings, sensor.n_azimuth)
        self._vert = sorted_vertical_angles_rad(sensor)

    def __iter__(self):
        from bshot_slam_tpu.ops.rangeimage import RangeImage

        while self._handle:
            rng = np.empty(self._shape, np.float32)
            az = np.empty(self._shape, np.float32)
            ok = self._lib.vd_stream_next(
                self._handle,
                rng.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                az.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
            if not ok:
                break
            yield RangeImage(
                range_mm=rng, azimuth_rad=az, vert_rad=self._vert,
                selected=np.ones(self._shape, bool),
            )
        self.close()

    def close(self):
        h, self._handle = self._handle, None
        if h:
            self._lib.vd_stream_close(h)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def stream_available() -> bool:
    lib = _load()
    if lib is None:
        return False
    return hasattr(lib, "vd_stream_open")


class _PreprocessCfg(ctypes.Structure):
    _fields_ = [
        ("vert_init_rad", ctypes.c_float),
        ("sensor_height_mm", ctypes.c_float),
        ("grad_th_deg", ctypes.c_float),
        ("lowpt_th_mm", ctypes.c_float),
        ("height_th_mm", ctypes.c_float),
        ("dist_th_mm", ctypes.c_float),
        ("angdiff_th_rad", ctypes.c_float),
        ("car_x0", ctypes.c_float), ("car_x1", ctypes.c_float),
        ("car_y0", ctypes.c_float), ("car_y1", ctypes.c_float),
        ("car_z0", ctypes.c_float), ("car_z1", ctypes.c_float),
    ]


def _load_preprocess():
    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, "vd_preprocess_extract"):
        return None
    if lib.vd_preprocess_extract.argtypes is None:
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.vd_preprocess_extract.restype = ctypes.c_int64
        lib.vd_preprocess_extract.argtypes = [
            f32p, f32p, f32p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(_PreprocessCfg), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32), f32p, f32p, ctypes.c_int64,
        ]
    return lib


def preprocess_extract_native(range_mm, azimuth_rad, vert_rad, cfg,
                              selected, max_points: int):
    """Native classify + compact-extract of one sweep (mirrors
    ops.preprocess_host; reference: src/preprocess.cpp:73-216).

    Returns (points (n, 3) float32, n_valid, classes (R, A) int32), or
    None when the native library is unavailable.
    """
    lib = _load_preprocess()
    if lib is None:
        return None
    r = np.ascontiguousarray(range_mm, np.float32)
    a = np.ascontiguousarray(azimuth_rad, np.float32)
    v = np.ascontiguousarray(vert_rad, np.float32)
    R, A = r.shape
    c = _PreprocessCfg(
        cfg.vert_init_rad, cfg.sensor_height_mm, cfg.grad_th_deg,
        cfg.lowpt_th_mm, cfg.height_th_mm, cfg.dist_th_mm,
        cfg.angdiff_th_rad,
        cfg.car_x_mm[0], cfg.car_x_mm[1], cfg.car_y_mm[0], cfg.car_y_mm[1],
        cfg.car_z_mm[0], cfg.car_z_mm[1],
    )
    classes = np.empty((R, A), np.int32)
    xyz = np.empty((R, A, 3), np.float32)
    pts = np.empty((max_points, 3), np.float32)
    if selected is not None:
        sel = np.ascontiguousarray(
            np.asarray(selected, bool).astype(np.uint8)
        )
        sel_p = sel.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    else:
        sel_p = None
    f32p = ctypes.POINTER(ctypes.c_float)
    n = lib.vd_preprocess_extract(
        r.ctypes.data_as(f32p), a.ctypes.data_as(f32p),
        v.ctypes.data_as(f32p), R, A, ctypes.byref(c), sel_p,
        classes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        xyz.ctypes.data_as(f32p), pts.ctypes.data_as(f32p), max_points,
    )
    if n < 0:
        return None
    return pts[:n].copy(), int(n), classes
