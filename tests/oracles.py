"""Plain-Python sequential oracles transcribing the reference's semantics.

Each oracle is a direct, loop-based restatement of a reference algorithm
(cited per function) used ONLY to validate the vectorized JAX kernels in
bshot_slam_tpu against the exact rule ordering of the original C++.  They are
written from the rule descriptions in SURVEY.md / the reference sources, not
copied code.
"""

from __future__ import annotations

import math

import numpy as np

from bshot_slam_tpu.config import PreprocessConfig


def ground_walk_oracle(
    range_mm: np.ndarray,
    azimuth_rad: np.ndarray,
    vert_rad: np.ndarray,
    cfg: PreprocessConfig,
) -> np.ndarray:
    """Sequential per-column ground walk (reference: src/preprocess.cpp:73-166)."""
    R, A = range_mm.shape
    cls = np.zeros((R, A), np.int32)
    H = cfg.sensor_height_mm
    for c in range(A):
        az = azimuth_rad[0, c]
        horiz = -H / math.tan(cfg.vert_init_rad)
        p_prev = np.array([horiz * math.sin(az), horiz * math.cos(az), -H])
        p_th = p_prev.copy()
        prev_is_ground = True
        lost_pt = False
        set_th_pt = False
        for r in range(R):
            d = float(range_mm[r, c])
            v = float(vert_rad[r])
            a = float(azimuth_rad[r, c])
            p = np.array(
                [d * math.cos(v) * math.sin(a), d * math.cos(v) * math.cos(a),
                 d * math.sin(v)]
            )
            diff = p - p_prev
            nrm = np.linalg.norm(diff)
            grad = math.degrees(math.asin(np.clip(diff[2] / (nrm + 1e-6), -1, 1)))
            norm_prev = np.linalg.norm(p_prev)

            if prev_is_ground and (grad > cfg.grad_th_deg or d == 0 or d < norm_prev):
                set_th_pt = True
                p_th = p_prev.copy()

            if prev_is_ground:
                if grad < cfg.grad_th_deg and not lost_pt:
                    cls[r, c] = 1
                    prev_is_ground = True
                else:
                    cls[r, c] = 0
                    prev_is_ground = False
            elif (not prev_is_ground) and p[2] < cfg.lowpt_th_mm and grad < cfg.grad_th_deg:
                cls[r, c] = 1
                prev_is_ground = True
                set_th_pt = False

            if d == 0:
                cls[r, c] = 1
                lost_pt = True
                prev_is_ground = False
            else:
                lost_pt = False

            if d < norm_prev and d != 0:
                cls[r, c] = 0
                prev_is_ground = False

            if set_th_pt and (p[2] - p_th[2]) < cfg.height_th_mm and p[2] < p_prev[2]:
                set_th_pt = False
                cls[r, c] = 1
                prev_is_ground = True

            if (cfg.car_x_mm[0] <= p[0] <= cfg.car_x_mm[1]
                    and cfg.car_y_mm[0] <= p[1] <= cfg.car_y_mm[1]
                    and cfg.car_z_mm[0] <= p[2] <= cfg.car_z_mm[1]):
                cls[r, c] = 2

            p_prev = p
    return cls


def occlusion_oracle(
    range_mm: np.ndarray,
    azimuth_rad: np.ndarray,
    classes: np.ndarray,
    cfg: PreprocessConfig,
) -> np.ndarray:
    """Sequential occlusion marking (reference: src/preprocess.cpp:168-199)."""
    R, A = range_mm.shape
    cls = classes.copy()
    for r in range(R):
        prev = 0  # first column seeds prev unconditionally
        for c in range(1, A):
            if range_mm[r, c] == 0:
                continue
            d_dist = range_mm[r, c] - range_mm[r, prev]
            d_hor = azimuth_rad[r, c] - azimuth_rad[r, prev]
            if abs(d_dist) > cfg.dist_th_mm and abs(d_hor) < cfg.angdiff_th_rad:
                if d_dist > 0:
                    if cls[r, c] == 0:
                        cls[r, c] = 3
                else:
                    if cls[r, prev] == 0:
                        cls[r, prev] = 3
            prev = c
    return cls


def bshot_binarize_oracle(shot: np.ndarray) -> np.ndarray:
    """Per-group 14-case decision tree (reference: include/bshot_bits.h:144-278).

    shot: (n, 352) float -> (n, 352) uint8 bits.
    """
    n = shot.shape[0]
    bits = np.zeros((n, 352), np.uint8)
    for i in range(n):
        for j in range(88):
            vec = shot[i, j * 4 : j * 4 + 4].astype(np.float32)
            s = float(vec.sum())
            out = np.zeros(4, np.uint8)
            thr = 0.9 * s
            v0, v1, v2, v3 = (float(x) for x in vec)
            if v0 == 0 and v1 == 0 and v2 == 0 and v3 == 0:
                pass
            elif v0 > thr:
                out[0] = 1
            elif v1 > thr:
                out[1] = 1
            elif v2 > thr:
                out[2] = 1
            elif v3 > thr:
                out[3] = 1
            elif v0 + v1 > thr:
                out[[0, 1]] = 1
            elif v1 + v2 > thr:
                out[[1, 2]] = 1
            elif v2 + v3 > thr:
                out[[2, 3]] = 1
            elif v0 + v3 > thr:
                out[[0, 3]] = 1
            elif v1 + v3 > thr:
                out[[1, 3]] = 1
            elif v0 + v2 > thr:
                out[[0, 2]] = 1
            elif v0 + v1 + v2 > thr:
                out[[0, 1, 2]] = 1
            elif v1 + v2 + v3 > thr:
                out[[1, 2, 3]] = 1
            elif v0 + v2 + v3 > thr:
                out[[0, 2, 3]] = 1
            elif v0 + v1 + v3 > thr:
                out[[0, 1, 3]] = 1
            else:
                out[:] = 1
            bits[i, j * 4 : j * 4 + 4] = out
    return bits


def seg_ratio_oracle(points: np.ndarray, radius: float, sr_type: str) -> np.ndarray:
    """Per-point segmentation-ratio saliency, full-radius neighborhood
    (reference: src/lidar_odometry.cpp:61-124, without the 300-neighbor cap).
    Returns (n,) scores with NaN where undefined."""
    n = points.shape[0]
    out = np.full(n, np.nan, np.float64)
    d2 = ((points[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    within = d2 <= radius * radius
    for i in range(n):
        if points[i, 0] == 0 and points[i, 1] == 0 and points[i, 2] == 0:
            continue
        nb = points[within[i]]
        if nb.shape[0] == 0:
            continue
        ct = nb.mean(axis=0)
        sp = points[i]
        ctvec = sp - ct
        rel = nb - sp
        dots = rel @ ctvec
        if sr_type == "CV":
            pos = float((dots > 0).sum())
            neg = float((dots < 0).sum())
            mx = max(pos, neg)
            out[i] = 1.0 - min(pos, neg) / mx if mx > 0 else np.nan
        elif sr_type == "CVS":
            keep = (np.linalg.norm(ctvec) != 0) & (np.linalg.norm(rel, axis=1) != 0)
            out[i] = abs(dots[keep].sum()) / nb.shape[0]
        elif sr_type == "CVSN":
            nrm = np.linalg.norm(ctvec) * np.linalg.norm(rel, axis=1)
            keep = nrm != 0
            out[i] = abs((dots[keep] / nrm[keep]).sum()) / nb.shape[0]
    return out


def seg_ratio_capped_oracle(
    points: np.ndarray, radius: float, sr_type: str, cap: int
) -> np.ndarray:
    """Seg-ratio saliency with the reference's EXACT neighbor truncation:
    PCL kd-tree radiusSearch returns the `cap` nearest in-radius points
    sorted by distance (reference: lidar_odometry.cpp:70 max 300)."""
    n = points.shape[0]
    out = np.full(n, np.nan, np.float64)
    d2 = ((points[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    r2 = radius * radius
    for i in range(n):
        if points[i, 0] == 0 and points[i, 1] == 0 and points[i, 2] == 0:
            continue
        idx = np.where(d2[i] <= r2)[0]
        if idx.size == 0:
            continue
        idx = idx[np.argsort(d2[i][idx], kind="stable")][:cap]
        nb = points[idx]
        ct = nb.mean(axis=0)
        sp = points[i]
        ctvec = sp - ct
        rel = nb - sp
        dots = rel @ ctvec
        if sr_type == "CV":
            pos = float((dots > 0).sum())
            neg = float((dots < 0).sum())
            mx = max(pos, neg)
            out[i] = 1.0 - min(pos, neg) / mx if mx > 0 else np.nan
        elif sr_type == "CVS":
            keep = (np.linalg.norm(ctvec) != 0) & (
                np.linalg.norm(rel, axis=1) != 0
            )
            out[i] = abs(dots[keep].sum()) / nb.shape[0]
        elif sr_type == "CVSN":
            nrm = np.linalg.norm(ctvec) * np.linalg.norm(rel, axis=1)
            keep = nrm != 0
            out[i] = abs((dots[keep] / nrm[keep]).sum()) / nb.shape[0]
    return out
