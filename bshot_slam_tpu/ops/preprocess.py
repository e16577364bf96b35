"""Sweep preprocessing: ground / self-car / occlusion classification (JAX).

TPU-native reimplementation of the reference's `Preprocessor`
(reference: src/preprocess.cpp).  The reference walks each azimuth column
bottom-up with mutable per-column state over `std::map` trees; here the walk
is a single `lax.scan` over the ring axis with all azimuth columns carried in
parallel as (A,)-shaped state — 32 sequential steps instead of ~70k, with
all per-step work on the VPU.  The occlusion rule becomes a vectorized
previous-valid-neighbor comparison plus a scatter, and the self-car crop is a
pure mask.  Classification codes match the reference exactly:
0 keep / 1 ground / 2 self-car / 3 occluded (reference: preprocess.cpp:
56,107,158,188).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bshot_slam_tpu.config import (
    CLASS_GROUND,
    CLASS_KEEP,
    CLASS_OCCLUDED,
    CLASS_SELFCAR,
    PreprocessConfig,
)

_EPS = 1e-6


class PreprocessResult(NamedTuple):
    classes: jnp.ndarray  # (R, A) int32 class codes
    xyz: jnp.ndarray  # (R, A, 3) float32 sensor-frame coordinates, mm
    valid: jnp.ndarray  # (R, A) bool: has a return (range > 0)


def polar_to_xyz(
    range_mm: jnp.ndarray, azimuth_rad: jnp.ndarray, vert_rad: jnp.ndarray
) -> jnp.ndarray:
    """(R, A) polar -> (R, A, 3) sensor-frame XYZ (reference: preprocess.cpp:50-52)."""
    v = vert_rad[:, None]
    cos_v = jnp.cos(v)
    return jnp.stack(
        [
            range_mm * cos_v * jnp.sin(azimuth_rad),
            range_mm * cos_v * jnp.cos(azimuth_rad),
            range_mm * jnp.sin(v) * jnp.ones_like(azimuth_rad),
        ],
        axis=-1,
    )


def _ground_scan(
    range_mm: jnp.ndarray,
    azimuth_rad: jnp.ndarray,
    vert_rad: jnp.ndarray,
    xyz: jnp.ndarray,
    cfg: PreprocessConfig,
) -> jnp.ndarray:
    """Stateful bottom-up ground walk (reference: preprocess.cpp:73-166).

    lax.scan over rings (sorted ascending vertical angle); the carry holds
    the per-column state booleans and previous/threshold points.
    """
    R, A = range_mm.shape
    H = cfg.sensor_height_mm
    # Virtual initial ground point at z=-H under the sensor
    # (reference: preprocess.cpp:80-83).
    az0 = azimuth_rad[0]  # columns share azimuth down a firing; row 0's value
    horiz0 = -H / jnp.tan(cfg.vert_init_rad)
    p0 = jnp.stack(
        [horiz0 * jnp.sin(az0), horiz0 * jnp.cos(az0), jnp.full((A,), -H)],
        axis=-1,
    ).astype(jnp.float32)

    init = dict(
        prev_is_ground=jnp.ones((A,), bool),
        lost_pt=jnp.zeros((A,), bool),
        set_th_pt=jnp.zeros((A,), bool),
        p_prev=p0,
        p_th=p0,
    )

    def step(state, inputs):
        d, p_curr = inputs  # (A,), (A, 3)
        pig = state["prev_is_ground"]
        lost = state["lost_pt"]
        set_th = state["set_th_pt"]
        p_prev = state["p_prev"]
        p_th = state["p_th"]

        z = p_curr[:, 2]
        diff = p_curr - p_prev
        grad = jnp.rad2deg(
            jnp.arcsin(
                jnp.clip(diff[:, 2] / (jnp.linalg.norm(diff, axis=-1) + _EPS), -1.0, 1.0)
            )
        )
        norm_prev = jnp.linalg.norm(p_prev, axis=-1)

        # Rule 1: remember a threshold point (reference: preprocess.cpp:99-103).
        cond1 = pig & ((grad > cfg.grad_th_deg) | (d == 0) | (d < norm_prev))
        set_th = set_th | cond1
        p_th = jnp.where(cond1[:, None], p_prev, p_th)

        # Rule 2: ground continuation / break / lower-ground re-attach
        # (reference: preprocess.cpp:105-127).
        g_keep = pig & (grad < cfg.grad_th_deg) & ~lost
        lower = ~pig & (z < cfg.lowpt_th_mm) & (grad < cfg.grad_th_deg)
        cls = jnp.where(g_keep | lower, CLASS_GROUND, CLASS_KEEP)
        pig = g_keep | lower
        set_th = jnp.where(lower, False, set_th)

        # Rule 3: lost point (reference: preprocess.cpp:129-136).
        lost_new = d == 0
        cls = jnp.where(lost_new, CLASS_GROUND, cls)
        pig = jnp.where(lost_new, False, pig)

        # Rule 4: range shortened vs previous (reference: preprocess.cpp:138-141).
        shorten = (d < norm_prev) & (d != 0)
        cls = jnp.where(shorten, CLASS_KEEP, cls)
        pig = jnp.where(shorten, False, pig)

        # Rule 5: threshold-point restart (reference: preprocess.cpp:146-150).
        restart = set_th & ((z - p_th[:, 2]) < cfg.height_th_mm) & (z < p_prev[:, 2])
        set_th = jnp.where(restart, False, set_th)
        cls = jnp.where(restart, CLASS_GROUND, cls)
        pig = jnp.where(restart, True, pig)

        # Rule 6: self-car crop box (reference: preprocess.cpp:155-158).
        # Note lost points (origin) fall inside the box, as in the reference.
        x, y = p_curr[:, 0], p_curr[:, 1]
        incar = (
            (x >= cfg.car_x_mm[0]) & (x <= cfg.car_x_mm[1])
            & (y >= cfg.car_y_mm[0]) & (y <= cfg.car_y_mm[1])
            & (z >= cfg.car_z_mm[0]) & (z <= cfg.car_z_mm[1])
        )
        cls = jnp.where(incar, CLASS_SELFCAR, cls)

        new_state = dict(
            prev_is_ground=pig,
            lost_pt=lost_new,
            set_th_pt=set_th,
            p_prev=p_curr,
            p_th=p_th,
        )
        return new_state, cls.astype(jnp.int32)

    _, classes = jax.lax.scan(step, init, (range_mm, xyz))
    return classes  # (R, A)


def _occlusion_pass(
    range_mm: jnp.ndarray,
    azimuth_rad: jnp.ndarray,
    classes: jnp.ndarray,
    cfg: PreprocessConfig,
) -> jnp.ndarray:
    """Mark background side of sharp range discontinuities along azimuth
    (reference: preprocess.cpp:168-199).  Vectorized over rings: for each
    cell the 'previous' column is the last non-lost column before it (the
    very first column counts even if lost, mirroring the reference's
    isFirst seeding at preprocess.cpp:175-177)."""
    R, A = range_mm.shape
    valid = range_mm > 0
    idx = jnp.broadcast_to(jnp.arange(A, dtype=jnp.int32), (R, A))
    # Last index j <= i with valid[j] (or j == 0).
    seed = valid | (idx == 0)
    vidx = jnp.where(seed, idx, -1)
    last_incl = jax.lax.associative_scan(jnp.maximum, vidx, axis=1)
    prev_idx = jnp.concatenate(
        [jnp.full((R, 1), -1, jnp.int32), last_incl[:, :-1]], axis=1
    )

    take = jnp.clip(prev_idx, 0, A - 1)
    prev_range = jnp.take_along_axis(range_mm, take, axis=1)
    prev_az = jnp.take_along_axis(azimuth_rad, take, axis=1)
    active = valid & (prev_idx >= 0)

    d_dist = range_mm - prev_range
    d_hor = azimuth_rad - prev_az
    occ = active & (jnp.abs(d_dist) > cfg.dist_th_mm) & (
        jnp.abs(d_hor) < cfg.angdiff_th_rad
    )
    mark_curr = occ & (d_dist > 0)
    mark_prev_flag = occ & (d_dist <= 0)

    # Scatter the previous-point marks (each prev index is marked by at most
    # one successor, its next valid column).
    prev_marks = (
        jnp.zeros((R, A), jnp.int32)
        .at[jnp.arange(R)[:, None], take]
        .max(mark_prev_flag.astype(jnp.int32))
    )
    marked = mark_curr | (prev_marks > 0)
    return jnp.where(
        marked & (classes == CLASS_KEEP), CLASS_OCCLUDED, classes
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def preprocess(
    range_mm: jnp.ndarray,
    azimuth_rad: jnp.ndarray,
    vert_rad: jnp.ndarray,
    cfg: PreprocessConfig,
) -> PreprocessResult:
    """Full preprocessing: classify every cell of a dense sweep.

    Equivalent of `Preprocessor::run()` minus IO (reference:
    src/preprocess.cpp:218-227).
    """
    range_mm = range_mm.astype(jnp.float32)
    xyz = polar_to_xyz(range_mm, azimuth_rad, vert_rad)
    classes = _ground_scan(range_mm, azimuth_rad, vert_rad, xyz, cfg)
    classes = _occlusion_pass(range_mm, azimuth_rad, classes, cfg)
    return PreprocessResult(classes=classes, xyz=xyz, valid=range_mm > 0)


@functools.partial(jax.jit, static_argnames=("max_points",))
def extract_cloud(
    result: PreprocessResult,
    selected: jnp.ndarray,
    max_points: int,
    save_sel: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gather kept points into a fixed-size padded cloud.

    Equivalent of `Preprocessor::writePointCloud` (reference:
    src/preprocess.cpp:201-216): emit XYZ where class == keep, the return is
    real, and the select-map matches `save_sel`.  Emission order is azimuth-
    major then vertical (the reference's column-major map walk).  Returns
    (points (max_points, 3) with zero padding, mask (max_points,)).
    """
    keep = result.valid & (result.classes == CLASS_KEEP) & (selected == save_sel)
    # Column-major order: transpose to (A, R) before flattening.
    keep_f = keep.T.reshape(-1)
    xyz_f = jnp.swapaxes(result.xyz, 0, 1).reshape(-1, 3)
    n = keep_f.shape[0]
    if n < max_points:  # pad the flat cell list up to the static capacity
        keep_f = jnp.concatenate([keep_f, jnp.zeros(max_points - n, bool)])
        xyz_f = jnp.concatenate(
            [xyz_f, jnp.zeros((max_points - n, 3), xyz_f.dtype)]
        )
    order = jnp.where(keep_f, 0, 1).astype(jnp.int32)
    # Stable partition: indices of kept cells first, in scan order.
    perm = jnp.argsort(order, stable=True)
    take = perm[:max_points]
    points = xyz_f[take]
    mask = keep_f[take]
    points = jnp.where(mask[:, None], points, 0.0)
    return points, mask
