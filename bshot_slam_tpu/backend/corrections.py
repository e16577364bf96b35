"""Propagating pose-graph corrections into the live SLAM state.

New capability beyond the reference (its g2o link is vestigial — reference:
CMakeLists.txt:86; the map is never corrected, SURVEY §5): after the pose
graph moves keyframe poses, this module

  * interpolates the per-keyframe correction ``T_opt @ inv(T_raw)`` to every
    in-between frame by twist (se3 log/exp) interpolation, and
  * re-anchors global-map landmarks using their ``frame_born`` provenance
    (mapstore.MapState.frame_born: the frame whose estimated pose placed
    each landmark in the world), so subsequent frames match against the
    corrected map.

Everything device-side is one jitted batched program over the fixed-capacity
map arrays; the only host work is slicing live keyframe rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from bshot_slam_tpu.config import MapConfig
from bshot_slam_tpu.geometry import se3
from bshot_slam_tpu.odometry.mapstore import (
    MapState,
    block_coords,
    snap_positions,
)


@jax.jit
def interpolate_corrections(
    corr_kf: jnp.ndarray,  # (n_kf, 4, 4) per-keyframe world correction
    kf_frames: jnp.ndarray,  # (n_kf,) ascending frame indices of keyframes
    frames: jnp.ndarray,  # (F,) frame indices to correct
) -> jnp.ndarray:
    """(F, 4, 4) corrections: exact at keyframes, twist-interpolated between
    them, clamped to the first/last keyframe correction outside the span."""
    n_kf = corr_kf.shape[0]
    k = jnp.searchsorted(kf_frames, frames, side="right") - 1
    k = jnp.clip(k, 0, n_kf - 1)
    k1 = jnp.minimum(k + 1, n_kf - 1)
    f0 = kf_frames[k].astype(jnp.float32)
    f1 = kf_frames[k1].astype(jnp.float32)
    s = jnp.where(f1 > f0, (frames.astype(jnp.float32) - f0) / (f1 - f0), 0.0)
    s = jnp.clip(s, 0.0, 1.0)
    A = corr_kf[k]
    B = corr_kf[k1]
    xi = se3.se3_log(se3.compose(B, se3.inverse(A)))  # (F, 6)
    return se3.compose(se3.se3_exp(xi * s[:, None]), A)


@functools.partial(
    jax.jit, static_argnames=("cfg",), donate_argnames=("state",)
)
def reanchor_map(
    state: MapState,
    corr: jnp.ndarray,  # (F, 4, 4) per-frame corrections
    frame0: jnp.ndarray,  # () int32 frame index of corr[0]
    cfg: MapConfig,
) -> MapState:
    """Move every landmark by the correction of the frame that inserted it
    (frame_born), re-snapping to the position grid and recomputing voxel
    blocks so dedup/query semantics stay consistent."""
    F = corr.shape[0]
    idx = jnp.clip(state.frame_born - frame0, 0, F - 1)
    T = corr[idx]  # (C, 4, 4)
    p = (
        jnp.einsum("cij,cj->ci", T[:, :3, :3], state.positions)
        + T[:, :3, 3]
    )
    p = snap_positions(p, cfg.snap_mm)
    move = state.valid & (state.frame_born >= 0)
    new_pos = jnp.where(move[:, None], p, state.positions)
    new_blk = jnp.where(
        move[:, None], block_coords(new_pos, cfg.block_size_mm), state.blocks
    )
    return state._replace(positions=new_pos, blocks=new_blk)
