"""Device-resident global keypoint map with voxel-block dedup (JAX).

Rebuild of the reference's two-level hash map (reference: include/mymap.h,
src/mymap.cpp): 10 m voxel blocks of keypoints with insert-time dedup —
a new keypoint is rejected when an existing same-block keypoint lies within
800 mm AND has >= its seg_ratio (reference: mymap.cpp:16-24) — and AABB
range queries at block granularity (reference: mymap.cpp:28-74).

The TPU design replaces pointer-chasing hash maps with fixed-capacity
device arrays + masks:

  * positions/descriptors/seg_ratios/block coords live in (capacity, ...)
    arrays with a valid mask and an append cursor;
  * insertion is one batched program: an (K, C) masked distance test against
    the existing map (MXU d2 expansion), an in-batch sequential-shadow test,
    and a cumsum scatter append;
  * queries return masks over the capacity axis instead of gathering —
    downstream matching is dense masked compute, so no dynamic shapes ever
    materialize.

Deviations from the reference, by design: the reference inserts its 600
keypoints one by one, so keypoint i sees 0..i-1 in the dedup test and a new
keypoint at an identical snapped position silently replaces the old one
(unordered_map assignment, mymap.cpp:23).  The batched rebuild mirrors the
sequential visibility with a lower-triangular in-batch test but keeps
both members of an exact-position pair only when the newcomer wins the
seg-ratio test; block occupancy statistics match the reference to within
the dedup tie cases.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bshot_slam_tpu.config import MapConfig
from bshot_slam_tpu.ops.keypoints import _pair_d2


class MapState(NamedTuple):
    positions: jnp.ndarray  # (C, 3) float32, snapped to cfg.snap_mm
    descriptors: jnp.ndarray  # (C, 11) uint32 packed B-SHOT
    seg_ratios: jnp.ndarray  # (C,) float32
    blocks: jnp.ndarray  # (C, 3) int32 voxel-block coords
    valid: jnp.ndarray  # (C,) bool
    cursor: jnp.ndarray  # () int32 next free slot
    # Provenance for backend corrections: the frame index whose pose placed
    # each landmark in the world (-1 for empty rows).  When the pose graph
    # corrects keyframe poses, landmarks are re-anchored by the correction
    # of the trajectory segment that inserted them (no reference
    # counterpart: the reference map is never corrected).
    frame_born: jnp.ndarray  # (C,) int32
    # Insertions dropped because the map was at capacity (saturation
    # observability; the reference grows unboundedly, mymap.cpp:4-26).
    n_dropped: jnp.ndarray  # () int32


def init_map(cfg: MapConfig, capacity: int | None = None) -> MapState:
    C = capacity if capacity is not None else cfg.capacity
    return MapState(
        positions=jnp.zeros((C, 3), jnp.float32),
        descriptors=jnp.zeros((C, 11), jnp.uint32),
        seg_ratios=jnp.zeros((C,), jnp.float32),
        blocks=jnp.zeros((C, 3), jnp.int32),
        valid=jnp.zeros((C,), bool),
        cursor=jnp.zeros((), jnp.int32),
        frame_born=jnp.full((C,), -1, jnp.int32),
        n_dropped=jnp.zeros((), jnp.int32),
    )


def grow_map(state: MapState, new_capacity: int) -> MapState:
    """Zero-pad every map array to a larger capacity (host-boundary op;
    every in-step kernel derives the capacity from array shapes, so the
    grown state simply compiles a wider step)."""
    C = state.positions.shape[0]
    if new_capacity <= C:
        return state
    p = new_capacity - C

    def pad(x):
        return jnp.concatenate(
            [x, jnp.zeros((p,) + x.shape[1:], x.dtype)], axis=0
        )

    return MapState(
        positions=pad(state.positions),
        descriptors=pad(state.descriptors),
        seg_ratios=pad(state.seg_ratios),
        blocks=pad(state.blocks),
        valid=pad(state.valid),
        cursor=state.cursor,
        frame_born=jnp.concatenate(
            [state.frame_born, jnp.full((p,), -1, jnp.int32)]
        ),
        n_dropped=state.n_dropped,
    )


def compact_indices(mask: jnp.ndarray, W: int) -> jnp.ndarray:
    """Indices of the first (ascending) `W` True rows of `mask`, padded
    with arbitrary in-range indices (callers mask the tail by count).

    Implemented as top-k over a negated iota instead of `jnp.nonzero`:
    measured 0.62 vs 1.69 ms at C=131072/W=32768 on TPU (nonzero lowers
    to cumsum + serialized scatter).  top_k's descending value order on
    the strictly-decreasing valid scores IS ascending index order, which
    the lowest-index tie-breaking downstream relies on.  Falls back to
    nonzero when the index range exceeds f32's exact-integer range.
    """
    C = mask.shape[0]
    if C >= (1 << 24):
        return jnp.nonzero(mask, size=W, fill_value=C - 1)[0]
    score = jnp.where(mask, -jnp.arange(C, dtype=jnp.float32), -jnp.inf)
    _, idx = jax.lax.top_k(score, W)
    return idx


def snap_positions(pos: jnp.ndarray, snap_mm: float) -> jnp.ndarray:
    """10 mm grid snap, truncating toward zero (reference: keypoint.cpp:25-29)."""
    return jnp.trunc(pos / snap_mm) * snap_mm


def block_coords(pos: jnp.ndarray, block_mm: float) -> jnp.ndarray:
    """Voxel-block integer coords by rounding (reference: mymap.cpp:97-99)."""
    return jnp.round(pos / block_mm).astype(jnp.int32)


def _dedup_against(
    pos: jnp.ndarray,
    blk: jnp.ndarray,
    seg: jnp.ndarray,
    m_pos: jnp.ndarray,
    m_blk: jnp.ndarray,
    m_seg: jnp.ndarray,
    m_valid: jnp.ndarray,
    n_valid: jnp.ndarray,
    cfg: MapConfig,
) -> jnp.ndarray:
    """(K,) True where an existing same-block candidate within the dedup
    radius has seg_ratio >= the newcomer's (reference: mymap.cpp:16-24).
    TPU runs the cursor-bounded Pallas kernel; elsewhere dense masked."""
    if jax.default_backend() == "tpu":
        from bshot_slam_tpu.kernels.mapops import dedup_blocked_bounded

        return dedup_blocked_bounded(
            pos, blk, seg, m_pos, m_blk, m_seg, m_valid, n_valid,
            dedup_radius=cfg.dedup_radius_mm,
        )
    r2 = cfg.dedup_radius_mm * cfg.dedup_radius_mm
    d2 = _pair_d2(pos, m_pos)  # (K, C)
    same_block = jnp.all(blk[:, None, :] == m_blk[None, :, :], axis=-1)
    blocker = (
        m_valid[None, :]
        & same_block
        & (d2 < r2)
        & (m_seg[None, :] >= seg[:, None])
    )
    return jnp.any(blocker, axis=1)


@functools.partial(
    jax.jit, static_argnames=("cfg", "window_cap"), donate_argnames=("state",)
)
def insert_keypoints(
    state: MapState,
    pos: jnp.ndarray,  # (K, 3) world-frame keypoint positions
    desc: jnp.ndarray,  # (K, 11) packed descriptors
    seg: jnp.ndarray,  # (K,)
    kmask: jnp.ndarray,  # (K,)
    cfg: MapConfig,
    frame_idx: jnp.ndarray | int = -1,  # () int32 provenance for frame_born
    window_cap: int | None = None,  # compact dedup candidates (see below)
) -> MapState:
    """Batched equivalent of K sequential `Map::addKeypoint` calls."""
    fidx = jnp.asarray(frame_idx, jnp.int32)
    pos = snap_positions(pos, cfg.snap_mm)
    blk = block_coords(pos, cfg.block_size_mm)
    r2 = cfg.dedup_radius_mm * cfg.dedup_radius_mm

    # --- dedup against the existing map ---
    # The map region is append-only (valid rows are exactly [0, cursor)),
    # so the TPU kernel skips candidate tiles past the cursor.  With
    # `window_cap`, candidates are first compacted to the map rows whose
    # block lies inside the new batch's block AABB — an exact superset of
    # possible blockers (a blocker shares a block with some newcomer), the
    # compaction analog of the reference touching only the blocks it
    # inserts into (mymap.cpp:4-26).  Overflow falls back to the dense
    # scan (lossless).
    C = state.positions.shape[0]
    if window_cap is not None and C > window_cap:
        W = window_cap
        big = jnp.int32(2**30)
        lo = jnp.min(jnp.where(kmask[:, None], blk, big), axis=0)
        hi = jnp.max(jnp.where(kmask[:, None], blk, -big), axis=0)
        inwin = state.valid & jnp.all(
            (state.blocks >= lo[None, :]) & (state.blocks <= hi[None, :]),
            axis=-1,
        )
        n_win = jnp.sum(inwin.astype(jnp.int32))
        widx = compact_indices(inwin, W)
        wmask = jnp.arange(W, dtype=jnp.int32) < n_win

        def _dense(_):
            return _dedup_against(
                pos, blk, seg, state.positions, state.blocks,
                state.seg_ratios, state.valid, state.cursor, cfg,
            )

        def _compact(_):
            return _dedup_against(
                pos, blk, seg, state.positions[widx], state.blocks[widx],
                state.seg_ratios[widx], wmask, n_win, cfg,
            )

        rejected_by_map = jax.lax.cond(n_win > W, _dense, _compact, None)
    else:
        rejected_by_map = _dedup_against(
            pos, blk, seg, state.positions, state.blocks, state.seg_ratios,
            state.valid, state.cursor, cfg,
        )

    # --- sequential-shadow dedup within the batch (i sees j < i) ---
    d2b = _pair_d2(pos, pos)
    same_blk_b = jnp.all(blk[:, None, :] == blk[None, :, :], axis=-1)
    K = pos.shape[0]
    earlier = jnp.tril(jnp.ones((K, K), bool), k=-1)
    blocker_b = (
        earlier
        & kmask[None, :]
        & same_blk_b
        & (d2b < r2)
        & (seg[None, :] >= seg[:, None])
    )
    rejected_in_batch = jnp.any(blocker_b, axis=1)

    accept = kmask & ~rejected_by_map & ~rejected_in_batch

    # --- cumsum scatter append ---
    offs = jnp.cumsum(accept.astype(jnp.int32)) - 1
    slot = state.cursor + offs
    C = state.positions.shape[0]
    ok = accept & (slot < C)
    # Inactive rows write to a scratch slot (C, via clip on an extended view
    # is not possible) -> use scatter with drop mode on out-of-range index.
    tgt = jnp.where(ok, slot, C)  # C is out of range -> dropped
    new_state = MapState(
        positions=state.positions.at[tgt].set(pos, mode="drop"),
        descriptors=state.descriptors.at[tgt].set(desc, mode="drop"),
        seg_ratios=state.seg_ratios.at[tgt].set(seg, mode="drop"),
        blocks=state.blocks.at[tgt].set(blk, mode="drop"),
        valid=state.valid.at[tgt].set(True, mode="drop"),
        cursor=jnp.minimum(
            state.cursor + jnp.sum(ok.astype(jnp.int32)), C
        ).astype(jnp.int32),
        frame_born=state.frame_born.at[tgt].set(
            jnp.broadcast_to(fidx, tgt.shape), mode="drop"
        ),
        # Accepted-but-out-of-capacity keypoints are lost: count them.
        n_dropped=state.n_dropped
        + jnp.sum(accept.astype(jnp.int32))
        - jnp.sum(ok.astype(jnp.int32)),
    )
    return new_state


@functools.partial(
    jax.jit, static_argnames=("n_evict",), donate_argnames=("state",)
)
def evict_keypoints(state: MapState, n_evict: int) -> MapState:
    """Evict up to `n_evict` keypoints, lowest-seg-ratio-in-densest-block
    first, then front-compact so the append-only invariant (valid rows are
    exactly [0, cursor)) holds for the bounded kernels.

    This is the saturation extension of the reference's insert-time dedup
    (mymap.cpp:16-24 rejects low-seg-ratio newcomers near strong existing
    keypoints; here, when the fixed capacity fills, the weakest keypoints of
    the most crowded voxel blocks make room instead of new data being
    silently dropped).  The reference itself grows unboundedly.
    """
    C = state.positions.shape[0]
    # --- per-row block occupancy via lexsort + run-length ---
    SENT = jnp.int32(2**30)
    blk = jnp.where(state.valid[:, None], state.blocks, SENT)
    order = jnp.lexsort((blk[:, 2], blk[:, 1], blk[:, 0]))
    sb = blk[order]
    new_run = jnp.concatenate(
        [jnp.array([True]), jnp.any(sb[1:] != sb[:-1], axis=1)]
    )
    run_id = jnp.cumsum(new_run.astype(jnp.int32)) - 1
    run_len = jax.ops.segment_sum(
        jnp.ones((C,), jnp.int32), run_id, num_segments=C
    )
    occ_sorted = run_len[run_id]
    occ = jnp.zeros((C,), jnp.int32).at[order].set(occ_sorted)
    occ = jnp.where(state.valid, occ, 0)

    # --- eviction score: densest block first, lowest seg_ratio within ---
    seg_rank = jnp.zeros((C,), jnp.int32).at[
        jnp.argsort(state.seg_ratios)
    ].set(jnp.arange(C, dtype=jnp.int32))  # ascending rank
    score = jnp.where(
        state.valid,
        occ.astype(jnp.float32) * (2.0 * C) + (C - 1 - seg_rank),
        -1.0,
    )
    _, evict_idx = jax.lax.top_k(score, n_evict)
    evict = jnp.zeros((C,), bool).at[evict_idx].set(True)
    evict &= state.valid  # never "evict" empty rows

    # --- stable front-compaction of survivors ---
    keep = state.valid & ~evict
    perm = jnp.argsort(~keep, stable=True)  # kept rows first, order kept
    return MapState(
        positions=state.positions[perm],
        descriptors=state.descriptors[perm],
        seg_ratios=state.seg_ratios[perm],
        blocks=state.blocks[perm],
        valid=keep[perm],
        cursor=jnp.sum(keep.astype(jnp.int32)),
        frame_born=jnp.where(keep, state.frame_born, -1)[perm],
        n_dropped=state.n_dropped,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def query_mask(
    state: MapState, center: jnp.ndarray, range_mm: float, cfg: MapConfig
) -> jnp.ndarray:
    """(C,) mask of keypoints whose block intersects the +-range AABB.

    Mirrors the reference's block-granularity AABB scan (reference:
    mymap.cpp:40-49): block coord b qualifies on each axis when
    round((c - range)/prec) <= b <= round((c + range)/prec).
    """
    lo = jnp.round((center - range_mm) / cfg.block_size_mm).astype(jnp.int32)
    hi = jnp.round((center + range_mm) / cfg.block_size_mm).astype(jnp.int32)
    inside = jnp.all(
        (state.blocks >= lo[None, :]) & (state.blocks <= hi[None, :]), axis=-1
    )
    return state.valid & inside


def map_size(state: MapState) -> jnp.ndarray:
    """Number of stored keypoints (reference: mymap.cpp:86-93)."""
    return jnp.sum(state.valid.astype(jnp.int32))
