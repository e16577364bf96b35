"""Pallas TPU kernels for the map-facing hot ops (SURVEY §3.5 HOT LOOP #4).

Matching, ICP nearest-neighbor, and insert-dedup all compare ~600 frame
keypoints against the fixed-capacity global map (2^17 rows).  Plain XLA
materializes (600, C) distance matrices in HBM (~300 MB of traffic per op
per frame) and scans the whole capacity even when the map holds a few
thousand entries.  These kernels stream map tiles through VMEM with
running min/argmin (or running OR) accumulators and skip every tile past
`n_valid` — candidates are kept front-compacted (previous-frame keypoints
first, then the append-only map region), so work scales with the actual
map size, not the capacity.

Tie-breaking matches the reference's strict-< first-minimum scans
(reference: src/lidar_odometry.cpp:217-242, bshot_bits.h:6-20): the lowest
index wins, which the manual iota-argmin preserves across tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TB = 1024  # candidate tile (lanes of the distance block)
# The euclid NN kernel carries only (TB, 3) coordinates + a (Kq, TB)
# distance tile through VMEM, so it affords a wider tile than the
# hamming/dedup kernels (whose unpacked-bit tiles dominate VMEM); 2048
# measured ~25% faster per launch on v5e while 2048 made hamming SLOWER.
TB_EUCLID = 2048
_BIG = 3.0e38  # python float: jnp scalars would be captured consts in kernels


def _pad_rows(x: jnp.ndarray, mult: int, fill=0) -> jnp.ndarray:
    n = x.shape[0]
    pad = (-n) % mult
    if pad:
        x = jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)]
        )
    return x


def _tile_argmin_lanes(d: jnp.ndarray):
    """(Q, T) -> per-row (min (Q, 1), lowest argmin (Q, 1) int32)."""
    mn = jnp.min(d, axis=1, keepdims=True)
    idx = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    arg = jnp.min(
        jnp.where(d == mn, idx, 2**30), axis=1, keepdims=True
    )
    return mn, arg


def _tile_argmin_sublanes(d: jnp.ndarray):
    """(Q, T) -> per-column (min (1, T), lowest argmin (1, T) int32)."""
    mn = jnp.min(d, axis=0, keepdims=True)
    idx = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
    arg = jnp.min(
        jnp.where(d == mn, idx, 2**30), axis=0, keepdims=True
    )
    return mn, arg


def _unpack_tile(words: jnp.ndarray) -> jnp.ndarray:
    """(T, W) uint32 -> (T, 32 * W) float32 bits, bit b of word w at
    column w * 32 + b (must match ops.bshot.unpack_bits)."""
    cols = []
    for w in range(words.shape[1]):
        word = words[:, w][:, None]
        shift = jax.lax.broadcasted_iota(jnp.uint32, (1, 32), 1)
        # Mosaic has no uint32->float32 cast; bounce through int32.
        cols.append(
            ((word >> shift) & 1).astype(jnp.int32).astype(jnp.float32)
        )
    return jnp.concatenate(cols, axis=1)


# ---------------------------------------------------------------------------
# Hamming mutual-NN


def _live_tile(j, nv_ref, tile, tail_start):
    """Tile j overlaps the front-compacted live region [0, n_valid) or the
    always-live tail [tail_start, end) (previous-frame keypoints appended
    after the map region; tail_start < 0 disables the tail)."""
    live = j * tile < nv_ref[0]
    if tail_start >= 0:
        live |= j * tile + tile > tail_start
    return live


def _clamped_index(tile, tail_start):
    """Candidate-tile index map that redirects DEAD tiles to block 0: the
    Pallas pipeline skips the input DMA when a step requests the same
    block as the previous step, so the dead middle of a mostly-empty
    candidate buffer costs grid-iteration overhead only (the scalar
    prefetch makes n_valid available to the index map)."""

    def index(j, nv_ref):
        return (jnp.where(_live_tile(j, nv_ref, tile, tail_start), j, 0), 0)

    return index


def _hamming_kernel(nv_ref, a_ref, am_ref, pa_ref, bw_ref, bm_ref,
                    amin_ref, aarg_ref, bmin_ref, barg_ref, *, tail_start):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        amin_ref[:] = jnp.full_like(amin_ref, _BIG)
        aarg_ref[:] = jnp.zeros_like(aarg_ref)

    live = _live_tile(j, nv_ref, TB, tail_start)

    @pl.when(live)
    def _():
        bits = _unpack_tile(bw_ref[:])  # (TB, 352)
        pb = jnp.sum(bits, axis=1, keepdims=True)  # (TB, 1)
        a = a_ref[:].astype(jnp.bfloat16)
        cross = jax.lax.dot_general(
            a, bits.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Ka, TB)
        d = pa_ref[:] + pb.T - 2.0 * cross
        ok = (am_ref[:] > 0) & (bm_ref[:].T > 0)
        d = jnp.where(ok, d, _BIG)

        mn, arg = _tile_argmin_lanes(d)
        better = mn < amin_ref[:]
        aarg_ref[:] = jnp.where(better, arg + j * TB, aarg_ref[:])
        amin_ref[:] = jnp.where(better, mn, amin_ref[:])

        bmn, barg = _tile_argmin_sublanes(d)
        bmin_ref[:] = bmn
        barg_ref[:] = barg

    @pl.when(jnp.logical_not(live))
    def _():
        bmin_ref[:] = jnp.full_like(bmin_ref, _BIG)
        barg_ref[:] = jnp.zeros_like(barg_ref)


@functools.partial(jax.jit, static_argnames=("tail_start", "interpret"))
def hamming_nn_bounded(
    a_bits: jnp.ndarray,  # (Ka, 352) float32 {0,1} unpacked source bits
    a_mask: jnp.ndarray,  # (Ka,)
    b_words: jnp.ndarray,  # (Cb, W) uint32 packed candidates
    b_mask: jnp.ndarray,  # (Cb,)
    n_valid_b: jnp.ndarray,  # () int32 upper bound on valid candidate rows
    tail_start: int = -1,  # candidate rows >= tail_start are always live
    interpret: bool = False,
):
    """Two-sided nearest neighbors under Hamming distance.

    Returns (a_min (Ka,), a_arg (Ka,), b_min (Cb,), b_arg (Cb,)) where
    invalid pairs have distance _BIG.
    """
    Ka, Cb = a_bits.shape[0], b_words.shape[0]
    a = _pad_rows(a_bits, 16)
    am = _pad_rows(a_mask.astype(jnp.float32)[:, None], 16)
    pa = jnp.sum(a, axis=1, keepdims=True)
    bw = _pad_rows(b_words, TB)
    bm = _pad_rows(b_mask.astype(jnp.float32)[:, None], TB)
    Kp = a.shape[0]
    grid = (bw.shape[0] // TB,)
    bidx = _clamped_index(TB, tail_start)
    amin, aarg, bmin, barg = pl.pallas_call(
        functools.partial(_hamming_kernel, tail_start=tail_start),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((Kp, a.shape[1]), lambda j, nv: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Kp, 1), lambda j, nv: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Kp, 1), lambda j, nv: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TB, b_words.shape[1]), bidx,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TB, 1), bidx, memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((Kp, 1), lambda j, nv: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Kp, 1), lambda j, nv: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TB), lambda j, nv: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TB), lambda j, nv: (0, j),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Kp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Kp, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, bw.shape[0]), jnp.float32),
            jax.ShapeDtypeStruct((1, bw.shape[0]), jnp.int32),
        ],
        interpret=interpret,
    )(jnp.asarray(n_valid_b, jnp.int32).reshape(1), a, am, pa, bw, bm)
    return (amin[:Ka, 0], aarg[:Ka, 0], bmin[0, :Cb], barg[0, :Cb])


# ---------------------------------------------------------------------------
# Euclidean nearest neighbor (ICP correspondence search)


def _euclid_kernel(nv_ref, q_ref, qm_ref, r_ref, rm_ref, dmin_ref, darg_ref,
                   *, tail_start):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        dmin_ref[:] = jnp.full_like(dmin_ref, _BIG)
        darg_ref[:] = jnp.zeros_like(darg_ref)

    live = _live_tile(j, nv_ref, TB_EUCLID, tail_start)

    @pl.when(live)
    def _():
        q = q_ref[:]  # (Kq, 3)
        r = r_ref[:]  # (TB_E, 3)
        qq = jnp.sum(q * q, axis=1, keepdims=True)
        rr = jnp.sum(r * r, axis=1, keepdims=True)
        cross = jax.lax.dot_general(
            q, r, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        d2 = jnp.maximum(qq + rr.T - 2.0 * cross, 0.0)
        ok = (qm_ref[:] > 0) & (rm_ref[:].T > 0)
        d2 = jnp.where(ok, d2, _BIG)
        mn, arg = _tile_argmin_lanes(d2)
        better = mn < dmin_ref[:]
        darg_ref[:] = jnp.where(better, arg + j * TB_EUCLID, darg_ref[:])
        dmin_ref[:] = jnp.where(better, mn, dmin_ref[:])


@functools.partial(jax.jit, static_argnames=("tail_start", "interpret"))
def euclid_nn_bounded(
    q: jnp.ndarray,  # (Kq, 3)
    q_mask: jnp.ndarray,
    ref: jnp.ndarray,  # (Cr, 3)
    ref_mask: jnp.ndarray,
    n_valid_ref: jnp.ndarray,
    tail_start: int = -1,
    interpret: bool = False,
):
    """Per-query nearest candidate: (d2 (Kq,), idx (Kq,)); invalid -> _BIG."""
    Kq = q.shape[0]
    qp = _pad_rows(q, 16)
    qm = _pad_rows(q_mask.astype(jnp.float32)[:, None], 16)
    rp = _pad_rows(ref, TB_EUCLID)
    rm = _pad_rows(ref_mask.astype(jnp.float32)[:, None], TB_EUCLID)
    Kp = qp.shape[0]
    grid = (rp.shape[0] // TB_EUCLID,)
    ridx = _clamped_index(TB_EUCLID, tail_start)
    dmin, darg = pl.pallas_call(
        functools.partial(_euclid_kernel, tail_start=tail_start),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((Kp, 3), lambda j, nv: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Kp, 1), lambda j, nv: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TB_EUCLID, 3), ridx, memory_space=pltpu.VMEM),
                pl.BlockSpec((TB_EUCLID, 1), ridx, memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((Kp, 1), lambda j, nv: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Kp, 1), lambda j, nv: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Kp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Kp, 1), jnp.int32),
        ],
        interpret=interpret,
    )(jnp.asarray(n_valid_ref, jnp.int32).reshape(1), qp, qm, rp, rm)
    return dmin[:Kq, 0], darg[:Kq, 0]


# ---------------------------------------------------------------------------
# Insert-dedup: is a new keypoint blocked by an existing map entry?


def _dedup_kernel(nv_ref, p_ref, k1_ref, k2_ref, s_ref, mp_ref, mk1_ref,
                  mk2_ref, ms_ref, mv_ref, out_ref, *, r2):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(_live_tile(j, nv_ref, TB, -1))
    def _():
        p = p_ref[:]
        m = mp_ref[:]
        pp = jnp.sum(p * p, axis=1, keepdims=True)
        mm = jnp.sum(m * m, axis=1, keepdims=True)
        cross = jax.lax.dot_general(
            p, m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        d2 = pp + mm.T - 2.0 * cross
        same = (k1_ref[:] == mk1_ref[:].T) & (k2_ref[:] == mk2_ref[:].T)
        blocker = (
            (mv_ref[:].T > 0)
            & same
            & (d2 < r2)
            & (ms_ref[:].T >= s_ref[:])
        )
        out_ref[:] = out_ref[:] | jnp.any(
            blocker, axis=1, keepdims=True
        ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("dedup_radius", "interpret"))
def dedup_blocked_bounded(
    pos: jnp.ndarray,  # (K, 3) new snapped positions
    blk: jnp.ndarray,  # (K, 3) int32 block coords
    seg: jnp.ndarray,  # (K,)
    map_pos: jnp.ndarray,  # (C, 3)
    map_blk: jnp.ndarray,  # (C, 3) int32
    map_seg: jnp.ndarray,  # (C,)
    map_valid: jnp.ndarray,  # (C,)
    n_valid: jnp.ndarray,  # () int32 bound on valid map rows
    dedup_radius: float = 800.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """(K,) True where an existing same-block entry within dedup_radius has
    seg_ratio >= the newcomer's (reference: mymap.cpp:16-24)."""
    K = pos.shape[0]

    def keys(b):
        return (
            b[:, 0] * jnp.int32(65536) + b[:, 1],
            b[:, 2],
        )

    k1, k2 = keys(blk)
    mk1, mk2 = keys(map_blk)
    p = _pad_rows(pos, 16)
    k1p = _pad_rows(k1[:, None], 16)
    k2p = _pad_rows(k2[:, None], 16)
    sp = _pad_rows(seg[:, None], 16)
    mp = _pad_rows(map_pos, TB)
    mk1p = _pad_rows(mk1[:, None], TB)
    mk2p = _pad_rows(mk2[:, None], TB)
    msp = _pad_rows(map_seg[:, None], TB)
    mvp = _pad_rows(map_valid.astype(jnp.float32)[:, None], TB)
    Kp = p.shape[0]
    grid = (mp.shape[0] // TB,)
    midx = _clamped_index(TB, -1)
    out = pl.pallas_call(
        functools.partial(_dedup_kernel, r2=dedup_radius * dedup_radius),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((Kp, 3), lambda j, nv: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Kp, 1), lambda j, nv: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Kp, 1), lambda j, nv: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Kp, 1), lambda j, nv: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TB, 3), midx, memory_space=pltpu.VMEM),
                pl.BlockSpec((TB, 1), midx, memory_space=pltpu.VMEM),
                pl.BlockSpec((TB, 1), midx, memory_space=pltpu.VMEM),
                pl.BlockSpec((TB, 1), midx, memory_space=pltpu.VMEM),
                pl.BlockSpec((TB, 1), midx, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((Kp, 1), lambda j, nv: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((Kp, 1), jnp.int32),
        interpret=interpret,
    )(jnp.asarray(n_valid, jnp.int32).reshape(1), p, k1p, k2p, sp, mp,
      mk1p, mk2p, msp, mvp)
    return out[:K, 0] > 0
