"""Pallas TPU kernel: fused radius-neighborhood accumulation.

The hottest loops in the pipeline (SURVEY §3.3 HOT LOOP #1-2) reduce, for
every point i, features of every in-radius point j:

    out[i, :] = sum_j [ |p_i - p_j| <= r ]  *  feat(p_j)

Under plain XLA this streams (N, tile)-sized weight matrices through HBM
on every scan step; this kernel keeps the whole (Tq, Tr) tile pipeline in
VMEM — the pairwise d2 expansion, the radius mask, and the (Tq, Tr) x
(Tr, F) feature matmul all fuse, so HBM sees only the inputs once per grid
stripe and the (N, F) accumulator.

The feature matrix is caller-supplied, which covers all users:
  * moments (count, sum, outer products)  -> normals / ISS / seg-ratio ct
  * seg-ratio dot-sign counts (CV) and dot sums (CVS/CVSN), via per-query
    rotation of the features (handled by the second kernel below).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile sizes: Tq sublanes x Tr lanes of the pair matrix; feature width F
# is padded to a lane multiple by callers.  Large tiles amortize per-grid-
# step overhead, but the fused elementwise pipeline needs several (TQ, TR)
# f32 buffers live at once: (512, 1024) is the largest shape that compiles
# within the 16 MB scoped-VMEM limit at every cloud bucket now that the
# coordinate cross-matmuls run at Precision.HIGHEST (the multi-pass f32
# emulation needs extra pass buffers; (512, 2048) OOMed by 1.3 MB at the
# 32768 bucket — verified empirically on v5e).  Halving TR rather than TQ
# keeps candidate-tile HBM traffic unchanged (r/feat tiles are re-read
# per q stripe either way).
TQ = 512
TR = 1024


def _pad_rows(x: jnp.ndarray, mult: int) -> jnp.ndarray:
    n = x.shape[0]
    pad = (-n) % mult
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    return x


_INF = 3.0e38


def _tile_aabbs(points: jnp.ndarray, mask: jnp.ndarray, tile: int):
    """Per-tile axis-aligned bounds over valid rows: ((NT, 3) lo, (NT, 3) hi).

    Entirely-masked tiles get (+inf, -inf) so any separation test prunes
    them.  Points arrive in scan order (azimuth-major from extract_cloud),
    which is spatially coherent, so tile boxes are tight in practice."""
    p = points.reshape(-1, tile, 3)
    m = mask.reshape(-1, tile, 1)
    lo = jnp.min(jnp.where(m, p, _INF), axis=1)
    hi = jnp.max(jnp.where(m, p, -_INF), axis=1)
    return lo, hi


def _boxes_separated(qlo_ref, qhi_ref, rlo_ref, rhi_ref, i, j, rad):
    """True if the closest points of tile boxes i and j are > rad apart in
    some axis (then no pair can be within rad; the prune is conservative)."""
    sep = False
    for d in range(3):
        sep = sep | (qlo_ref[i, d] - rhi_ref[j, d] > rad) | (
            rlo_ref[j, d] - qhi_ref[i, d] > rad
        )
    return sep


def _accum_kernel(nv_ref, qlo_ref, qhi_ref, rlo_ref, rhi_ref,
                  q_ref, qm_ref, qr2_ref, r_ref, rm_ref, feat_ref, out_ref,
                  *, rad):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # Tile-level sparsity: valid points sit at the front of the cloud
    # (extract_cloud stable-partitions them there), so every tile fully
    # past the last valid row contributes nothing — skip its MXU work.
    # AABB pruning: scan-ordered points are spatially coherent, so most
    # tile pairs are farther apart than the radius — skip those too.
    # (Per-query radii qr2 are always <= rad^2, so pruning with the global
    # rad stays conservative.)
    nv = nv_ref[0]
    sep = _boxes_separated(qlo_ref, qhi_ref, rlo_ref, rhi_ref, i, j, rad)

    @pl.when((i * TQ < nv) & (j * TR < nv) & jnp.logical_not(sep))
    def _():
        q = q_ref[:]  # (TQ, 3f32)... padded to (TQ, 128) by caller layout
        r = r_ref[:]
        qq = jnp.sum(q * q, axis=1, keepdims=True)  # (TQ, 1)
        pp = jnp.sum(r * r, axis=1, keepdims=True)  # (TR, 1)
        # HIGHEST: the default bf16 input precision puts an error on the
        # cross term comparable to radius^2 at mm-scale coordinates,
        # corrupting the membership test (see ops/keypoints._pair_d2).
        cross = jax.lax.dot_general(
            q, r, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (TQ, TR)
        d2 = qq + pp.T - 2.0 * cross
        within = (d2 <= qr2_ref[:]) & (qm_ref[:] > 0) & (rm_ref[:].T > 0)
        w = within.astype(jnp.float32)
        out_ref[:] += jax.lax.dot_general(
            w, feat_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


@functools.partial(
    jax.jit, static_argnames=("radius", "feat_width", "interpret")
)
def neighborhood_accumulate(
    points: jnp.ndarray,  # (N, 3) float32
    mask: jnp.ndarray,  # (N,) bool
    feat: jnp.ndarray,  # (N, F) float32 per-point features to sum
    radius: float,
    feat_width: int = 0,
    interpret: bool = False,
    r2_row: jnp.ndarray | None = None,  # (N,) per-query r^2 (<= radius^2)
) -> jnp.ndarray:
    """out[i] = sum over in-radius j of feat[j]; masked rows give zeros.

    `r2_row` optionally shrinks each query's ball (the neighbor-cap parity
    mode); `radius` stays the conservative AABB-pruning bound."""
    N = points.shape[0]
    F = feat.shape[1]
    q = _pad_rows(points, TQ)
    r = _pad_rows(points, TR)
    qm = _pad_rows(mask.astype(jnp.float32)[:, None], TQ)
    rm = _pad_rows(mask.astype(jnp.float32)[:, None], TR)
    if r2_row is None:
        r2_row = jnp.full((N,), radius * radius, jnp.float32)
    qr2 = _pad_rows(r2_row.astype(jnp.float32)[:, None], TQ)
    fp = _pad_rows(feat, TR)
    Nq = q.shape[0]
    Nr = r.shape[0]

    # Upper bound on valid rows: last set mask index + 1 (valid points are
    # front-compacted by extract_cloud; for arbitrary masks this is still
    # correct, just saves less).
    n_valid = jnp.where(
        jnp.any(mask),
        points.shape[0] - jnp.argmax(mask[::-1]).astype(jnp.int32),
        0,
    )
    qlo, qhi = _tile_aabbs(q, _pad_rows(mask, TQ), TQ)
    rlo, rhi = _tile_aabbs(r, _pad_rows(mask, TR), TR)
    grid = (Nq // TQ, Nr // TR)
    out = pl.pallas_call(
        functools.partial(_accum_kernel, rad=radius),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TQ, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TQ, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TQ, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 3), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, F), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TQ, F), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Nq, F), jnp.float32),
        interpret=interpret,
    )(n_valid.reshape(1), qlo, qhi, rlo, rhi, q, qm, qr2, r, rm, fp)
    return jnp.where(mask[:, None], out[:N], 0.0)


def _segratio_kernel(nv_ref, qlo_ref, qhi_ref, rlo_ref, rhi_ref,
                     q_ref, qm_ref, qv_ref, qr2_ref, r_ref, rm_ref, out_ref,
                     *, rad, normalized):
    """Per-query-side vector kernel: counts of sign(dot(ctvec_q, p_r - q))
    and the CVS/CVSN dot sums, fused with the radius test."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    nv = nv_ref[0]
    sep = _boxes_separated(qlo_ref, qhi_ref, rlo_ref, rhi_ref, i, j, rad)

    @pl.when((i * TQ < nv) & (j * TR < nv) & jnp.logical_not(sep))
    def _():
        q = q_ref[:]  # (TQ, 3)
        v = qv_ref[:]  # (TQ, 3) ctvec
        r = r_ref[:]  # (TR, 3)
        qq = jnp.sum(q * q, axis=1, keepdims=True)
        pp = jnp.sum(r * r, axis=1, keepdims=True)
        cross = jax.lax.dot_general(
            q, r, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        d2 = qq + pp.T - 2.0 * cross
        within = (d2 <= qr2_ref[:]) & (qm_ref[:] > 0) & (rm_ref[:].T > 0)
        # dot(v_q, p_r - q) = v.p_r - v.q
        # HIGHEST: the CV rule takes the SIGN of vr - vq, a small
        # difference of ~1e7-magnitude products — bf16 input error flips it.
        vr = jax.lax.dot_general(
            v, r, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        vq = jnp.sum(v * q, axis=1, keepdims=True)
        dots = vr - vq
        w = within.astype(jnp.float32)
        pos = jnp.sum(w * (dots > 0), axis=1)
        neg = jnp.sum(w * (dots < 0), axis=1)
        if normalized:  # CVSN: dots / (|ctvec| * |p - q|)
            vnorm = jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True))
            denom = vnorm * jnp.sqrt(jnp.maximum(d2, 1e-24))
            terms = jnp.where(
                within & (d2 > 0) & (denom > 0),
                dots / jnp.maximum(denom, 1e-12), 0.0,
            )
        else:  # CVS
            terms = jnp.where(within & (d2 > 0), dots, 0.0)
        ssum = jnp.sum(terms, axis=1)
        out_ref[:, 0] += pos
        out_ref[:, 1] += neg
        out_ref[:, 2] += ssum


@functools.partial(
    jax.jit, static_argnames=("radius", "normalized", "interpret")
)
def segratio_accumulate(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    ctvec: jnp.ndarray,  # (N, 3) sp - centroid
    radius: float,
    normalized: bool = False,
    interpret: bool = False,
    r2_row: jnp.ndarray | None = None,  # (N,) per-query r^2 (<= radius^2)
) -> jnp.ndarray:
    """Returns (N, 3): [pos count, neg count, CVS(N) dot sum] per point."""
    N = points.shape[0]
    q = _pad_rows(points, TQ)
    r = _pad_rows(points, TR)
    qm = _pad_rows(mask.astype(jnp.float32)[:, None], TQ)
    rm = _pad_rows(mask.astype(jnp.float32)[:, None], TR)
    qv = _pad_rows(ctvec, TQ)
    if r2_row is None:
        r2_row = jnp.full((N,), radius * radius, jnp.float32)
    qr2 = _pad_rows(r2_row.astype(jnp.float32)[:, None], TQ)
    n_valid = jnp.where(
        jnp.any(mask),
        points.shape[0] - jnp.argmax(mask[::-1]).astype(jnp.int32),
        0,
    )
    qlo, qhi = _tile_aabbs(q, _pad_rows(mask, TQ), TQ)
    rlo, rhi = _tile_aabbs(r, _pad_rows(mask, TR), TR)
    grid = (q.shape[0] // TQ, r.shape[0] // TR)
    out = pl.pallas_call(
        functools.partial(_segratio_kernel, rad=radius,
                          normalized=normalized),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TQ, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TQ, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TQ, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TQ, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 3), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TQ, 128), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q.shape[0], 128), jnp.float32),
        interpret=interpret,
    )(n_valid.reshape(1), qlo, qhi, rlo, rhi, q, qm, qv, qr2, r, rm)
    return jnp.where(mask[:, None], out[:N, :3], 0.0)
