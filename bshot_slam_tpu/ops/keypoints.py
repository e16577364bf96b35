"""Segmentation-ratio saliency keypoints + ISS evaluation detector (JAX).

TPU-native rebuild of the reference's keypoint extraction
(reference: src/lidar_odometry.cpp:51-171).  The reference does a FLANN
kd-tree radius search per point (capped at 300 neighbors) inside a serial
CPU loop; here neighborhoods are evaluated by tiled brute-force masked
distance passes where the pairwise inner products ride the MXU
(|q-p|^2 = |q|^2 + |p|^2 - 2 q.p) and the per-pair selects ride the VPU,
with `lax.scan` over reference tiles bounding live memory.  The full radius
neighborhood is used (no 300 cap — see KeypointConfig.neighbor_cap note).

Scores match the reference formulas exactly:
  CV   = 1 - min(pos, neg)/max(pos, neg)   (lidar_odometry.cpp:83-97)
  CVS  = |sum dot(ctvec, p-sp)| / n        (lidar_odometry.cpp:98-108)
  CVSN = |sum cos angle| / n               (lidar_odometry.cpp:109-119)
with ctvec = sp - centroid(neighborhood).  Undefined scores (NaN in the
reference, skipped at lidar_odometry.cpp:121) become -inf so they never
enter the top-k.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from bshot_slam_tpu.config import KeypointConfig
from bshot_slam_tpu.geometry.eig3 import eigvalsh3

_NEG_INF = -jnp.inf


def _use_pallas() -> bool:
    """Fused Pallas kernels on TPU; the lax.scan path elsewhere (tests run
    the scan path on CPU and the two are cross-checked in interpret mode)."""
    return jax.default_backend() == "tpu"


def _ref_tiles(points: jnp.ndarray, mask: jnp.ndarray, tile: int):
    """Pad to a multiple of `tile` and reshape to (n_tiles, tile, ...)."""
    n = points.shape[0]
    n_pad = (-n) % tile
    if n_pad:
        points = jnp.concatenate([points, jnp.zeros((n_pad, 3), points.dtype)])
        mask = jnp.concatenate([mask, jnp.zeros((n_pad,), bool)])
    nt = points.shape[0] // tile
    return points.reshape(nt, tile, 3), mask.reshape(nt, tile)


def _pair_d2(q: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Squared distances (Q, P) via MXU-friendly expansion.

    precision=HIGHEST: XLA's default f32 matmul precision on TPU feeds the
    MXU bf16 inputs, whose 8-bit mantissa at mm-scale coordinates puts an
    error on the cross term comparable to the (3000 mm)^2 radius threshold
    itself — silently scrambling neighbor selection vs the exact CPU path
    (measured as a 205 mm ATE divergence on the 2.1 m golden fixture).
    The matmul's K dimension is 3, so full precision costs nothing."""
    qq = jnp.sum(q * q, axis=-1)
    pp = jnp.sum(p * p, axis=-1)
    cross = jnp.dot(q, p.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(qq[:, None] + pp[None, :] - 2.0 * cross, 0.0)


def capped_r2_rows(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    radius: float,
    cap: int,
    tile: int = 4096,
    refine: int = 2,
) -> jnp.ndarray:
    """Per-point effective squared radius approximating the reference's
    300-nearest-neighbor cap (reference: lidar_odometry.cpp:70,
    bshot_bits.h:68 — PCL radiusSearch returns the `cap` NEAREST hits).

    The TPU rebuild has no kd-tree ordering to truncate, so the ball is
    shrunk instead: under locally uniform density, the ball holding the
    nearest `cap` of `cnt` in-radius points has r_eff = r (cap/cnt)^(1/3),
    i.e. r_eff^2 = r^2 (cap/cnt)^(2/3).  `refine` extra counting passes
    fixed-point-iterate the shrinkage, adapting to density gradients
    (Gaussian clusters etc.); tests/test_keypoints.py quantifies the
    residual divergence from the exact truncation.
    """
    r2 = radius * radius
    r2_row = jnp.full((points.shape[0],), r2, jnp.float32)
    for _ in range(1 + refine):
        cnt, _, _ = neighborhood_moments(points, mask, radius, tile,
                                         r2_row=r2_row)
        # Shrink where over-full, relax toward the full radius where
        # over-shrunk; fixed point at cnt ~= cap (or at the full ball).
        r2_row = jnp.minimum(
            r2_row * (cap / jnp.maximum(cnt, 1.0)) ** (2.0 / 3.0), r2
        )
    return r2_row


def neighborhood_moments(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    radius: float,
    tile: int = 4096,
    r2_row: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-point neighbor (count, sum, sum of outer products) within radius.

    Returns (count (N,), psum (N, 3), pouter (N, 3, 3)); the query point
    itself is included (kd-tree radius search includes the query, as in the
    reference).  Masked points contribute nothing and receive zeros.
    `r2_row` optionally shrinks each query's ball (neighbor-cap mode).
    """
    r2 = radius * radius
    if _use_pallas():
        from bshot_slam_tpu.kernels.neighborhood import neighborhood_accumulate

        n = points.shape[0]
        prods = jnp.stack(
            [
                points[:, 0] * points[:, 0], points[:, 0] * points[:, 1],
                points[:, 0] * points[:, 2], points[:, 1] * points[:, 1],
                points[:, 1] * points[:, 2], points[:, 2] * points[:, 2],
            ],
            axis=-1,
        )
        feat = jnp.zeros((n, 128), jnp.float32)
        feat = feat.at[:, 0].set(1.0).at[:, 1:4].set(points).at[:, 4:10].set(prods)
        acc = neighborhood_accumulate(points, mask, feat, radius,
                                      r2_row=r2_row)
        cnt, s, o6 = acc[:, 0], acc[:, 1:4], acc[:, 4:10]
        outer = jnp.stack(
            [
                jnp.stack([o6[:, 0], o6[:, 1], o6[:, 2]], axis=-1),
                jnp.stack([o6[:, 1], o6[:, 3], o6[:, 4]], axis=-1),
                jnp.stack([o6[:, 2], o6[:, 4], o6[:, 5]], axis=-1),
            ],
            axis=-2,
        )
        return cnt, s, outer

    r2_col = r2 if r2_row is None else r2_row[:, None]
    ref_p, ref_m = _ref_tiles(points, mask, tile)

    def body(acc, ref):
        rp, rm = ref
        cnt, s, o = acc
        d2 = _pair_d2(points, rp)
        within = (d2 <= r2_col) & rm[None, :] & mask[:, None]
        w = within.astype(jnp.float32)
        cnt = cnt + jnp.sum(w, axis=1)
        s = s + jnp.dot(w, rp, preferred_element_type=jnp.float32)
        # Outer-product sums: sum_j w_ij * rp_j rp_j^T, via 6 matmuls.
        prods = jnp.stack(
            [
                rp[:, 0] * rp[:, 0], rp[:, 0] * rp[:, 1], rp[:, 0] * rp[:, 2],
                rp[:, 1] * rp[:, 1], rp[:, 1] * rp[:, 2], rp[:, 2] * rp[:, 2],
            ],
            axis=-1,
        )
        po = jnp.dot(w, prods, preferred_element_type=jnp.float32)
        o = o + po
        return (cnt, s, o), None

    n = points.shape[0]
    init = (
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n, 3), jnp.float32),
        jnp.zeros((n, 6), jnp.float32),
    )
    (cnt, s, o6), _ = jax.lax.scan(body, init, (ref_p, ref_m))
    outer = jnp.stack(
        [
            jnp.stack([o6[:, 0], o6[:, 1], o6[:, 2]], axis=-1),
            jnp.stack([o6[:, 1], o6[:, 3], o6[:, 4]], axis=-1),
            jnp.stack([o6[:, 2], o6[:, 4], o6[:, 5]], axis=-1),
        ],
        axis=-2,
    )
    return cnt, s, outer


def seg_ratio_scores(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: KeypointConfig,
    tile: int = 4096,
    moments: Tuple[jnp.ndarray, jnp.ndarray] | None = None,
    r2_row: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Per-point saliency (N,), -inf where undefined or masked.

    `moments` optionally supplies precomputed (count, sum) at cfg.radius_mm
    so the sweep can be shared with normal estimation (same radius in the
    reference: lidar_odometry.cpp:68 vs 174).  With cfg.neighbor_cap_mode,
    an extra counting pass shrinks each query's ball to the cap (reference
    300-neighbor truncation, lidar_odometry.cpp:70) before scoring.
    """
    r2 = cfg.radius_mm * cfg.radius_mm
    if cfg.neighbor_cap_mode and r2_row is None:
        r2_row = capped_r2_rows(points, mask, cfg.radius_mm,
                                cfg.neighbor_cap, tile)
        moments = None  # shared full-radius moments don't apply when capped
    if moments is None:
        cnt, psum, _ = neighborhood_moments(points, mask, cfg.radius_mm,
                                            tile, r2_row=r2_row)
    else:
        cnt, psum = moments
    safe_cnt = jnp.maximum(cnt, 1.0)
    centroid = psum / safe_cnt[:, None]
    ctvec = points - centroid  # sp - ct (reference: lidar_odometry.cpp:79)
    ct_norm = jnp.linalg.norm(ctvec, axis=-1)

    if _use_pallas():
        from bshot_slam_tpu.kernels.neighborhood import segratio_accumulate

        acc = segratio_accumulate(
            points, mask, ctvec, cfg.radius_mm,
            normalized=(cfg.sr_type == "CVSN"), r2_row=r2_row,
        )
        pos, neg, ssum = acc[:, 0], acc[:, 1], acc[:, 2]
        return _finalize_scores(points, mask, cfg, cnt, pos, neg, ssum)

    r2_col = r2 if r2_row is None else r2_row[:, None]
    ref_p, ref_m = _ref_tiles(points, mask, tile)

    def body(acc, ref):
        rp, rm = ref
        pos, neg, ssum = acc
        d2 = _pair_d2(points, rp)
        within = (d2 <= r2_col) & rm[None, :] & mask[:, None]
        # dot(ctvec_i, p_j - sp_i) = p_j . ctvec_i - sp_i . ctvec_i  (matmul)
        dots = jnp.dot(ctvec, rp.T, preferred_element_type=jnp.float32) - jnp.sum(
            ctvec * points, axis=-1, keepdims=True
        )
        w = within.astype(jnp.float32)
        pos = pos + jnp.sum(w * (dots > 0), axis=1)
        neg = neg + jnp.sum(w * (dots < 0), axis=1)
        if cfg.sr_type == "CVS":
            valid = within & (d2 > 0)
            ssum = ssum + jnp.sum(jnp.where(valid, dots, 0.0), axis=1)
        elif cfg.sr_type == "CVSN":
            denom = ct_norm[:, None] * jnp.sqrt(d2)
            valid = within & (denom > 0)
            ssum = ssum + jnp.sum(
                jnp.where(valid, dots / jnp.maximum(denom, 1e-12), 0.0), axis=1
            )
        return (pos, neg, ssum), None

    n = points.shape[0]
    init = (
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
    )
    (pos, neg, ssum), _ = jax.lax.scan(body, init, (ref_p, ref_m))
    return _finalize_scores(points, mask, cfg, cnt, pos, neg, ssum)


def _finalize_scores(points, mask, cfg, cnt, pos, neg, ssum):
    if cfg.sr_type == "CV":
        mx = jnp.maximum(pos, neg)
        score = 1.0 - jnp.minimum(pos, neg) / jnp.maximum(mx, 1.0)
        defined = mx > 0
    elif cfg.sr_type in ("CVS", "CVSN"):
        score = jnp.abs(ssum) / jnp.maximum(cnt, 1.0)
        defined = cnt > 0
    else:
        raise ValueError(f"unknown sr_type {cfg.sr_type}")

    # Reference skips the origin point and zero-neighbor points
    # (lidar_odometry.cpp:63-64,70).
    at_origin = jnp.all(points == 0, axis=-1)
    ok = mask & defined & ~at_origin & (cnt > 0)
    return jnp.where(ok, score, _NEG_INF)


class Keypoints(NamedTuple):
    positions: jnp.ndarray  # (K, 3)
    scores: jnp.ndarray  # (K,)
    mask: jnp.ndarray  # (K,) valid flag
    indices: jnp.ndarray  # (K,) index into the input cloud


@functools.partial(jax.jit, static_argnames=("cfg", "tile"))
def extract_keypoints(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: KeypointConfig,
    tile: int = 4096,
) -> Keypoints:
    """Top-k saliency keypoints (reference: lidar_odometry.cpp:131-153)."""
    scores = seg_ratio_scores(points, mask, cfg, tile)
    top_scores, top_idx = jax.lax.top_k(scores, cfg.top_k)
    kmask = jnp.isfinite(top_scores)
    pos = jnp.where(kmask[:, None], points[top_idx], 0.0)
    return Keypoints(
        positions=pos,
        scores=jnp.where(kmask, top_scores, 0.0),
        mask=kmask,
        indices=jnp.where(kmask, top_idx, -1),
    )


@functools.partial(jax.jit, static_argnames=("cfg", "tile", "max_out"))
def iss_keypoints(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: KeypointConfig,
    tile: int = 4096,
    max_out: int = 1024,
) -> Keypoints:
    """ISS-style detector used for repeatability evaluation
    (reference: lidar_odometry.cpp:447-461; PCL ISSKeypoint3D semantics:
    eigenvalues of the neighborhood scatter matrix within salient_radius,
    keep lambda2/lambda1 < g21 and lambda3/lambda2 < g32 with >= min
    neighbors, then non-max suppression on lambda3 within nonmax_radius)."""
    cnt, psum, outer = neighborhood_moments(
        points, mask, cfg.iss_salient_radius_mm, tile
    )
    safe = jnp.maximum(cnt, 1.0)
    mean = psum / safe[:, None]
    cov = outer / safe[:, None, None] - mean[:, :, None] * mean[:, None, :]
    evals = eigvalsh3(cov)  # ascending: l3, l2, l1 (closed form)
    l3, l2, l1 = evals[:, 0], evals[:, 1], evals[:, 2]
    good = (
        mask
        & (cnt >= cfg.iss_min_neighbors)
        & (l2 / jnp.maximum(l1, 1e-12) < cfg.iss_gamma_21)
        & (l3 / jnp.maximum(l2, 1e-12) < cfg.iss_gamma_32)
        & (l3 > 0)
    )
    saliency = jnp.where(good, l3, _NEG_INF)

    # Non-max suppression: keep i iff l3_i is the max within nonmax radius.
    r2 = cfg.iss_nonmax_radius_mm**2
    ref_p, ref_m = _ref_tiles(points, mask, tile)
    ref_s, _ = _ref_tiles(saliency[:, None] * jnp.ones((1, 3)), mask, tile)

    def body(mx, ref):
        rp, rm, rs = ref
        d2 = _pair_d2(points, rp)
        within = (d2 <= r2) & rm[None, :]
        cand = jnp.where(within, rs[None, :, 0], _NEG_INF)
        return jnp.maximum(mx, jnp.max(cand, axis=1)), None

    mx, _ = jax.lax.scan(
        body, jnp.full((points.shape[0],), _NEG_INF), (ref_p, ref_m, ref_s)
    )
    keep = good & (saliency >= mx)
    sal = jnp.where(keep, saliency, _NEG_INF)
    top_scores, top_idx = jax.lax.top_k(sal, max_out)
    kmask = jnp.isfinite(top_scores)
    return Keypoints(
        positions=jnp.where(kmask[:, None], points[top_idx], 0.0),
        scores=jnp.where(kmask, top_scores, 0.0),
        mask=kmask,
        indices=jnp.where(kmask, top_idx, -1),
    )


@functools.partial(jax.jit, static_argnames=())
def repeatability(
    src: jnp.ndarray,
    src_mask: jnp.ndarray,
    ref: jnp.ndarray,
    ref_mask: jnp.ndarray,
    hit_radius_mm: float = 30.0,
) -> jnp.ndarray:
    """Fraction of src keypoints with a ref keypoint within hit radius
    (reference: lidar_odometry.cpp:392-419, sqDistLimit = 30^2)."""
    d2 = _pair_d2(src, ref)
    d2 = jnp.where(ref_mask[None, :], d2, jnp.inf)
    nearest = jnp.min(d2, axis=1)
    at_origin = jnp.all(src == 0, axis=-1)
    valid = src_mask & ~at_origin
    hits = valid & (nearest <= hit_radius_mm * hit_radius_mm)
    return jnp.sum(hits) / jnp.maximum(jnp.sum(valid), 1)
