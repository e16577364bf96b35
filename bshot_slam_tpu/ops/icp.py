"""Masked point-to-point ICP refinement (JAX).

Rebuild of the reference's PCL `IterativeClosestPoint` refinement step
(reference: src/lidar_odometry.cpp:291-299: align the RANSAC-transformed
source keypoints to the reference keypoint set, then T_best = T_icp * T_est).
PCL iterates NN correspondence + SVD alignment until convergence (default
cap 10 iterations, unbounded correspondence distance); here the loop is a
fixed-length `lax.scan` whose per-iteration nearest-neighbor search is the
same MXU distance expansion used everywhere else (|q-p|^2 via matmul), so
the whole refinement compiles to one program with no data-dependent shapes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bshot_slam_tpu.geometry import se3
from bshot_slam_tpu.ops.keypoints import _pair_d2


class IcpResult(NamedTuple):
    transform: jnp.ndarray  # (4, 4): target ~= transform(source)
    rmse: jnp.ndarray  # () final inlier RMSE, mm
    n_pairs: jnp.ndarray  # () correspondences used in the last iteration


@functools.partial(jax.jit, static_argnames=("iterations", "tail_start"))
def icp_point_to_point(
    src: jnp.ndarray,
    src_mask: jnp.ndarray,
    dst: jnp.ndarray,
    dst_mask: jnp.ndarray,
    iterations: int = 10,
    max_corr_dist: float = 1.0e9,
    n_valid_dst: jnp.ndarray | None = None,
    tail_start: int = -1,
) -> IcpResult:
    """Align (K, 3) masked source points to (M, 3) masked target points.

    `n_valid_dst` optionally bounds the valid (front-compacted) target rows
    so the TPU Pallas NN kernel can skip empty map capacity; rows at or
    past `tail_start` are always searched (the appended ref keypoints).
    """
    use_kernel = n_valid_dst is not None and jax.default_backend() == "tpu"
    if use_kernel:
        from bshot_slam_tpu.kernels.mapops import euclid_nn_bounded

    def body(T, _):
        cur = se3.apply(T, src)
        if use_kernel:
            nn_d2, nn = euclid_nn_bounded(
                cur, src_mask, dst, dst_mask, n_valid_dst,
                tail_start=tail_start,
            )
            nn_ok = nn_d2 < 1e30
        else:
            d2 = _pair_d2(cur, dst)
            d2 = jnp.where(dst_mask[None, :], d2, jnp.inf)
            nn = jnp.argmin(d2, axis=1)
            nn_d2 = jnp.min(d2, axis=1)
            nn_ok = jnp.isfinite(nn_d2)
        pair_ok = src_mask & nn_ok & (
            nn_d2 <= max_corr_dist * max_corr_dist
        )
        w = pair_ok.astype(jnp.float32)
        T_step = se3.kabsch(cur, dst[nn], w)
        T_step = jnp.where(jnp.sum(w) >= 3, T_step, jnp.eye(4, dtype=T.dtype))
        T_new = se3.compose(T_step, T)
        rmse = jnp.sqrt(
            jnp.sum(jnp.where(pair_ok, nn_d2, 0.0)) / jnp.maximum(jnp.sum(w), 1.0)
        )
        return T_new, (rmse, jnp.sum(w))

    # Fixed trip count, deliberately: an increment-epsilon while_loop was
    # measured (r4) at the SAME per-iteration cost, and on real noisy
    # scans the Kabsch increment stays above any honest epsilon for all
    # 10 iterations — PCL's convergence path would not fire either — so
    # the data-dependent loop bought nothing and cost HLO complexity.
    T0 = jnp.eye(4, dtype=jnp.float32)
    T, (rmses, counts) = jax.lax.scan(body, T0, None, length=iterations)
    return IcpResult(transform=T, rmse=rmses[-1],
                     n_pairs=counts[-1].astype(jnp.int32))
