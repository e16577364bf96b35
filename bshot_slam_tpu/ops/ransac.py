"""Batched-hypothesis RANSAC correspondence rejection (JAX).

Rebuild of the reference's PCL `CorrespondenceRejectorSampleConsensus`
(reference: src/lidar_odometry.cpp:251-261: 2000 iterations, 1500 mm inlier
threshold).  PCL evaluates 2000 sequential 3-point hypotheses on the CPU;
here all hypotheses are drawn and scored in one batched program —
`vmap`-free tensor ops end to end: (H, 3) index draws, a batched Kabsch
solve (H small SVDs), and an (H, K) inlier count — followed by a masked
Umeyama refit on the best hypothesis's inliers, which is what PCL's
`getBestTransformation` returns after its model refit.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bshot_slam_tpu.geometry import se3


class RansacResult(NamedTuple):
    transform: jnp.ndarray  # (4, 4) refit on inliers of the best hypothesis
    inliers: jnp.ndarray  # (K,) bool
    n_inliers: jnp.ndarray  # () int32


@functools.partial(jax.jit, static_argnames=("iterations",))
def ransac_rigid(
    key: jax.Array,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    cmask: jnp.ndarray,
    inlier_threshold: float,
    iterations: int = 2000,
) -> RansacResult:
    """Estimate a rigid transform from correspondences with outliers.

    src, dst: (K, 3) corresponding points (src[i] matches dst[i]); cmask
    marks real correspondences.  Invalid rows never enter sampling or
    scoring.  With < 3 valid correspondences the identity transform and an
    empty inlier set are returned.
    """
    K = src.shape[0]
    n_valid = jnp.sum(cmask.astype(jnp.int32))
    # Dense list of valid indices (padded with 0) for uniform sampling.
    order = jnp.argsort(jnp.where(cmask, 0, 1), stable=True)
    u = jax.random.uniform(key, (iterations, 3))
    draw = (u * jnp.maximum(n_valid, 1)).astype(jnp.int32)
    sample_idx = order[jnp.clip(draw, 0, K - 1)]  # (H, 3)

    s = src[sample_idx]  # (H, 3, 3)
    d = dst[sample_idx]
    T_h = se3.kabsch(s, d)  # (H, 4, 4)

    # Score every hypothesis against all correspondences.
    src_h = se3.apply(T_h, src[None, :, :].repeat(1, axis=0))  # broadcast (H, K, 3)
    err = jnp.linalg.norm(src_h - dst[None, :, :], axis=-1)
    ok = cmask[None, :] & (err < inlier_threshold)
    scores = jnp.sum(ok, axis=1)
    best = jnp.argmax(scores)

    inliers = ok[best] & (n_valid >= 3)
    w = inliers.astype(jnp.float32)
    T = se3.kabsch(src, dst, w)
    T = jnp.where(jnp.sum(w) >= 3, T, jnp.eye(4, dtype=T.dtype))
    return RansacResult(transform=T, inliers=inliers,
                        n_inliers=jnp.sum(inliers.astype(jnp.int32)))
