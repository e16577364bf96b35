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


def sample_distinct_triples(
    key: jax.Array, n_valid: jnp.ndarray, iterations: int
) -> jnp.ndarray:
    """(H, 3) uniform index triples WITHOUT replacement from [0, n_valid).

    PCL samples without replacement (reference: lidar_odometry.cpp:255-261
    via SampleConsensusModelRegistration), so duplicate-index (rank-deficient
    Kabsch) samples never waste a hypothesis: draw r0 from [0,n), r1 from
    [0,n-1) shifted past r0, r2 from [0,n-2) shifted past both.  For
    n_valid < 3 the draws are garbage but callers mask those cases out.
    """
    u = jax.random.uniform(key, (iterations, 3))
    n = jnp.maximum(n_valid, 3)
    r0 = (u[:, 0] * n).astype(jnp.int32)
    r1 = (u[:, 1] * (n - 1)).astype(jnp.int32)
    r1 = r1 + (r1 >= r0)
    r2 = (u[:, 2] * (n - 2)).astype(jnp.int32)
    lo = jnp.minimum(r0, r1)
    hi = jnp.maximum(r0, r1)
    r2 = r2 + (r2 >= lo)
    r2 = r2 + (r2 >= hi)
    return jnp.stack([r0, r1, r2], axis=1)


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
    draw = sample_distinct_triples(key, n_valid, iterations)
    sample_idx = order[jnp.clip(draw, 0, K - 1)]  # (H, 3)

    s = src[sample_idx]  # (H, 3, 3)
    d = dst[sample_idx]
    T_h = se3.kabsch(s, d)  # (H, 4, 4)

    # Score every hypothesis against all correspondences.
    src_h = se3.apply(T_h, src[None, :, :].repeat(1, axis=0))  # broadcast (H, K, 3)
    err = jnp.linalg.norm(src_h - dst[None, :, :], axis=-1)
    ok = cmask[None, :] & (err < inlier_threshold)
    # Near-collinear source triples make the Kabsch rotation ill-conditioned;
    # zero their score so a degenerate hypothesis can never win.
    area2 = jnp.linalg.norm(
        jnp.cross(s[:, 1] - s[:, 0], s[:, 2] - s[:, 0]), axis=-1
    )
    scores = jnp.where(area2 > 1e-6, jnp.sum(ok, axis=1), 0)
    best = jnp.argmax(scores)

    inliers = ok[best] & (n_valid >= 3) & (scores[best] > 0)
    w = inliers.astype(jnp.float32)
    T = se3.kabsch(src, dst, w)
    T = jnp.where(jnp.sum(w) >= 3, T, jnp.eye(4, dtype=T.dtype))
    return RansacResult(transform=T, inliers=inliers,
                        n_inliers=jnp.sum(inliers.astype(jnp.int32)))
