"""Surface normal estimation by masked neighborhood PCA (JAX).

Rebuild of the plane-fit + viewpoint-flip normal estimation the reference
does per keypoint with PCL (reference: include/bshot_bits.h:43-94,
`pcl::computePointNormal` + `flipNormalTowardsViewpoint` at origin), as one
batched pass: neighborhood first/second moments come from the tiled
MXU/VPU sweep in ops.keypoints, then a batched 3x3 eigendecomposition gives
the smallest-eigenvector normal per point.

Unlike the reference — which resizes the normal cloud to the full surface
but only fills keypoint rows, leaving SHOT's per-neighbor normals zero
(see DescriptorConfig.use_surface_normals) — this computes a true normal
for every unmasked point.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from bshot_slam_tpu.geometry.eig3 import eigh3
from bshot_slam_tpu.ops.keypoints import neighborhood_moments


@functools.partial(
    jax.jit, static_argnames=("radius", "tile", "min_neighbors", "cap")
)
def surface_normals(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    radius: float,
    tile: int = 4096,
    min_neighbors: int = 3,
    cap: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-point unit normals, curvature, and validity.

    Returns (normals (N, 3), curvature (N,), valid (N,)).  Normals are
    flipped toward the sensor at the origin (reference: bshot_bits.h:83-86);
    points with fewer than `min_neighbors` neighbors get a zero normal and
    valid=False (the reference sets NaN — bshot_bits.h:70).  `cap` enables
    the reference's 300-neighbor truncation (bshot_bits.h:68) via the
    shrunk-ball approximation (ops.keypoints.capped_r2_rows).
    """
    r2_row = None
    if cap:
        from bshot_slam_tpu.ops.keypoints import capped_r2_rows

        r2_row = capped_r2_rows(points, mask, radius, cap, tile)
    cnt, psum, outer = neighborhood_moments(points, mask, radius, tile,
                                            r2_row=r2_row)
    return normals_from_moments(points, mask, cnt, psum, outer, min_neighbors)


def normals_from_moments(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    cnt: jnp.ndarray,
    psum: jnp.ndarray,
    outer: jnp.ndarray,
    min_neighbors: int = 3,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Normals from precomputed neighborhood moments (shared-sweep path)."""
    safe = jnp.maximum(cnt, 1.0)
    mean = psum / safe[:, None]
    cov = outer / safe[:, None, None] - mean[:, :, None] * mean[:, None, :]
    evals, evecs = eigh3(cov)  # ascending eigenvalues (closed form)
    n = evecs[..., 0]  # smallest-eigenvalue direction
    # Flip toward viewpoint at origin: need n . (0 - p) > 0.
    flip = jnp.sum(n * points, axis=-1) > 0
    n = jnp.where(flip[:, None], -n, n)
    lam = jnp.maximum(evals, 0.0)
    denom = lam[:, 0] + lam[:, 1] + lam[:, 2]
    curvature = lam[:, 0] / jnp.maximum(denom, 1e-12)
    valid = mask & (cnt >= min_neighbors)
    n = jnp.where(valid[:, None], n, 0.0)
    return n, jnp.where(valid, curvature, 0.0), valid
