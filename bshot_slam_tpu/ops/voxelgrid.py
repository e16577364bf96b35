"""Voxel-grid downsampling (centroid per occupied voxel), fixed-shape.

Parity for the reference's alternate keypoint source
`bshot::calculate_voxel_grid_keypoints` (reference: include/bshot_bits.h:
97-110, `pcl::VoxelGrid`), which its SLAM loop never calls but its API
exposes; also useful as an ICP/map decimation stage.

TPU shape discipline: voxel coordinates are hashed into a fixed-capacity
accumulator table with scatter-add (sum, count), centroids read back where
count > 0.  Distinct voxels that collide in the hash merge their centroids;
with capacity >= 4x the expected occupied-voxel count collisions are rare
(documented deviation from PCL's exact map).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_P1, _P2, _P3 = 73856093, 19349663, 83492791  # classic spatial-hash primes


@functools.partial(jax.jit, static_argnames=("leaf_mm", "capacity"))
def voxel_downsample(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    leaf_mm: float,
    capacity: int = 16384,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(N, 3) masked points -> (capacity, 3) voxel centroids + valid mask."""
    cell = jnp.floor(points / leaf_mm).astype(jnp.int32)
    h = (
        (cell[:, 0] * _P1) ^ (cell[:, 1] * _P2) ^ (cell[:, 2] * _P3)
    ) % capacity
    h = jnp.where(mask, h, capacity)  # masked rows dropped by scatter
    w = mask.astype(jnp.float32)
    cnt = jnp.zeros((capacity,), jnp.float32).at[h].add(w, mode="drop")
    psum = jnp.zeros((capacity, 3), jnp.float32).at[h].add(
        points * w[:, None], mode="drop"
    )
    valid = cnt > 0
    centroids = jnp.where(
        valid[:, None], psum / jnp.maximum(cnt, 1.0)[:, None], 0.0
    )
    return centroids, valid
