"""B-SHOT loop-closure detection + verification (new capability).

The reference has no loop closure (SURVEY §5).  Candidates are keyframe
pairs that are spatially close but temporally distant; verification matches
their B-SHOT descriptor sets with the same mutual-NN + RANSAC machinery as
the odometry front end and accepts the relative pose when enough inliers
survive.  The verified measurement M satisfies p_b = M p_a for keypoints in
the two sensor frames, i.e. M = T_b^{-1} T_a — directly the pose-graph edge
Z for edge (i=b, j=a).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bshot_slam_tpu.config import SlamConfig
from bshot_slam_tpu.backend.keyframes import KeyframeStore
from bshot_slam_tpu.ops import hamming
from bshot_slam_tpu.ops.ransac import ransac_rigid


class LoopEdge(NamedTuple):
    kf_i: int  # graph edge source (keyframe b)
    kf_j: int  # graph edge target (keyframe a)
    z: np.ndarray  # (4, 4) measured T_i^-1 T_j
    n_inliers: int


@functools.partial(jax.jit, static_argnames=("iterations", "inlier_th"))
def _verify_pair(
    key: jax.Array,
    kp_a: jnp.ndarray, desc_a: jnp.ndarray, mask_a: jnp.ndarray,
    kp_b: jnp.ndarray, desc_b: jnp.ndarray, mask_b: jnp.ndarray,
    inlier_th: float, iterations: int,
):
    m = hamming.mutual_nn(desc_a, mask_a, desc_b, mask_b)
    dst = kp_b[m.src_to_ref]
    rr = ransac_rigid(key, kp_a, dst, m.mutual, inlier_th, iterations)
    return rr.transform, rr.n_inliers


def find_loop_closures(
    store: KeyframeStore,
    cfg: SlamConfig,
    key: jax.Array,
    max_candidates: int = 8,
) -> List[LoopEdge]:
    """Detect + verify loop closures among the stored keyframes (host loop
    over O(few) candidate pairs; each verification is one jit call)."""
    n = int(store.count)
    if n < 2:
        return []
    bcfg = cfg.backend
    poses = np.asarray(store.poses[:n])
    pos = poses[:, :3, 3]
    d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    gap = np.abs(np.arange(n)[:, None] - np.arange(n)[None, :])
    cand = (d < bcfg.lc_max_dist_mm) & (gap >= bcfg.lc_min_gap)
    pairs = np.argwhere(np.triu(cand))
    if len(pairs) == 0:
        return []
    # Closest-first, capped.
    order = np.argsort(d[pairs[:, 0], pairs[:, 1]])
    pairs = pairs[order][:max_candidates]

    edges: List[LoopEdge] = []
    for a, b in pairs:
        key, sub = jax.random.split(key)
        T, n_inl = _verify_pair(
            sub,
            store.keypoints[a], store.descriptors[a], store.kp_mask[a],
            store.keypoints[b], store.descriptors[b], store.kp_mask[b],
            cfg.match.ransac_inlier_th_mm, cfg.match.ransac_iterations,
        )
        n_inl = int(n_inl)
        if n_inl >= bcfg.lc_min_inliers:
            edges.append(
                LoopEdge(kf_i=int(b), kf_j=int(a), z=np.asarray(T),
                         n_inliers=n_inl)
            )
    return edges
