"""B-SHOT loop-closure detection + verification (new capability).

The reference has no loop closure (SURVEY §5).  Candidate retrieval runs
two channels:

  * **proximity** — keyframe pairs whose *estimated* positions are close
    but temporally distant (cheap, but blind under exactly the drift loop
    closure exists to fix);
  * **appearance** — keyframe pairs whose B-SHOT descriptor *sets* look
    alike, scored place-recognition-style: each keyframe is summarized as
    its L2-normalized 352-bin bit histogram (a bag-of-binary-words TF
    vector) and all-pairs cosine similarity is one (Mk, 352) x (352, Mk)
    MXU matmul.  This channel needs no pose estimate at all, so it keeps
    firing when drift exceeds the proximity gate.

Verification matches each candidate pair's descriptor sets with the same
mutual-NN + RANSAC machinery as the odometry front end and accepts the
relative pose when enough inliers survive.  The verified measurement M
satisfies p_b = M p_a for keypoints in the two sensor frames, i.e.
M = T_b^{-1} T_a — directly the pose-graph edge Z for edge (i=b, j=a).
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
from bshot_slam_tpu.ops.bshot import unpack_bits
from bshot_slam_tpu.ops.ransac import ransac_rigid


class LoopEdge(NamedTuple):
    kf_i: int  # graph edge source (keyframe b)
    kf_j: int  # graph edge target (keyframe a)
    z: np.ndarray  # (4, 4) measured T_i^-1 T_j
    n_inliers: int
    rmse_mm: float  # ICP residual of the refined measurement


@functools.partial(
    jax.jit, static_argnames=("iterations", "inlier_th", "icp_iterations")
)
def _verify_pair(
    key: jax.Array,
    kp_a: jnp.ndarray, desc_a: jnp.ndarray, mask_a: jnp.ndarray,
    kp_b: jnp.ndarray, desc_b: jnp.ndarray, mask_b: jnp.ndarray,
    inlier_th: float, iterations: int, icp_iterations: int = 10,
):
    from bshot_slam_tpu.ops.icp import icp_point_to_point

    m = hamming.mutual_nn(desc_a, mask_a, desc_b, mask_b)
    dst = kp_b[m.src_to_ref]
    rr = ransac_rigid(key, kp_a, dst, m.mutual, inlier_th, iterations)
    # ICP-refine the RANSAC pose on the keypoint sets (the same refinement
    # the odometry front end applies, lidar_odometry.cpp:291-299): the raw
    # 3-point-hypothesis transform carries O(100 mm) error, far coarser
    # than odometry edges — unrefined it *degrades* the pose graph.
    src_est = jax.vmap(lambda p: rr.transform[:3, :3] @ p + rr.transform[:3, 3])(
        kp_a
    )
    icp = icp_point_to_point(
        src_est, mask_a & m.mutual, kp_b, mask_b,
        iterations=icp_iterations, max_corr_dist=inlier_th,
    )
    T = icp.transform @ rr.transform
    return T, rr.n_inliers, icp.rmse


@jax.jit
def keyframe_bow(store: KeyframeStore) -> jnp.ndarray:
    """(Mk, 352) L2-normalized per-keyframe B-SHOT bit histograms (bag of
    binary words); invalid/empty keyframes come back all-zero.  Fixed shape
    over the whole store capacity so the program compiles once."""

    def one(args):
        desc, mask = args
        bits = unpack_bits(desc).astype(jnp.float32)  # (K, 352)
        h = jnp.sum(bits * mask[:, None], axis=0)
        # Center per keyframe before normalizing: every descriptor set
        # shares a large DC component (mean bit frequency), which would
        # make unrelated keyframes look ~0.99-similar.  The centered
        # cosine measures bin-pattern agreement only.
        n_kp = jnp.maximum(jnp.sum(mask), 1.0)
        h = jnp.where(jnp.sum(mask) > 0, h / n_kp - jnp.mean(h / n_kp), h)
        return h / jnp.maximum(jnp.linalg.norm(h), 1e-6)

    return jax.lax.map(one, (store.descriptors, store.kp_mask))


def appearance_pairs(
    store: KeyframeStore, n: int, cfg: SlamConfig
) -> np.ndarray:
    """Top descriptor-similarity keyframe pairs (i < j, gap-qualified),
    best-first — the retrieval channel that survives unbounded drift."""
    bcfg = cfg.backend
    bow = np.asarray(keyframe_bow(store))  # (Mk, 352)
    sim = bow[:n] @ bow[:n].T  # cosine: rows are unit vectors
    gap = np.abs(np.arange(n)[:, None] - np.arange(n)[None, :])
    ok = np.triu(gap >= bcfg.lc_min_gap) & (sim >= bcfg.lc_appearance_min_sim)
    pairs = np.argwhere(ok)
    if len(pairs) == 0:
        return pairs.reshape(0, 2)
    order = np.argsort(-sim[pairs[:, 0], pairs[:, 1]])
    return pairs[order][: bcfg.lc_appearance_top]


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
    if len(pairs):
        # Closest-first, capped.
        order = np.argsort(d[pairs[:, 0], pairs[:, 1]])
        pairs = pairs[order][:max_candidates]
    else:
        pairs = pairs.reshape(0, 2)
    # Appearance channel: immune to pose drift; union (dedup) with the
    # proximity channel, appearance extras riding after the proximity cap.
    ap = appearance_pairs(store, n, cfg)
    seen = {tuple(p) for p in pairs.tolist()}
    extra = [p for p in ap.tolist() if tuple(p) not in seen]
    if extra:
        pairs = np.concatenate([pairs, np.asarray(extra)], axis=0)
    if len(pairs) == 0:
        return []

    edges: List[LoopEdge] = []
    for a, b in pairs:
        key, sub = jax.random.split(key)
        T, n_inl, rmse = _verify_pair(
            sub,
            store.keypoints[a], store.descriptors[a], store.kp_mask[a],
            store.keypoints[b], store.descriptors[b], store.kp_mask[b],
            cfg.match.ransac_inlier_th_mm, cfg.match.ransac_iterations,
            cfg.match.icp_iterations,
        )
        n_inl = int(n_inl)
        if n_inl >= bcfg.lc_min_inliers:
            edges.append(
                LoopEdge(kf_i=int(b), kf_j=int(a), z=np.asarray(T),
                         n_inliers=n_inl, rmse_mm=float(rmse))
            )
    return edges
