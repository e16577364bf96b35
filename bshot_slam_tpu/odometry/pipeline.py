"""Scan-to-map LiDAR odometry: the full per-frame step as one jitted program.

Rebuild of the reference's `LidarOdometry` front end (reference:
include/lidar_odometry.h, src/lidar_odometry.cpp) — the INITIAL/RUN state
machine (lidar_odometry.h:18), keypoint extraction, descriptor computation,
map-window matching, RANSAC + gating + ICP pose estimation, and global map
insertion — with the C++ stage-by-stage host orchestration collapsed into a
single `jax.jit` step over fixed-shape device state:

    OdometryState = (global map arrays, previous-frame features, pose)
    odometry_step(state, points, mask, key) -> (state', StepDiagnostics)

Per-frame stage order mirrors odometry_test.cpp:185-193
(extractKeypoints -> computeDescriptors -> featureMatching ->
evaluateEstimation -> poseEstimation -> updateMap); the reference's first
frame runs a degenerate self-match (lidar_odometry.cpp:187-194), which the
rebuild expresses as a `select` to the identity pose on frame 0.

Matching detail (reference: lidar_odometry.cpp:195-208): the candidate set
is the global-map AABB window around the previous pose PLUS the previous
frame's keypoints transformed into the world; source keypoints stay in the
sensor frame, so the estimated transform IS the absolute pose.  Instead of
gathering candidates into a dynamic buffer, matching runs densely over the
whole fixed-capacity map with the window as a mask.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bshot_slam_tpu.config import SlamConfig
from bshot_slam_tpu.geometry import se3
from bshot_slam_tpu.odometry import mapstore
from bshot_slam_tpu.ops import bshot, hamming
from bshot_slam_tpu.ops.icp import icp_point_to_point
from bshot_slam_tpu.ops.keypoints import extract_keypoints, seg_ratio_scores
from bshot_slam_tpu.ops.normals import surface_normals
from bshot_slam_tpu.ops.ransac import ransac_rigid
from bshot_slam_tpu.ops.shot import shot_descriptors


# Packed-diagnostics layout (StepDiagnostics.packed): base length and the
# named indices drivers read.  _odometry_step_impl's concat, the fused
# abort skeleton and SlamEngine's row parsing all reference these, so a
# layout change is a one-place edit.
PACKED_LEN = 28  # [pose(16), n_mutual, n_inliers, gated, h_diff, t_diff,
#                  map_size, icp_rmse, corr_stats(3), n_dropped, frame_idx]
IDX_N_MUTUAL = 16
IDX_N_INLIERS = 17
IDX_GATED = 18
IDX_MAP_SIZE = 21
IDX_ICP_RMSE = 22
IDX_CORR_STATS = 23  # ..IDX_CORR_STATS+3
IDX_N_DROPPED = 26
IDX_FRAME = 27
# Pipelined tail (present when the step receives n_valid):
IDX_N_VALID = 28
IDX_BUCKET = 29
IDX_COMMITTED = 30


class FrameFeatures(NamedTuple):
    keypoints: jnp.ndarray  # (K, 3) sensor frame
    scores: jnp.ndarray  # (K,) seg ratios
    descriptors: jnp.ndarray  # (K, 11) packed B-SHOT
    mask: jnp.ndarray  # (K,) keypoint and descriptor valid


class OdometryState(NamedTuple):
    map: mapstore.MapState
    ref: FrameFeatures  # previous frame's features (sensor frame)
    ref_pose: jnp.ndarray  # (4, 4) previous frame's world pose
    frame_idx: jnp.ndarray  # () int32


class StepDiagnostics(NamedTuple):
    pose: jnp.ndarray  # (4, 4) estimated pose of this frame
    n_mutual: jnp.ndarray  # mutual-NN correspondences before RANSAC
    n_inliers: jnp.ndarray  # RANSAC inliers
    gated: jnp.ndarray  # True if the pose gate rejected the estimate
    heading_diff_rad: jnp.ndarray
    translation_diff_mm: jnp.ndarray
    map_size: jnp.ndarray
    icp_rmse: jnp.ndarray
    # [mean, SD, median] of inlier correspondence distance (mm) after the
    # final transform (reference: lidar_odometry.cpp:304-330).
    corr_stats: jnp.ndarray  # (3,) float32
    # Correspondence details for the BA backend: per source keypoint, the
    # matched index into [map capacity | prev-frame keypoints] and whether it
    # was a RANSAC inlier (indices < map capacity are landmark observations).
    corr_index: jnp.ndarray  # (K,) int32
    corr_inlier: jnp.ndarray  # (K,) bool
    features: "FrameFeatures"  # this frame's features (for keyframing)
    # Cumulative keypoints dropped at the capacity ceiling (saturation
    # observability; the reference map grows unboundedly, mymap.cpp:4-26).
    n_dropped: jnp.ndarray
    # All host-facing scalars flattened into one (28,) float32 vector
    # [pose(16), n_mutual, n_inliers, gated, h_diff, t_diff, map_size,
    # icp_rmse, corr_stats(3), n_dropped, frame_idx] so drivers fetch
    # per-frame diagnostics in a single device->host transfer (one RPC on
    # remoted backends).  Pipelined steps append a [n_valid, bucket,
    # committed] tail (31 total) — see `odometry_step_fused`.
    packed: jnp.ndarray


def init_state(cfg: SlamConfig) -> OdometryState:
    K = cfg.keypoints.top_k
    return OdometryState(
        map=mapstore.init_map(cfg.map),
        ref=FrameFeatures(
            keypoints=jnp.zeros((K, 3), jnp.float32),
            scores=jnp.zeros((K,), jnp.float32),
            descriptors=jnp.zeros((K, cfg.descriptor.n_words), jnp.uint32),
            mask=jnp.zeros((K,), bool),
        ),
        ref_pose=jnp.eye(4, dtype=jnp.float32),
        frame_idx=jnp.zeros((), jnp.int32),
    )


def compute_features(
    points: jnp.ndarray, pmask: jnp.ndarray, cfg: SlamConfig, tile: int
) -> FrameFeatures:
    """extractKeypoints + computeDescriptors (reference:
    lidar_odometry.cpp:51-184) as pure tensor ops.

    The SR saliency centroid pass and the normal-PCA pass need the same
    neighborhood moments at the same radius (reference radii both 3000 mm —
    lidar_odometry.cpp:68,174), so one fused sweep feeds both.
    """
    from bshot_slam_tpu.ops.keypoints import (
        extract_keypoints as _extract, neighborhood_moments, seg_ratio_scores,
    )
    from bshot_slam_tpu.ops.normals import normals_from_moments

    cap_mode = cfg.keypoints.neighbor_cap_mode
    share = (
        cfg.descriptor.use_surface_normals
        and cfg.descriptor.normal_radius_mm == cfg.keypoints.radius_mm
        and not cap_mode  # capped balls differ per consumer; no shared sweep
    )
    if share:
        cnt, psum, outer = neighborhood_moments(
            points, pmask, cfg.keypoints.radius_mm, tile
        )
        scores = seg_ratio_scores(points, pmask, cfg.keypoints, tile,
                                  moments=(cnt, psum))
        # approx_max_k: exact on CPU, bucketed on TPU (~5x faster than
        # lax.top_k over 49k lanes); may swap a few borderline keypoints,
        # which the saliency heuristic never guaranteed anyway.
        # RuntimeConfig.exact_topk forces the exact path (TPU-vs-CPU
        # trajectory parity; measured divergence in GOLDEN_TPU_r04.json).
        # topk_chunks makes the selection two-stage (shard-local first
        # stage under a data-sharded mesh — see ops.shot.chunked_top_k).
        from bshot_slam_tpu.ops.shot import chunked_top_k

        top_scores, top_idx = chunked_top_k(
            scores, cfg.keypoints.top_k, cfg.runtime.topk_chunks,
            cfg.runtime.exact_topk,
        )
        kmask = jnp.isfinite(top_scores)
        from bshot_slam_tpu.ops.keypoints import Keypoints

        kps = Keypoints(
            positions=jnp.where(kmask[:, None], points[top_idx], 0.0),
            scores=jnp.where(kmask, top_scores, 0.0),
            mask=kmask,
            indices=jnp.where(kmask, top_idx, -1),
        )
        normals, _, _ = normals_from_moments(points, pmask, cnt, psum, outer)
    else:
        kps = extract_keypoints(points, pmask, cfg.keypoints, tile)
        if cfg.descriptor.use_surface_normals:
            normals, _, _ = surface_normals(
                points, pmask, cfg.descriptor.normal_radius_mm, tile,
                cap=cfg.keypoints.neighbor_cap if cap_mode else None,
            )
        else:  # reference-mimic mode: zero surface normals (bshot_bits.h:59)
            normals = jnp.zeros_like(points)
    desc_f, desc_valid = shot_descriptors(
        kps.positions, kps.mask, points, pmask, normals, cfg.descriptor,
        exact_topk=cfg.runtime.exact_topk,
        topk_chunks=cfg.runtime.topk_chunks,
    )
    words = bshot.bshot_from_shot(desc_f, cfg.descriptor)
    return FrameFeatures(
        keypoints=kps.positions,
        scores=kps.scores,
        descriptors=words,
        mask=kps.mask & desc_valid,
    )


def _match_and_estimate(
    key: jax.Array,
    src: FrameFeatures,
    state: OdometryState,
    cfg: SlamConfig,
):
    """featureMatching + evaluateEstimation (reference:
    lidar_odometry.cpp:186-331)."""
    mcfg = cfg.match
    ref_pose = state.ref_pose
    center = se3.translation(ref_pose)

    # Candidate set: map window  ∪  previous frame keypoints in world frame
    # (map first, then ref — the reference's build order, which its strict-<
    # minimum scans turn into map-wins tie-breaking: lidar_odometry.cpp:
    # 196-208,217-242).  Valid map rows are the append-only prefix
    # [0, cursor); the ref block rides after the map region and is always
    # live, so the Pallas kernels skip only the empty middle.
    win = mapstore.query_mask(state.map, center, mcfg.map_query_range_mm, cfg.map)
    ref_world = se3.apply(ref_pose, state.ref.keypoints)
    capacity = state.map.positions.shape[0]

    # Window compaction (reference: mymap.cpp:28-74 iterates ONLY the voxel
    # blocks inside the query AABB): gather the in-window map rows into a
    # (window_cap, ...) compact buffer once, so matching and ICP scale with
    # the local map density instead of the total map size.  `widx` is
    # ascending, preserving the reference's lowest-index tie-breaking.
    # Lossless: if the window overflows the cap, lax.cond falls back to the
    # dense full-capacity scan (the pre-compaction path).
    W = cfg.runtime.window_cap
    use_compact = cfg.runtime.window_compact and capacity > W
    if use_compact:
        n_win = jnp.sum(win.astype(jnp.int32))
        widx = mapstore.compact_indices(win, W)
        wmask = jnp.arange(W, dtype=jnp.int32) < n_win
        overflow = n_win > W

    def _nn_dense(_):
        cand_desc = jnp.concatenate(
            [state.map.descriptors, state.ref.descriptors]
        )
        cand_mask = jnp.concatenate([win, state.ref.mask])
        cand_pos = jnp.concatenate([state.map.positions, ref_world], axis=0)
        m = hamming.mutual_nn_bounded(
            src.descriptors, src.mask, cand_desc, cand_mask, state.map.cursor,
            tail_start=capacity,
        )
        return cand_pos[m.src_to_ref], m.mutual, m.src_to_ref

    def _nn_compact(_):
        wpos = jnp.where(wmask[:, None], state.map.positions[widx], 0.0)
        wdesc = jnp.where(
            wmask[:, None], state.map.descriptors[widx], jnp.uint32(0)
        )
        cand_desc = jnp.concatenate([wdesc, state.ref.descriptors])
        cand_mask = jnp.concatenate([wmask, state.ref.mask])
        cand_pos = jnp.concatenate([wpos, ref_world], axis=0)
        m = hamming.mutual_nn_bounded(
            src.descriptors, src.mask, cand_desc, cand_mask, n_win,
            tail_start=W,
        )
        # Translate compact candidate indices back to the full-map index
        # space [0, capacity + K) so BA/keyframing semantics are unchanged.
        full_idx = jnp.where(
            m.src_to_ref < W, widx[m.src_to_ref],
            capacity + (m.src_to_ref - W),
        )
        return cand_pos[m.src_to_ref], m.mutual, full_idx

    if use_compact:
        corr_dst, cmask, corr_index = jax.lax.cond(
            overflow, _nn_dense, _nn_compact, None
        )
    else:
        corr_dst, cmask, corr_index = _nn_dense(None)

    rr = ransac_rigid(
        key, src.keypoints, corr_dst, cmask,
        inlier_threshold=mcfg.ransac_inlier_th_mm,
        iterations=mcfg.ransac_iterations,
    )
    T_j = rr.transform

    # Pose gate (reference: lidar_odometry.cpp:267-290).
    T_ij = se3.compose(se3.inverse(ref_pose), T_j)
    h_diff = se3.heading_angle(T_ij)
    t_diff = jnp.linalg.norm(se3.translation(T_ij))
    gate = (
        (h_diff > jnp.deg2rad(mcfg.gate_heading_deg))
        | (t_diff > mcfg.gate_translation_mm)
        | (rr.n_inliers < mcfg.gate_min_inliers)
    )
    T_est = jnp.where(gate, ref_pose, T_j)

    # ICP refinement against the candidate set
    # (reference: lidar_odometry.cpp:291-299).
    src_est = se3.apply(T_est, src.keypoints)

    def _icp_dense(_):
        cand_pos = jnp.concatenate([state.map.positions, ref_world], axis=0)
        cand_mask = jnp.concatenate([win, state.ref.mask])
        r = icp_point_to_point(
            src_est, src.mask, cand_pos, cand_mask,
            iterations=mcfg.icp_iterations,
            max_corr_dist=mcfg.icp_max_corr_dist_mm,
            n_valid_dst=state.map.cursor,
            tail_start=capacity,
        )
        return r.transform, r.rmse

    def _icp_compact(_):
        wpos = jnp.where(wmask[:, None], state.map.positions[widx], 0.0)
        cand_pos = jnp.concatenate([wpos, ref_world], axis=0)
        cand_mask = jnp.concatenate([wmask, state.ref.mask])
        r = icp_point_to_point(
            src_est, src.mask, cand_pos, cand_mask,
            iterations=mcfg.icp_iterations,
            max_corr_dist=mcfg.icp_max_corr_dist_mm,
            n_valid_dst=n_win,
            tail_start=W,
        )
        return r.transform, r.rmse

    if use_compact:
        T_icp, icp_rmse_v = jax.lax.cond(
            overflow, _icp_dense, _icp_compact, None
        )
    else:
        T_icp, icp_rmse_v = _icp_dense(None)
    T_best = jnp.where(mcfg.run_icp, se3.compose(T_icp, T_est), T_j)
    n_mutual = jnp.sum(cmask.astype(jnp.int32))

    # Correspondence-quality stats over RANSAC inliers after the final
    # transform (reference: lidar_odometry.cpp:304-330, printed when
    # evaluate_corr_ is set; feeds Correspondences_analysis.m).  Median is
    # the lower middle element of the sorted inlier distances.
    d = jnp.linalg.norm(se3.apply(T_best, src.keypoints) - corr_dst, axis=-1)
    w = rr.inliers
    n_in = jnp.sum(w.astype(jnp.int32))
    safe_n = jnp.maximum(n_in, 1).astype(jnp.float32)
    c_mean = jnp.sum(jnp.where(w, d, 0.0)) / safe_n
    c_std = jnp.sqrt(
        jnp.sum(jnp.where(w, (d - c_mean) ** 2, 0.0)) / safe_n
    )
    d_sorted = jnp.sort(jnp.where(w, d, jnp.inf))
    c_median = d_sorted[jnp.maximum(n_in - 1, 0) // 2]
    corr_stats = jnp.where(
        n_in > 0,
        jnp.stack([c_mean, c_std, c_median]),
        jnp.zeros(3, jnp.float32),
    )
    return (T_best, rr, corr_index, n_mutual, gate, h_diff, t_diff,
            icp_rmse_v, corr_stats)


def _odometry_step_impl(
    state: OdometryState,
    points: jnp.ndarray,
    pmask: jnp.ndarray,
    key: jax.Array,
    cfg: SlamConfig,
    tile: int = 2048,
    n_valid: jnp.ndarray | None = None,
) -> tuple[OdometryState, StepDiagnostics]:
    """One full SLAM frame (reference main loop: odometry_test.cpp:185-193).

    `n_valid` (pre-slice cloud count) optionally rides along in `packed`
    (+[n_valid, bucket, committed] tail) so pipelined drivers learn it in
    the same device->host transfer as the diagnostics."""
    src = compute_features(points, pmask, cfg, tile)

    (T_best, rr, corr_index, n_mutual, gate, h_diff, t_diff,
     icp_rmse, corr_stats) = _match_and_estimate(key, src, state, cfg)

    # INITIAL frame: identity pose, no gating (reference: self-match branch).
    is_initial = state.frame_idx == 0
    T_best = jnp.where(is_initial, jnp.eye(4, dtype=jnp.float32), T_best)
    gate = jnp.where(is_initial, False, gate)

    # updateMap (reference: lidar_odometry.cpp:344-376): transform source
    # keypoints by the accepted pose and insert all of them.
    world_kp = se3.apply(T_best, src.keypoints)
    new_map = mapstore.insert_keypoints(
        state.map, world_kp, src.descriptors, src.scores, src.mask, cfg.map,
        frame_idx=state.frame_idx,
        window_cap=(
            cfg.runtime.window_cap if cfg.runtime.window_compact else None
        ),
    )

    new_state = OdometryState(
        map=new_map,
        ref=src,
        ref_pose=T_best,
        frame_idx=state.frame_idx + 1,
    )
    msize = mapstore.map_size(new_map)
    packed = jnp.concatenate([
        T_best.reshape(16),
        jnp.stack([
            n_mutual.astype(jnp.float32),
            rr.n_inliers.astype(jnp.float32),
            gate.astype(jnp.float32),
            h_diff,
            t_diff,
            msize.astype(jnp.float32),
            icp_rmse,
        ]),
        corr_stats,
        new_map.n_dropped.astype(jnp.float32)[None],
        # This frame's absolute index (= pre-increment state.frame_idx), so
        # pipelined drivers recover it at drain time without a device sync.
        state.frame_idx.astype(jnp.float32)[None],
    ])
    if n_valid is not None:
        packed = jnp.concatenate([
            packed,
            n_valid.astype(jnp.float32)[None],
            jnp.float32(points.shape[0])[None],
            jnp.float32(1.0)[None],  # committed (fused steps may override)
        ])
    diag = StepDiagnostics(
        pose=T_best,
        n_mutual=n_mutual,
        n_inliers=rr.n_inliers,
        gated=gate,
        heading_diff_rad=h_diff,
        translation_diff_mm=t_diff,
        map_size=msize,
        icp_rmse=icp_rmse,
        corr_stats=corr_stats,
        corr_index=corr_index.astype(jnp.int32),
        corr_inlier=rr.inliers & ~is_initial,
        features=src,
        n_dropped=new_map.n_dropped,
        packed=packed,
    )
    return new_state, diag


@functools.partial(
    jax.jit, static_argnames=("cfg", "tile"), donate_argnames=("state",)
)
def odometry_step(
    state: OdometryState,
    points: jnp.ndarray,
    pmask: jnp.ndarray,
    key: jax.Array,
    cfg: SlamConfig,
    tile: int = 2048,
    n_valid: jnp.ndarray | None = None,
) -> tuple[OdometryState, StepDiagnostics]:
    return _odometry_step_impl(state, points, pmask, key, cfg, tile, n_valid)


odometry_step.__doc__ = _odometry_step_impl.__doc__


@functools.partial(
    jax.jit, static_argnames=("cfg", "tile"), donate_argnames=("state",)
)
def odometry_step_compact(
    state: OdometryState,
    points: jnp.ndarray,  # (bucket, 3) front-compacted kept points
    n_valid: jnp.ndarray,  # () int32, <= bucket (exact: host counted it)
    key: jax.Array,
    cfg: SlamConfig,
    tile: int = 2048,
) -> tuple[OdometryState, StepDiagnostics]:
    """Odometry step over a host-preprocessed compact cloud.

    The engine's default ingest path preprocesses on the HOST (see
    ops.preprocess_host for why), so kept points arrive front-compacted
    with an exact count: the validity mask is just `iota < n_valid`,
    making the per-frame upload a single (bucket, 3) buffer.  Because the
    bucket is chosen from the exact count, this path can never overflow —
    the deferred-bucket commit-or-abort machinery exists only for the
    device-preprocessed `odometry_step_fused` path."""
    pmask = jnp.arange(points.shape[0], dtype=jnp.int32) < n_valid
    return _odometry_step_impl(
        state, points, pmask, key, cfg, tile, n_valid=n_valid
    )


@functools.partial(
    jax.jit,
    static_argnames=("pcfg", "cfg", "bucket", "tile"),
    donate_argnames=("state",),
)
def odometry_step_fused(
    state: OdometryState,
    key: jax.Array,
    ok: jnp.ndarray,  # () bool: pipeline healthy (no earlier in-flight abort)
    range_az: jnp.ndarray,  # (2, R, A): [range_mm, azimuth_rad]
    vert_rad: jnp.ndarray,  # (R,)
    selected: jnp.ndarray | None,
    pcfg,
    cfg: SlamConfig,
    bucket: int,
    tile: int = 2048,
) -> tuple[OdometryState, jax.Array, jnp.ndarray, StepDiagnostics]:
    """Whole frame in ONE device dispatch: preprocessing + cloud extraction
    + bucket slice + PRNG split + the odometry step — with commit-or-abort
    overflow semantics so bucketing is lossless.

    The pipelined engine path uses this instead of the separate
    `_ingest` + `odometry_step` dispatches: on remoted backends each
    dispatch is a host RPC, so halving the per-frame dispatch count is a
    direct latency win (the TPU analog of the reference folding its whole
    frame into one main-loop iteration, odometry_test.cpp:185-193).  The
    PRNG chain advances with the same `jax.random.split` the host path
    uses, so results match the unfused path (numerically equivalent;
    padded-lane masking makes cross-bucket results agree to ~1e-5).

    Lossless bucketing: the engine predicts `bucket` from the previous
    frame's point count, so a count spike can overflow it.  Instead of
    silently dropping the tail (the reference never drops kept returns —
    preprocess.cpp:201-216), the step COMMITS only when `ok` is set and the
    cloud fits: on overflow it passes `state`/`key` through untouched and
    clears `ok`, which cascades the abort through every later in-flight
    frame.  The host sees committed=0 in the packed tail at drain time and
    re-dispatches the stalled frames at their exact (now known) buckets.
    Returns (state', key', ok', diag); diag.packed tail is
    [n_valid, bucket, committed]."""
    from bshot_slam_tpu.ops import preprocess as pp

    res = pp.preprocess(range_az[0], range_az[1], vert_rad, pcfg)
    sel = selected if selected is not None else jnp.ones_like(res.valid)
    points, pmask = pp.extract_cloud(res, sel, pcfg.max_points)
    n_valid = jnp.sum(pmask.astype(jnp.int32))
    points, pmask = points[:bucket], pmask[:bucket]
    # n_valid <= max_points by construction, so a bucket at the global
    # capacity ceiling can never overflow.
    commit = ok & (n_valid <= bucket)

    def _run(st, k):
        nk, sub = jax.random.split(k)
        nst, diag = _odometry_step_impl(
            st, points, pmask, sub, cfg, tile, n_valid=n_valid
        )
        return nst, nk, diag

    def _skip(st, k):
        # Aborted frame: state/key passthrough and a dummy diagnostics
        # skeleton — only the packed tail's n_valid matters (the host uses
        # it to re-dispatch at the exact bucket).  Running under lax.cond
        # means an abort costs ~preprocess only, so a cascade of stalled
        # in-flight frames wastes almost no device time.
        K = cfg.keypoints.top_k
        feats = FrameFeatures(
            keypoints=jnp.zeros((K, 3), jnp.float32),
            scores=jnp.zeros((K,), jnp.float32),
            descriptors=jnp.zeros((K, cfg.descriptor.n_words), jnp.uint32),
            mask=jnp.zeros((K,), bool),
        )
        packed = jnp.concatenate([
            jnp.zeros(PACKED_LEN, jnp.float32),
            n_valid.astype(jnp.float32)[None],
            jnp.float32(bucket)[None],
            jnp.float32(0.0)[None],
        ])
        diag = StepDiagnostics(
            pose=jnp.eye(4, dtype=jnp.float32),
            n_mutual=jnp.int32(0), n_inliers=jnp.int32(0),
            gated=jnp.asarray(False),
            heading_diff_rad=jnp.float32(0.0),
            translation_diff_mm=jnp.float32(0.0),
            map_size=jnp.int32(0), icp_rmse=jnp.float32(0.0),
            corr_stats=jnp.zeros(3, jnp.float32),
            corr_index=jnp.zeros((K,), jnp.int32),
            corr_inlier=jnp.zeros((K,), bool),
            features=feats,
            n_dropped=st.map.n_dropped,
            packed=packed,
        )
        return st, k, diag

    new_state, new_key, diag = jax.lax.cond(commit, _run, _skip, state, key)
    diag = diag._replace(
        packed=diag.packed.at[-1].set(commit.astype(jnp.float32))
    )
    return new_state, new_key, commit, diag
