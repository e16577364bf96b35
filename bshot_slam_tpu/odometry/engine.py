"""Host-side SLAM engine: sweeps in, poses out.

Equivalent of the reference's `odometry_test` driver main loop (reference:
test/odometry_test.cpp:122-345) without the interactive visualization:
ingest a sweep, preprocess on device, run the fused odometry step, record
the trajectory.  All device work is two jitted calls per frame
(preprocess+extract, odometry step); the host only reshapes numpy buffers —
the TPU analog of the reference's capture-thread/main-loop split, with the
queue replaced by XLA's async dispatch.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bshot_slam_tpu.config import SlamConfig
from bshot_slam_tpu.io.velodyne import LaserSweep
from bshot_slam_tpu.odometry import mapstore, pipeline
from bshot_slam_tpu.ops import preprocess as pp
from bshot_slam_tpu.ops.rangeimage import build_range_image


def pick_bucket(n_valid: int, cfg: SlamConfig) -> int:
    """Smallest configured cloud bucket holding n_valid points (capped at
    max_points; buckets above the cap are ignored)."""
    cap = cfg.preprocess.max_points
    for b in sorted(cfg.runtime.cloud_buckets):
        if n_valid <= b <= cap:
            return b
    return cap


@dataclasses.dataclass
class FrameRecord:
    pose: np.ndarray  # (4, 4)
    n_inliers: int
    n_mutual: int
    gated: bool
    map_size: int
    icp_rmse: float
    # (mean, SD, median) inlier correspondence distance in mm
    # (reference: lidar_odometry.cpp:304-330)
    corr_stats: np.ndarray
    # Cumulative keypoints lost to the map capacity ceiling as of this frame
    n_dropped: int = 0


class SlamEngine:
    """Streaming scan-to-map odometry over a sweep source, with an optional
    keyframe/loop-closure/pose-graph backend (no reference counterpart)."""

    def __init__(self, cfg: SlamConfig, seed: int = 0, tile: int = 2048,
                 enable_backend: bool = False):
        from bshot_slam_tpu.backend import keyframes as kf_mod

        self.cfg = cfg
        self.tile = tile
        self.state = pipeline.init_state(cfg)
        # Start the map at the smallest capacity bucket; _maybe_grow_map
        # widens it (one recompile per bucket) as the map fills.
        first = min(
            [b for b in cfg.runtime.map_buckets if b <= cfg.map.capacity]
            or [cfg.map.capacity]
        )
        self.state = self.state._replace(map=mapstore.init_map(cfg.map, first))
        self.key = jax.random.PRNGKey(seed)
        self.records: List[FrameRecord] = []
        self.enable_backend = enable_backend
        self.keyframes = kf_mod.init_keyframes(cfg)
        self._last_kf_pose = np.eye(4, dtype=np.float32)
        self._frames_since_kf = 10**9  # force a keyframe on frame 0
        self.optimized_keyframe_poses: np.ndarray | None = None
        self._warned_drop = False

    def process_sweep(self, sweep: LaserSweep,
                      selected: Optional[np.ndarray] = None) -> FrameRecord:
        ri = build_range_image(sweep, self.cfg.sensor, selected)
        return self.process_range_image(
            ri.range_mm, ri.azimuth_rad, ri.vert_rad, ri.selected
        )

    def process_range_image(
        self,
        range_mm: np.ndarray,
        azimuth_rad: np.ndarray,
        vert_rad: np.ndarray,
        selected: Optional[np.ndarray] = None,
    ) -> FrameRecord:
        res = pp.preprocess(
            jnp.asarray(range_mm), jnp.asarray(azimuth_rad),
            jnp.asarray(vert_rad), self.cfg.preprocess,
        )
        sel = (
            jnp.asarray(selected) if selected is not None
            else jnp.ones_like(res.valid)
        )
        points, pmask = pp.extract_cloud(
            res, sel, self.cfg.preprocess.max_points
        )
        # Capacity bucketing: extract_cloud front-compacts kept points, so
        # slicing to the smallest bucket >= n_valid preserves every valid
        # point while shrinking the O(N^2) neighborhood grids (~4-8x fewer
        # Pallas grid steps on typical urban frames).
        b = pick_bucket(int(jnp.sum(pmask)), self.cfg)
        if b < points.shape[0]:
            points, pmask = points[:b], pmask[:b]
        return self.process_cloud(points, pmask)

    def process_cloud(self, points: jnp.ndarray, pmask: jnp.ndarray) -> FrameRecord:
        self._maybe_grow_map()
        self.key, sub = jax.random.split(self.key)
        self.state, diag = pipeline.odometry_step(
            self.state, points, pmask, sub, self.cfg, self.tile
        )
        # One host fetch for all scalar diagnostics (pipeline packs them),
        # instead of seven round trips — dominant cost on remoted devices.
        pk = np.asarray(diag.packed)
        rec = FrameRecord(
            pose=pk[:16].reshape(4, 4),
            n_inliers=int(pk[17]),
            n_mutual=int(pk[16]),
            gated=bool(pk[18] > 0),
            map_size=int(pk[21]),
            icp_rmse=float(pk[22]),
            corr_stats=pk[23:26].copy(),
            n_dropped=int(pk[26]),
        )
        if rec.n_dropped > 0 and not self._warned_drop:
            self._warned_drop = True
            import warnings

            warnings.warn(
                f"map capacity {self.cfg.map.capacity} saturated at frame "
                f"{len(self.records)}: {rec.n_dropped} keypoint(s) dropped "
                "(raise MapConfig.capacity or rely on eviction)",
                stacklevel=2,
            )
        if self.enable_backend:
            self._maybe_keyframe(diag, rec)
        self.records.append(rec)
        return rec

    def _maybe_grow_map(self) -> None:
        """Pad the map to the next capacity bucket when this frame's insert
        could overflow it (map ops scale with live capacity, so starting
        small and growing keeps matching/ICP/dedup grids minimal)."""
        cap = self.state.map.positions.shape[0]
        need = int(self.state.map.cursor) + self.cfg.keypoints.top_k
        if need <= cap:
            return
        hard_cap = self.cfg.map.capacity
        for b in sorted(set(self.cfg.runtime.map_buckets) | {hard_cap}):
            if b >= min(need, hard_cap) and b <= hard_cap and b > cap:
                self.state = self.state._replace(
                    map=mapstore.grow_map(self.state.map, b)
                )
                return

    def _maybe_keyframe(self, diag, rec: FrameRecord) -> None:
        from bshot_slam_tpu.backend import keyframes as kf_mod

        if not kf_mod.should_add_keyframe(
            self._last_kf_pose, rec.pose, self._frames_since_kf, self.cfg.backend
        ):
            self._frames_since_kf += 1
            return
        # Landmark observations: inlier matches whose candidate index falls
        # inside the map capacity at step time (the rest matched the
        # previous frame's keypoint block appended after it).
        cap = self.state.map.positions.shape[0]
        obs_lm = jnp.where(
            diag.corr_inlier & (diag.corr_index < cap), diag.corr_index, -1
        )
        self.keyframes = kf_mod.add_keyframe(
            self.keyframes, jnp.asarray(rec.pose), diag.features,
            jnp.asarray(len(self.records)), obs_lm,
        )
        self._last_kf_pose = rec.pose
        self._frames_since_kf = 1

    def optimize_backend(self, max_candidates: int = 8):
        """Loop-closure detection + pose-graph optimization over keyframes.

        Returns (optimized keyframe poses (n,4,4), loop edges).  Also keeps
        them on self.optimized_keyframe_poses.
        """
        from bshot_slam_tpu.backend import loop_closure, posegraph

        n = int(self.keyframes.count)
        if n < 2:
            # Degenerate graph: nothing to optimize; return only the real
            # keyframe poses (0 or 1) so callers can slice frame_idx safely.
            return np.asarray(self.keyframes.poses[:n]), []
        self.key, sub = jax.random.split(self.key)
        edges = loop_closure.find_loop_closures(self.keyframes, self.cfg, sub,
                                                max_candidates)
        kf_poses = jnp.asarray(np.asarray(self.keyframes.poses[:n]))
        g = posegraph.odometry_edges(kf_poses)
        if edges:
            g = posegraph.add_edges(
                g,
                jnp.asarray([e.kf_i for e in edges]),
                jnp.asarray([e.kf_j for e in edges]),
                jnp.asarray(np.stack([e.z for e in edges])),
                jnp.asarray([float(e.n_inliers) for e in edges]),
            )
        res = posegraph.optimize_pose_graph(
            g, iterations=self.cfg.backend.gn_iterations
        )
        self.optimized_keyframe_poses = np.asarray(res.poses)
        return self.optimized_keyframe_poses, edges

    def build_ba_problem(self):
        """Assemble a bundle-adjustment problem from keyframe landmark
        observations (map landmarks seen as RANSAC inliers at keyframes)."""
        from bshot_slam_tpu.backend.ba import BAProblem

        n = int(self.keyframes.count)
        kf_poses = np.asarray(self.keyframes.poses[:n])
        obs_lm = np.asarray(self.keyframes.obs_lm[:n])  # (n, K)
        kp = np.asarray(self.keyframes.keypoints[:n])  # (n, K, 3)
        kf_idx, kp_idx = np.nonzero(obs_lm >= 0)
        lm_raw = obs_lm[kf_idx, kp_idx]
        uniq, compact = np.unique(lm_raw, return_inverse=True)
        L = min(len(uniq), self.cfg.backend.ba_max_landmarks)
        keep = compact < L
        kf_idx, kp_idx, compact = kf_idx[keep], kp_idx[keep], compact[keep]
        landmarks = np.asarray(self.state.map.positions)[uniq[:L]]
        return BAProblem(
            poses=jnp.asarray(kf_poses),
            landmarks=jnp.asarray(landmarks.astype(np.float32)),
            obs_kf=jnp.asarray(kf_idx.astype(np.int32)),
            obs_lm=jnp.asarray(compact.astype(np.int32)),
            obs_p=jnp.asarray(kp[kf_idx, kp_idx].astype(np.float32)),
            obs_mask=jnp.ones(len(kf_idx), bool),
        )

    @property
    def trajectory(self) -> np.ndarray:
        """(n, 3) positions, the reference's saved-trajectory content
        (reference: odometry_test.cpp:348-361)."""
        if not self.records:
            return np.zeros((0, 3))
        return np.stack([r.pose[:3, 3] for r in self.records])

    @property
    def poses(self) -> np.ndarray:
        if not self.records:
            return np.zeros((0, 4, 4))
        return np.stack([r.pose for r in self.records])
