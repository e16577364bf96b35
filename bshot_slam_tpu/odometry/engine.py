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
from bshot_slam_tpu.odometry import pipeline
from bshot_slam_tpu.ops import preprocess as pp
from bshot_slam_tpu.ops.rangeimage import build_range_image


@dataclasses.dataclass
class FrameRecord:
    pose: np.ndarray  # (4, 4)
    n_inliers: int
    n_mutual: int
    gated: bool
    map_size: int
    icp_rmse: float


class SlamEngine:
    """Streaming scan-to-map odometry over a sweep source."""

    def __init__(self, cfg: SlamConfig, seed: int = 0, tile: int = 2048):
        self.cfg = cfg
        self.tile = tile
        self.state = pipeline.init_state(cfg)
        self.key = jax.random.PRNGKey(seed)
        self.records: List[FrameRecord] = []

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
        return self.process_cloud(points, pmask)

    def process_cloud(self, points: jnp.ndarray, pmask: jnp.ndarray) -> FrameRecord:
        self.key, sub = jax.random.split(self.key)
        self.state, diag = pipeline.odometry_step(
            self.state, points, pmask, sub, self.cfg, self.tile
        )
        rec = FrameRecord(
            pose=np.asarray(diag.pose),
            n_inliers=int(diag.n_inliers),
            n_mutual=int(diag.n_mutual),
            gated=bool(diag.gated),
            map_size=int(diag.map_size),
            icp_rmse=float(diag.icp_rmse),
        )
        self.records.append(rec)
        return rec

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
