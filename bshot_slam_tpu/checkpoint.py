"""Checkpoint / resume of full SLAM state.

The reference has no state persistence at all — only trajectory xyz text
and a PCAP start-frame fast-forward (SURVEY §5 checkpoint note; reference:
odometry_test.cpp:348-361, VelodyneCapture.h:491-497).  Here the complete
odometry state (map arrays, previous-frame features, pose, frame index)
plus the recorded trajectory round-trips through one compressed npz so long
sequences and multi-host runs can stop and resume exactly.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from bshot_slam_tpu.odometry.mapstore import MapState
from bshot_slam_tpu.odometry.pipeline import FrameFeatures, OdometryState

# v2 adds map_frame_born / map_n_dropped (MapState provenance + saturation
# fields); v1 checkpoints load with frame_born=-1, n_dropped=0 defaults.
_FORMAT_VERSION = 2


def save_state(path: str, state: OdometryState, poses: np.ndarray) -> None:
    """Write state + (n, 4, 4) pose history to `path`/slam_state.npz."""
    os.makedirs(path, exist_ok=True)
    np.savez_compressed(
        os.path.join(path, "slam_state.npz"),
        version=_FORMAT_VERSION,
        map_positions=np.asarray(state.map.positions),
        map_descriptors=np.asarray(state.map.descriptors),
        map_seg_ratios=np.asarray(state.map.seg_ratios),
        map_blocks=np.asarray(state.map.blocks),
        map_valid=np.asarray(state.map.valid),
        map_cursor=np.asarray(state.map.cursor),
        map_frame_born=np.asarray(state.map.frame_born),
        map_n_dropped=np.asarray(state.map.n_dropped),
        ref_keypoints=np.asarray(state.ref.keypoints),
        ref_scores=np.asarray(state.ref.scores),
        ref_descriptors=np.asarray(state.ref.descriptors),
        ref_mask=np.asarray(state.ref.mask),
        ref_pose=np.asarray(state.ref_pose),
        frame_idx=np.asarray(state.frame_idx),
        poses=np.asarray(poses),
    )


def load_state(path: str) -> Tuple[OdometryState, np.ndarray]:
    """Read back (OdometryState, poses). Raises on version mismatch."""
    with np.load(os.path.join(path, "slam_state.npz")) as z:
        version = int(z["version"])
        if version not in (1, 2):
            raise ValueError(f"unsupported checkpoint version {version}")
        C = z["map_positions"].shape[0]
        frame_born = (
            jnp.asarray(z["map_frame_born"]) if version >= 2
            else jnp.full((C,), -1, jnp.int32)
        )
        n_dropped = (
            jnp.asarray(z["map_n_dropped"]) if version >= 2
            else jnp.zeros((), jnp.int32)
        )
        state = OdometryState(
            map=MapState(
                positions=jnp.asarray(z["map_positions"]),
                descriptors=jnp.asarray(z["map_descriptors"]),
                seg_ratios=jnp.asarray(z["map_seg_ratios"]),
                blocks=jnp.asarray(z["map_blocks"]),
                valid=jnp.asarray(z["map_valid"]),
                cursor=jnp.asarray(z["map_cursor"]),
                frame_born=frame_born,
                n_dropped=n_dropped,
            ),
            ref=FrameFeatures(
                keypoints=jnp.asarray(z["ref_keypoints"]),
                scores=jnp.asarray(z["ref_scores"]),
                descriptors=jnp.asarray(z["ref_descriptors"]),
                mask=jnp.asarray(z["ref_mask"]),
            ),
            ref_pose=jnp.asarray(z["ref_pose"]),
            frame_idx=jnp.asarray(z["frame_idx"]),
        )
        return state, z["poses"]


# ---------------------------------------------------------------------------
# Backend (keyframes + loop edges) checkpointing — the odometry npz above
# restores the map and reference frame; these restore the pose-graph world
# so `--resume --backend` is no longer amnesiac.

_BACKEND_VERSION = 1


def save_backend(path: str, engine) -> None:
    """Persist a SlamEngine's KeyframeStore, verified loop edges, and
    keyframe-policy counters to `path`/backend_state.npz."""
    os.makedirs(path, exist_ok=True)
    kf = engine.keyframes
    edges = getattr(engine, "loop_edges", [])
    np.savez_compressed(
        os.path.join(path, "backend_state.npz"),
        version=_BACKEND_VERSION,
        kf_poses=np.asarray(kf.poses),
        kf_keypoints=np.asarray(kf.keypoints),
        kf_descriptors=np.asarray(kf.descriptors),
        kf_kp_mask=np.asarray(kf.kp_mask),
        kf_frame_idx=np.asarray(kf.frame_idx),
        kf_obs_lm=np.asarray(kf.obs_lm),
        kf_count=np.asarray(kf.count),
        edge_i=np.asarray([e.kf_i for e in edges], np.int32),
        edge_j=np.asarray([e.kf_j for e in edges], np.int32),
        edge_z=(
            np.stack([e.z for e in edges]).astype(np.float32)
            if edges else np.zeros((0, 4, 4), np.float32)
        ),
        edge_inliers=np.asarray([e.n_inliers for e in edges], np.int32),
        edge_rmse=np.asarray([e.rmse_mm for e in edges], np.float32),
        last_kf_pose=np.asarray(engine._last_kf_pose, np.float32),
        frames_since_kf=np.asarray(
            min(engine._frames_since_kf, 2**31 - 1), np.int32
        ),
        # Engine PRNG state: restoring it makes the resumed run consume the
        # exact key sequence of the uninterrupted run (bit-identical RANSAC).
        rng_key=np.asarray(engine.key),
    )


def load_backend(path: str, engine) -> bool:
    """Restore the backend state saved by `save_backend` into `engine`.
    Returns False (engine untouched) when no backend file exists."""
    import jax.numpy as _jnp

    from bshot_slam_tpu.backend.keyframes import KeyframeStore
    from bshot_slam_tpu.backend.loop_closure import LoopEdge

    fn = os.path.join(path, "backend_state.npz")
    if not os.path.exists(fn):
        return False
    with np.load(fn) as z:
        if int(z["version"]) != _BACKEND_VERSION:
            raise ValueError(
                f"unsupported backend checkpoint version {z['version']}"
            )
        engine.keyframes = KeyframeStore(
            poses=_jnp.asarray(z["kf_poses"]),
            keypoints=_jnp.asarray(z["kf_keypoints"]),
            descriptors=_jnp.asarray(z["kf_descriptors"]),
            kp_mask=_jnp.asarray(z["kf_kp_mask"]),
            frame_idx=_jnp.asarray(z["kf_frame_idx"]),
            obs_lm=_jnp.asarray(z["kf_obs_lm"]),
            count=_jnp.asarray(z["kf_count"]),
        )
        engine.loop_edges = [
            LoopEdge(
                kf_i=int(z["edge_i"][k]),
                kf_j=int(z["edge_j"][k]),
                z=z["edge_z"][k],
                n_inliers=int(z["edge_inliers"][k]),
                rmse_mm=float(z["edge_rmse"][k]),
            )
            for k in range(len(z["edge_i"]))
        ]
        engine._last_kf_pose = z["last_kf_pose"]
        engine._frames_since_kf = int(z["frames_since_kf"])
        engine.key = _jnp.asarray(z["rng_key"])
        # Host mirrors of the device store (saturation/eviction policy
        # runs without device syncs).
        engine._kf_count = int(z["kf_count"])
        engine._kf_positions = list(
            z["kf_poses"][: engine._kf_count, :3, 3].astype(np.float32)
        )
    return True
