"""bshot_slam_tpu — a TPU-native LiDAR SLAM engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
TingKaiChen/B-SHOT-SLAM (reference mounted at /root/reference): Velodyne
ingest, spherical range-image preprocessing, segmentation-ratio keypoints,
SHOT→B-SHOT binary descriptors, MXU Hamming matching, RANSAC+ICP scan-to-map
odometry, a device-resident voxel keypoint map, plus a new pose-graph /
bundle-adjustment backend and multi-chip sharding that the reference lacks.
"""

import os as _os

# Persistent XLA compilation cache: TPU compiles in this environment go
# through a remote-compile tunnel and cost seconds to minutes; caching them
# across processes makes every driver/bench rerun start warm.  Opt out by
# setting BSHOT_SLAM_NO_COMPILE_CACHE=1.
if not _os.environ.get("BSHOT_SLAM_NO_COMPILE_CACHE"):
    _os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/bshot_slam_jax_cache"
    )
    _os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

from bshot_slam_tpu.config import (  # noqa: F401
    SlamConfig,
    default_config,
    tiny_config,
)

__version__ = "0.1.0"
