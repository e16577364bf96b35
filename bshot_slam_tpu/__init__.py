"""bshot_slam_tpu — a TPU-native LiDAR SLAM engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
TingKaiChen/B-SHOT-SLAM (reference mounted at /root/reference): Velodyne
ingest, spherical range-image preprocessing, segmentation-ratio keypoints,
SHOT→B-SHOT binary descriptors, MXU Hamming matching, RANSAC+ICP scan-to-map
odometry, a device-resident voxel keypoint map, plus a new pose-graph /
bundle-adjustment backend and multi-chip sharding that the reference lacks.
"""

from bshot_slam_tpu.config import (  # noqa: F401
    SlamConfig,
    default_config,
    tiny_config,
)

__version__ = "0.1.0"
