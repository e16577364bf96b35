from bshot_slam_tpu.geometry import se3  # noqa: F401
