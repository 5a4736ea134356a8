"""LiDAR pipeline: range-image features, voxel-hash NN, LOAM odometry."""

from . import features, odometry, voxel_map
from .features import LidarConfig, LidarFeatures
from .odometry import LidarOdometry, OdomConfig

__all__ = [
    "features",
    "voxel_map",
    "odometry",
    "LidarConfig",
    "LidarFeatures",
    "LidarOdometry",
    "OdomConfig",
]
