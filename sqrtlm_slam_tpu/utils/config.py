"""Sequence / sensor configuration presets (SURVEY §5.6).

The reference layers OpenCV YAML files: `cfg/KITTIpath.yaml` (paths, loop
flag) -> `cfg/KITTI00-02.yaml` / `KITTI03.yaml` / `KITTI04-12.yaml` (camera
intrinsics, `bf`, `ThDepth: 125`, 2000 ORB features, pyramid 8x1.2, FAST
20/7) -> `cfg/lidar_slam.yaml` (ring counts, feature caps, match radius,
weights). Here intrinsics come from the dataset's own calib.txt (as the
reference also parses, fusionsystem.cc:51-90); this module carries the
remaining per-sequence knobs as plain NamedTuples.
"""

from __future__ import annotations

from typing import NamedTuple

from ..frontend.orb import ORBConfig
from ..lidar.features import LidarConfig
from ..pipeline.local_mapping import LocalMappingConfig
from ..pipeline.tracking import TrackingConfig


class SequenceConfig(NamedTuple):
    orb: ORBConfig
    tracking: TrackingConfig
    lidar: LidarConfig
    th_depth_scale: float  # ThDepth * baseline heuristics (cfg ThDepth: 125)


def kitti_sequence_config(seq: str = "00") -> SequenceConfig:
    """Reference cfg parity: 2000 features, 8x1.2 pyramid, FAST 20/7
    (cfg/KITTI04-12.yaml), HDL-64E lidar rings (cfg/lidar_slam.yaml)."""
    orb = ORBConfig(
        max_features=2000, num_levels=8, scale_factor=1.2, fast_threshold=20
    )
    tracking = TrackingConfig(close_depth=40.0)
    lidar = LidarConfig()  # KITTI HDL-64E defaults
    return SequenceConfig(
        orb=orb, tracking=tracking, lidar=lidar, th_depth_scale=125.0
    )
