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


def load_yaml_config(path: str, seq: str = "00") -> SequenceConfig:
    """Load a reference-style YAML config file over the sequence defaults.

    Accepts the reference's key names (`cfg/KITTI04-12.yaml`:
    `ORBextractor.nFeatures/scaleFactor/nLevels/iniThFAST`, `ThDepth`) and
    this repo's snake_case equivalents under `orb:`/`tracking:` sections.
    Unknown keys are ignored (the reference's cv::FileStorage does the same).
    """
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    base = kitti_sequence_config(seq)

    orb_kw = {}
    trk_kw = {}
    flat = {k: v for k, v in raw.items() if not isinstance(v, dict)}
    # Reference OpenCV-YAML key names.
    ref_orb = {
        "ORBextractor.nFeatures": "max_features",
        "ORBextractor.scaleFactor": "scale_factor",
        "ORBextractor.nLevels": "num_levels",
        "ORBextractor.iniThFAST": "fast_threshold",
    }
    for rk, ok in ref_orb.items():
        if rk in flat:
            orb_kw[ok] = type(getattr(base.orb, ok))(flat[rk])
    if "ThDepth" in flat:
        th_depth = float(flat["ThDepth"])
    else:
        th_depth = base.th_depth_scale
    # Section-style overrides.
    for k, v in (raw.get("orb") or {}).items():
        if k in base.orb._fields:
            orb_kw[k] = type(getattr(base.orb, k))(v)
    for k, v in (raw.get("tracking") or {}).items():
        if k in base.tracking._fields:
            trk_kw[k] = type(getattr(base.tracking, k))(v)
    return SequenceConfig(
        orb=base.orb._replace(**orb_kw),
        tracking=base.tracking._replace(**trk_kw),
        lidar=base.lidar,
        th_depth_scale=th_depth,
    )
