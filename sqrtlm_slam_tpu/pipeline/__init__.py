"""SLAM pipeline: frame building, tracking, local mapping, system facade."""

from . import frame, local_mapping, system, tracking
from .frame import Frame, build_frame
from .system import SlamSystem, SystemConfig
from .tracking import Tracker, TrackingConfig, TrackState

__all__ = [
    "frame",
    "tracking",
    "local_mapping",
    "system",
    "Frame",
    "build_frame",
    "SlamSystem",
    "SystemConfig",
    "Tracker",
    "TrackingConfig",
    "TrackState",
]
