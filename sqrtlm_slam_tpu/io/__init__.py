"""Dataset I/O: KITTI odometry loading, calibration, trajectory writers."""

from . import kitti
from .kitti import KittiCalib, KittiSequence

__all__ = ["kitti", "KittiCalib", "KittiSequence"]
