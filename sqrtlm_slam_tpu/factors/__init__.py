"""Residual + Jacobian library (reprojection, LiDAR, pose-graph, Sim3)."""

from . import lidar, pose_graph, reprojection
from .reprojection import Camera

__all__ = ["reprojection", "lidar", "pose_graph", "Camera"]
