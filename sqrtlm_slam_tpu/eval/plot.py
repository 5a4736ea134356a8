"""Trajectory / map visualization — the rviz replacement (SURVEY §5.5).

The reference publishes 15+ ROS topics into rviz (fusionsystem.cc:224-586:
GT path, estimated path, prior-run overlays, keyframe markers, map clouds).
Headless TPU runs get static artifacts instead: a top-down trajectory
figure with optional ground truth + comparison overlays and the landmark
cloud — the same side-by-side regression view `cfg/display.rviz` provides.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def plot_trajectory(
    out_path: str,
    est: np.ndarray,
    gt: Optional[np.ndarray] = None,
    comparisons: Optional[dict] = None,
    landmarks: Optional[np.ndarray] = None,
    title: str = "trajectory",
):
    """est/gt: (F, 4, 4) cam-to-world pose arrays; comparisons: name -> (F,4,4).

    Writes a top-down (x-z) PNG. Matches the reference's overlay protocol
    (fusionsystem.cc:114-190 loads prior ORB-SLAM2 runs for comparison)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 8))
    if landmarks is not None and len(landmarks):
        ax.scatter(
            landmarks[:, 0], landmarks[:, 2], s=0.5, c="#cccccc", label="landmarks"
        )
    if gt is not None:
        ax.plot(gt[:, 0, 3], gt[:, 2, 3], "k--", lw=1.2, label="ground truth")
    ax.plot(est[:, 0, 3], est[:, 2, 3], "-", lw=1.5, label="estimate")
    for name, traj in (comparisons or {}).items():
        ax.plot(traj[:, 0, 3], traj[:, 2, 3], lw=1.0, alpha=0.7, label=name)
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_aspect("equal")
    ax.legend(loc="best", fontsize=8)
    ax.set_title(title)
    fig.tight_layout()
    fig.savefig(out_path, dpi=130)
    plt.close(fig)
    return out_path
