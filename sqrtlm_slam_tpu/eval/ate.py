"""Trajectory evaluation: evo-equivalent ATE / RPE metrics.

The reference's protocol is `evo_ape ... -as` on KITTI-format trajectories
(/root/reference/src/fusionsystem.cc:218-220). This module reproduces it:
Umeyama/Horn alignment (with or without scale) + RMSE over translation, plus
a relative-pose error (RPE) for drift-per-meter reporting.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax.numpy as jnp

from ..geometry import align


def ate_rmse(
    est_poses: np.ndarray, gt_poses: np.ndarray, align_scale: bool = True
) -> Tuple[float, np.ndarray]:
    """ATE RMSE between (F, 4, 4) cam-to-world pose arrays (evo `-as`)."""
    est_xyz = jnp.asarray(est_poses[:, :3, 3])
    gt_xyz = jnp.asarray(gt_poses[:, :3, 3])
    rmse, aligned = align.ate_rmse(est_xyz, gt_xyz, align_scale=align_scale)
    return float(rmse), np.asarray(aligned)


def rpe(
    est_poses: np.ndarray, gt_poses: np.ndarray, delta: int = 1
) -> Tuple[float, float]:
    """Relative pose error over `delta`-frame steps.

    Returns (trans_rmse, rot_rmse_deg) — drift metrics complementary to ATE.
    """
    def rel(poses):
        A = poses[:-delta]
        B = poses[delta:]
        return np.linalg.inv(A) @ B

    E = np.linalg.inv(rel(gt_poses)) @ rel(est_poses)
    t_err = np.linalg.norm(E[:, :3, 3], axis=-1)
    cos_r = np.clip((np.trace(E[:, :3, :3], axis1=1, axis2=2) - 1) / 2, -1, 1)
    r_err = np.degrees(np.arccos(cos_r))
    return float(np.sqrt((t_err**2).mean())), float(np.sqrt((r_err**2).mean()))
