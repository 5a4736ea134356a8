"""End-to-end visual-LiDAR fusion: depth association + tight coupling.

Synthesizes a scanner-style cloud from the rendered depth image (backproject
-> lidar frame), drives `track_fusion`, and checks the tightly-coupled
pipeline tracks with active lidar associations.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sqrtlm_slam_tpu.eval.ate import ate_rmse
from sqrtlm_slam_tpu.eval.synthetic import DEFAULT_CAM, SyntheticWorld, forward_trajectory
from sqrtlm_slam_tpu.frontend import orb
from sqrtlm_slam_tpu.lidar.features import LidarConfig
from sqrtlm_slam_tpu.pipeline.system import SlamSystem, SystemConfig

# Camera -> LiDAR basis: x_l = z_c, y_l = -x_c, z_l = -y_c.
R_CL = np.array([[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]], np.float32)
T_CL = (jnp.asarray(R_CL), jnp.zeros(3))

LCFG = LidarConfig(
    num_rings=48,
    elev_min_deg=-30.0,
    elev_max_deg=30.0,
    horizon_res_deg=0.4,
    ground_z=-100.0,  # synthetic world has no ground plane
    min_range=0.5,
    max_range=90.0,
)


def depth_to_lidar_cloud(depth_img, cam):
    """Backproject the rendered depth image into a lidar-frame cloud."""
    d = np.asarray(depth_img)
    H, W = d.shape
    vs, us = np.mgrid[0:H, 0:W]
    z = d.reshape(-1)
    u = us.reshape(-1).astype(np.float32)
    v = vs.reshape(-1).astype(np.float32)
    x = (u - cam.cx) * z / cam.fx
    y = (v - cam.cy) * z / cam.fy
    p_c = np.stack([x, y, z], -1).astype(np.float32)
    p_l = p_c @ R_CL  # R_CL^T p_c (row form)
    return jnp.asarray(p_l)  # z=0 pixels give range 0 -> dropped by min_range


@pytest.mark.slow
def test_fusion_tight_coupling_tracks():
    world = SyntheticWorld(seed=9, n_points=1000)
    n_frames = 12
    poses = forward_trajectory(n_frames, step=0.35)
    cfg = SystemConfig(orb=orb.ORBConfig(max_features=600), lidar=LCFG)
    s = SlamSystem(DEFAULT_CAM, cfg)

    tracked = 0
    lidar_hits = 0
    for T in poses:
        img, depth = world.render(T, DEFAULT_CAM)
        cloud = depth_to_lidar_cloud(depth, DEFAULT_CAM)
        if s.track_fusion(img, cloud, T_cam_lidar=T_CL) is not None:
            tracked += 1
        lidar_hits = max(lidar_hits, s.tracker.last_lidar_matches)
    assert tracked >= n_frames - 1, f"fusion tracking broke: {tracked}/{n_frames}"
    assert lidar_hits > 20, f"tight coupling inactive (max lidar matches {lidar_hits})"

    est = s.get_trajectory()
    gt = []
    for T in poses[: len(est)]:
        M = np.eye(4)
        M[:3, :3] = np.asarray(T.R)
        M[:3, 3] = np.asarray(T.t)
        gt.append(np.linalg.inv(M))
    rmse, _ = ate_rmse(est, np.stack(gt))
    assert rmse < 0.2, f"fusion ATE too high: {rmse}"
