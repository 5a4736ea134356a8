"""End-to-end monocular SLAM on the synthetic world (up-to-scale ATE)."""

import numpy as np
import pytest

from sqrtlm_slam_tpu.eval.ate import ate_rmse
from sqrtlm_slam_tpu.eval.synthetic import DEFAULT_CAM, SyntheticWorld, forward_trajectory
from sqrtlm_slam_tpu.frontend import orb
from sqrtlm_slam_tpu.pipeline.system import SlamSystem, SystemConfig
from sqrtlm_slam_tpu.pipeline.tracking import TrackingConfig


@pytest.mark.slow
def test_mono_initializes_and_tracks():
    world = SyntheticWorld(seed=5, n_points=1200)
    n_frames = 15
    poses = forward_trajectory(n_frames, step=0.35)
    cfg = SystemConfig(
        orb=orb.ORBConfig(max_features=600),
        tracking=TrackingConfig(min_inliers_local=15),
    )
    s = SlamSystem(DEFAULT_CAM, cfg)

    tracked = 0
    for T in poses:
        img, _ = world.render(T, DEFAULT_CAM)
        if s.track_monocular(img) is not None:
            tracked += 1
    # The first frame is consumed as the init reference (not tracked).
    assert s.num_keyframes() >= 2, "mono init failed"
    assert s.num_landmarks() > 80
    assert tracked >= n_frames - 4, f"mono tracking broke: {tracked}/{n_frames}"

    est = s.get_trajectory()
    gt = []
    for T in poses[-len(est):]:
        M = np.eye(4)
        M[:3, :3] = np.asarray(T.R)
        M[:3, 3] = np.asarray(T.t)
        gt.append(np.linalg.inv(M))
    # Sim3-aligned ATE (mono is up-to-scale).
    rmse, _ = ate_rmse(est, np.stack(gt), align_scale=True)
    # Mono accumulates scale drift without loop closure; ~5% of path length.
    assert rmse < 0.4, f"mono ATE too high: {rmse}"
