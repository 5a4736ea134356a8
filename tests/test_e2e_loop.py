"""End-to-end loop closure on a synthetic ring trajectory.

Drives the full stack — ORB, depth association, tracking, local BA,
vocabulary, BoW database, Sim3 RANSAC, essential graph, global BA — around
a circle that re-enters its start, and asserts a loop is detected+closed
with the trajectory staying accurate (the capability exercised on KITTI 05
in the reference's protocol, SURVEY.md §6)."""

import numpy as np
import pytest

from sqrtlm_slam_tpu.eval.ate import ate_rmse
from sqrtlm_slam_tpu.eval.synthetic import DEFAULT_CAM, ring_trajectory, ring_world
from sqrtlm_slam_tpu.frontend import orb
from sqrtlm_slam_tpu.loop import LoopClosingConfig
from sqrtlm_slam_tpu.pipeline.system import SlamSystem, SystemConfig


@pytest.mark.slow
def test_ring_loop_closes():
    world = ring_world(seed=7, n_points=2500)
    n_frames = 80
    poses = ring_trajectory(n_frames, frac=1.15)  # re-traverse 15% of the ring

    cfg = SystemConfig(
        orb=orb.ORBConfig(max_features=600),
        loop_detection=True,
    )
    loop_cfg = LoopClosingConfig(
        consistency_threshold=1,  # short run: accept on first consistent hit
        min_ransac_inliers=15,
        min_total_matches=20,
        kf_gap=8,
        gba_iters=10,
    )
    s = SlamSystem(DEFAULT_CAM, cfg, loop_cfg=loop_cfg)

    tracked = 0
    for T in poses:
        img, depth = world.render(T, DEFAULT_CAM)
        if s.track_depth(img, depth) is not None:
            tracked += 1
    assert tracked >= n_frames - 2, f"tracking broke: {tracked}/{n_frames}"
    assert s.loop_closer.num_loops_closed >= 1, "no loop closed on ring rerun"

    est = s.get_trajectory()
    gt = []
    for T in poses[: len(est)]:
        M = np.eye(4)
        M[:3, :3] = np.asarray(T.R)
        M[:3, 3] = np.asarray(T.t)
        gt.append(np.linalg.inv(M))
    rmse, _ = ate_rmse(est, np.stack(gt))
    assert rmse < 0.5, f"ATE too high after loop closure: {rmse}"
