"""End-to-end loop closure on a synthetic ring trajectory.

Drives the full stack — ORB, depth association, tracking, local BA,
vocabulary, BoW database, Sim3 RANSAC + SearchBySim3 growth, guided
projection acceptance, SearchAndFuse, essential graph, global BA — around a
circle that re-enters its start, and asserts a loop is detected+closed at
the REFERENCE-STRENGTH gates (consistency 3, >= 20 Sim3 inliers, >= 40
total matches — LoopClosing.cc defaults) with duplicate landmarks fused and
the trajectory staying accurate (the capability exercised on KITTI 05 in
the reference's protocol, SURVEY.md §6)."""

import numpy as np
import pytest

from sqrtlm_slam_tpu.eval.ate import ate_rmse
from sqrtlm_slam_tpu.eval.synthetic import DEFAULT_CAM, ring_trajectory, ring_world
from sqrtlm_slam_tpu.frontend import orb
from sqrtlm_slam_tpu.loop import LoopClosingConfig
from sqrtlm_slam_tpu.pipeline.system import SlamSystem, SystemConfig


@pytest.mark.slow
def test_ring_loop_closes_at_reference_gates():
    world = ring_world(seed=7, n_points=2500)
    n_frames = 160
    poses = ring_trajectory(n_frames, frac=1.3)  # re-traverse 30% of the ring

    cfg = SystemConfig(
        orb=orb.ORBConfig(max_features=600),
        loop_detection=True,
    )
    # DEFAULT LoopClosingConfig == the reference's acceptance protocol.
    s = SlamSystem(DEFAULT_CAM, cfg, loop_cfg=LoopClosingConfig())

    tracked = 0
    for T in poses:
        img, depth = world.render(T, DEFAULT_CAM)
        if s.track_depth(img, depth) is not None:
            tracked += 1
    assert tracked >= n_frames - 2, f"tracking broke: {tracked}/{n_frames}"
    lc = s.loop_closer
    assert lc.num_loops_closed >= 1, "no loop closed at reference gates"
    # SearchAndFuse must have merged duplicate landmarks across the loop.
    assert lc.last_fused >= 20, f"only {lc.last_fused} landmarks fused"

    est = s.get_trajectory()
    gt = []
    for T in poses[: len(est)]:
        M = np.eye(4)
        M[:3, :3] = np.asarray(T.R)
        M[:3, 3] = np.asarray(T.t)
        gt.append(np.linalg.inv(M))
    rmse, _ = ate_rmse(est, np.stack(gt))
    assert rmse < 0.3, f"ATE too high after loop closure: {rmse}"
