"""End-to-end: synthetic sequence through the full SLAM pipeline.

Renders a textured-point world along a known trajectory, runs
ORB -> matching -> pose optimization -> keyframes -> local BA, and checks
the recovered trajectory against ground truth (evo-style aligned ATE).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sqrtlm_slam_tpu.eval.synthetic import DEFAULT_CAM, SyntheticWorld, forward_trajectory
from sqrtlm_slam_tpu.frontend import orb
from sqrtlm_slam_tpu.geometry import align, se3
from sqrtlm_slam_tpu.pipeline import SlamSystem, SystemConfig, TrackingConfig
from sqrtlm_slam_tpu.pipeline.tracking import TrackState


def small_system():
    # Full 8-level pyramid: the scale-realistic renderer grows features up
    # to 3x over this trajectory (near clip at ref_depth/3), which a
    # truncated pyramid cannot normalize — the same reason the reference
    # runs 8 levels (Tracking.cc:116-120).
    cfg = SystemConfig(
        orb=orb.ORBConfig(max_features=600),
        tracking=TrackingConfig(init_min_depth_kp=80, local_map_capacity=1024),
        max_keyframes=64,
        max_landmarks=8000,
    )
    return SlamSystem(DEFAULT_CAM, cfg)


class TestEndToEnd:
    @pytest.fixture(scope="class")
    def run(self):
        world = SyntheticWorld(seed=3, n_points=900)
        poses = forward_trajectory(25, step=0.4)
        system = small_system()
        tracked = []
        for T_gt in poses:
            img, depth = world.render(T_gt, DEFAULT_CAM)
            pose = system.track_depth(img, depth)
            tracked.append(pose)
        return world, poses, system, tracked

    def test_initializes_and_tracks(self, run):
        _, poses, system, tracked = run
        assert tracked[0] is not None, "failed to initialize on frame 0"
        n_ok = sum(p is not None for p in tracked)
        assert n_ok == len(poses), f"lost tracking: {n_ok}/{len(poses)}"
        assert system.state == TrackState.OK

    def test_keyframes_and_landmarks_created(self, run):
        _, _, system, _ = run
        assert system.num_keyframes() >= 2
        assert system.num_landmarks() > 100

    def test_trajectory_ate(self, run):
        _, poses, system, _ = run
        est = system.get_trajectory()  # (F, 4, 4) cam-to-world
        assert est.shape[0] == len(poses)
        est_xyz = jnp.asarray(est[:, :3, 3])
        gt_xyz = jnp.stack(
            [se3.inverse(T).t for T in poses]
        )  # camera centers in world
        rmse, _ = align.ate_rmse(est_xyz, gt_xyz, align_scale=False)
        # ~10 m of travel; sub-0.3 m ATE demonstrates consistent tracking+BA.
        assert float(rmse) < 0.3, f"ATE {float(rmse):.3f} m"

    def test_per_frame_pose_error(self, run):
        _, poses, _, tracked = run
        errs = []
        for T_gt, T_est in zip(poses, tracked):
            d = se3.local_delta(T_est, T_gt)
            errs.append(float(jnp.linalg.norm(d[:3])))
        assert np.median(errs) < 0.2, f"median pose err {np.median(errs):.3f}"

    def test_kitti_trajectory_io(self, run, tmp_path):
        _, _, system, _ = run
        path = tmp_path / "traj.txt"
        system.save_trajectory_kitti(str(path))
        data = np.loadtxt(path)
        assert data.shape[1] == 12
        assert data.shape[0] == len(system.tracker.trajectory)
