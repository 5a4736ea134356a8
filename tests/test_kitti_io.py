"""KITTI loader/writer round-trips on a synthetic dataset fixture."""

import os

import numpy as np
import pytest

from sqrtlm_slam_tpu.eval import ate
from sqrtlm_slam_tpu.io import kitti


@pytest.fixture()
def fake_kitti(tmp_path):
    """Minimal KITTI odometry tree: calib, times, velodyne bins, poses."""
    root = tmp_path / "kitti"
    seq = root / "sequences" / "04"
    (seq / "velodyne").mkdir(parents=True)
    (root / "poses").mkdir(parents=True)

    fx, cx, cy, bf = 718.856, 607.1928, 185.2157, 386.1448
    with open(seq / "calib.txt", "w") as f:
        P0 = f"P0: {fx} 0 {cx} 0 0 {fx} {cy} 0 0 0 1 0\n"
        P1 = f"P1: {fx} 0 {cx} {-bf} 0 {fx} {cy} 0 0 0 1 0\n"
        Tr = "Tr: 0 -1 0 0 0 0 -1 0 1 0 0 -0.08\n"
        f.write(P0 + P1 + Tr)
    np.savetxt(seq / "times.txt", np.arange(5) * 0.1)

    rng = np.random.RandomState(0)
    for i in range(5):
        pts = rng.randn(100, 4).astype(np.float32)
        pts.tofile(seq / "velodyne" / f"{i:06d}.bin")

    poses = np.tile(np.eye(4), (5, 1, 1))
    poses[:, 0, 3] = np.arange(5) * 1.5  # move along x
    with open(root / "poses" / "04.txt", "w") as f:
        for T in poses:
            f.write(" ".join(str(x) for x in T[:3].reshape(-1)) + "\n")
    return str(root)


class TestKittiIO:
    def test_calib(self, fake_kitti):
        seq = kitti.KittiSequence(fake_kitti, "04")
        assert abs(seq.calib.cam.fx - 718.856) < 1e-6
        assert abs(seq.calib.cam.bf - 386.1448) < 1e-3
        assert seq.calib.T_cam_velo.shape == (4, 4)

    def test_velodyne_and_cam_transform(self, fake_kitti):
        seq = kitti.KittiSequence(fake_kitti, "04")
        pts = seq.velodyne(0)
        assert pts.shape == (100, 4)
        cam_pts = seq.cloud_in_cam(0)
        # Tr maps velo x-forward to cam z-forward.
        T = seq.calib.T_cam_velo
        manual = pts[:, :3] @ T[:3, :3].T + T[:3, 3]
        np.testing.assert_allclose(cam_pts, manual, atol=1e-6)

    def test_gt_poses_and_times(self, fake_kitti):
        seq = kitti.KittiSequence(fake_kitti, "04")
        assert seq.gt_poses.shape == (5, 4, 4)
        assert len(seq.times) == 5
        assert seq.num_frames == 5

    def test_pose_writer_roundtrip(self, fake_kitti, tmp_path):
        seq = kitti.KittiSequence(fake_kitti, "04")
        out = tmp_path / "out.txt"
        kitti.write_kitti_poses(str(out), seq.gt_poses)
        again = kitti.read_poses(str(out))
        np.testing.assert_allclose(again, seq.gt_poses, atol=1e-6)

    def test_ate_on_perturbed(self, fake_kitti):
        seq = kitti.KittiSequence(fake_kitti, "04")
        est = seq.gt_poses.copy()
        est[:, :3, 3] += 0.05
        rmse, _ = ate.ate_rmse(est, seq.gt_poses, align_scale=False)
        assert rmse < 1e-4  # constant offset is removed by alignment

    def test_rpe_zero_for_identical(self, fake_kitti):
        seq = kitti.KittiSequence(fake_kitti, "04")
        t_err, r_err = ate.rpe(seq.gt_poses, seq.gt_poses)
        assert t_err < 1e-9 and r_err < 1e-3
